import os, time
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', 'tests/.jax_cache')
import jax.numpy as jnp
import numpy as np
import ray_rust_tpu as rt
from ray_rust_tpu.ops.pallas_march import render_color_pallas_march

scene, _ = rt.default_scene()
W, H = 64, 48
base = dict(xres=W, yres=H, use_raymarching=True, glow_effect=1.0,
            max_refractions=1, march_max_iter=4000, pallas_march_chunk=4,
            use_pallas=False, march_tiles=1)

def img(c):
    col = rt.render(scene, rt.RenderConfig(**c)) if not c.get('k') else None
    return np.stack([np.asarray(col.r), np.asarray(col.g), np.asarray(col.b)], -1)

t0=time.time()
ref = img(base)
print(f'jnp ref {time.time()-t0:.0f}s', flush=True)

for skip in (False, True):
    cfg = rt.RenderConfig(**{**base, 'use_pallas': True}, )
    cfg = cfg.with_(march_floor_skip=skip)
    t0=time.time()
    col = render_color_pallas_march(scene, cfg, interpret=True)
    got = np.stack([np.asarray(col.r), np.asarray(col.g), np.asarray(col.b)], -1)
    d = np.abs(got - ref)
    bad = (d.max(-1) > 1e-3).mean()
    print(f'skip={skip}: {time.time()-t0:.0f}s bad_frac={bad:.3f} mean={d.mean():.5f} max={d.max():.3f}', flush=True)
