import os, sys, time
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', 'tests/.jax_cache')
import jax.numpy as jnp
import numpy as np
import ray_rust_tpu as rt
from ray_rust_tpu.ops.pallas_bwd import render_color_pallas_march_grads
from ray_rust_tpu.ops.rays import camera_rays
from ray_rust_tpu.ops.trace import trace_image
from ray_rust_tpu.models.vec import Color

W, H = 32, 16
glow = None if len(sys.argv) > 1 and sys.argv[1] == 'noglow' else 1.0
scene, _ = rt.default_scene()
scene = scene._replace(camera=scene.camera._replace(
    position=scene.camera.position._replace(x=jnp.float32(0.37))))
cfg = rt.RenderConfig(xres=W, yres=H, use_raymarching=True, glow_effect=glow,
                      pallas_bwd=True, raymarch_max_reflections=2,
                      max_refractions=1, refraction_unroll=1,
                      march_max_iter=512, march_chunk=8)

def _img_np(c):
    return np.stack([np.asarray(c.r), np.asarray(c.g), np.asarray(c.b)], -1)

def jnp_fwd(s):
    vi, eye = camera_rays(s.camera.position, s.camera.rotation, cfg)
    return trace_image(s, cfg.with_(use_pallas=False, march_tiles=1), vi, eye)

t0 = time.time()
ones = Color(*(jnp.ones((H, W)) for _ in range(3)))
_, primal = render_color_pallas_march_grads(scene, cfg, ones, interpret=True, return_primal=True)
print(f'march site bwd done in {time.time()-t0:.1f}s', flush=True)

imgj = _img_np(jnp_fwd(scene))
agree = (np.abs(_img_np(primal) - imgj).max(-1) < 1e-4)
print('agree frac:', agree.mean())

rng = np.random.default_rng(0)
gm = rng.standard_normal((H, W)).astype(np.float32) * agree
g = Color(*(jnp.asarray(gm) for _ in range(3)))
ct = render_color_pallas_march_grads(scene, cfg, g, interpret=True)
_, vjp = jax.vjp(jnp_fwd, scene)
(ct_ref,) = vjp(g)

paths = jax.tree_util.tree_flatten_with_path(ct)[0]
lb = jax.tree_util.tree_leaves(ct_ref)
ok = True
for (path, a), b in zip(paths, lb):
    if getattr(a, "dtype", None) is None or str(a.dtype) != "float32":
        continue
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    ks = jax.tree_util.keystr(path)
    if "pattern_scale" in ks:
        assert np.isfinite(a).all(); continue
    denom = max(np.linalg.norm(b), 1e-2)
    rel = np.linalg.norm(a - b) / denom
    if rel > 0.02:
        ok = False
        print('MISMATCH', ks, 'rel %.4g'%rel, 'got', a[:3], 'want', b[:3])
print('grads ok' if ok else 'grads MISMATCH')
