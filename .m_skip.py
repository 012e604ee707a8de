import time
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.xla_bench_cache')
import ray_rust_tpu as rt
from ray_rust_tpu.renderer import render_color
from ray_rust_tpu.parallel.train import render_loss
import numpy as np

scene, _ = rt.default_scene()
W, H = 1280, 720
float(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0)))
print('tunnel warm', flush=True)

def scalar(c):
    return jnp.sum(c.r) + jnp.sum(c.g) + jnp.sum(c.b)

imgs = {}
for skip in (True, False):
    cfg = rt.RenderConfig(xres=W, yres=H, use_raymarching=True, glow_effect=1.0,
                          use_pallas=True, march_floor_skip=skip)
    f = jax.jit(lambda s, c=cfg: render_color(s, c))
    fsum = jax.jit(lambda s, c=cfg: scalar(render_color(s, c)))
    col = f(scene); jax.block_until_ready(col.r)
    imgs[skip] = np.stack([np.asarray(col.r), np.asarray(col.g), np.asarray(col.b)], -1)
    float(fsum(scene))
    t0 = time.perf_counter()
    for _ in range(3): float(fsum(scene))
    dt = (time.perf_counter()-t0)/3
    print(f'march fwd skip={skip}: {dt*1e3:.1f} ms  {W*H/dt/1e6:.1f} Mrays/s', flush=True)

d = np.abs(imgs[True] - imgs[False])
print(f'skip vs noskip @720p: bad_frac={(d.max(-1) > 1e-3).mean():.5f} mean={d.mean():.6f} max={d.max():.4f}', flush=True)

# fwd+bwd with skip (phase-1 marches use it too)
kcfg = rt.RenderConfig(xres=W, yres=H, use_raymarching=True, glow_effect=1.0,
                       use_pallas=True, pallas_bwd=True)
img = jax.jit(lambda s: render_color(s, kcfg))(scene)
tgt = jnp.stack([img.r, img.g, img.b], -1) + 0.05
def fb(s):
    loss, grads = jax.value_and_grad(lambda q: render_loss(q, kcfg, tgt), allow_int=True)(s)
    acc = loss
    for leaf in jax.tree_util.tree_leaves(grads):
        if hasattr(leaf, 'dtype') and leaf.dtype == jnp.float32:
            acc = acc + jnp.sum(leaf)
    return acc
fbj = jax.jit(fb)
v = float(fbj(scene)); print('fb val', v, flush=True)
t0 = time.perf_counter()
for _ in range(3): float(fbj(scene))
dt = (time.perf_counter()-t0)/3
print(f'march fwd+bwd with skip: {dt*1e3:.1f} ms  {W*H/dt/1e6:.1f} Mrays/s', flush=True)
