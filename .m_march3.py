import time
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.xla_bench_cache')
import ray_rust_tpu as rt
from ray_rust_tpu.renderer import render_color
from ray_rust_tpu.parallel.train import render_loss

scene, _ = rt.default_scene()
W, H = 1280, 720
float(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0)))
print('tunnel warm', flush=True)

def scalar(c):
    return jnp.sum(c.r) + jnp.sum(c.g) + jnp.sum(c.b)

# forward with new defaults
mcfg = rt.RenderConfig(xres=W, yres=H, use_raymarching=True, glow_effect=1.0, use_pallas=True)
f = jax.jit(lambda s: scalar(render_color(s, mcfg)))
t0 = time.perf_counter(); v = float(f(scene)); print(f'march fwd compile {time.perf_counter()-t0:.0f}s val={v:.0f}', flush=True)
t0 = time.perf_counter()
for _ in range(3): float(f(scene))
dt = (time.perf_counter()-t0)/3
print(f'march fwd (new defaults): {dt*1e3:.1f} ms  {W*H/dt/1e6:.1f} Mrays/s', flush=True)

# fwd+bwd through the march site backward
kcfg = mcfg.with_(pallas_bwd=True)
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
t0 = time.perf_counter(); v = float(fbj(scene)); print(f'march fwd+bwd compile {time.perf_counter()-t0:.0f}s val={v:.4f}', flush=True)
t0 = time.perf_counter()
for _ in range(3): float(fbj(scene))
dt = (time.perf_counter()-t0)/3
print(f'march fwd+bwd (site kernel): {dt*1e3:.1f} ms  {W*H/dt/1e6:.1f} Mrays/s', flush=True)

# budgeted forward (quality-trade headroom)
for cap in (1024, 384):
    bcfg = mcfg.with_(march_max_iter=cap)
    fb2 = jax.jit(lambda s, c=bcfg: scalar(render_color(s, c)))
    float(fb2(scene))
    t0 = time.perf_counter()
    for _ in range(3): float(fb2(scene))
    dt = (time.perf_counter()-t0)/3
    print(f'march fwd budget cap={cap}: {dt*1e3:.1f} ms  {W*H/dt/1e6:.1f} Mrays/s', flush=True)
