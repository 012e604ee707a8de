import sys, time
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.xla_bench_cache')
import ray_rust_tpu as rt
from ray_rust_tpu.renderer import render_color
from ray_rust_tpu.parallel.train import render_loss

scene, _ = rt.default_scene()
W, H = 1920, 1080
# absorb tunnel stall
float(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0)))
print('tunnel warm', flush=True)

base = rt.RenderConfig(xres=W, yres=H, use_pallas=True, pallas_bwd=True)
img0 = jax.jit(lambda s: render_color(s, base))(scene)
tgt = jnp.stack([img0.r, img0.g, img0.b], -1) + 0.05

def timed_fb(cfg, iters=5):
    grad_fn = jax.value_and_grad(lambda s: render_loss(s, cfg, tgt), allow_int=True)
    def fb(s):
        loss, grads = grad_fn(s)
        acc = loss
        for leaf in jax.tree_util.tree_leaves(grads):
            if hasattr(leaf, 'dtype') and leaf.dtype == jnp.float32:
                acc = acc + jnp.sum(leaf)
        return acc
    f = jax.jit(fb)
    t0 = time.perf_counter()
    v = float(f(scene)); print(f'  compile+first {time.perf_counter()-t0:.1f}s val={v:.4f}', flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(scene))
    return (time.perf_counter() - t0) / iters

for cols in [256, 384, 512]:
    cfg = base.with_(pallas_bwd_cols=cols)
    dt = timed_fb(cfg)
    print(f'site bwd cols={cols}: {dt*1e3:.2f} ms -> {W*H/dt/1e6:.1f} Mrays/s', flush=True)
