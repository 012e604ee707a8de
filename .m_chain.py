import time
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.xla_bench_cache')
import ray_rust_tpu as rt
from ray_rust_tpu.renderer import render_color
from ray_rust_tpu.parallel.train import render_loss

scene, _ = rt.default_scene()
W, H = 1920, 1080
CHAIN = 4
float(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0)))
print('tunnel warm', flush=True)

base = rt.RenderConfig(xres=W, yres=H, use_pallas=True, pallas_bwd=True)
img0 = jax.jit(lambda s: render_color(s, base))(scene)
tgt = jnp.stack([img0.r, img0.g, img0.b], -1) + 0.05

def chain_fb(cfg):
    grad_fn = jax.value_and_grad(lambda s: render_loss(s, cfg, tgt), allow_int=True)
    def one(s):
        loss, grads = grad_fn(s)
        acc = loss
        for leaf in jax.tree_util.tree_leaves(grads):
            if hasattr(leaf, 'dtype') and leaf.dtype == jnp.float32:
                acc = acc + jnp.sum(leaf)
        return acc
    def fb_chain(s):
        def body(a, dx):
            cam = s.camera
            s2 = s._replace(camera=cam._replace(position=cam.position._replace(x=cam.position.x + dx)))
            return a + one(s2), None
        a, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(CHAIN, dtype=jnp.float32) * 1e-3)
        return a
    return jax.jit(fb_chain)

for tag, cfg in [
    ('site cols=256', base.with_(pallas_bwd_cols=256)),
    ('site cols=512', base.with_(pallas_bwd_cols=512)),
    ('old  cols=384', base.with_(pallas_bwd_site=False)),
]:
    f = chain_fb(cfg)
    t0 = time.perf_counter()
    v = float(f(scene))
    print(f'{tag}: compile {time.perf_counter()-t0:.1f}s val={v:.3f}', flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        float(f(scene))
    dt = (time.perf_counter()-t0)/3/CHAIN
    print(f'{tag}: {dt*1e3:.2f} ms/step -> {W*H/dt/1e6:.1f} Mrays/s fwd+bwd', flush=True)
