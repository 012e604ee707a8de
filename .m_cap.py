import time
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.xla_bench_cache')
import ray_rust_tpu as rt
from ray_rust_tpu.renderer import render_color

scene, _ = rt.default_scene()
W, H = 1280, 720
float(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0)))
print('tunnel warm', flush=True)

def scalar(c):
    return jnp.sum(c.r) + jnp.sum(c.g) + jnp.sum(c.b)

for cap in (2048, 512, 256, 128, 64):
    cfg = rt.RenderConfig(xres=W, yres=H, use_raymarching=True, glow_effect=1.0,
                          use_pallas=True, march_max_iter=cap)
    f = jax.jit(lambda s, c=cfg: scalar(render_color(s, c)))
    float(f(scene))
    t0 = time.perf_counter()
    for _ in range(3): float(f(scene))
    dt = (time.perf_counter()-t0)/3
    print(f'cap={cap}: {dt*1e3:.1f} ms  {W*H/dt/1e6:.1f} Mrays/s', flush=True)
