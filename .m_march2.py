import time
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.xla_bench_cache')
import ray_rust_tpu as rt
from ray_rust_tpu.ops.pallas_march import render_color_pallas_march

scene, _ = rt.default_scene()
W, H = 1280, 720
float(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0)))
print('tunnel warm', flush=True)

def scalar(c):
    return jnp.sum(c.r) + jnp.sum(c.g) + jnp.sum(c.b)

for cols, rows, chunk in [(256, 8, 16), (256, 8, 32), (128, 8, 32),
                          (128, 8, 64), (256, 8, 64), (128, 16, 16),
                          (384, 8, 16)]:
    cfg = rt.RenderConfig(xres=W, yres=H, use_raymarching=True, glow_effect=1.0,
                          use_pallas=True, pallas_cols=cols, pallas_rows=rows,
                          march_chunk=chunk)
    try:
        f = jax.jit(lambda s, cfg=cfg: scalar(render_color_pallas_march(s, cfg)))
        t0 = time.perf_counter()
        v = float(f(scene))
        c_t = time.perf_counter()-t0
        t0 = time.perf_counter()
        for _ in range(3):
            float(f(scene))
        dt = (time.perf_counter()-t0)/3
        print(f'cols={cols} rows={rows} chunk={chunk}: {dt*1e3:.1f} ms  {W*H/dt/1e6:.1f} Mrays/s (compile {c_t:.0f}s val={v:.0f})', flush=True)
    except Exception as e:
        print(f'cols={cols} rows={rows} chunk={chunk}: FAILED {type(e).__name__}', flush=True)
