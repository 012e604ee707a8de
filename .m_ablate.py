import time
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.xla_bench_cache')
import ray_rust_tpu as rt
import ray_rust_tpu.ops.pallas_bwd as pb
from ray_rust_tpu.models.vec import Color
from ray_rust_tpu.ops.pallas_bwd import render_color_pallas_grads_site

scene, _ = rt.default_scene()
W, H = 1920, 1080
float(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0)))
print('tunnel warm', flush=True)

cfg = rt.RenderConfig(xres=W, yres=H, use_pallas=True, pallas_bwd=True, pallas_bwd_cols=256)
ones = Color(*(jnp.ones((H, W), jnp.float32) for _ in range(3)))

def timed(tag):
    f = jax.jit(lambda g: render_color_pallas_grads_site(scene, cfg, g))
    t0 = time.perf_counter()
    out = f(ones); jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    print(f'{tag} compile+first {time.perf_counter()-t0:.1f}s', flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(ones); jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    print(f'{tag}: {(time.perf_counter()-t0)/5*1e3:.2f} ms', flush=True)

timed('full')

real_scatter = pb._scatter_block
pb._scatter_block = lambda gsa, gc, gl, consumed, recs, n, rows_out: jnp.zeros((rows_out, 128), jnp.float32)
timed('no-scatter')

real_replay = pb._p2_replay
def dummy_replay(vcfg, nodes, recs, sargs, light, bg_fn, vi, eye, lev, active):
    shape = jnp.shape(eye.x)
    z = jnp.zeros(shape, jnp.float32)
    # touch args so vjp structure holds but work is trivial
    return Color(z + vi.x * 0.0, z, z)
pb._p2_replay = dummy_replay
timed('p1-only')
pb._scatter_block = real_scatter
pb._p2_replay = real_replay
