"""Benchmark harness (driver-run on real TPU).

Headline metric (BASELINE.json north star): primary Mrays/s/chip for
forward+backward rendering of the default scene at 1920x1080, full reference
depths (refraction unroll 4 == bit-identical to the reference's depth-10
semantics on this scene; measured with the scalar oracle).

Prints ONE JSON line to stdout; supplementary metrics go to stderr.

Measurement notes for this environment:
* The TPU is reached through a TCP relay whose FIRST dispatch can stall for
  minutes server-side (measured: a trivial ``jit(x+1)`` result fetch hangs
  with ~140 B/s keepalive traffic while the process sleeps at 0 CPU — see
  BENCH_NOTES.md "warmup stall"). That stall is environment latency, NOT
  compile time: round 3 recorded it as a 1439.9s "warmup compile" and, since
  every supplementary section was gated on wall-clock-since-start, silently
  skipped the entire measurement matrix. This harness (a) absorbs the stall
  in a trivial-jit warmup reported separately as ``tunnel_first_dispatch_s``
  and (b) gates sections on *work time* measured from after the warmup.
* A persistent XLA compilation cache (``.xla_bench_cache/``, gitignored)
  carries real compile work across rounds.
* Per-dispatch tunnel latency is ~30 ms, so timed functions reduce to a
  scalar inside jit and forward throughput is also reported amortized over an
  in-jit ``lax.scan`` chain of renders (CHAIN=8).

Baseline: the reference publishes no numbers (BASELINE.md) and no Rust
toolchain exists in this image. Round 5 replaces the old hand-waved 4.0
Mrays/s ESTIMATE with a MEASUREMENT of a native stand-in:
``native/baseline_ref.cpp`` — a C++ f32 transliteration of the reference's
trace semantics (the compiled-language sibling of tests/oracle.py, verified
against the oracle goldens), -O3, scanline thread pool mirroring
render.rs:836-898 — built and run live on this host's CPU at the headline
resolution. ``vs_baseline`` divides by that measured number (reference
stand-in on THIS host's CPU, all cores, vs one TPU chip);
``baseline_proxy_8thread_extrapolated`` additionally scales it to the
reference's default 8 threads (main.rs:48) for desktop-class context. If
the proxy cannot be built, the legacy estimate (4.0) is used and
``baseline_is_estimate`` returns to true.
"""

import json
import os
import subprocess
import sys
import time

RUST_BASELINE_PRIMARY_MRAYS = 4.0  # legacy estimate (fallback only)


def measure_baseline_proxy(width, height):
    """Build + run native/baseline_ref.cpp on the host CPU; returns the
    parsed JSON dict or None."""
    root = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(root, "native", "baseline_ref.cpp")
    exe = os.path.join(root, "native", "baseline_ref")
    try:
        if not os.path.exists(exe) or (
            os.path.getmtime(exe) < os.path.getmtime(src)
        ):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-o", exe, src,
                 "-lpthread"],
                check=True, capture_output=True, timeout=300,
            )
        best = None
        for _ in range(3):
            out = subprocess.run(
                [exe, str(width), str(height)],
                check=True, capture_output=True, text=True, timeout=300,
            )
            res = json.loads(out.stdout)
            if best is None or res["primary_mrays"] > best["primary_mrays"]:
                best = res
        return best
    except Exception as e:
        log(f"baseline proxy unavailable: {e}")
        return None
CHAIN = 8  # renders per dispatch for amortized forward throughput
FB_CHAIN = 4  # fwd+bwd steps per dispatch for the amortized headline

# Work-time budgets (seconds since warmup completed) gating each
# supplementary section, in EXECUTION order — BASELINE configs first
# (VERDICT r3 #1: the round-3 gate ordering skipped march entirely).
BUDGETS = {
    "march_fwd": 900,        # BASELINE config 3
    "march_fwd_bwd": 1000,   # first-ever march gradient number
    "stress_101": 1100,      # BASELINE config 4
    "textured": 1200,        # reference default scene with bar.png
    "tiled_4k": 1300,        # BASELINE config 5's render half
    "inverse": 1400,         # BASELINE config 5's training half
    "sharded_smoke": 1500,
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".xla_bench_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import ray_rust_tpu as rt
    from ray_rust_tpu.renderer import render_color
    from ray_rust_tpu.parallel.train import render_loss

    dev = jax.devices()[0]
    log(f"device: {dev}")

    scene, _ = rt.default_scene()

    def scalar(col):
        return jnp.sum(col.r) + jnp.sum(col.g) + jnp.sum(col.b)

    # ---- warmup: absorb the tunnel's first-dispatch stall on a trivial
    # program, then compile a tiny render. Reported separately — neither is a
    # property of the renderer.
    t0 = time.perf_counter()
    float(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0)))
    tunnel_s = time.perf_counter() - t0
    log(f"tunnel first dispatch (trivial jit): {tunnel_s:.1f}s")

    t0 = time.perf_counter()
    warm_cfg = rt.RenderConfig(xres=32, yres=24, max_reflections=1,
                               max_refractions=1)
    float(jax.jit(lambda s: scalar(render_color(s, warm_cfg)))(scene))
    warm_s = time.perf_counter() - t0
    log(f"warmup render compile: {warm_s:.1f}s")

    t_work0 = time.perf_counter()

    def work_s():
        return time.perf_counter() - t_work0

    W, H = 1920, 1080
    cfg = rt.RenderConfig(xres=W, yres=H)
    rays = W * H

    def timed(fn, arg, iters=5, what=""):
        t0 = time.perf_counter()
        float(fn(arg))
        log(f"{what} compile+first: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for _ in range(iters):
            out = float(fn(arg))
        dt = (time.perf_counter() - t0) / iters
        assert out == out, "nan"
        return dt

    def chain_of(render_fn, chain_cfg):
        def chain_fn(s):
            def body(acc, dx):
                cam = s.camera
                s2 = s._replace(camera=cam._replace(
                    position=cam.position._replace(x=cam.position.x + dx)))
                return acc + scalar(render_fn(s2, chain_cfg)), None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                jnp.arange(CHAIN, dtype=jnp.float32) * 1e-3)
            return acc

        return jax.jit(chain_fn)

    # ---- total-traced-rays accounting (BASELINE.md:34-37) ----
    total_rays = None
    try:
        from ray_rust_tpu.ops.accounting import count_traced_rays

        total_rays = float(jax.jit(
            lambda s: count_traced_rays(s, cfg))(scene))
        log(f"traced rays/frame: primary {rays/1e6:.2f}M, "
            f"total {total_rays/1e6:.2f}M ({total_rays/rays:.2f}x)")
    except Exception as e:  # supplementary only
        log(f"ray accounting failed: {e}")

    # ---- forward: single dispatch + amortized chains ----
    # Headline chain = the default path (Pallas kernel on TPU). The explicit
    # use_pallas=False chain keeps the jnp/XLA oracle path tracked (VERDICT
    # r3 weak #3: auto-on made the old "jnp" label measure the kernel twice).
    fwd = jax.jit(lambda s: scalar(render_color(s, cfg)))
    fwd_t = timed(fwd, scene, what="fwd")
    log(f"fwd 1080p single-dispatch: {fwd_t*1e3:.2f} ms")

    fwd_amort = timed(chain_of(render_color, cfg), scene, iters=3,
                      what="fwd-chain") / CHAIN
    fwd_mrays = rays / fwd_amort / 1e6
    log(f"fwd 1080p amortized: {fwd_amort*1e3:.2f} ms -> "
        f"{fwd_mrays:.1f} Mrays/s primary")

    jnp_cfg = cfg.with_(use_pallas=False)
    fwd_jnp_ms = None
    try:
        j_t = timed(chain_of(render_color, jnp_cfg), scene, iters=3,
                    what="fwd-jnp-chain") / CHAIN
        fwd_jnp_ms = j_t * 1e3
        log(f"fwd 1080p jnp/XLA amortized: {fwd_jnp_ms:.2f} ms -> "
            f"{rays/j_t/1e6:.1f} Mrays/s primary")
    except Exception as e:
        log(f"jnp-path bench failed: {e}")

    # ---- forward+backward (scene-parameter gradients): the HEADLINE ----
    img0 = jax.jit(lambda s: render_color(s, cfg))(scene)
    target = jnp.stack([img0.r, img0.g, img0.b], -1) + 0.05

    def make_fb(loss_cfg):
        grad_fn = jax.value_and_grad(
            lambda s: render_loss(s, loss_cfg, target), allow_int=True
        )

        def fb_scalar(s):
            loss, grads = grad_fn(s)
            acc = loss
            for leaf in jax.tree_util.tree_leaves(grads):
                if hasattr(leaf, "dtype") and leaf.dtype == jnp.float32:
                    acc = acc + jnp.sum(leaf)
            return acc

        return jax.jit(fb_scalar)

    def make_fb_chain(loss_cfg):
        """CHAIN fwd+bwd steps per dispatch (lax.scan), matching the forward
        metric's amortization: the ~20 ms tunnel round-trip a single float()
        fetch pays (BENCH_NOTES.md) is environment latency, not renderer
        cost — rounds 1-3 reported it inside the headline."""
        grad_fn = jax.value_and_grad(
            lambda s: render_loss(s, loss_cfg, target), allow_int=True
        )

        def one(s):
            loss, grads = grad_fn(s)
            acc = loss
            for leaf in jax.tree_util.tree_leaves(grads):
                if hasattr(leaf, "dtype") and leaf.dtype == jnp.float32:
                    acc = acc + jnp.sum(leaf)
            return acc

        def fb_chain(s):
            def body(a, dx):
                cam = s.camera
                s2 = s._replace(camera=cam._replace(
                    position=cam.position._replace(x=cam.position.x + dx)))
                return a + one(s2), None

            a, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                jnp.arange(FB_CHAIN, dtype=jnp.float32) * 1e-3)
            return a

        return jax.jit(fb_chain)

    fb_t = None
    fb_single_ms = None
    # ZERO-FLAG default config: on TPU the tri-state auto resolves to the
    # fused forward + site-backward kernels (VERDICT r4 #1 — the headline
    # must be the path jax.grad(render_color) hits with no flag anywhere).
    kcfg = cfg
    try:
        fb_single_ms = timed(make_fb(kcfg), scene,
                             what="fwd+bwd (pallas, single)") * 1e3
        fb_t = timed(make_fb_chain(kcfg), scene, iters=3,
                     what="fwd+bwd (pallas, chain)") / FB_CHAIN
    except Exception as e:
        log(f"pallas fwd+bwd failed, falling back to jnp path: {e}")
    if fb_t is None:
        fb_t = timed(make_fb(jnp_cfg), scene, what="fwd+bwd (jnp)")
    fb_mrays = rays / fb_t / 1e6
    log(f"fwd+bwd 1080p: {fb_t*1e3:.2f} ms -> {fb_mrays:.1f} Mrays/s primary")

    # ---- supplementary: raymarch + glow 1280x720 (BASELINE config 3) ----
    march_ms = None
    march_single_ms = None
    march_budget_ms = None
    if work_s() < BUDGETS["march_fwd"]:
        try:
            mcfg = rt.RenderConfig(xres=1280, yres=720, use_raymarching=True,
                                   glow_effect=1.0)
            # Amortized chain = renderer cost (same methodology as the fwd
            # headline — the ~22 ms/dispatch tunnel round-trip is environment
            # latency; r4's 41.1 ms march number was single-dispatch and so
            # carried it). Both reported.
            m_t = timed(chain_of(render_color, mcfg), scene, iters=3,
                        what="march-chain") / CHAIN
            march_ms = m_t * 1e3
            log(f"raymarch+glow 720p amortized: {march_ms:.1f} ms -> "
                f"{1280*720/m_t/1e6:.1f} Mrays/s primary")
            march = jax.jit(lambda s: scalar(render_color(s, mcfg)))
            ms_t = timed(march, scene, iters=2, what="march-single")
            march_single_ms = ms_t * 1e3
            log(f"raymarch+glow 720p single-dispatch (r4-comparable): "
                f"{march_single_ms:.1f} ms")
            # quality-trade headroom: the reference's own MAX_ITER=10000 is a
            # quality knob (render.rs:1255); a 1024-step budget converges all
            # but a sub-horizon sliver of rays and halves wall time.
            bcfg = mcfg.with_(march_max_iter=1024)
            mb_t = timed(jax.jit(lambda s: scalar(render_color(s, bcfg))),
                         scene, iters=2, what="march-budget1024")
            march_budget_ms = mb_t * 1e3
            log(f"raymarch budget-1024 720p: {march_budget_ms:.1f} ms -> "
                f"{1280*720/mb_t/1e6:.1f} Mrays/s primary")
        except Exception as e:  # supplementary only
            log(f"march bench failed: {e}")

    # ---- supplementary: march fwd+bwd (implicit-VJP gradients) ----
    march_fb_ms = None
    march_fb_amort_ms = None
    if work_s() < BUDGETS["march_fwd_bwd"]:
        try:
            mcfg = rt.RenderConfig(xres=1280, yres=720, use_raymarching=True,
                                   glow_effect=1.0)
            img_m = jax.jit(lambda s: render_color(s, mcfg))(scene)
            tgt_m = jnp.stack([img_m.r, img_m.g, img_m.b], -1) + 0.05

            def fb_march(s):
                loss, grads = jax.value_and_grad(
                    lambda q: render_loss(q, mcfg, tgt_m), allow_int=True)(s)
                acc = loss
                for leaf in jax.tree_util.tree_leaves(grads):
                    if hasattr(leaf, "dtype") and leaf.dtype == jnp.float32:
                        acc = acc + jnp.sum(leaf)
                return acc

            m_t = timed(jax.jit(fb_march), scene, iters=2,
                        what="march fwd+bwd")
            march_fb_ms = m_t * 1e3
            log(f"march fwd+bwd 720p single-dispatch (r4-comparable): "
                f"{march_fb_ms:.1f} ms -> "
                f"{1280*720/m_t/1e6:.1f} Mrays/s primary")

            # amortized 2-step chain (renderer cost; ~3.5 min extra compile)
            def fb_march_chain(s):
                def body(a, dx):
                    cam = s.camera
                    s2 = s._replace(camera=cam._replace(
                        position=cam.position._replace(
                            x=cam.position.x + dx)))
                    return a + fb_march(s2), None

                a, _ = jax.lax.scan(
                    body, jnp.float32(0.0),
                    jnp.arange(2, dtype=jnp.float32) * 1e-3)
                return a

            mc_t = timed(jax.jit(fb_march_chain), scene, iters=2,
                         what="march fwd+bwd chain") / 2
            march_fb_amort_ms = mc_t * 1e3
            log(f"march fwd+bwd 720p amortized: {march_fb_amort_ms:.1f} ms "
                f"-> {1280*720/mc_t/1e6:.1f} Mrays/s primary")
        except Exception as e:  # supplementary only
            log(f"march fwd+bwd bench failed: {e}")

    # ---- supplementary: 100-sphere deserialized stress scene (config 4) ----
    stress_ms = None
    if work_s() < BUDGETS["stress_101"]:
        try:
            import numpy as np

            from ray_rust_tpu import FloorSpec, MaterialSpec, SphereSpec, build_scene
            from ray_rust_tpu.models.serialize import (
                deserialize_scene,
                serialize_scene,
            )

            rng = np.random.default_rng(7)
            mats = [MaterialSpec(name="m0", diffuse=(1.0, 1.0, 0.0))] + [
                MaterialSpec(
                    name=f"m{i}",
                    diffuse=tuple(rng.uniform(0.2, 1.0, 3).round(3)),
                    specular=(0.3, 0.3, 0.3),
                    pn=8,
                )
                for i in range(1, 9)
            ]
            objs = [FloorSpec(material="m0", org=(0, -300, 0),
                              face_normal=(0, 1, 0))] + [
                SphereSpec(
                    material=f"m{1 + int(rng.integers(8))}",
                    r=float(rng.uniform(20, 60)),
                    org=tuple(
                        rng.uniform(-800, 800, 3) * np.array([1, 0.3, 1])
                        + np.array([0, -150, 400])
                    ),
                )
                for _ in range(100)
            ]
            big_scene, big_meta = build_scene(
                mats, objs, camera_position=(0, -150, -300),
                camera_pyr=(0, -np.pi / 2, -np.pi / 2),
                light=(50, 60, -50),
            )
            # Round-trip through the reference YAML format (config 4 says
            # "deserialized custom scene") so the stress path includes the
            # serializer.
            big_scene, _, _ = deserialize_scene(
                serialize_scene(big_scene, big_meta))
            # the fused kernel's fori_loop object path covers >64-object
            # scenes (ops/pallas_trace.py:_KernelScene); zero-flag default
            scfg = rt.RenderConfig(xres=640, yres=480)
            s_t = timed(chain_of(render_color, scfg), big_scene, iters=3,
                        what="stress-101obj-chain") / CHAIN
            stress_ms = s_t * 1e3
            log(f"101-object 640x480 fwd (amortized): {stress_ms:.1f} ms -> "
                f"{640*480/s_t/1e6:.1f} Mrays/s primary")
        except Exception as e:  # supplementary only
            log(f"stress bench failed: {e}")

    # ---- supplementary: textured default scene (reference's bar.png path) --
    tex_ms = None
    tex_single_ms = None
    tex_fb_ms = None
    tex_fb_amort_ms = None
    if work_s() < BUDGETS["textured"]:
        try:
            import numpy as np

            from ray_rust_tpu.models.scene import default_scene as build_default

            # The reference's default floor is textured whenever bar.png
            # exists next to the binary (src/main.rs:169). None ships with the
            # repo, so synthesize an equivalent 256x256 RGB texture.
            import tempfile

            from PIL import Image

            rng2 = np.random.default_rng(11)
            tex = (rng2.uniform(0, 255, (256, 256, 3))).astype(np.uint8)
            with tempfile.TemporaryDirectory() as td:
                Image.fromarray(tex, "RGB").save(os.path.join(td, "bar.png"))
                tex_scene, _ = build_default(texture_dir=td)
            tcfg = rt.RenderConfig(xres=W, yres=H)
            t_t = timed(chain_of(render_color, tcfg), tex_scene, iters=3,
                        what="textured-chain") / CHAIN
            tex_ms = t_t * 1e3
            log(f"textured 1080p fwd amortized: {tex_ms:.1f} ms -> "
                f"{rays/t_t/1e6:.1f} Mrays/s primary")
            texf = jax.jit(lambda s: scalar(render_color(s, tcfg)))
            ts_t = timed(texf, tex_scene, iters=3, what="textured-single")
            tex_single_ms = ts_t * 1e3
            log(f"textured 1080p fwd single-dispatch (r4-comparable): "
                f"{tex_single_ms:.1f} ms")

            # textured fwd+bwd (VERDICT r3 #3: backward covers textures)
            tkcfg = tcfg
            img_t = jax.jit(lambda s: render_color(s, tkcfg))(tex_scene)
            tgt_t = jnp.stack([img_t.r, img_t.g, img_t.b], -1) + 0.05

            def fb_tex(s):
                loss, grads = jax.value_and_grad(
                    lambda q: render_loss(q, tkcfg, tgt_t), allow_int=True)(s)
                acc = loss
                for leaf in jax.tree_util.tree_leaves(grads):
                    if hasattr(leaf, "dtype") and leaf.dtype == jnp.float32:
                        acc = acc + jnp.sum(leaf)
                return acc

            tb_t = timed(jax.jit(fb_tex), tex_scene, iters=2,
                         what="textured fwd+bwd")
            tex_fb_ms = tb_t * 1e3
            log(f"textured 1080p fwd+bwd single-dispatch (r4-comparable): "
                f"{tex_fb_ms:.1f} ms -> {rays/tb_t/1e6:.1f} Mrays/s primary")

            def fb_tex_chain(s):
                def body(a, dx):
                    cam = s.camera
                    s2 = s._replace(camera=cam._replace(
                        position=cam.position._replace(
                            x=cam.position.x + dx)))
                    return a + fb_tex(s2), None

                a, _ = jax.lax.scan(
                    body, jnp.float32(0.0),
                    jnp.arange(2, dtype=jnp.float32) * 1e-3)
                return a

            tc_t = timed(jax.jit(fb_tex_chain), tex_scene, iters=2,
                         what="textured fwd+bwd chain") / 2
            tex_fb_amort_ms = tc_t * 1e3
            log(f"textured 1080p fwd+bwd amortized: {tex_fb_amort_ms:.1f} ms "
                f"-> {rays/tc_t/1e6:.1f} Mrays/s primary")
        except Exception as e:  # supplementary only
            log(f"textured bench failed: {e}")

    # ---- supplementary: 4K tiled forward (config "long context") ----
    k4_ms = None
    k4_dev_ms = None
    if work_s() < BUDGETS["tiled_4k"]:
        try:
            from jax.sharding import Mesh

            from ray_rust_tpu.parallel.shard import render_tiled_u8

            import numpy as np

            mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                         ("dp", "sp"))
            k4cfg = rt.RenderConfig(xres=3840, yres=2160)
            t0 = time.perf_counter()
            render_tiled_u8(scene, k4cfg, mesh1, rows_per_tile=432)
            log(f"4K tiled compile+first: {time.perf_counter() - t0:.1f}s")
            t0 = time.perf_counter()
            render_tiled_u8(scene, k4cfg, mesh1, rows_per_tile=432)
            k4_ms = (time.perf_counter() - t0) * 1e3
            log(f"4K tiled fwd (to host u8): {k4_ms:.1f} ms -> "
                f"{3840*2160/(k4_ms/1e3)/1e6:.1f} Mrays/s primary")
            # device-side 4K: the to-host number is dominated by hauling a
            # 24 MB u8 frame through the tunnel; the kernel path streams
            # tiles and never materializes per-pixel intermediates, so a
            # monolithic 4K launch fits HBM — reduce on device to isolate
            # render cost.
            k4r = jax.jit(lambda s: scalar(render_color(s, k4cfg)))
            kd_t = timed(k4r, scene, iters=3, what="4K-device")
            k4_dev_ms = kd_t * 1e3
            log(f"4K device-side fwd: {k4_dev_ms:.1f} ms -> "
                f"{3840*2160/kd_t/1e6:.1f} Mrays/s primary")
        except Exception as e:  # supplementary only
            log(f"4K bench failed: {e}")

    # ---- supplementary: inverse-rendering step rate (config 5 analogue) ----
    inv_steps_s = None
    if work_s() < BUDGETS["inverse"]:
        try:
            from ray_rust_tpu.parallel.train import sgd_train_step

            icfg = rt.RenderConfig(xres=320, yres=240)
            img_i = jax.jit(lambda s: render_color(s, icfg))(scene)
            tgt_i = jnp.stack([img_i.r, img_i.g, img_i.b], -1) + 0.05
            s0, _ = sgd_train_step(scene, icfg, tgt_i, lr=1e-4)
            jax.block_until_ready(jax.tree_util.tree_leaves(s0)[0])
            t0 = time.perf_counter()
            s_cur = scene
            for _ in range(10):
                s_cur, loss = sgd_train_step(s_cur, icfg, tgt_i, lr=1e-4)
            jax.block_until_ready(loss)
            inv_steps_s = 10 / (time.perf_counter() - t0)
            log(f"inverse rendering 320x240: {inv_steps_s:.1f} steps/s")
        except Exception as e:  # supplementary only
            log(f"inverse bench failed: {e}")

    # ---- supplementary: full-depth sharded fwd+bwd smoke (1-chip mesh) ----
    sharded_ok = None
    if work_s() < BUDGETS["sharded_smoke"]:
        try:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ray_rust_tpu.parallel.shard import make_mesh
            from ray_rust_tpu.parallel.train import sgd_train_step

            mesh1 = make_mesh(jax.devices()[:1], dp=1, sp=1)
            ccfg = rt.RenderConfig(xres=640, yres=360)
            with mesh1:
                tgt = jax.device_put(
                    jnp.zeros((360, 640, 3), jnp.float32),
                    NamedSharding(mesh1, P("dp", "sp", None)))
                _, loss = sgd_train_step(scene, ccfg, tgt, lr=1e-4)
                sharded_ok = bool(jnp.isfinite(loss))
            log(f"sharded full-depth fwd+bwd smoke (Mesh(1,1)): ok={sharded_ok}")
        except Exception as e:  # supplementary only
            log(f"sharded smoke failed: {e}")

    # ---- native CPU baseline proxy (measured, this host) ----
    proxy = measure_baseline_proxy(W, H)
    if proxy is not None:
        baseline_mrays = proxy["primary_mrays"]
        baseline_is_estimate = False
        log(f"baseline proxy (C++ ref stand-in, {proxy['threads']} threads, "
            f"this host): {baseline_mrays:.1f} Mrays/s primary at 1080p")
    else:
        baseline_mrays = RUST_BASELINE_PRIMARY_MRAYS
        baseline_is_estimate = True

    extra = {
        "tunnel_first_dispatch_s": round(tunnel_s, 1),
        "warmup_render_compile_s": round(warm_s, 1),
        "fwd_amortized_ms": round(fwd_amort * 1e3, 3),
        "fwd_single_dispatch_ms": round(fwd_t * 1e3, 3),
        "fwd_amortized_mrays": round(fwd_mrays, 2),
        "fwd_bwd_ms": round(fb_t * 1e3, 3),
        "baseline_is_estimate": baseline_is_estimate,
    }
    if proxy is not None:
        extra["baseline_proxy_mrays"] = round(baseline_mrays, 2)
        extra["baseline_proxy_threads"] = proxy["threads"]
        extra["baseline_proxy_8thread_extrapolated"] = round(
            baseline_mrays * 8.0 / max(proxy["threads"], 1), 2)
        # forward-vs-forward comparison (the reference has no backward at
        # all, so the headline fwd+bwd ratio understates the renderer gap)
        extra["fwd_vs_baseline"] = round(fwd_mrays / baseline_mrays, 2)
    if fb_single_ms is not None:
        extra["fwd_bwd_single_dispatch_ms"] = round(fb_single_ms, 3)
    if total_rays is not None:
        extra["total_traced_rays_per_frame_M"] = round(total_rays / 1e6, 2)
        extra["fwd_bwd_total_mrays"] = round(total_rays / fb_t / 1e6, 2)
        extra["fwd_total_mrays"] = round(total_rays / fwd_amort / 1e6, 2)
    if fwd_jnp_ms is not None:
        extra["fwd_jnp_ms"] = round(fwd_jnp_ms, 3)
    # (fwd_pallas_mrays dropped in r5: since the kernel became the default
    # path it aliased fwd_amortized_mrays — ADVICE r4.)
    if march_ms is not None:
        extra["raymarch_720p_ms"] = round(march_ms, 1)
    if march_single_ms is not None:
        extra["raymarch_720p_single_dispatch_ms"] = round(march_single_ms, 1)
    if march_budget_ms is not None:
        extra["raymarch_budget1024_720p_ms"] = round(march_budget_ms, 1)
    if march_fb_ms is not None:
        extra["raymarch_fwd_bwd_720p_ms"] = round(march_fb_ms, 1)
    if march_fb_amort_ms is not None:
        extra["raymarch_fwd_bwd_720p_amortized_ms"] = round(
            march_fb_amort_ms, 1)
    if stress_ms is not None:
        extra["stress_101obj_640x480_ms"] = round(stress_ms, 1)
    if tex_ms is not None:
        extra["textured_1080p_ms"] = round(tex_ms, 1)
    if tex_single_ms is not None:
        extra["textured_1080p_single_dispatch_ms"] = round(tex_single_ms, 1)
    if tex_fb_ms is not None:
        extra["textured_fwd_bwd_1080p_ms"] = round(tex_fb_ms, 1)
    if tex_fb_amort_ms is not None:
        extra["textured_fwd_bwd_1080p_amortized_ms"] = round(
            tex_fb_amort_ms, 1)
    if k4_ms is not None:
        extra["tiled_4k_fwd_ms"] = round(k4_ms, 1)
    if k4_dev_ms is not None:
        extra["device_4k_fwd_ms"] = round(k4_dev_ms, 1)
    if inv_steps_s is not None:
        extra["inverse_320x240_steps_per_s"] = round(inv_steps_s, 2)
    if sharded_ok is not None:
        extra["sharded_full_depth_smoke_ok"] = sharded_ok
    print(
        json.dumps(
            {
                "metric": "primary Mrays/s/chip fwd+bwd, default scene 1920x1080",
                "value": round(fb_mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(fb_mrays / baseline_mrays, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
