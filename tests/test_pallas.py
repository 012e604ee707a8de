"""Fused Pallas trace kernel vs the jnp path (its correctness oracle).

Runs in Pallas interpret mode on the CPU backend. Bit-parity between the two
compilation paths is impossible (different op fusion/rounding), so knife-edge
pixels (floor horizon, sphere silhouettes) may flip — the comparison uses the
same outlier-budget scheme as the Rust-oracle parity tests.
"""

import numpy as np
import pytest

import ray_rust_tpu as rt
from ray_rust_tpu.ops.pallas_trace import (
    pallas_supported,
    render_color_pallas,
)
from ray_rust_tpu.renderer import render, render_color


def _img_np(col):
    return np.stack([np.asarray(col.r), np.asarray(col.g), np.asarray(col.b)], -1)


def _compare(ref, got, frac_budget=0.05, tol=1e-3, mean_tol=0.02):
    diff = np.abs(got - ref)
    bad_frac = (diff.max(-1) > tol).mean()
    assert bad_frac <= frac_budget, (
        f"{bad_frac:.1%} pixels differ > {tol} (budget {frac_budget:.0%}); "
        f"mean {diff.mean():.4f} max {diff.max():.3f}"
    )
    assert diff.mean() <= mean_tol, f"mean diff {diff.mean():.4f} > {mean_tol}"


def test_pallas_default_scene_matches_jnp():
    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(xres=64, yres=48, max_reflections=2, refraction_unroll=2)
    assert pallas_supported(scene, cfg)
    ref = _img_np(render(scene, cfg))
    got = _img_np(render_color_pallas(scene, cfg, interpret=True))
    _compare(ref, got)


def test_pallas_row_padding():
    """yres not divisible by the tile height exercises the pad+slice path."""
    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(xres=32, yres=21, max_reflections=1,
                          refraction_unroll=1, pallas_rows=8)
    ref = _img_np(render(scene, cfg))
    got = _img_np(render_color_pallas(scene, cfg, interpret=True))
    assert got.shape == ref.shape
    # tiny image: the singular horizon band is a larger pixel fraction
    _compare(ref, got, frac_budget=0.08)


def test_pallas_rejects_march_mode():
    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(xres=32, yres=24, use_raymarching=True)
    assert not pallas_supported(scene, cfg)
    with pytest.raises(ValueError):
        render_color_pallas(scene, cfg, interpret=True)


def test_pallas_patterns_checkerboard():
    """Checkerboard + solid materials (non-default pattern path)."""
    mats = [
        rt.MaterialSpec(name="checker", diffuse=(0.9, 0.9, 0.9), pn=0,
                        pattern=1, pattern_scale=50.0),
        rt.MaterialSpec(name="blue", diffuse=(0.1, 0.2, 0.9),
                        specular=(0.2, 0.2, 0.2), pn=8),
    ]
    objs = [
        rt.FloorSpec("checker", (0.0, -100.0, 0.0), (0.0, 1.0, 0.0), uvmap=2),
        rt.SphereSpec("blue", 60.0, (0.0, -40.0, 200.0)),
    ]
    scene, _ = rt.build_scene(
        mats, objs, (0.0, 0.0, -300.0), (0.0, -np.pi / 2, -np.pi / 2),
        (50.0, 60.0, -50.0),
    )
    cfg = rt.RenderConfig(xres=48, yres=32, max_reflections=2, refraction_unroll=1)
    # Far-field checker cells are sub-pixel: a 1-ulp ray change flips them
    # outright (the jnp path disagrees with ITSELF across jit/eager on ~9% of
    # pixels here). Compare compiled-vs-compiled with a matching budget.
    ref = _img_np(render(scene, cfg))
    got = _img_np(render_color_pallas(scene, cfg, interpret=True))
    _compare(ref, got, frac_budget=0.08, mean_tol=0.04)


def test_pallas_big_scene_fori_path():
    """Above _KERNEL_UNROLL_MAX objects the kernel's raycast/gather/SDF
    switch to fori_loops over the SMEM table — same image as the jnp scan
    path (BASELINE config 4's shape: many spheres + floor)."""
    rng = np.random.default_rng(3)
    mats = [rt.MaterialSpec(name="floor", diffuse=(1.0, 1.0, 0.0))] + [
        rt.MaterialSpec(name=f"m{i}", diffuse=tuple(rng.uniform(0.2, 1.0, 3)),
                        specular=(0.3, 0.3, 0.3), pn=8)
        for i in range(4)
    ]
    objs = [rt.FloorSpec("floor", (0.0, -300.0, 0.0), (0.0, 1.0, 0.0))] + [
        rt.SphereSpec(
            f"m{int(rng.integers(4))}", float(rng.uniform(20, 60)),
            tuple(rng.uniform(-800, 800, 3) * np.array([1, 0.3, 1])
                  + np.array([0, -150, 400])),
        )
        for _ in range(70)
    ]
    scene, _ = rt.build_scene(
        mats, objs, (0.0, -150.0, -300.0), (0.0, -np.pi / 2, -np.pi / 2),
        (50.0, 60.0, -50.0),
    )
    assert scene.objects.count == 71
    cfg = rt.RenderConfig(xres=48, yres=24, max_reflections=2,
                          refraction_unroll=1)
    assert pallas_supported(scene, cfg)
    ref = _img_np(render(scene, cfg))
    got = _img_np(render_color_pallas(scene, cfg, interpret=True))
    _compare(ref, got, frac_budget=0.08, mean_tol=0.03)


def test_pallas_march_big_scene_fori_path():
    """March kernel in the fori_loop scene regime (>64 objects): the
    position-based march sweep plus the lane-major gather table."""
    from ray_rust_tpu.ops.pallas_march import render_color_pallas_march

    rng = np.random.default_rng(3)
    mats = [rt.MaterialSpec(name="floor", diffuse=(1.0, 1.0, 0.0),
                            glow_dist=2.0)] + [
        rt.MaterialSpec(name=f"m{i}", diffuse=tuple(rng.uniform(0.2, 1.0, 3)),
                        specular=(0.3, 0.3, 0.3), pn=8)
        for i in range(4)
    ]
    objs = [rt.FloorSpec("floor", (0.0, -300.0, 0.0), (0.0, 1.0, 0.0))] + [
        rt.SphereSpec(
            f"m{int(rng.integers(4))}", float(rng.uniform(20, 60)),
            tuple(rng.uniform(-800, 800, 3) * np.array([1, 0.3, 1])
                  + np.array([0, -150, 400])),
        )
        for _ in range(70)
    ]
    scene, _ = rt.build_scene(
        mats, objs, (0.0, -150.0, -300.0), (0.0, -np.pi / 2, -np.pi / 2),
        (50.0, 60.0, -50.0),
    )
    cfg = rt.RenderConfig(xres=32, yres=16, use_raymarching=True,
                          glow_effect=1.0, max_refractions=1,
                          march_max_iter=400, pallas_march_chunk=4)
    ref = _img_np(render(scene, cfg))
    got = _img_np(render_color_pallas_march(scene, cfg, interpret=True))
    _compare(ref, got, frac_budget=0.08, mean_tol=0.03)


def test_pallas_march_matches_jnp():
    """Fused march kernel (ops/pallas_march.py) vs the jnp march path,
    including glow. Knife-edge budget is wider: sphere tracing accumulates
    hundreds of f32 steps, so rounding differences flip horizon pixels."""
    from ray_rust_tpu.ops.pallas_march import (
        pallas_march_supported,
        render_color_pallas_march,
    )

    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(xres=32, yres=24, use_raymarching=True,
                          glow_effect=1.0, max_refractions=1,
                          march_max_iter=2000, pallas_march_chunk=4)
    assert pallas_march_supported(scene, cfg)
    ref = _img_np(render(scene, cfg))
    got = _img_np(render_color_pallas_march(scene, cfg, interpret=True))
    _compare(ref, got, frac_budget=0.05, mean_tol=0.03)


def test_pallas_prefilter_bit_equal():
    """Per-tile object prefilter (cfg.pallas_prefilter, fori regime): the
    candidate-restricted raycast/gather/shadow must be BIT-IDENTICAL to the
    full scan — the cull is conservative-exact, not approximate. Scene
    includes spheres behind the camera, far off-frustum, and straddling
    tile boundaries; the non-axis-aligned camera exercises the rotated
    pyramid planes."""
    rng = np.random.default_rng(17)
    mats = [rt.MaterialSpec(name="floor", diffuse=(1.0, 1.0, 0.0))] + [
        rt.MaterialSpec(name=f"m{i}", diffuse=tuple(rng.uniform(0.2, 1.0, 3)),
                        specular=(0.3, 0.3, 0.3), pn=8)
        for i in range(4)
    ]
    objs = [rt.FloorSpec("floor", (0.0, -300.0, 0.0), (0.0, 1.0, 0.0))]
    # in-frustum cluster
    objs += [
        rt.SphereSpec(f"m{int(rng.integers(4))}", float(rng.uniform(20, 60)),
                      tuple(rng.uniform(-400, 400, 3)
                            * np.array([1, 0.3, 1])
                            + np.array([0, -150, 400])))
        for _ in range(40)
    ]
    # behind the camera and far off to the sides
    objs += [
        rt.SphereSpec("m0", 50.0, (0.0, -150.0, -900.0)),
        rt.SphereSpec("m1", 50.0, (3000.0, -150.0, 100.0)),
        rt.SphereSpec("m2", 50.0, (-3000.0, 500.0, 100.0)),
    ] + [
        rt.SphereSpec(f"m{int(rng.integers(4))}", float(rng.uniform(20, 60)),
                      tuple(rng.uniform(-3000, 3000, 3)
                            * np.array([1, 0.3, 1])
                            + np.array([0, -150, -1200])))
        for _ in range(24)
    ]
    scene, _ = rt.build_scene(
        mats, objs, (7.0, -150.0, -300.0), (0.1, -np.pi / 2 + 0.2,
                                            -np.pi / 2),
        (50.0, 60.0, -50.0),
    )
    assert scene.objects.count == 68  # fori regime (> 64)
    cfg = rt.RenderConfig(xres=64, yres=32, max_reflections=2,
                          refraction_unroll=1)
    on = _img_np(render_color_pallas(scene, cfg, interpret=True))
    off = _img_np(render_color_pallas(
        scene, cfg.with_(pallas_prefilter=False), interpret=True))
    np.testing.assert_array_equal(on, off)


# ---------------------------------------------------------------------------
# March floor-tail shortcut (cfg.march_floor_skip, ops/pallas_march.py:
# _floor_tail). The shortcut changes the kernel's arithmetic on every
# floor-approach lane; these tests pin it directly: A/B same-config runs with
# the flag toggled must be bit-equal-or-knife-edge-only, across every branch
# of the closed form (rho<1 hit, rho>1 escape, iteration-cap stop, glow
# argmin interior/endpoint, applicability rejection).
# ---------------------------------------------------------------------------


def _march_skip_pair(scene, cfg):
    from ray_rust_tpu.ops.pallas_march import render_color_pallas_march

    on = _img_np(render_color_pallas_march(
        scene, cfg.with_(march_floor_skip=True), interpret=True))
    off = _img_np(render_color_pallas_march(
        scene, cfg.with_(march_floor_skip=False), interpret=True))
    return on, off


def _assert_knife_edge_only(on, off, frac_budget=0.005, tol=1e-3,
                            contrast=0.05):
    """Assert the two images are equal except for a sub-``frac_budget``
    sliver of pixels that all sit on a decision boundary (high local
    contrast in the exact step-by-step image's 3x3 neighborhood)."""
    diff = np.abs(on - off).max(-1)
    bad = diff > tol
    frac = bad.mean()
    assert frac <= frac_budget, (
        f"{frac:.2%} pixels differ > {tol} (budget {frac_budget:.1%}); "
        f"max {diff.max():.4f}"
    )
    if bad.any():
        lum = off.mean(-1)
        pad = np.pad(lum, 1, mode="edge")
        h, w = lum.shape
        win = np.stack([pad[r:r + h, c:c + w]
                        for r in range(3) for c in range(3)])
        local = win.max(0) - win.min(0)
        assert (local[bad] > contrast).all(), (
            f"{(local[bad] <= contrast).sum()} differing pixels are NOT on a "
            f"decision boundary (max diff there "
            f"{diff[bad][local[bad] <= contrast].max():.4f})"
        )


def test_march_floor_skip_branch_matrix():
    """One scene exercising every _floor_tail branch: a glowing floor seen
    from 5 units above (lower rays: rho<1 hit; near-horizon rays: iteration
    cap; upper rays: rho>1 escape), a glowing sphere off to the side (glow
    argmin at an interior tail sample) and a dull sphere inside the escape
    corridor (whole-tail safety check must reject the shortcut there)."""
    mats = [
        rt.MaterialSpec(name="glowfloor", diffuse=(0.8, 0.8, 0.2),
                        glow_dist=3.0),
        rt.MaterialSpec(name="glowball", diffuse=(0.8, 0.2, 0.2),
                        glow_dist=4.0),
        rt.MaterialSpec(name="dull", diffuse=(0.3, 0.3, 0.6)),
    ]
    objs = [
        rt.FloorSpec("glowfloor", (0.0, -300.0, 0.0), (0.0, 1.0, 0.0)),
        rt.SphereSpec("glowball", 80.0, (400.0, -100.0, 600.0)),
        rt.SphereSpec("dull", 60.0, (0.0, -180.0, 1500.0)),
    ]
    scene, _ = rt.build_scene(
        mats, objs, (0.0, -295.0, -300.0), (0.0, -np.pi / 2, -np.pi / 2),
        (50.0, 60.0, -50.0),
    )
    cfg = rt.RenderConfig(xres=64, yres=48, use_raymarching=True,
                          glow_effect=1.5, max_refractions=1,
                          march_max_iter=600, pallas_march_chunk=8)
    on, off = _march_skip_pair(scene, cfg)
    _assert_knife_edge_only(on, off)
    # sanity vs the jnp oracle path (unchanged budgets)
    ref = _img_np(render(scene, cfg))
    _compare(ref, on, frac_budget=0.05, mean_tol=0.03)


def test_march_floor_skip_escape_glow_regression():
    """ADVICE r4 (high): the round-4 escape-branch guard compared other
    objects against the INITIAL floor distance h only, so a glowing sphere
    beyond h could still become the SDF winner mid-tail (the floor distance
    grows as h*rho^k) and the closed form recorded a too-coarse glow argmin
    — up to 0.057 image error with glow on. This scene reproduces exactly
    that geometry: rays escape 5 units above the floor (rho slightly > 1)
    and pass near a glowing sphere far down the corridor; the fixed
    whole-tail safety check must reject the shortcut on those lanes."""
    mats = [
        rt.MaterialSpec(name="floor", diffuse=(0.9, 0.9, 0.3)),
        rt.MaterialSpec(name="glow", diffuse=(0.9, 0.1, 0.1),
                        glow_dist=1.0),
    ]
    objs = [
        rt.FloorSpec("floor", (0.0, -300.0, 0.0), (0.0, 1.0, 0.0)),
        rt.SphereSpec("glow", 100.0, (0.0, -150.0, 2000.0)),
    ]
    scene, _ = rt.build_scene(
        mats, objs, (0.0, -295.0, -300.0), (0.0, -np.pi / 2, -np.pi / 2),
        (50.0, 60.0, -50.0),
    )
    cfg = rt.RenderConfig(xres=64, yres=48, use_raymarching=True,
                          glow_effect=2.0, max_refractions=1,
                          march_max_iter=2000, pallas_march_chunk=8)
    on, off = _march_skip_pair(scene, cfg)
    _assert_knife_edge_only(on, off)


def test_march_floor_skip_ab_default_scene():
    """A/B flag toggle on the reference default scene (glow on): the
    shortcut's output must be bit-equal-or-knife-edge-only at a resolution
    where the horizon band is well resolved."""
    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(xres=64, yres=48, use_raymarching=True,
                          glow_effect=1.0, max_refractions=1,
                          march_max_iter=2000, pallas_march_chunk=8)
    on, off = _march_skip_pair(scene, cfg)
    _assert_knife_edge_only(on, off)


@pytest.mark.slow
def test_march_floor_skip_ab_default_scene_160x120():
    """Same A/B at 160x120 (VERDICT r4 #4's asked-for resolution)."""
    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(xres=160, yres=120, use_raymarching=True,
                          glow_effect=1.0, max_refractions=1,
                          march_max_iter=2000)
    on, off = _march_skip_pair(scene, cfg)
    _assert_knife_edge_only(on, off)


def test_fast_path_march_gradients_route_through_jnp():
    """render_color_fast in march mode: Pallas march forward, backward through
    the jnp while-march with the implicit VJP (ops/march.py)."""
    import jax
    import jax.numpy as jnp

    from ray_rust_tpu.ops.pallas_trace import render_color_fast
    from ray_rust_tpu.renderer import render_color as render_jnp

    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(xres=16, yres=8, use_raymarching=True,
                          max_refractions=1, march_max_iter=256,
                          march_budget=64, pallas_march_chunk=4)

    def loss(light_y, render_fn, c):
        s = scene._replace(light=scene.light._replace(y=light_y))
        img = render_fn(s, c)
        return jnp.sum(img.r)

    g_ref = jax.grad(lambda ly: loss(ly, render_jnp, cfg))(jnp.float32(0.6))
    g_fast = jax.grad(lambda ly: loss(ly, render_color_fast, cfg))(jnp.float32(0.6))
    assert np.allclose(np.asarray(g_ref), np.asarray(g_fast), rtol=1e-5)


def test_fast_path_gradients_route_through_jnp():
    """render_color_fast must be differentiable; grads equal the jnp path's
    (custom_vjp: Pallas forward — interpreted on CPU — jnp-path backward)."""
    import jax
    import jax.numpy as jnp

    from ray_rust_tpu.ops.pallas_trace import render_color_fast

    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(xres=16, yres=8, max_reflections=1, refraction_unroll=1)

    def loss(light_y, render_fn):
        s = scene._replace(light=scene.light._replace(y=light_y))
        img = render_fn(s, cfg)
        return jnp.sum(img.r)

    def render_jnp(s, c):
        return render_color(s, c)

    g_ref = jax.grad(lambda ly: loss(ly, render_jnp))(jnp.float32(0.6))
    g_fast = jax.grad(lambda ly: loss(ly, render_color_fast))(jnp.float32(0.6))
    assert np.allclose(np.asarray(g_ref), np.asarray(g_fast), rtol=1e-5)


def _probe_cases_for(scene, cfg, n_row_tiles):
    """Run the backward kernel's tile-classification probe standalone."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import ray_rust_tpu.ops.pallas_trace as P

    cfgx = cfg.with_(pallas_early_exit=False)
    tile_rows, tile_cols = cfg.pallas_rows, cfg.xres
    n = scene.objects.count
    f32t, i32t, cam, light = P._pack_scene(scene)

    def kernel(f32_ref, i32_ref, cam_ref, light_ref, out_ref):
        ks = P._KernelScene(f32_ref, i32_ref, light_ref, n)
        row0, col0 = P._tile_origin(tile_rows, tile_cols, False)
        out_ref[0, 0] = P._probe_case(ks, cfgx, cam_ref, tile_rows,
                                      tile_cols, row0, col0)

    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel, grid=(n_row_tiles,),
        in_specs=[smem()] * 4,
        out_specs=pl.BlockSpec((1, 1), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_row_tiles, 1), jnp.int32),
        interpret=True,
    )(f32t, i32t, cam, light)
    return np.asarray(out).ravel()


def test_pallas_bwd_probe_classification():
    """The pruning probe's tile classes: the default scene (glass sphere in
    frame) needs the full program; a diffuse-only scene (no specular, no
    transparency — every lane terminates at bounce 1) is all-terminal."""
    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(xres=32, yres=16, max_reflections=2,
                          refraction_unroll=1)
    cases = _probe_cases_for(scene, cfg, 2)
    assert (cases == 2).any(), cases

    mats = [rt.MaterialSpec(name="d", diffuse=(0.5, 0.5, 0.5))]
    objs = [
        rt.FloorSpec("d", (0.0, -300.0, 0.0), (0.0, 1.0, 0.0)),
        rt.SphereSpec("d", 80.0, (0.0, -30.0, 172.0)),
    ]
    diffuse_scene, _ = rt.build_scene(
        mats, objs, (0.0, -150.0, -300.0), (0.0, -np.pi / 2, -np.pi / 2),
        (50.0, 60.0, -50.0),
    )
    cases = _probe_cases_for(diffuse_scene, cfg, 2)
    assert (cases == 0).all(), cases


def test_pallas_bwd_pruned_terminal_tiles():
    """Pruned backward on an all-terminal (case 0) scene vs the jnp VJP,
    masked by the backward's own re-traced primal."""
    import jax
    import jax.numpy as jnp

    from ray_rust_tpu.models.vec import Color
    from ray_rust_tpu.ops.pallas_trace import render_color_pallas_grads
    from ray_rust_tpu.ops.rays import camera_rays
    from ray_rust_tpu.ops.trace import trace_image

    mats = [rt.MaterialSpec(name="d", diffuse=(0.5, 0.6, 0.7))]
    objs = [
        rt.FloorSpec("d", (0.0, -300.0, 0.0), (0.0, 1.0, 0.0)),
        rt.SphereSpec("d", 80.0, (0.0, -30.0, 172.0)),
    ]
    scene, _ = rt.build_scene(
        mats, objs, (0.0, -150.0, -300.0), (0.0, -np.pi / 2, -np.pi / 2),
        (50.0, 60.0, -50.0),
    )
    cfg = rt.RenderConfig(xres=32, yres=16, max_reflections=2,
                          refraction_unroll=1)

    def jnp_fwd(s):
        vi, eye = camera_rays(s.camera.position, s.camera.rotation, cfg)
        return trace_image(s, cfg, vi, eye)

    ones = Color(*(jnp.ones((16, 32), jnp.float32) for _ in range(3)))
    _, primal = render_color_pallas_grads(scene, cfg, ones, interpret=True,
                                          return_primal=True)
    agree = (np.abs(_img_np(primal) - _img_np(jnp_fwd(scene))).max(-1) < 1e-4)
    assert agree.mean() > 0.9

    rng = np.random.default_rng(1)
    gm = rng.standard_normal((16, 32)).astype(np.float32) * agree
    g = Color(*(jnp.asarray(gm) for _ in range(3)))
    ct = render_color_pallas_grads(scene, cfg, g, interpret=True)
    _, vjp = jax.vjp(jnp_fwd, scene)
    (ct_ref,) = vjp(g)
    a = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(ct)
                        if str(getattr(x, "dtype", "")) == "float32"])
    b = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(ct_ref)
                        if str(getattr(x, "dtype", "")) == "float32"])
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-3)
    assert rel < 0.01, rel


def test_pallas_bwd_kernel_matches_jnp_vjp():
    """Fused Pallas backward kernel (render_color_pallas_grads, interpret
    mode) vs the jnp path's VJP.

    Methodology: the two backwards are exact derivatives of *slightly
    different* forwards (kernel vs jnp op fusion/rounding), so the cotangent
    is masked to pixels where the two forwards agree — on those pixels every
    discrete decision (hit object, shadow, pattern cell) matched, and the
    local derivatives must too. The backward kernel exposes its own re-traced
    primal for exactly this masking (its tile-pruned while bodies compile as
    separate XLA computations whose rounding flips knife-edge pixels relative
    to the forward kernel). ``pattern_scale`` is exempt: its per-pixel
    gradient scales like u/scale with u ~ 1e4/scale at horizon-grazing floor
    hits, so it is edge-dominated noise in BOTH paths (checked finite only).
    """
    import jax
    import jax.numpy as jnp

    from ray_rust_tpu.models.vec import Color
    from ray_rust_tpu.ops.pallas_trace import render_color_pallas_grads
    from ray_rust_tpu.ops.rays import camera_rays
    from ray_rust_tpu.ops.trace import trace_image

    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(xres=32, yres=16, max_reflections=2,
                          refraction_unroll=1)

    def jnp_fwd(s):
        vi, eye = camera_rays(s.camera.position, s.camera.rotation, cfg)
        return trace_image(s, cfg, vi, eye)

    imgj = _img_np(jnp_fwd(scene))
    ones = Color(*(jnp.ones((16, 32), jnp.float32) for _ in range(3)))
    _, primal = render_color_pallas_grads(scene, cfg, ones, interpret=True,
                                          return_primal=True)
    agree = (np.abs(_img_np(primal) - imgj).max(-1) < 1e-4)
    assert agree.mean() > 0.85, f"forwards agree on only {agree.mean():.0%}"

    rng = np.random.default_rng(0)
    gm = rng.standard_normal((16, 32)).astype(np.float32) * agree
    g = Color(*(jnp.asarray(gm) for _ in range(3)))

    ct = render_color_pallas_grads(scene, cfg, g, interpret=True)
    _, vjp = jax.vjp(jnp_fwd, scene)
    (ct_ref,) = vjp(g)

    paths = jax.tree_util.tree_flatten_with_path(ct)[0]
    lb = jax.tree_util.tree_leaves(ct_ref)
    assert len(paths) == len(lb)
    for (path, a), b in zip(paths, lb):
        if getattr(a, "dtype", None) is None or str(a.dtype) != "float32":
            continue
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        if "pattern_scale" in jax.tree_util.keystr(path):
            assert np.isfinite(a).all()
            continue
        denom = max(np.linalg.norm(b), 1e-2)
        rel = np.linalg.norm(a - b) / denom
        assert rel < 0.01, (
            f"{jax.tree_util.keystr(path)}: relative-L2 grad diff {rel:.4f} "
            f"(leaf norm {denom:.3g})"
        )


# ---------------------------------------------------------------------------
# Image textures through the fused kernel (deferred texture-hit slots):
# the kernel records (uv, weight, texture id) per textured hit and a
# single-gather XLA pass resolves them (render.rs:249-316 semantics).
# ---------------------------------------------------------------------------


def _textured_scene(filt, tex=None):
    rng = np.random.default_rng(5)
    if tex is None:
        tex = rng.integers(0, 256, (12, 20, 3)).astype(np.uint8)
    mats = [
        rt.MaterialSpec(name="texfloor", diffuse=(1.0, 1.0, 0.0), pattern=2,
                        pattern_scale=300.0, pattern_angle_scale=0.2,
                        texture_filter=filt, texture=tex),
        rt.MaterialSpec(name="mirror", diffuse=(0.0, 0.0, 0.0),
                        specular=(1.0, 1.0, 1.0), pn=24),
        rt.MaterialSpec(name="glass", transparency=1.0, refraction=1.5),
    ]
    objs = [
        rt.FloorSpec("texfloor", (0.0, -300.0, 0.0), (0.0, 1.0, 0.0), uvmap=2),
        rt.SphereSpec("mirror", 80.0, (0.0, -30.0, 172.0)),
        rt.SphereSpec("glass", 100.0, (70.0, -200.0, 150.0)),
    ]
    scene, _ = rt.build_scene(
        mats, objs, (0.0, -150.0, -300.0), (0.0, -np.pi / 2, -np.pi / 2),
        (50.0, 60.0, -50.0),
    )
    return scene


@pytest.mark.parametrize("filt", [0, 1], ids=["nearest", "bilinear"])
def test_pallas_textured_matches_jnp(filt):
    """Textured floor seen directly, via mirror reflection, and through the
    glass sphere's refraction sub-trace — all three weight chains."""
    scene = _textured_scene(filt)
    cfg = rt.RenderConfig(xres=64, yres=48, max_reflections=2,
                          refraction_unroll=2)
    assert pallas_supported(scene, cfg)
    ref = _img_np(render(scene, cfg))
    got = _img_np(render_color_pallas(scene, cfg, interpret=True))
    # Nearest-neighbor texel boundaries flip on 1-ulp uv differences between
    # the two compilation paths, on top of the usual knife-edge pixels.
    _compare(ref, got, frac_budget=0.08, mean_tol=0.03)


def test_pallas_textures_disabled_rejects():
    scene = _textured_scene(0)
    cfg = rt.RenderConfig(xres=32, yres=24, pallas_textures=False)
    assert not pallas_supported(scene, cfg)
    with pytest.raises(ValueError):
        render_color_pallas(scene, cfg, interpret=True)
    # texture-free scenes are unaffected by the flag
    scene0, _ = rt.default_scene(texture_dir="/nonexistent")
    assert pallas_supported(scene0, cfg)


def test_sample_texture_packed_matches_gather():
    """The packed single-gather sampler must equal the 4-gather reference
    sampler exactly (same wrap arithmetic, same blend term order)."""
    import jax.numpy as jnp

    from ray_rust_tpu.models.material import build_material_table
    from ray_rust_tpu.ops.texture import _sample_texture, sample_texture_packed

    rng = np.random.default_rng(11)
    specs = [
        rt.MaterialSpec(name="a", texture=rng.integers(0, 256, (7, 13, 3)).astype(np.uint8)),
        rt.MaterialSpec(name="b", texture=rng.integers(0, 256, (16, 8, 3)).astype(np.uint8)),
    ]
    _, bank = build_material_table(specs)
    n = 4096
    u = jnp.asarray(rng.uniform(-3.0, 3.0, n).astype(np.float32))
    v = jnp.asarray(rng.uniform(-3.0, 3.0, n).astype(np.float32))
    tid = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    for filt in (0, 1):
        f = jnp.full((n,), filt, jnp.int32)
        ref = _sample_texture(bank, tid, f, u, v)
        got = sample_texture_packed(bank, tid, f, u, v)
        for cr, cg in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(cr), np.asarray(cg))


def test_fast_path_textured_gradients_route_through_jnp():
    """With the fused backward forced off (pallas_bwd=False), textured
    scenes use the Pallas forward + jnp VJP; gradients must equal the
    pure-jnp gradients. (With the default tri-state auto, textured gradients
    go through the fused site-reparameterized backward on TPU;
    tests/test_pallas_bwd.py covers that path.)"""
    import jax
    import jax.numpy as jnp

    from ray_rust_tpu.ops.pallas_trace import render_color_fast
    from ray_rust_tpu.ops.rays import camera_rays
    from ray_rust_tpu.ops.trace import trace_image

    scene = _textured_scene(1)
    cfg = rt.RenderConfig(xres=16, yres=8, max_reflections=1,
                          refraction_unroll=1, pallas_bwd=False)

    def loss_fast(s):
        col = render_color_fast(s, cfg)
        return jnp.sum(col.r) + 2.0 * jnp.sum(col.g) + 3.0 * jnp.sum(col.b)

    def loss_jnp(s):
        vi, eye = camera_rays(s.camera.position, s.camera.rotation, cfg)
        col = trace_image(s, cfg, vi, eye)
        return jnp.sum(col.r) + 2.0 * jnp.sum(col.g) + 3.0 * jnp.sum(col.b)

    g_fast = jax.grad(loss_fast, allow_int=True)(scene).objects.org.x
    g_ref = jax.grad(loss_jnp, allow_int=True)(scene).objects.org.x
    assert np.allclose(np.asarray(g_ref), np.asarray(g_fast), rtol=1e-5)


def test_pallas_texture_while_path_multi_texture_multiblock():
    """ADVICE r3: exercise the texture paths the small-atlas tests miss, all
    at once — the while-loop chunk-visitation gather (>192-chunk atlas), the
    multi-block gather (tile cols > 128 lanes), and multi-texture meta
    selection with different filters (tid >= 1).

    Scene: two textured objects — a 200x128 floor texture (200 chunks ->
    while path, bilinear) and a second texture on a sphere (nearest) — at
    xres=160 (n_blk=2 in the chunk gather)."""
    from ray_rust_tpu.ops.pallas_trace import (
        _TEXTURE_UNROLL_MAX,
        pallas_supported,
        render_color_pallas,
    )

    rng = np.random.default_rng(23)
    tex_floor = rng.integers(0, 256, (200, 128, 3)).astype(np.uint8)
    tex_ball = rng.integers(0, 256, (9, 14, 3)).astype(np.uint8)
    mats = [
        rt.MaterialSpec(name="texfloor", diffuse=(1.0, 1.0, 0.0),
                        pattern_scale=300.0, pattern_angle_scale=0.2,
                        texture_filter=1, texture=tex_floor),
        rt.MaterialSpec(name="texball", diffuse=(0.5, 0.5, 0.5),
                        pattern_scale=80.0, texture_filter=0,
                        texture=tex_ball),
    ]
    objs = [
        rt.FloorSpec("texfloor", (0.0, -300.0, 0.0), (0.0, 1.0, 0.0),
                     uvmap=2),
        rt.SphereSpec("texball", 120.0, (30.0, -160.0, 180.0)),
    ]
    scene, _ = rt.build_scene(mats, objs, (0.3, -150.0, -300.0),
                              (0.0, -np.pi / 2, -np.pi / 2),
                              (50.0, 60.0, -50.0))
    # both textures padded to (200, 128): 200 chunks each -> 400 total
    t, hmax, wmax = scene.textures.data.shape[:3]
    assert t == 2
    assert -(-(hmax * wmax) // 128) * t > _TEXTURE_UNROLL_MAX

    cfg = rt.RenderConfig(xres=160, yres=32, max_reflections=1,
                          refraction_unroll=0, pallas_cols=160)
    assert pallas_supported(scene, cfg)
    ref = _img_np(render(scene, cfg.with_(use_pallas=False)))
    got = _img_np(render_color_pallas(scene, cfg, interpret=True))
    _compare(ref, got, frac_budget=0.08, mean_tol=0.03)
