"""Site-reparameterized fused backward kernel (ops/pallas_bwd.py), interpret
mode vs the jnp path's VJP.

Methodology (same as tests/test_pallas.py's round-3 backward tests): the two
backwards are exact derivatives of slightly different forwards (kernel vs jnp
op fusion/rounding), so cotangents are masked to pixels where the two
forwards agree — there every discrete decision matched and local derivatives
must too. The replay exposes its own primal for exactly this masking.

Test scenes break the default camera's x=0 symmetry: the reference default
camera puts a whole image column exactly on a bilinear texel boundary
(v*h == 0), where the blend's VALUE is continuous but its SLOPE jumps — both
paths then pick valid, opposite-side subgradients that no value-based mask
can separate (verified: every mismatching pixel sat in that column).
``pattern_scale`` is exempt as in the round-3 tests (edge-dominated noise in
both paths; checked finite).
"""

import numpy as np
import pytest

import ray_rust_tpu as rt


def _img_np(c):
    return np.stack([np.asarray(c.r), np.asarray(c.g), np.asarray(c.b)], -1)


def _assert_boundary_only(imgj, agree, contrast=0.05):
    """Every pixel excluded from the gradient check must be classified as a
    decision boundary: its 3x3 neighborhood in the oracle image has high
    local contrast (a hit/shadow/pattern decision flips nearby). Masked
    pixels are never silently dropped (VERDICT r4 #8)."""
    bad = ~agree
    if not bad.any():
        return
    h, w = agree.shape
    lum = imgj.mean(-1)
    pad = np.pad(lum, 1, mode="edge")
    win = np.stack([pad[r:r + h, c:c + w]
                    for r in range(3) for c in range(3)])
    local = win.max(0) - win.min(0)
    n_flat = int((local[bad] <= contrast).sum())
    assert n_flat == 0, (
        f"{n_flat} masked pixels are NOT on a decision boundary "
        f"(min local contrast {local[bad].min():.4f})"
    )


def _compare_site_bwd(scene, cfg, min_agree=0.9, seed=0):
    import jax
    import jax.numpy as jnp

    from ray_rust_tpu.models.vec import Color
    from ray_rust_tpu.ops.pallas_bwd import render_color_pallas_grads_site
    from ray_rust_tpu.ops.rays import camera_rays
    from ray_rust_tpu.ops.trace import trace_image

    H, W = cfg.yres, cfg.xres

    def jnp_fwd(s):
        vi, eye = camera_rays(s.camera.position, s.camera.rotation, cfg)
        return trace_image(s, cfg.with_(use_pallas=False), vi, eye)

    ones = Color(*(jnp.ones((H, W), jnp.float32) for _ in range(3)))
    _, primal = render_color_pallas_grads_site(scene, cfg, ones,
                                               interpret=True,
                                               return_primal=True)
    imgj = _img_np(jnp_fwd(scene))
    agree = (np.abs(_img_np(primal) - imgj).max(-1) < 1e-4)
    assert agree.mean() > min_agree, f"forwards agree on {agree.mean():.0%}"
    _assert_boundary_only(imgj, agree)

    rng = np.random.default_rng(seed)
    gm = rng.standard_normal((H, W)).astype(np.float32) * agree
    g = Color(*(jnp.asarray(gm) for _ in range(3)))
    ct = render_color_pallas_grads_site(scene, cfg, g, interpret=True)
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
        ks = jax.tree_util.keystr(path)
        if "pattern_scale" in ks:
            assert np.isfinite(a).all()
            continue
        denom = max(np.linalg.norm(b), 1e-2)
        rel = np.linalg.norm(a - b) / denom
        assert rel < 0.01, (
            f"{ks}: relative-L2 grad diff {rel:.4f} (leaf norm {denom:.3g})"
        )


def test_site_bwd_default_scene_unpruned():
    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(xres=32, yres=16, pallas_bwd=True,
                          pallas_bwd_prune=False, max_reflections=2,
                          refraction_unroll=1)
    _compare_site_bwd(scene, cfg, min_agree=0.88)


def test_site_bwd_default_scene_pruned_variants():
    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(xres=32, yres=16, pallas_bwd=True,
                          pallas_bwd_prune=True, max_reflections=2,
                          refraction_unroll=1)
    _compare_site_bwd(scene, cfg, min_agree=0.88)


def _textured_scene():
    rng = np.random.default_rng(5)
    tex = rng.integers(0, 256, (12, 20, 3)).astype(np.uint8)
    mats = [
        rt.MaterialSpec(name="texfloor", diffuse=(1.0, 1.0, 0.0), pattern=2,
                        pattern_scale=300.0, pattern_angle_scale=0.2,
                        texture_filter=1, texture=tex),
        rt.MaterialSpec(name="mirror", diffuse=(0.0, 0.0, 0.0),
                        specular=(1.0, 1.0, 1.0), pn=24),
        rt.MaterialSpec(name="glass", transparency=1.0, refraction=1.5),
    ]
    objs = [
        rt.FloorSpec("texfloor", (0.0, -300.0, 0.0), (0.0, 1.0, 0.0),
                     uvmap=2),
        rt.SphereSpec("mirror", 80.0, (0.0, -30.0, 172.0)),
        rt.SphereSpec("glass", 100.0, (70.0, -200.0, 150.0)),
    ]
    # symmetry-broken camera — see module docstring
    scene, _ = rt.build_scene(mats, objs, (0.37, -150.3, -300.0),
                              (0.0, -np.pi / 2, -np.pi / 2),
                              (50.0, 60.0, -50.0))
    return scene


def test_site_bwd_textured_bilinear():
    """The round-4 capability the round-3 kernel lacked: image-textured
    scenes through the fused backward — taps recorded as constants, only the
    uv -> bilinear-weight chain differentiated (VERDICT r3 #3)."""
    scene = _textured_scene()
    cfg = rt.RenderConfig(xres=32, yres=16, pallas_bwd=True,
                          max_reflections=2, refraction_unroll=1,
                          grad_distance_cutoff=2e3)
    _compare_site_bwd(scene, cfg)


@pytest.mark.slow
def test_site_bwd_many_objects_fori_regime():
    """>64 objects: phase 1 records through the fori_loop raycast/gather
    regime; the replay is object-count-independent (VERDICT r3 #3)."""
    rng = np.random.default_rng(7)
    mats = [rt.MaterialSpec(name="m0", diffuse=(1.0, 1.0, 0.0))] + [
        rt.MaterialSpec(name=f"m{i}",
                        diffuse=tuple(rng.uniform(0.2, 1.0, 3).round(3)),
                        specular=(0.3, 0.3, 0.3), pn=8)
        for i in range(1, 5)
    ]
    objs = [rt.FloorSpec("m0", (0, -300, 0), (0, 1, 0))] + [
        rt.SphereSpec(f"m{1 + int(rng.integers(4))}",
                      float(rng.uniform(20, 60)),
                      tuple(rng.uniform(-800, 800, 3) * np.array([1, 0.3, 1])
                            + np.array([0, -150, 400])))
        for _ in range(70)
    ]
    scene, _ = rt.build_scene(mats, objs, (0.37, -150.3, -300.0),
                              (0, -np.pi / 2, -np.pi / 2), (50, 60, -50))
    cfg = rt.RenderConfig(xres=32, yres=16, pallas_bwd=True,
                          max_reflections=2, refraction_unroll=1)
    _compare_site_bwd(scene, cfg)


def test_fast_path_routes_textured_bwd_through_site_kernel(monkeypatch):
    """render_color_fast with pallas_bwd enabled must send textured-scene
    gradients through the site kernel, not the jnp VJP."""
    import jax
    import jax.numpy as jnp

    import ray_rust_tpu.ops.pallas_bwd as pb
    from ray_rust_tpu.ops.pallas_trace import _fast_fn, render_color_fast

    scene = _textured_scene()
    cfg = rt.RenderConfig(xres=16, yres=8, max_reflections=1,
                          refraction_unroll=0, pallas_bwd=True)
    _fast_fn.cache_clear()

    called = {"n": 0}
    real = pb.render_color_pallas_grads_site

    def spy(*a, **kw):
        called["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(pb, "render_color_pallas_grads_site", spy)

    def loss(s):
        col = render_color_fast(s, cfg)
        return jnp.sum(col.r) + jnp.sum(col.g) + jnp.sum(col.b)

    g = jax.grad(loss, allow_int=True)(scene)
    assert called["n"] == 1
    assert np.isfinite(np.asarray(g.objects.org.x)).all()
    _fast_fn.cache_clear()


def test_site_bwd_matches_retrace_oracle():
    """Cross-check the production site-reparameterized backward against the
    round-3 re-trace backward kernel (demoted in r5 to exactly this role —
    see render_color_pallas_grads' docstring): two completely independent
    mechanisms (recorded-winner replay vs jax.vjp over a full re-trace) must
    produce the same scene cotangents on pixels where their re-traced
    primals agree."""
    import jax
    import jax.numpy as jnp

    from ray_rust_tpu.models.vec import Color
    from ray_rust_tpu.ops.pallas_bwd import render_color_pallas_grads_site
    from ray_rust_tpu.ops.pallas_trace import render_color_pallas_grads

    scene, _ = rt.default_scene()
    scene = scene._replace(camera=scene.camera._replace(
        position=scene.camera.position._replace(x=jnp.float32(0.37))))
    cfg = rt.RenderConfig(xres=32, yres=16, pallas_bwd=True,
                          max_reflections=2, refraction_unroll=1)
    H, W = cfg.yres, cfg.xres

    ones = Color(*(jnp.ones((H, W), jnp.float32) for _ in range(3)))
    _, p_site = render_color_pallas_grads_site(scene, cfg, ones,
                                               interpret=True,
                                               return_primal=True)
    _, p_ret = render_color_pallas_grads(scene, cfg, ones, interpret=True,
                                         return_primal=True)
    agree = (np.abs(_img_np(p_site) - _img_np(p_ret)).max(-1) < 1e-4)
    assert agree.mean() > 0.9, f"primals agree on {agree.mean():.0%}"

    rng = np.random.default_rng(3)
    gm = rng.standard_normal((H, W)).astype(np.float32) * agree
    g = Color(*(jnp.asarray(gm) for _ in range(3)))
    ct_site = render_color_pallas_grads_site(scene, cfg, g, interpret=True)
    ct_ret = render_color_pallas_grads(scene, cfg, g, interpret=True)

    paths = jax.tree_util.tree_flatten_with_path(ct_site)[0]
    lb = jax.tree_util.tree_leaves(ct_ret)
    for (path, a), b in zip(paths, lb):
        if getattr(a, "dtype", None) is None or str(a.dtype) != "float32":
            continue
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        ks = jax.tree_util.keystr(path)
        if "pattern_scale" in ks:
            assert np.isfinite(a).all()
            continue
        denom = max(np.linalg.norm(b), 1e-2)
        rel = np.linalg.norm(a - b) / denom
        assert rel < 0.01, (
            f"{ks}: relative-L2 grad diff {rel:.4f} (leaf norm {denom:.3g})"
        )


def _compare_march_bwd(glow):
    import jax
    import jax.numpy as jnp

    from ray_rust_tpu.models.vec import Color
    from ray_rust_tpu.ops.pallas_bwd import render_color_pallas_march_grads
    from ray_rust_tpu.ops.rays import camera_rays
    from ray_rust_tpu.ops.trace import trace_image

    W, H = 32, 16
    scene, _ = rt.default_scene()
    scene = scene._replace(camera=scene.camera._replace(
        position=scene.camera.position._replace(x=jnp.float32(0.37))))
    # pallas_march_chunk stays small here: interpret-mode compile cost
    # scales with the while BODY size (chunk unrolled SDF steps), and the
    # TPU-tuned default of 32 quadruples it for zero test benefit
    cfg = rt.RenderConfig(xres=W, yres=H, use_raymarching=True,
                          glow_effect=glow, pallas_bwd=True,
                          raymarch_max_reflections=2, max_refractions=1,
                          refraction_unroll=1, march_max_iter=512,
                          pallas_march_chunk=4)

    def jnp_fwd(s):
        vi, eye = camera_rays(s.camera.position, s.camera.rotation, cfg)
        return trace_image(s, cfg.with_(use_pallas=False, march_tiles=1),
                           vi, eye)

    ones = Color(*(jnp.ones((H, W), jnp.float32) for _ in range(3)))
    _, primal = render_color_pallas_march_grads(scene, cfg, ones,
                                                interpret=True,
                                                return_primal=True)
    imgj = _img_np(jnp_fwd(scene))
    agree = (np.abs(_img_np(primal) - imgj).max(-1) < 1e-4)
    assert agree.mean() > 0.9, f"forwards agree on {agree.mean():.0%}"
    _assert_boundary_only(imgj, agree)

    rng = np.random.default_rng(0)
    gm = rng.standard_normal((H, W)).astype(np.float32) * agree
    g = Color(*(jnp.asarray(gm) for _ in range(3)))
    ct = render_color_pallas_march_grads(scene, cfg, g, interpret=True)
    _, vjp = jax.vjp(jnp_fwd, scene)
    (ct_ref,) = vjp(g)

    paths = jax.tree_util.tree_flatten_with_path(ct)[0]
    lb = jax.tree_util.tree_leaves(ct_ref)
    for (path, a), b in zip(paths, lb):
        if getattr(a, "dtype", None) is None or str(a.dtype) != "float32":
            continue
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        ks = jax.tree_util.keystr(path)
        if "pattern_scale" in ks:
            assert np.isfinite(a).all()
            continue
        denom = max(np.linalg.norm(b), 1e-2)
        rel = np.linalg.norm(a - b) / denom
        assert rel < 0.02, (
            f"{ks}: relative-L2 grad diff {rel:.4f} (leaf norm {denom:.3g})"
        )


def test_march_site_bwd_with_glow():
    """March-mode site backward vs the jnp implicit-VJP path, glow on: the
    Newton-reparameterized hit t (IFT pullback against recorded winner
    fields) plus the recorded-argmin glow envelope, incl. the endpoint
    routing through the replayed hit point (ops/march.py:243-313)."""
    _compare_march_bwd(glow=1.0)


@pytest.mark.slow
def test_march_site_bwd_no_glow():
    _compare_march_bwd(glow=None)
