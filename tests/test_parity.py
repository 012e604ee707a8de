"""Golden parity: batched/jitted renderer vs the scalar f32 oracle.

The oracle (tests/oracle.py) is a line-by-line scalar model of the Rust
reference; bit-parity across backends is impossible (XLA forms FMAs, the Rust
x86-64 baseline doesn't), so knife-edge rays — the singular horizon row
``iy == yres/2`` and bounce-amplified silhouette pixels — may land on the other
side of a decision boundary. Tests therefore assert a *budget*: the vast
majority of pixels match tightly, the mean error is small.
"""

import numpy as np
import pytest

import ray_rust_tpu as rt
from ray_rust_tpu.renderer import render_color

from . import oracle as orc


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


def test_raytrace_default_scene_reduced_depth():
    """Fast fixture: full reflections, refraction unroll 2 (smaller program).
    Oracle runs with the same caps -> identical semantics."""
    W, H = 48, 36
    env = orc.default_env(W, H)
    env.max_refractions = 2
    ref = orc.render_oracle(env)
    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(xres=W, yres=H, max_refractions=2)
    got = _img_np(render_color(scene, cfg))
    _compare(ref, got)


@pytest.mark.slow
def test_raytrace_default_scene_full_depth():
    """The BASELINE.json config-1 fixture semantics (default depths 3/10)."""
    W, H = 64, 48
    env = orc.default_env(W, H)
    ref = orc.render_oracle(env)
    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(xres=W, yres=H, refraction_unroll=None)
    got = _img_np(render_color(scene, cfg))
    _compare(ref, got)


def test_raymarch_glow_default_scene():
    """March mode with glow (BASELINE config-3 semantics) at tiny res."""
    W, H = 32, 24
    env = orc.default_env(W, H, use_raymarching=True, glow_effect=1.0)
    env.max_refractions = 1
    ref = orc.render_oracle(env)
    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(
        xres=W, yres=H, use_raymarching=True, glow_effect=1.0, max_refractions=1
    )
    got = _img_np(render_color(scene, cfg))
    # march amplifies knife-edge divergence (10k-iter floor-grazing rays):
    # slightly wider budget
    _compare(ref, got, frac_budget=0.08, mean_tol=0.05)


def test_many_spheres_scene():
    """Batched intersection stress (BASELINE config-4 shape): 40 spheres from
    a deterministic RNG, compared to the oracle."""
    rng = np.random.default_rng(7)
    n = 40
    mats = [
        rt.MaterialSpec(name="m0", diffuse=(0.9, 0.4, 0.2), specular=(0.3, 0.3, 0.3), pn=8),
        rt.MaterialSpec(name="m1", diffuse=(0.1, 0.5, 0.9), specular=(0.0, 0.0, 0.0), pn=0),
    ]
    objs = [rt.FloorSpec("m0", (0.0, -100.0, 0.0), (0.0, 1.0, 0.0))]
    o_mats = [
        orc.OMat(diffuse=(0.9, 0.4, 0.2), specular=(0.3, 0.3, 0.3), pn=8, t=0.0, n=0.0),
        orc.OMat(diffuse=(0.1, 0.5, 0.9), specular=(0.0, 0.0, 0.0), pn=0, t=0.0, n=0.0),
    ]
    o_objs = [orc.OObj("floor", o_mats[0], orc.V(0, -100, 0), normal=orc.V(0, 1, 0))]
    for i in range(n - 1):
        c = rng.uniform(-300, 300, 3)
        c[2] = rng.uniform(100, 600)
        r = rng.uniform(10, 50)
        m = int(rng.integers(0, 2))
        objs.append(rt.SphereSpec(f"m{m}", float(r), tuple(float(v) for v in c)))
        o_objs.append(orc.OObj("sphere", o_mats[m], orc.V(*c), r=float(r)))

    W, H = 40, 30
    scene, _ = rt.build_scene(
        mats, objs, (0.0, 0.0, -400.0), (0.0, -np.pi / 2, -np.pi / 2), (50.0, 60.0, -50.0)
    )
    cfg = rt.RenderConfig(xres=W, yres=H, max_refractions=1)
    got = _img_np(render_color(scene, cfg))

    env = orc.OEnv(
        camera_pos=orc.V(0, 0, -400),
        camera_rot=orc.Q.from_pyr(orc.V(0, -np.pi / 2, -np.pi / 2)),
        xres=W, yres=H, xfov=1.0, yfov=H / W,
        objects=o_objs,
        light=orc.V(50, 60, -50).normalized(),
        bg=orc.default_sky,
        max_refractions=1,
    )
    ref = orc.render_oracle(env)
    _compare(ref, got)


def test_u8_conversion():
    from ray_rust_tpu.models.vec import Color
    from ray_rust_tpu.renderer import to_u8
    import jax.numpy as jnp

    c = Color(
        jnp.array([[0.0, 0.5, 1.0, 2.0]]),
        jnp.array([[-0.5, 0.999, 1.0001, np.nan]]),
        jnp.array([[0.251, 0.002, 0.9999, 255.0]]),
    )
    out = np.asarray(to_u8(c))
    # (c*255).min(255) as u8 — truncation, saturating (main.rs:148-152)
    assert out[0, 0, 0] == 0 and out[0, 1, 0] == 127 and out[0, 2, 0] == 255
    assert out[0, 3, 0] == 255
    assert out[0, 0, 1] == 0  # negative saturates to 0
    assert out[0, 1, 1] == 254  # 0.999*255=254.745 -> 254
    assert out[0, 3, 1] == 0  # NaN -> 0


# ---------------------------------------------------------------------------
# Checked-in golden fixtures (VERDICT r2 item 8): regressions diff against a
# fixed artifact rendered once by the oracle at full reference depth, not a
# re-run. tests/goldens/*.npz hold the exact f32 oracle output (the sibling
# .png files are for human inspection).
# ---------------------------------------------------------------------------


def _load_golden(name):
    import os

    path = os.path.join(os.path.dirname(__file__), "goldens", f"{name}.npz")
    return np.load(path)["img"]


def test_golden_default_trace_320x240():
    """BASELINE config-1 fixture: default scene, 320x240, full reference
    depths (max_reflections 3 / max_refractions 10). Tightened budget: ≤2%
    outlier pixels (vs the 5% used for the tiny-res fixtures, where the
    singular horizon row is a larger fraction)."""
    ref = _load_golden("default_trace_320x240")
    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(xres=320, yres=240, refraction_unroll=None)
    got = _img_np(render_color(scene, cfg))
    _compare(ref, got, frac_budget=0.02, mean_tol=0.01)


def test_golden_default_march_glow_160x120():
    """BASELINE config-3 fixture: march mode + glow at 160x120, full march
    budget (the oracle runs the reference's MAX_ITER=10000 loop)."""
    ref = _load_golden("default_march_glow_160x120")
    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(xres=160, yres=120, use_raymarching=True,
                          glow_effect=1.0, refraction_unroll=None)
    got = _img_np(render_color(scene, cfg))
    _compare(ref, got, frac_budget=0.02, mean_tol=0.01)


def _textured_fixture_scene(filt: int):
    """Default scene with the goldens' synthesized 256x256 ``bar.png``
    (tests/goldens/gen_textured.py — seed 101; 512 atlas chunks keeps the
    fused kernel on the group-visitation gather path)."""
    import os
    import tempfile

    from PIL import Image

    rng = np.random.default_rng(101)
    tex = rng.integers(0, 256, (256, 256, 3)).astype(np.uint8)
    with tempfile.TemporaryDirectory() as td:
        Image.fromarray(tex, "RGB").save(os.path.join(td, "bar.png"))
        scene, _ = rt.default_scene(texture_dir=td, texture_filter=filt)
    return scene


def test_golden_default_textured_nearest_320x240():
    """Full-depth TEXTURED fixture (VERDICT r4 #6): the reference's default
    scene is textured whenever bar.png exists (src/main.rs:169, default
    Nearest filter) — this pins the chunk-gather + wrap + pattern chain
    end-to-end at full reference depth, not just per-op. Budget matches the
    untextured golden; the noise texture makes far-floor texel picks
    knife-edge (1-ulp uv flips select a different random texel), so the
    outlier budget is carried by the horizon band."""
    ref = _load_golden("default_textured_nearest_320x240")
    scene = _textured_fixture_scene(0)
    cfg = rt.RenderConfig(xres=320, yres=240, refraction_unroll=None)
    got = _img_np(render_color(scene, cfg))
    _compare(ref, got, frac_budget=0.02, mean_tol=0.015)


def test_golden_default_textured_bilinear_160x120():
    """Bilinear-filter variant at 160x120: pins the 4-tap neighborhood
    packing + fimod weight chain (render.rs:267-296) at full depth."""
    ref = _load_golden("default_textured_bilinear_160x120")
    scene = _textured_fixture_scene(1)
    cfg = rt.RenderConfig(xres=160, yres=120, refraction_unroll=None)
    got = _img_np(render_color(scene, cfg))
    _compare(ref, got, frac_budget=0.02, mean_tol=0.015)
