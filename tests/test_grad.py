"""Gradient correctness: the renderer is differentiable w.r.t. continuous
scene parameters. The Rust reference has no gradients, so finite differences
are the oracle (SURVEY.md §4) — with the standard differentiable-rendering
contract: autodiff provides the *interior* (shading/geometry) gradient;
visibility-boundary (silhouette) terms are subgradients and are NOT captured,
so FD probes must be designed on smooth regions (tiny steps, losses restricted
to patches away from silhouettes/shadow edges), and component-level FD checks
cover the geometry math directly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ray_rust_tpu as rt
from ray_rust_tpu.models.vec import Vec3
from ray_rust_tpu.ops.intersect import raycast
from ray_rust_tpu.parallel.train import render_loss, sgd_train_step
from ray_rust_tpu.renderer import render_color

CFG = rt.RenderConfig(xres=32, yres=24, max_refractions=1)


@pytest.fixture(scope="module")
def scene():
    s, _ = rt.default_scene()
    return s


@pytest.fixture(scope="module")
def target(scene):
    img = render_color(scene, CFG)
    return jnp.stack([img.r, img.g, img.b], -1)


# ---------------------------------------------------------------------------
# Component-level FD: intersection distance is smooth in radius/center for a
# ray hitting a sphere face-on (no tangency).
# ---------------------------------------------------------------------------


def _hit_t(scene, radius=None, cx=None):
    objs = scene.objects
    if radius is not None:
        objs = objs._replace(radius=objs.radius.at[1].set(radius))
    if cx is not None:
        objs = objs._replace(org=objs.org._replace(x=objs.org.x.at[1].set(cx)))
    s = scene._replace(objects=objs)
    # ray from the camera straight at mirror sphere 1 (org (0,-30,172))
    origin = Vec3(jnp.zeros((1, 1)), jnp.full((1, 1), -150.0), jnp.full((1, 1), -300.0))
    d = Vec3(
        jnp.zeros((1, 1)), jnp.full((1, 1), 120.0), jnp.full((1, 1), 472.0)
    ).normalized()
    ig = jnp.full((1, 1), -1, jnp.int32)
    flags = jnp.zeros((1, 1), jnp.int32)
    t, idx = raycast(s, origin, d, ig, flags)
    return t[0, 0]


def test_fd_intersection_radius(scene):
    r0 = float(scene.objects.radius[1])
    g = jax.grad(lambda r: _hit_t(scene, radius=r))(jnp.float32(r0))
    eps = 0.1  # t ~ 400: f32 quantization makes smaller FD steps noisy
    fd = (float(_hit_t(scene, radius=r0 + eps)) - float(_hit_t(scene, radius=r0 - eps))) / (
        2 * eps
    )
    np.testing.assert_allclose(float(g), fd, rtol=1e-3)


def test_fd_intersection_center(scene):
    g = jax.grad(lambda c: _hit_t(scene, cx=c))(jnp.float32(0.0))
    eps = 1e-2
    fd = (float(_hit_t(scene, cx=eps)) - float(_hit_t(scene, cx=-eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=1e-3, atol=1e-5)


# ---------------------------------------------------------------------------
# Image-level FD on smooth patches (away from silhouettes / shadow edges).
# The red sphere (object 3, mat 2) projects near the lower-left; probe pixels
# strictly inside its lit area.
# ---------------------------------------------------------------------------


def _patch_loss(scene, y0=14, x0=6, k=2):
    img = render_color(scene, CFG)
    block = img.r[y0 : y0 + k, x0 : x0 + k] + img.g[y0 : y0 + k, x0 : x0 + k]
    return jnp.mean(block)


def _find_red_patch(scene):
    img = render_color(scene, CFG)
    r = np.asarray(img.r)
    g = np.asarray(img.g)
    red = (r > 0.2) & (g < 0.1)
    ys, xs = np.where(red)
    assert len(ys) > 6, "red sphere not visible at this res"
    # take the centroid — interior of the projected disk
    return int(np.median(ys)), int(np.median(xs))


def test_fd_image_light_direction(scene):
    y0, x0 = _find_red_patch(scene)

    def loss(ly):
        s = scene._replace(light=scene.light._replace(y=ly))
        return _patch_loss(s, y0, x0, 1)

    ly0 = float(scene.light.y)
    g = float(jax.grad(loss)(jnp.float32(ly0)))
    eps = 1e-3
    fd = (float(loss(jnp.float32(ly0 + eps))) - float(loss(jnp.float32(ly0 - eps)))) / (
        2 * eps
    )
    np.testing.assert_allclose(g, fd, rtol=0.05, atol=1e-6)


def test_fd_image_diffuse_color(scene, target):
    def loss(r):
        mats = scene.materials
        s = scene._replace(
            materials=mats._replace(
                diffuse=mats.diffuse._replace(r=mats.diffuse.r.at[2].set(r))
            )
        )
        return render_loss(s, CFG, target + 0.05)

    r0 = float(scene.materials.diffuse.r[2])
    g = float(jax.grad(loss)(jnp.float32(r0)))
    eps = 1e-3
    fd = (float(loss(jnp.float32(r0 + eps))) - float(loss(jnp.float32(r0 - eps)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=0.05)


def test_fd_image_camera_position(scene):
    """Camera dolly: probe a patch interior to the red sphere; small step so
    no silhouette crossings."""
    y0, x0 = _find_red_patch(scene)

    def loss(cz):
        cam = scene.camera
        s = scene._replace(camera=cam._replace(position=cam.position._replace(z=cz)))
        return _patch_loss(s, y0, x0, 1)

    z0 = float(scene.camera.position.z)
    g = float(jax.grad(loss)(jnp.float32(z0)))
    eps = 0.05
    fd = (float(loss(jnp.float32(z0 + eps))) - float(loss(jnp.float32(z0 - eps)))) / (2 * eps)
    # f32 forward differences at 1e-2 relative step: loose tolerance
    np.testing.assert_allclose(g, fd, rtol=0.2, atol=5e-5)


def test_grad_zero_at_optimum(scene, target):
    _, grads = jax.value_and_grad(render_loss, allow_int=True)(scene, CFG, target)
    assert abs(float(grads.objects.org.x[1])) < 1e-8
    assert abs(float(grads.materials.diffuse.r[2])) < 1e-8


def test_grads_finite_everywhere(scene, target):
    """No NaN/inf gradients through the full default render (refraction,
    textures-off patterns, sky, shadow) — the where-safe-math contract."""
    _, grads = jax.value_and_grad(render_loss, allow_int=True)(
        scene, CFG, target + 0.1
    )

    def check(leaf):
        if leaf is None:
            return
        a = np.asarray(leaf)
        if a.dtype == np.float32:
            assert np.all(np.isfinite(a)), a

    jax.tree_util.tree_map(check, grads)


def test_inverse_rendering_converges(scene):
    """End-to-end: perturb the red sphere's color, recover it by gradient
    descent on that parameter (single-param descent; the full-tree step is
    exercised by test_full_tree_sgd_step_stays_finite and the dryrun)."""
    true_img = render_color(scene, CFG)
    target = jnp.stack([true_img.r, true_img.g, true_img.b], -1)

    def loss_of(r):
        mats = scene.materials
        s = scene._replace(
            materials=mats._replace(
                diffuse=mats.diffuse._replace(r=mats.diffuse.r.at[2].set(r))
            )
        )
        return render_loss(s, CFG, target)

    vg = jax.jit(jax.value_and_grad(loss_of))
    r = jnp.float32(0.2)
    loss0 = float(vg(r)[0])
    for _ in range(60):
        loss, g = vg(r)
        r = r - 20.0 * g
    # criterion is parameter recovery: the loss has an r-independent floor
    # from knife-edge pixels that flip between the (unjitted) target render
    # and the jitted loss render
    assert float(loss) < loss0
    assert abs(float(r) - 0.8) < 0.01, float(r)


def test_full_tree_sgd_step_stays_finite(scene):
    """Whole-scene SGD steps keep the forward render finite (gradient
    sanitization + far-hit stop-gradient)."""
    true_img = render_color(scene, CFG)
    target = jnp.stack([true_img.r, true_img.g, true_img.b], -1) + 0.05
    s = scene
    for _ in range(5):
        s, loss = sgd_train_step(s, CFG, target, lr=1e-3)
        assert np.isfinite(float(loss)), float(loss)
    img = render_color(s, CFG)
    assert np.all(np.isfinite(np.asarray(img.r)))


def test_march_differentiable_mode(scene):
    """Reverse-mode through the scan-based march (cfg.differentiable)."""
    cfg = rt.RenderConfig(
        xres=16, yres=12, use_raymarching=True, glow_effect=1.0,
        max_refractions=1, differentiable=True, march_budget=64,
    )

    def loss(s):
        img = render_color(s, cfg)
        return jnp.mean(img.r + img.g + img.b)

    g = jax.grad(loss, allow_int=True)(scene)
    gx = np.asarray(g.objects.org.x)
    assert np.all(np.isfinite(gx))
    assert np.any(gx != 0.0)


def test_march_implicit_vjp_matches_scan(scene):
    """The closed-form implicit VJP through the while-loop march
    (ops/march.py) vs the brute-force scan-path AD, geometry only: the hit
    point is an SDF root, so the IFT gradient must equal the unrolled
    gradient up to march convergence tolerance."""
    base = rt.RenderConfig(xres=16, yres=12, use_raymarching=True,
                           max_refractions=1, march_max_iter=512)
    cfg_scan = base.with_(differentiable=True, march_budget=256)

    def loss(cy, cfg):
        objs = scene.objects
        s = scene._replace(objects=objs._replace(
            org=objs.org._replace(y=objs.org.y.at[3].set(cy))))
        img = render_color(s, cfg)
        return jnp.mean(img.r + img.g + img.b)

    y0 = jnp.float32(float(scene.objects.org.y[3]))
    g_impl = float(jax.grad(lambda c: loss(c, base))(y0))
    g_scan = float(jax.grad(lambda c: loss(c, cfg_scan))(y0))
    np.testing.assert_allclose(g_impl, g_scan, rtol=5e-3)


def test_march_implicit_vjp_glow_contract(scene):
    """Glow gradients through the implicit VJP: endpoint-argmin lanes route
    through the hit-point IFT (exact shadowing), interior-argmin lanes use the
    continuum envelope — same sign and order as the discrete scan-path
    derivative, not bit-equal (documented contract, ops/march.py)."""
    base = rt.RenderConfig(xres=16, yres=12, use_raymarching=True,
                           glow_effect=1.0, max_refractions=1,
                           march_max_iter=512)
    cfg_scan = base.with_(differentiable=True, march_budget=256)

    def loss(r, cfg):
        objs = scene.objects
        s = scene._replace(objects=objs._replace(radius=objs.radius.at[3].set(r)))
        img = render_color(s, cfg)
        return jnp.mean(img.r + img.g + img.b)

    r0 = jnp.float32(80.0)
    g_impl = float(jax.grad(lambda r: loss(r, base))(r0))
    g_scan = float(jax.grad(lambda r: loss(r, cfg_scan))(r0))
    assert np.isfinite(g_impl)
    np.testing.assert_allclose(g_impl, g_scan, rtol=0.1)
