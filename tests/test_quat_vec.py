"""Quaternion / Vec3 math parity vs the scalar oracle (reference quat.rs,
vec3.rs semantics)."""

import numpy as np
import jax.numpy as jnp

from ray_rust_tpu.models.quat import Quat
from ray_rust_tpu.models.vec import Vec3, v3

from .oracle import Q, V


def _as_np(vec: Vec3):
    return np.array([float(vec.x), float(vec.y), float(vec.z)], np.float32)


def test_transform_matches_oracle():
    rng = np.random.default_rng(0)
    for _ in range(20):
        pyr = rng.uniform(-np.pi, np.pi, 3).astype(np.float32)
        vec = rng.uniform(-2, 2, 3).astype(np.float32)
        q = Quat.from_pyr(v3(*pyr))
        got = _as_np(q.transform(v3(*vec)))
        oq = Q.from_pyr(V(*pyr))
        ov = oq.transform(V(*vec))
        want = np.array([ov.x, ov.y, ov.z], np.float32)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_transform_preserves_length():
    q = Quat.from_pyr(v3(0.3, -1.1, 0.7))
    vec = v3(1.0, 2.0, -3.0)
    out = q.transform(vec)
    np.testing.assert_allclose(float(out.len()), float(vec.len()), rtol=1e-5)


def test_rotation_axis_angle():
    # 90° about +Y maps +X to ... with the reference's quat convention
    q = Quat.rotation(np.pi / 2, 0.0, 1.0, 0.0)
    out = _as_np(q.transform(v3(1.0, 0.0, 0.0)))
    oq = Q.rotation(np.pi / 2, 0, 1, 0)
    ov = oq.transform(V(1, 0, 0))
    np.testing.assert_allclose(out, [ov.x, ov.y, ov.z], atol=1e-6)


def test_slerp_endpoints_and_long_path():
    a = Quat.from_pyr(v3(0.1, 0.2, 0.3))
    b = Quat.from_pyr(v3(-0.5, 1.0, 0.4))
    s0 = a.slerp(b, 0.0)
    s1 = a.slerp(b, 1.0)
    vec_probe = v3(0.3, -1.2, 2.0)
    # endpoints must act as the same *rotation* (slerp may return -q on the
    # long path, which is the identical rotation)
    for got, want in ((s0, a), (s1, b)):
        np.testing.assert_allclose(
            _as_np(got.transform(vec_probe)), _as_np(want.transform(vec_probe)), atol=1e-4
        )
    # degenerate (identical) case returns self
    s = a.slerp(a, 0.5)
    np.testing.assert_allclose(float(s.x), float(a.x), atol=1e-7)
    # long path: negate b -> dot < 0 takes the sign-fix branch
    # (quat.rs:116-118). The reference's fix yields a NON-unit quaternion, so
    # the transform picks up a |q|^2 scale (harmless: ray gen re-normalizes,
    # render.rs:815) — compare directions only.
    bneg = Quat(-b.x, -b.y, -b.z, -b.w)
    mid1 = a.slerp(b, 0.5)
    mid2 = a.slerp(bneg, 0.5)
    vec = v3(1.0, -2.0, 0.5)
    d1 = mid1.transform(vec).normalized()
    d2 = mid2.transform(vec).normalized()
    np.testing.assert_allclose(_as_np(d1), _as_np(d2), atol=1e-4)


def test_vec_normalized_zero_safe():
    z = Vec3(jnp.zeros(3), jnp.zeros(3), jnp.zeros(3))
    out = z.normalized()
    assert np.all(np.isfinite(np.asarray(out.x)))


def test_vec_ops():
    a = v3(1.0, 2.0, 3.0)
    b = v3(-1.0, 0.5, 2.0)
    assert float(a.dot(b)) == 1.0 * -1.0 + 2.0 * 0.5 + 3.0 * 2.0
    s = a - b
    assert float(s.x) == 2.0
    n = v3(3.0, 0.0, 4.0).normalized()
    np.testing.assert_allclose(_as_np(n), [0.6, 0.0, 0.8], rtol=1e-6)
