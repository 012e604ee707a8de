"""Vectorized ray-object intersection and nearest-hit reduction.

Replaces the reference's per-object virtual ``raycast`` dispatch plus linear
min-scan (src/render.rs:993-1018, sphere test render.rs:447-471, floor test
render.rs:557-569). Both primitive equations are evaluated branch-free for the
whole ``(H, W)`` ray grid and the object axis is reduced with a ``lax.scan``
that preserves the reference's ordering semantics exactly: strictly-closer
wins, first index wins ties, and the ignored object is masked by index rather
than pointer identity.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..models.scene import KIND_SPHERE, ObjectTable, Scene
from ..models.vec import Vec3

__all__ = [
    "OUTONLY",
    "INONLY",
    "RIGNORE",
    "GIGNORE",
    "BIGNORE",
    "F32_EPSILON",
    "raycast",
    "surface_normal",
    "object_candidate_t",
]

# Ray flags (render.rs:14-18). OUTONLY skips the sphere entry root, INONLY the
# exit root; the channel-IGNORE bits guard color accumulation (vestigial
# dispersion support — never set by any reference caller, kept for parity).
OUTONLY = 1
INONLY = 1 << 1
RIGNORE = 1 << 2
GIGNORE = 1 << 3
BIGNORE = 1 << 4

F32_EPSILON = np.float32(np.finfo(np.float32).eps)  # f32::EPSILON (render.rs:460)

_BIG = np.float32(np.inf)
_UNROLL_MAX = 32


def object_candidate_t(kind, org: Vec3, radius, normal: Vec3, vi: Vec3, eye: Vec3,
                       t_running, flags):
    """Intersection parameter of one object against the ray batch, or +inf.

    ``kind/org/radius/normal`` are one object's (scalar) fields; ``vi``/``eye``
    the ray grids; ``t_running`` the current nearest t (the reference threads
    the running min as ``ray_length``); ``flags`` the per-ray flag word.
    """
    wpt = vi - org

    # --- sphere: quadratic with entry/exit selection (render.rs:447-471) ---
    b = 2.0 * eye.dot(wpt)
    c = wpt.dot(wpt) - radius * radius
    d2 = b * b - 4.0 * c
    has_roots = d2 >= F32_EPSILON
    d = jnp.sqrt(jnp.where(has_roots, d2, 1.0))
    t0 = (-b - d) / 2.0
    far = t0 + d
    outonly = (flags & OUTONLY) != 0
    inonly = (flags & INONLY) != 0
    take_near = has_roots & ~outonly & (t0 >= 0.0) & (t0 < t_running)
    take_far = has_roots & ~inonly & (far > 0.0) & (far < t_running)
    cand_sphere = jnp.where(take_near, t0, jnp.where(take_far, far, _BIG))

    # --- floor: half-space plane, only front-facing rays (render.rs:557-569).
    # w == 0 can never produce a hit (division yields ±inf/NaN in the
    # reference, failing the range check), so the guard is w < 0.
    w = normal.dot(eye)
    denom = jnp.where(w < 0.0, w, -1.0)
    t0f = -normal.dot(wpt) / denom
    take_floor = (w < 0.0) & (t0f >= 0.0) & (t0f < t_running)
    cand_floor = jnp.where(take_floor, t0f, _BIG)

    return jnp.where(kind == KIND_SPHERE, cand_sphere, cand_floor)


def raycast(scene: Scene, vi: Vec3, eye: Vec3, ig, flags):
    """Nearest hit over all objects (render.rs:993-1018).

    ``ig`` is the per-ray ignored object index (-1 = none), replacing the
    reference's pointer-equality skip (render.rs:1004-1008).

    Returns ``(t, idx)`` with ``t = +inf`` on miss and ``idx = 0`` default.
    """
    objs = scene.objects
    n = objs.count

    t_init = jnp.full(vi.shape, _BIG, jnp.float32)
    idx_init = jnp.zeros(vi.shape, jnp.int32)

    def one(i, kind, org, fnorm, radius, carry):
        t, idx = carry
        cand = object_candidate_t(kind, org, radius, fnorm, vi, eye, t, flags)
        cand = jnp.where(i == ig, _BIG, cand)
        closer = cand < t
        return jnp.where(closer, cand, t), jnp.where(closer, i, idx)

    # Small scenes: straight-line unroll -> one fused kernel, no per-object
    # scan-step dispatch. Large scenes: sequential scan, O(H*W) memory.
    if n <= _UNROLL_MAX:
        carry = (t_init, idx_init)
        for i in range(n):
            carry = one(
                jnp.int32(i),
                objs.kind[i],
                Vec3(objs.org.x[i], objs.org.y[i], objs.org.z[i]),
                Vec3(objs.normal.x[i], objs.normal.y[i], objs.normal.z[i]),
                objs.radius[i],
                carry,
            )
        return carry

    def step(carry, xs):
        i, kind, ox, oy, oz, radius, nx, ny, nz = xs
        return one(i, kind, Vec3(ox, oy, oz), Vec3(nx, ny, nz), radius, carry), None

    xs = (
        jnp.arange(n, dtype=jnp.int32),
        objs.kind,
        objs.org.x,
        objs.org.y,
        objs.org.z,
        objs.radius,
        objs.normal.x,
        objs.normal.y,
        objs.normal.z,
    )
    (t, idx), _ = lax.scan(step, (t_init, idx_init), xs)
    return t, idx


def surface_normal(objs: ObjectTable, idx, pt: Vec3) -> Vec3:
    """Normal of the hit object at ``pt``: sphere ``(pt-org)/|pt-org|``
    (render.rs:443-445), floor's stored face normal as-is (render.rs:553-555).
    """
    kind = jnp.take(objs.kind, idx)
    org = objs.org.take(idx)
    fnorm = objs.normal.take(idx)
    sphere_n = (pt - org).normalized()
    is_sphere = kind == KIND_SPHERE
    return sphere_n.where(is_sphere, fnorm)
