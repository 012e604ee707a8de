"""Traced-ray accounting for throughput reporting.

BASELINE.md:34-37 asks for *total-traced-rays/s* next to primary-rays/s: the
reference traces one camera ray per pixel, one shadow ray per shading call
(src/render.rs:1048-1082), one reflection ray per surviving bounce
(render.rs:1156-1221) and a refraction sub-tree per transparent hit
(render.rs:1093-1115), each with its own early-exit. This module replays the
unrolled Whitted loop's *control flow only* (raycasts, masks, terminations —
no shading math) and counts, per lane, exactly the raycast calls the
reference's recursion would perform, so ``total rays = sum(count_image)``.

Used by bench.py; correctness pinned by tests/test_profiling.py against a
hand-count on the default scene.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import RenderConfig
from ..models.scene import Scene
from ..models.vec import Color, Vec3
from .gather import gather_hit_fields
from .intersect import F32_EPSILON, INONLY, OUTONLY, raycast
from .rays import camera_rays
from .trace import _reflect_update

__all__ = ["count_traced_rays"]


def _count_raytrace(scene: Scene, cfg: RenderConfig, vi: Vec3, eye: Vec3,
                    lev: int, ig, flags, active):
    """Per-lane raycast-call count of raytrace (render.rs:1142-1224) +
    shading's shadow/refraction rays (render.rs:1048-1115), following the
    reference's terminations exactly (same masks as ops/trace.py)."""
    shape = jnp.shape(eye.x)
    count = jnp.zeros(shape, jnp.float32)
    fcs = Color.full(1.0, 1.0, 1.0, shape)

    # Count the REFERENCE's ray tree: its recursion spawns transparent
    # sub-traces up to the full max_refractions (render.rs:1093), not our
    # image-equivalent static unroll (cfg.refraction_unroll) — sub-rays past
    # unroll depth contribute ~zero color but are still traced and must be
    # charged when reporting total-traced-rays/s.
    unroll_cap = cfg.max_refractions

    n_iters = max(1, cfg.max_reflections - lev)
    for step in range(n_iters):
        lev_i = lev + 1 + step
        t, idx = raycast(scene, vi, eye, ig, flags)
        count = count + active.astype(jnp.float32)  # the trace ray itself
        hit = jnp.isfinite(t)
        shaded = active & hit
        # shading: one shadow raycast per shaded lane (render.rs:1069)
        count = count + shaded.astype(jnp.float32)

        t_safe = jnp.where(hit, t, 0.0)
        pt = vi + eye * t_safe
        fields = gather_hit_fields(scene, idx)
        sphere_n = (pt - fields.org).normalized()
        from ..models.scene import KIND_SPHERE

        n = sphere_n.where(fields.kind == KIND_SPHERE, fields.normal)

        # refraction sub-tree (render.rs:1093-1115): spawned per transparent
        # shaded lane while the static nest depth allows (shading receives
        # nest=lev_i and recurses into raytrace at lev=nest — ops/trace.py)
        if lev_i < unroll_cap:
            f = fields.transparency
            sub_active = shaded & (f > 0.0)
            sp = eye.dot(n)
            fracn = fields.refraction
            fracn_safe = jnp.where(
                (f > 0.0) & (jnp.abs(fracn) > 1e-6), fracn, 1.0
            )
            bend = sp * (jnp.where(sp > 0.0, fracn_safe, 1.0 / fracn_safe) - 1.0)
            ray = (eye + Vec3(n.x * bend, n.y * bend, n.z * bend)).normalized()
            pt3 = pt + ray * F32_EPSILON
            sub_flags = jnp.where(sp < 0.0, OUTONLY, INONLY).astype(jnp.int32)
            count = count + _count_raytrace(
                scene, cfg, pt3, ray, lev_i, idx, sub_flags, sub_active
            )

        # throughput update + terminations (render.rs:1175-1197)
        fcs = Color(
            jnp.where(shaded, fcs.r * fields.specular.r, fcs.r),
            jnp.where(shaded, fcs.g * fields.specular.g, fcs.g),
            jnp.where(shaded, fcs.b * fields.specular.b, fcs.b),
        )
        cont = (
            shaded & (idx != 0) & (fcs.sum() > 0.1)
            & (lev_i < cfg.max_reflections)
        )
        vi, eye, flags, ig = _reflect_update(vi, eye, flags, ig, pt, n, idx,
                                             cont)
        active = cont
    return count


def count_traced_rays(scene: Scene, cfg: RenderConfig) -> jnp.ndarray:
    """Total rays the reference would trace for this frame (scalar f32).

    Trace mode only (march mode's per-ray cost is iteration-, not ray-,
    bound; BASELINE.md's accounting is defined for the Whitted path)."""
    if cfg.use_raymarching:
        raise ValueError("ray accounting is defined for trace mode")
    vi, eye = camera_rays(scene.camera.position, scene.camera.rotation, cfg)
    shape = jnp.shape(eye.x)
    ig = jnp.full(shape, -1, jnp.int32)
    flags = jnp.zeros(shape, jnp.int32)
    active = jnp.ones(shape, bool)
    return jnp.sum(_count_raytrace(scene, cfg, vi, eye, 0, ig, flags, active))
