"""The trace core: shading + unrolled Whitted loop + march loop.

This is the TPU-native replacement for the reference's hot path —
``shading`` (src/render.rs:1020-1140), ``raytrace`` (render.rs:1142-1224) and
``raymarch`` (render.rs:1299-1411). The reference recurses per pixel with
dynamic levels; here every level is a *static* Python int at trace time, so the
whole ray tree (reflection chain × refraction recursion) unrolls into one
fixed, fully differentiable tensor program over the ``(H, W)`` ray batch, with
per-ray lane masks standing in for early loop exits.

Reference quirks preserved deliberately:
* hitting object index 0 terminates the bounce loop (render.rs:1187-1189);
* throughput cutoff ``r+g+b <= 0.1`` (render.rs:1191-1193);
* per-channel R/G/B-IGNORE accumulation guards (render.rs:1175-1186) — never
  set by any caller but kept bit-exact;
* the march loop's reflection cap is the compile-time constant, not the env
  field (render.rs:1368,1391);
* a ray that misses in march mode stays "active" and re-adds the background
  every remaining lap (render.rs:1385-1390 has no miss-break);
* pseudo-refraction bends the ray and *ignores the source object* rather than
  tracing a true exit interface (render.rs:1093-1115);
* the raymarch-mode shadow checks the transparency of the *shaded* object,
  while raytrace mode checks the *blocker* (render.rs:1053-1080).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..models.scene import Scene
from ..models.vec import Color, Vec3
from .gather import HitFields, gather_hit_fields, surface_normal_from
from .intersect import (
    BIGNORE,
    F32_EPSILON,
    GIGNORE,
    INONLY,
    OUTONLY,
    RIGNORE,
    raycast,
)
from .march import march_single
from .sky import get_bg
from .texture import get_uv, lookup_diffuse

__all__ = ["shading", "raytrace", "raymarch", "trace_image"]

_INF = np.float32(np.inf)


def _gather_mat(scene: Scene, idx):
    """Material row id for the hit object."""
    return jnp.take(scene.objects.mat, idx)


def shading(scene: Scene, cfg: RenderConfig, idx, fields: HitFields, n: Vec3,
            pt: Vec3, eye: Vec3, nest: int, active=None) -> Color:
    """Lambert + Phong + shadow + texture + pseudo-refraction
    (render.rs:1020-1140). ``nest`` is static — the refraction recursion
    unrolls while ``nest < cfg.max_refractions``. ``fields`` carries the
    pre-gathered per-hit object/material properties (see ops/gather.py)."""
    mats = scene.materials
    light = scene.light

    # Lambert + Phong lobes (render.rs:1024-1046)
    light_incidence = light.dot(n)
    ln2 = 2.0 * light_incidence
    reflected_to_light = Vec3(n.x * ln2, n.y * ln2, n.z * ln2) - light
    diffuse_intensity = jnp.maximum(light_incidence, 0.0)
    shadow_org = pt + light * F32_EPSILON
    pn = fields.pn
    refl_incidence = -reflected_to_light.dot(eye)
    ri_safe = jnp.where(refl_incidence > 0.0, refl_incidence, 1.0)
    reflection_intensity = jnp.where(
        (pn != 0.0) & (refl_incidence > 0.0), jnp.power(ri_safe, pn), 0.0
    )

    # Shadow trace (render.rs:1048-1082)
    transparency_self = fields.transparency
    if cfg.use_raymarching:
        res = march_single(
            scene, cfg, shadow_org, light.broadcast_to(pt.shape), idx, active=active
        )
        lit = (
            (res.travel_dist >= cfg.far_away)
            | (res.iter >= cfg.march_max_iter)
            | (transparency_self > 0.0)
        )
    else:
        zero_flags = jnp.zeros(jnp.shape(pt.x), jnp.int32)
        t_s, i_s = raycast(scene, shadow_org, light.broadcast_to(pt.shape), idx, zero_flags)
        blocker_transparency = jnp.take(mats.transparency, _gather_mat(scene, i_s))
        lit = jnp.isinf(t_s) | (blocker_transparency > 0.0)

    k1 = jnp.where(lit, jnp.minimum(0.2 + diffuse_intensity, 1.0), 0.2)
    k2 = jnp.where(lit, reflection_intensity, 0.0)

    # Face texturing (render.rs:1085; uv relative to object org, render.rs:434-437,544-547)
    uv = get_uv(pt - fields.org, fields.uvmap, fields.pattern_scale,
                fields.pattern_angle_scale)
    kd = lookup_diffuse(scene, fields, uv)

    base = Color(kd.r * k1 + k2, kd.g * k1 + k2, kd.b * k1 + k2)

    # Pseudo-refraction (render.rs:1093-1132): static depth gate + dynamic
    # transparency gate. The sub-trace starts at level ``nest`` with the
    # source object ignored and OUTONLY/INONLY chosen by entry/exit sign.
    # ``refraction_unroll`` caps the unrolled program depth (see config.py).
    unroll_cap = cfg.max_refractions
    if cfg.refraction_unroll is not None:
        unroll_cap = min(unroll_cap, cfg.refraction_unroll)
    if nest < unroll_cap:
        sp = eye.dot(n)
        f = transparency_self
        fracn = fields.refraction
        # guard |n| ~ 0: a material with t>0 but n==0 is degenerate (the
        # reference computes 1/0 -> NaN rays); treat as index 1 so the forward
        # and backward stay finite under optimization drift
        fracn_safe = jnp.where((f > 0.0) & (jnp.abs(fracn) > 1e-6), fracn, 1.0)
        bend = sp * (jnp.where(sp > 0.0, fracn_safe, 1.0 / fracn_safe) - 1.0)
        ray = (eye + Vec3(n.x * bend, n.y * bend, n.z * bend)).normalized()
        pt3 = pt + ray * F32_EPSILON
        sub_flags = jnp.where(sp < 0.0, OUTONLY, INONLY).astype(jnp.int32)
        sub_active = f > 0.0 if active is None else (f > 0.0) & active
        if cfg.use_raymarching:
            fc2 = raymarch(scene, cfg, pt3, ray, nest, idx, sub_flags,
                           active0=sub_active)
        else:
            fc2 = raytrace(scene, cfg, pt3, ray, nest, idx, sub_flags)
        blended = Color(
            (kd.r * k1 + k2) * (1.0 - f) + fc2.r * f,
            (kd.g * k1 + k2) * (1.0 - f) + fc2.g * f,
            (kd.b * k1 + k2) * (1.0 - f) + fc2.b * f,
        )
        return blended.where(f > 0.0, base)
    return base


def _accumulate(ret: Color, fcs: Color, face: Color, ks: Color, mask, flags):
    """Masked color accumulation + throughput attenuation with the
    per-channel IGNORE guards (render.rs:1175-1186)."""
    m_r = mask & ((flags & RIGNORE) == 0)
    m_g = mask & ((flags & GIGNORE) == 0)
    m_b = mask & ((flags & BIGNORE) == 0)
    ret = Color(
        ret.r + jnp.where(m_r, face.r * fcs.r, 0.0),
        ret.g + jnp.where(m_g, face.g * fcs.g, 0.0),
        ret.b + jnp.where(m_b, face.b * fcs.b, 0.0),
    )
    fcs = Color(
        jnp.where(m_r, fcs.r * ks.r, fcs.r),
        jnp.where(m_g, fcs.g * ks.g, fcs.g),
        jnp.where(m_b, fcs.b * ks.b, fcs.b),
    )
    return ret, fcs


def _reflect_update(vi, eye, flags, ig, pt, n, idx, upd):
    """Mirror bounce + entry/exit flag flip (render.rs:1199-1211)."""
    en2 = -2.0 * eye.dot(n)
    new_eye = eye + Vec3(n.x * en2, n.y * en2, n.z * en2)
    inside = n.dot(new_eye) < 0.0
    new_flags = jnp.where(
        inside,
        (flags & ~INONLY) | OUTONLY,
        (flags & ~OUTONLY) | INONLY,
    )
    return (
        pt.where(upd, vi),
        new_eye.where(upd, eye),
        jnp.where(upd, new_flags, flags),
        jnp.where(upd, idx, ig),
    )


def raytrace(scene: Scene, cfg: RenderConfig, vi: Vec3, eye: Vec3, lev: int,
             ig, flags) -> Color:
    """Unrolled Whitted reflection loop (render.rs:1142-1224).

    ``lev`` is static; the loop bodies run at levels ``lev+1 .. max(lev+1,
    max_reflections)`` exactly as the reference's ``loop`` would.
    """
    shape = jnp.shape(eye.x)
    fcs = Color.full(1.0, 1.0, 1.0, shape)
    ret = Color.zero(shape)
    active = jnp.ones(shape, bool)

    n_iters = max(1, cfg.max_reflections - lev)
    for step in range(n_iters):
        lev_i = lev + 1 + step
        step_fn = _raytrace_step(cfg, lev_i)
        if cfg.remat:
            step_fn = jax.checkpoint(step_fn)
        vi, eye, flags, ig, fcs, ret, active = step_fn(
            scene, vi, eye, flags, ig, fcs, ret, active
        )

    return ret


def _raytrace_step(cfg: RenderConfig, lev_i: int):
    """One bounce of the Whitted loop as a pure state-transition function —
    the rematerialization unit: under ``cfg.remat``, XLA recomputes the whole
    bounce (intersections, shading, the refraction subtree) in the backward
    pass instead of spilling every (H, W) intermediate to HBM."""

    def step_fn(scene, vi, eye, flags, ig, fcs, ret, active):
        bg_fn = get_bg(cfg.bg)
        t, idx = raycast(scene, vi, eye, ig, flags)
        hit = jnp.isfinite(t)
        t_safe = jnp.where(hit, t, 0.0)
        pt = vi + eye * t_safe
        if cfg.grad_distance_cutoff is not None:
            from jax import lax

            near = t_safe < cfg.grad_distance_cutoff
            pt = pt.where(near, Vec3(*(lax.stop_gradient(c) for c in pt)))
        fields = gather_hit_fields(scene, idx)
        n = surface_normal_from(fields, pt)
        face = shading(scene, cfg, idx, fields, n, pt, eye, lev_i,
                       active=active & hit)
        ks = fields.specular

        ret, fcs = _accumulate(ret, fcs, face, ks, active & hit, flags)

        # Miss: background picked up once, unguarded by IGNORE bits
        # (render.rs:1212-1217), then the lane terminates.
        miss = active & ~hit
        bg = bg_fn(scene.light, eye)
        ret = Color(
            ret.r + jnp.where(miss, bg.r * fcs.r, 0.0),
            ret.g + jnp.where(miss, bg.g * fcs.g, 0.0),
            ret.b + jnp.where(miss, bg.b * fcs.b, 0.0),
        )

        # Terminations (render.rs:1187-1197) and reflection bounce.
        cont = (
            active
            & hit
            & (idx != 0)
            & (fcs.sum() > 0.1)
            & (lev_i < cfg.max_reflections)
        )
        vi, eye, flags, ig = _reflect_update(vi, eye, flags, ig, pt, n, idx, cont)
        return vi, eye, flags, ig, fcs, ret, cont

    return step_fn


def raymarch(scene: Scene, cfg: RenderConfig, vi: Vec3, eye: Vec3, lev: int,
             ig, flags, active0=None) -> Color:
    """Unrolled march + reflect loop with glow post-multiply
    (render.rs:1299-1411). Loop cap is the reference's compile-time constant
    (``cfg.raymarch_max_reflections``), independent of ``max_reflections``.

    ``active0`` masks lanes that need tracing at all (refraction sub-traces
    pass the transparent-lane mask). Within the loop, a lane's march is only
    *recomputed* when its ray state changed (a reflection happened): a lane
    that missed keeps re-adding the background each lap with unchanged state
    (reference quirk, render.rs:1385-1391), so its cached march result is
    reused instead of re-running the sphere-tracing loop — identical values,
    none of the cost.
    """
    shape = jnp.shape(eye.x)
    fcs = Color.full(1.0, 1.0, 1.0, shape)
    ret = Color.zero(shape)
    active = (
        jnp.ones(shape, bool)
        if active0 is None
        else jnp.broadcast_to(active0, shape)
    )
    min_min_dist = jnp.full(shape, _INF, jnp.float32)
    pos = vi
    bg_fn = get_bg(cfg.bg)

    need_march = active
    res = None
    n_iters = max(1, cfg.raymarch_max_reflections - lev)
    for step in range(n_iters):
        lev_i = lev + 1 + step

        new_res = march_single(scene, cfg, pos, eye, ig, active=need_march)
        if res is None:
            res = new_res
        else:
            res = jax.tree_util.tree_map(
                lambda new, old: jnp.where(need_march, new, old), new_res, res
            )
        min_min_dist = jnp.where(
            active & (res.min_dist < min_min_dist), res.min_dist, min_min_dist
        )
        hit = res.final_dist < cfg.march_eps
        pt = res.pos
        if cfg.grad_distance_cutoff is not None:
            from jax import lax

            near = res.travel_dist < cfg.grad_distance_cutoff
            pt = pt.where(near, Vec3(*(lax.stop_gradient(c) for c in pt)))
        fields = gather_hit_fields(scene, res.idx)
        n = surface_normal_from(fields, pt)
        face = shading(scene, cfg, res.idx, fields, n, pt, eye, lev_i,
                       active=active & hit)
        ks = fields.specular

        ret, fcs = _accumulate(ret, fcs, face, ks, active & hit, flags)

        # March-mode miss does NOT terminate the lane: the background is
        # re-added every remaining lap with unchanged state (reference quirk,
        # render.rs:1385-1391).
        miss = active & ~hit
        bg = bg_fn(scene.light, eye)
        ret = Color(
            ret.r + jnp.where(miss, bg.r * fcs.r, 0.0),
            ret.g + jnp.where(miss, bg.g * fcs.g, 0.0),
            ret.b + jnp.where(miss, bg.b * fcs.b, 0.0),
        )

        cont_hit = (
            hit
            & (res.idx != 0)
            & (fcs.sum() > 0.1)
            & (lev_i < cfg.raymarch_max_reflections)
        )
        cont = active & (cont_hit | ~hit)
        upd = active & cont_hit
        pos, eye, flags, ig = _reflect_update(pos, eye, flags, ig, pt, n, res.idx, upd)
        active = cont
        need_march = upd  # only reflected lanes have new state to march

    if cfg.glow_effect is not None:
        g = jnp.float32(cfg.glow_effect)
        factor = jnp.where(
            jnp.isinf(min_min_dist),
            1.0,
            1.0 + g * jnp.power(jnp.float32(0.99), min_min_dist),
        )
        ret = Color(ret.r * factor, ret.g * factor, ret.b * factor)
    return ret


def trace_image(scene: Scene, cfg: RenderConfig, vi: Vec3, eye: Vec3) -> Color:
    """Entry: trace a full ray grid from scratch (lev 0, no ignore, no flags —
    render.rs:820-824). March mode optionally runs in sequential row bands
    (``cfg.march_tiles``) so each band's sphere-tracing loop exits at its own
    worst lane."""
    shape = jnp.shape(eye.x)
    ig = jnp.full(shape, -1, jnp.int32)
    flags = jnp.zeros(shape, jnp.int32)
    if not cfg.use_raymarching:
        return raytrace(scene, cfg, vi, eye, 0, ig, flags)

    tiles = cfg.march_tiles
    if tiles > 1 and len(shape) == 2 and shape[0] % tiles == 0:
        h, w = shape
        bh = h // tiles

        def to_bands(a):
            return a.reshape(tiles, bh, w)

        bands = (
            Vec3(*(to_bands(c) for c in vi)),
            Vec3(*(to_bands(c) for c in eye)),
        )

        def band_fn(band):
            vi_b, eye_b = band
            ig_b = jnp.full((bh, w), -1, jnp.int32)
            flags_b = jnp.zeros((bh, w), jnp.int32)
            return raymarch(scene, cfg, vi_b, eye_b, 0, ig_b, flags_b)

        out = jax.lax.map(band_fn, bands)
        return Color(*(c.reshape(h, w) for c in out))

    return raymarch(scene, cfg, vi, eye, 0, ig, flags)
