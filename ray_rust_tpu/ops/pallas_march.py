"""Fused Pallas TPU kernel for march mode (SDF sphere tracing + glow).

Companion to ops/pallas_trace.py, covering the reference's ``raymarch`` path
(src/render.rs:1299-1411): sphere tracing (``raymarch_single``,
render.rs:1266-1297) over the scene SDF (``distance_estimate``,
render.rs:1226-1251), the march-mode reflect/shade loop, glow min-tracking and
the ``1 + g·0.99^min_dist`` post-multiply (render.rs:1397-1410) — all inside
ONE Pallas kernel over row tiles.

Why a kernel beats the jnp path here even more than for the Whitted trace: the
march is a data-dependent loop whose per-lane trip count varies by ~3 orders
of magnitude (a horizon-grazing ray needs ~1500 SDF steps, a sphere hit ~10).
The jnp path's batched ``lax.while_loop`` rolls the WHOLE image until the
worst lane settles, round-tripping every (H, W) state array through HBM each
step (ops/march.py; row-banding via ``cfg.march_tiles`` only coarsely confines
it). Here each row tile runs its own ``lax.while_loop`` in VMEM/registers:
tiles whose rays all settle in 10 steps exit after 10 steps, and no march
state ever touches HBM — the Pallas grid is the TPU-native replacement for
both the reference's scanline work units (render.rs:836-898) and the jnp
path's banding.

Structure mirrors ops/trace.py:raymarch lap-for-lap (same cached-march reuse
for non-reflected lanes, same miss-re-adds-background reference quirk, same
shadow/refraction semantics), so the jnp path stays the correctness oracle
(tests/test_pallas.py). Forward-only — :func:`render_color_fast` in
pallas_trace pairs kernels with the jnp path's VJP.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..models.scene import KIND_SPHERE, Scene
from ..models.vec import Color, Vec3
from .intersect import F32_EPSILON, INONLY, OUTONLY
from .march import MarchResult
from .pallas_trace import (
    _BIG,
    _KernelScene,
    _pack_scene,
    _pattern_diffuse,
    _powf,
    _tile_origin,
    _tile_rays,
)
from .sky import get_bg
from .texture import get_uv
from .trace import _accumulate, _reflect_update

__all__ = ["pallas_march_supported", "render_color_pallas_march"]


def pallas_march_supported(scene: Scene, cfg: RenderConfig) -> bool:
    """The fused march kernel covers forward march mode without image
    textures (differentiable mode stays on the jnp scan path)."""
    if not cfg.use_raymarching or cfg.differentiable:
        return False
    if scene.textures is not None:
        tex_ids = np.asarray(scene.textures.widths)
        if tex_ids.size and np.asarray(scene.materials.texture_id).max() >= 0:
            return False
    from .pallas_trace import _KERNEL_OBJECT_MAX

    return scene.objects.count <= _KERNEL_OBJECT_MAX


def _march_single(ks: _KernelScene, cfg: RenderConfig, init_pos: Vec3,
                  eye: Vec3, ig, active,
                  record_glow: bool = False,
                  need_glow: bool = True) -> MarchResult:
    """Kernel-side sphere tracing (render.rs:1266-1297); mirrors
    ops/march.py:march_single's while mode. The whole tile's march state is a
    while_loop carry in VMEM; the loop exits when every live lane converges,
    escapes, or passes the iteration cap.

    ``record_glow`` additionally tracks the glow argmin's sample position,
    object index and step index (ops/march.py's glow_pos/glow_iter contract)
    — carried state for the site-recording backward (ops/pallas_bwd.py);
    the pure forward kernel leaves it off.

    ``need_glow=False`` drops the glow-metric min channel entirely: shadow
    marches only consume the hit/escape decision (travel/iter,
    render.rs:1053-1067) and glow-off renders never read ``min_dist``, so
    the per-object glow multiply+compare every step and the tail shortcut's
    closed-form glow argmin are dead work on those paths. The returned
    ``min_dist`` is +inf. Exact: the reference computes and discards the
    same values (render.rs:1244-1247)."""
    shape = jnp.shape(init_pos.x)
    if record_glow:
        need_glow = True
    # The done mask is carried as int32 (1 = done): Mosaic fails to legalize
    # while_loops with vector-of-i1 carries ('scf.yield' legalization error).
    state = (
        init_pos.x, init_pos.y, init_pos.z,
        jnp.zeros(shape, jnp.float32),           # travel
        jnp.zeros(shape, jnp.int32),             # iter
        jnp.full(shape, _BIG, jnp.float32),      # min glow
        jnp.zeros(shape, jnp.float32),           # final dist
        jnp.zeros(shape, jnp.int32),             # idx
        (~active).astype(jnp.int32),             # done (0/1)
    )
    if not need_glow:
        # drop the min-glow carry (slot 5) — restored as +inf on exit
        state = state[:5] + state[6:]

    def unpack(s):
        if need_glow:
            return s[:9]
        px, py, pz, travel, it, fd, idx, done = s[:8]
        return px, py, pz, travel, it, None, fd, idx, done

    if record_glow:
        state = state + (
            init_pos.x, init_pos.y, init_pos.z,   # glow argmin pos
            jnp.zeros(shape, jnp.int32),          # glow argmin object
            jnp.full(shape, -1, jnp.int32),       # glow argmin step (pre-inc)
        )
    n_core = 9 if need_glow else 8

    def once(s):
        px, py, pz, travel, it, mind, fd, idx, done = unpack(s)
        dist, i, glow, gobj = ks.distance_estimate(
            Vec3(px, py, pz), ig, with_glow_idx=record_glow,
            with_glow=need_glow)
        live = done == 0
        new_it = it + 1
        stop = (
            (dist < cfg.march_eps)
            | (dist > cfg.far_away)
            | (new_it > cfg.march_max_iter)
        )
        out = (
            jnp.where(live, px + eye.x * dist, px),
            jnp.where(live, py + eye.y * dist, py),
            jnp.where(live, pz + eye.z * dist, pz),
            jnp.where(live, travel + dist, travel),
            jnp.where(live, new_it, it),
        )
        if need_glow:
            gupd = live & (glow < mind)
            out = out + (jnp.where(gupd, glow, mind),)
        out = out + (
            jnp.where(live, dist, fd),
            jnp.where(live, i, idx),
            jnp.maximum(done, (live & stop).astype(jnp.int32)),
        )
        if record_glow:
            gx, gy, gz, go, gi = s[9:]
            out = out + (
                jnp.where(gupd, px, gx),
                jnp.where(gupd, py, gy),
                jnp.where(gupd, pz, gz),
                jnp.where(gupd, gobj, go),
                jnp.where(gupd, it, gi),
            )
        return out

    chunk = max(1, cfg.pallas_march_chunk)
    use_skip = cfg.march_floor_skip and ks.unrolled

    def body(s):
        if use_skip:
            s = _floor_tail(ks, cfg, eye, ig, s, record_glow, need_glow)
        for _ in range(chunk):
            s = once(s)
        return s

    state = lax.while_loop(lambda s: jnp.min(s[n_core - 1]) == 0, body, state)
    px, py, pz, travel, it, mind, fd, idx, _done = unpack(state)
    if mind is None:
        mind = jnp.full(shape, _BIG, jnp.float32)
    res = MarchResult(
        final_dist=fd, idx=idx, pos=Vec3(px, py, pz), iter=it,
        travel_dist=travel, min_dist=mind,
    )
    if record_glow:
        gx, gy, gz, go, gi = state[9:]
        res = res._replace(glow_pos=Vec3(gx, gy, gz), glow_iter=gi)
        return res, go
    return res


def _floor_tail(ks: _KernelScene, cfg: RenderConfig, eye: Vec3, ig, s,
                record_glow: bool, need_glow: bool = True):
    """Closed-form resolution of a floor-approach march tail (see
    ``cfg.march_floor_skip``).

    Applicability (per lane): the current nearest object is a floor, and
    every other object provably stays strictly farther than the floor's
    distance over the WHOLE remaining tail range ``[0, S]`` (S = the tail's
    total travel, known in closed form before the check). Then every
    remaining evaluation sees the floor as winner and the evaluated distances
    form ``h_k = h * rho^k`` with ``rho = 1 + e.n``:

    * rho < 1: hits at the first k with h_k < eps;
    * rho > 1: escapes at the first k with h_k > far;
    * either way the iteration cap (render.rs:1255) bounds k;
    * travel is the geometric sum, the final position one step past the
      stopping evaluation (mirroring the update-then-check loop order);
    * the glow channel's sampled minimum over the tail is found in closed
      form: per object the distance along the ray is unimodal in the travel
      parameter, so the discrete argmin over the geometric sample points is
      at the endpoints or the two samples bracketing the continuous argmin —
      four candidate evaluations replace up to 10^4 steps. (Within
      applicability every non-winner distance stays above the winner floor's
      distance > 0 over the whole tail, so the ``glow > 0`` filter never
      clips a candidate interval.)

    The per-object safety bound is exact (up to f32), not heuristic: with
    ``a = rho - 1`` the floor's distance along the tail is the affine
    ``h + a*s``, a sphere's unclamped SDF along the ray is the convex
    ``sqrt(perp^2 + (s - s*)^2) - r``, so their difference ``g(s)`` is convex
    and its minimum over ``[0, S]`` is at an endpoint or the single interior
    critical point ``s_c = s* + a*perp/sqrt(1-a^2)`` where
    ``g(s_c) = perp*sqrt(1-a^2) - r - h - a*s*``. Another floor's SDF is
    affine, so endpoint checks suffice. This covers BOTH branches soundly —
    the round-4 check compared other objects against the *initial* ``h``
    only, which under-constrained the escape branch (rho > 1: the floor
    distance grows, so a sphere beyond ``h`` could still become the SDF
    winner mid-tail and move the glow argmin — ADVICE r4, high).
    """
    if need_glow:
        px, py, pz, travel, it, mind, fd, idx, done = s[:9]
    else:
        px, py, pz, travel, it, fd, idx, done = s[:8]
        mind = None
    p = Vec3(px, py, pz)
    shape = jnp.shape(px)
    live = done == 0
    eps = np.float32(cfg.march_eps)
    far = np.float32(cfg.far_away)
    cap = np.int32(cfg.march_max_iter)

    # fresh winner sweep at the current position (one extra SDF evaluation
    # per while trip — ~1/chunk overhead)
    h, win, _, _ = ks.distance_estimate(p, ig, with_glow=False)

    # pass 1 over objects: winner kind + normal
    win_is_floor = jnp.zeros(shape, bool)
    n_win = Vec3(*(jnp.zeros(shape, jnp.float32) for _ in range(3)))
    for j, o in enumerate(ks.objs):
        is_win = win == jnp.int32(j)
        is_floor_j = o["kind"] != KIND_SPHERE
        win_is_floor = win_is_floor | (is_win & is_floor_j)
        n_win = Vec3(
            jnp.where(is_win, o["normal"].x, n_win.x),
            jnp.where(is_win, o["normal"].y, n_win.y),
            jnp.where(is_win, o["normal"].z, n_win.z),
        )

    rho = 1.0 + eye.dot(n_win)
    pre = (live & win_is_floor & (h > eps) & (h < far) & (rho > 1e-6))

    # --- stop step k (0-based index of the stopping evaluation) ------------
    rho_s = jnp.where(pre, rho, 0.5)
    h_s = jnp.where(pre, h, 1.0)
    log_rho = jnp.log(rho_s)
    lr_ok = jnp.abs(log_rho) > 1e-7
    lr_s = jnp.where(lr_ok, log_rho, 1.0)
    k_hit = jnp.ceil((jnp.log(eps) - jnp.log(h_s)) / lr_s)
    k_esc = jnp.ceil((jnp.log(far) - jnp.log(h_s)) / lr_s)
    k_geo = jnp.where(rho_s < 1.0, k_hit, k_esc)
    k_cap = (cap - it).astype(jnp.float32)
    kf = jnp.where(lr_ok, jnp.minimum(k_geo, k_cap), k_cap)
    kf = jnp.maximum(kf, 0.0)
    k_i = kf.astype(jnp.int32)
    kf = k_i.astype(jnp.float32)

    geo_ok = jnp.abs(1.0 - rho_s) > 1e-6

    def s_of(i_f):
        """travel offset of sample i (= sum of the first i step lengths)."""
        rho_i = jnp.exp(i_f * log_rho)
        return h_s * jnp.where(geo_ok, (1.0 - rho_i) / (1.0 - rho_s), i_f)

    rho_k = jnp.exp(kf * log_rho)
    m_f = kf + 1.0
    S = h_s * jnp.where(geo_ok, (1.0 - rho_k * rho_s) / (1.0 - rho_s), m_f)
    fd2 = h_s * rho_k
    p2 = p + eye * S
    travel2 = travel + S
    it2 = it + k_i + 1

    # pass 2 over objects: exact whole-tail safety check over [0, S] (see
    # docstring — convex g(s) for spheres: interior critical point +
    # endpoints; affine for floors: endpoints). |a| >= 1 has no interior
    # critical point (g' is one-signed), so endpoints are exact there.
    a = rho_s - 1.0
    safe = jnp.ones(shape, bool)
    for j, o in enumerate(ks.objs):
        is_sph = o["kind"] == KIND_SPHERE
        w = o["org"] - p
        s_star = w.dot(eye)
        wlen2 = w.squared_len()
        wlen = jnp.sqrt(jnp.maximum(wlen2, 1e-30))
        perp2 = jnp.maximum(wlen2 - s_star * s_star, 0.0)
        perp = jnp.sqrt(perp2)
        r = o["radius"]
        g0 = wlen - r - h
        dS2 = perp2 + (S - s_star) * (S - s_star)
        gS = jnp.sqrt(jnp.maximum(dS2, 0.0)) - r - h - a * S
        a_ok = jnp.abs(a) < 1.0 - 1e-6
        a_c = jnp.where(a_ok, a, 0.0)
        root = jnp.sqrt(jnp.maximum(1.0 - a_c * a_c, 1e-12))
        s_c = s_star + a_c * perp / root
        g_crit = perp * root - r - h - a_c * s_star
        interior = a_ok & (s_c > 0.0) & (s_c < S)
        g_min = jnp.minimum(jnp.minimum(g0, gS),
                            jnp.where(interior, g_crit, _BIG))
        d0 = -(w.dot(o["normal"]))  # (p - org).n
        slope = eye.dot(o["normal"])
        floor_safe = (d0 > h) & (d0 + slope * S > h + a * S)
        # logical ops, not where: Mosaic cannot legalize selects between
        # i1 vectors
        obj_safe = (is_sph & (g_min > 0.0)) | (~is_sph & floor_safe)
        skip_j = (win == jnp.int32(j)) | (jnp.int32(j) == ig)
        safe = safe & (skip_j | obj_safe)

    applicable = pre & safe

    def pick(new, old):
        return jnp.where(applicable, new, old)

    out = (
        pick(p2.x, px), pick(p2.y, py), pick(p2.z, pz),
        pick(travel2, travel), pick(it2, it),
    )

    if need_glow:
        # --- glow channel over the tail samples -----------------------------
        best_v = jnp.full(shape, _BIG, jnp.float32)
        best_i = jnp.zeros(shape, jnp.float32)
        best_j = jnp.zeros(shape, jnp.int32)
        for j, o in enumerate(ks.objs):
            gd = o["glow_dist"]
            w = o["org"] - p
            s_star = jnp.clip(w.dot(eye), 0.0, S)
            # sample index whose travel offset is nearest the continuous
            # argmin
            arg = 1.0 - s_star * (1.0 - rho_s) / h_s
            i_star = jnp.where(
                geo_ok,
                jnp.log(jnp.maximum(arg, 1e-30)) / lr_s,
                s_star / h_s,
            )
            i1 = jnp.clip(jnp.floor(i_star), 0.0, kf)
            for i_c in (jnp.zeros(shape, jnp.float32), i1,
                        jnp.minimum(i1 + 1.0, kf), kf):
                pos_c = p + eye * s_of(i_c)
                delta = o["org"] - pos_c
                sq = delta.squared_len()
                ln = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
                d_sph = jnp.maximum(
                    jnp.where(sq > 0, ln, 0.0) - o["radius"], 0.0)
                d_flo = jnp.maximum((pos_c - o["org"]).dot(o["normal"]), 0.0)
                d_c = jnp.where(o["kind"] == KIND_SPHERE, d_sph, d_flo)
                g_c = d_c * gd
                ok_c = (g_c > 0.0) & (jnp.int32(j) != ig)
                upd = ok_c & (g_c < best_v)
                best_v = jnp.where(upd, g_c, best_v)
                best_i = jnp.where(upd, i_c, best_i)
                best_j = jnp.where(upd, jnp.int32(j), best_j)

        gupd = applicable & (best_v < mind)
        out = out + (jnp.where(gupd, best_v, mind),)

    out = out + (
        pick(fd2, fd), pick(win, idx),
        jnp.maximum(done, applicable.astype(jnp.int32)),
    )
    if record_glow:
        gx, gy, gz, go, gi = s[9:]
        pos_b = p + eye * s_of(best_i)
        out = out + (
            jnp.where(gupd, pos_b.x, gx),
            jnp.where(gupd, pos_b.y, gy),
            jnp.where(gupd, pos_b.z, gz),
            jnp.where(gupd, best_j, go),
            jnp.where(gupd, it + best_i.astype(jnp.int32), gi),
        )
    else:
        out = out + tuple(s[(9 if need_glow else 8):])
    return out


def _shading(ks: _KernelScene, cfg: RenderConfig, idx, fields, n: Vec3,
             pt: Vec3, eye: Vec3, nest: int, active) -> Color:
    """March-mode shading (render.rs:1020-1140): shadow via sphere tracing,
    ``lit`` checks the SHADED object's transparency (reference quirk,
    render.rs:1053-1080). Mirrors ops/trace.py:shading."""
    light = ks.light

    light_incidence = light.dot(n)
    ln2 = 2.0 * light_incidence
    reflected_to_light = Vec3(n.x * ln2, n.y * ln2, n.z * ln2) - light
    diffuse_intensity = jnp.maximum(light_incidence, 0.0)
    shadow_org = pt + light * F32_EPSILON
    pn = fields.pn
    refl_incidence = -reflected_to_light.dot(eye)
    ri_safe = jnp.where(refl_incidence > 0.0, refl_incidence, 1.0)
    reflection_intensity = jnp.where(
        (pn != 0.0) & (refl_incidence > 0.0), _powf(ri_safe, pn), 0.0
    )

    transparency_self = fields.transparency
    # shadow march: only the hit/escape decision is consumed — skip the
    # glow-min channel (render.rs:1053-1067 discards it too)
    res = _march_single(
        ks, cfg, shadow_org, light.broadcast_to(pt.shape), idx, active,
        need_glow=False,
    )
    lit = (
        (res.travel_dist >= cfg.far_away)
        | (res.iter >= cfg.march_max_iter)
        | (transparency_self > 0.0)
    )

    k1 = jnp.where(lit, jnp.minimum(0.2 + diffuse_intensity, 1.0), 0.2)
    k2 = jnp.where(lit, reflection_intensity, 0.0)

    uv = get_uv(pt - fields.org, fields.uvmap, fields.pattern_scale,
                fields.pattern_angle_scale)
    kd = _pattern_diffuse(fields, uv)

    base = Color(kd.r * k1 + k2, kd.g * k1 + k2, kd.b * k1 + k2)

    unroll_cap = cfg.max_refractions
    if cfg.refraction_unroll is not None:
        unroll_cap = min(unroll_cap, cfg.refraction_unroll)
    if nest < unroll_cap:
        sp = eye.dot(n)
        f = transparency_self
        fracn = fields.refraction
        fracn_safe = jnp.where((f > 0.0) & (jnp.abs(fracn) > 1e-6), fracn, 1.0)
        bend = sp * (jnp.where(sp > 0.0, fracn_safe, 1.0 / fracn_safe) - 1.0)
        ray = (eye + Vec3(n.x * bend, n.y * bend, n.z * bend)).normalized()
        pt3 = pt + ray * F32_EPSILON
        sub_flags = jnp.where(sp < 0.0, OUTONLY, INONLY).astype(jnp.int32)
        sub_active = (f > 0.0) & active
        fc2 = _raymarch(ks, cfg, pt3, ray, nest, idx, sub_flags, sub_active)
        blended = Color(
            (kd.r * k1 + k2) * (1.0 - f) + fc2.r * f,
            (kd.g * k1 + k2) * (1.0 - f) + fc2.g * f,
            (kd.b * k1 + k2) * (1.0 - f) + fc2.b * f,
        )
        return blended.where(f > 0.0, base)
    return base


def _raymarch(ks: _KernelScene, cfg: RenderConfig, vi: Vec3, eye: Vec3,
              lev: int, ig, flags, active0) -> Color:
    """Kernel-side march + reflect loop with glow post-multiply
    (render.rs:1299-1411); mirrors ops/trace.py:raymarch lap-for-lap,
    including the cached-march reuse for lanes whose ray state didn't change
    and the miss-re-adds-background quirk (render.rs:1385-1391)."""
    shape = jnp.shape(eye.x)
    fcs = Color.full(1.0, 1.0, 1.0, shape)
    ret = Color.zero(shape)
    active = jnp.broadcast_to(active0, shape)
    min_min_dist = jnp.full(shape, _BIG, jnp.float32)
    pos = vi
    bg_fn = get_bg(cfg.bg)

    need_march = active
    res = None
    n_iters = max(1, cfg.raymarch_max_reflections - lev)
    # min_dist is consumed only by the glow post-multiply — glow-off renders
    # skip the glow-min channel in every march
    glow_on = cfg.glow_effect is not None
    for step in range(n_iters):
        lev_i = lev + 1 + step

        new_res = _march_single(ks, cfg, pos, eye, ig, need_march,
                                need_glow=glow_on)
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
        fields = ks.gather(res.idx)
        n = ks.normal_at(fields, pt)
        face = _shading(ks, cfg, res.idx, fields, n, pt, eye, lev_i,
                        active & hit)

        ret, fcs = _accumulate(ret, fcs, face, fields.specular, active & hit,
                               flags)

        miss = active & ~hit
        bg = bg_fn(ks.light, eye)
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
        pos, eye, flags, ig = _reflect_update(pos, eye, flags, ig, pt, n,
                                              res.idx, upd)
        active = cont
        need_march = upd

    if cfg.glow_effect is not None:
        g = jnp.float32(cfg.glow_effect)
        factor = jnp.where(
            jnp.isinf(min_min_dist),
            1.0,
            1.0 + g * _powf(jnp.float32(0.99), min_min_dist),
        )
        ret = Color(ret.r * factor, ret.g * factor, ret.b * factor)
    return ret


def _make_kernel(cfg: RenderConfig, n_objects: int, tile_rows: int,
                 tile_cols: int, col_grid: bool):
    def kernel(f32_ref, i32_ref, cam_ref, light_ref, org_ref, r_ref, g_ref,
               b_ref):
        ks = _KernelScene(f32_ref, i32_ref, light_ref, n_objects)
        row0, col0 = _tile_origin(tile_rows, tile_cols, col_grid)
        row0 = row0 + org_ref[0, 0]
        col0 = col0 + org_ref[0, 1]
        vi, eye = _tile_rays(cam_ref, cfg, tile_rows, tile_cols, row0, col0)

        ig = jnp.full((tile_rows, tile_cols), -1, jnp.int32)
        flags = jnp.zeros((tile_rows, tile_cols), jnp.int32)
        active = jnp.ones((tile_rows, tile_cols), bool)
        out = _raymarch(ks, cfg, vi, eye, 0, ig, flags, active)

        r_ref[:] = out.r
        g_ref[:] = out.g
        b_ref[:] = out.b

    return kernel


def render_color_pallas_march(scene: Scene, cfg: RenderConfig,
                              interpret: bool | None = None,
                              origin=None, shape=None) -> Color:
    """Forward march render through the fused Pallas kernel. Not
    differentiable — use pallas_trace.render_color_fast for the custom-VJP
    pairing. Column tiling (cfg.pallas_cols) matters even more here than for
    the trace kernel: every while_loop (march, shadow march) runs to the
    slowest live lane in the tile, and horizon-grazing rays need ~1500 SDF
    steps while sphere hits need ~10.

    ``origin``/``shape``: render a sub-rectangle of the global image (see
    pallas_trace.render_color_pallas)."""
    if not pallas_march_supported(scene, cfg):
        raise ValueError("scene/config outside the fused march kernel's "
                         "support; use the jnp path")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    from .pallas_trace import fwd_grid_spec

    h, w = shape if shape is not None else (cfg.yres, cfg.xres)
    tile_rows = cfg.pallas_rows
    grid, out_spec, (h_pad, w_pad), tile_cols, col_grid = fwd_grid_spec(
        cfg.with_(pallas_cols=cfg.pallas_march_cols), (h, w))
    n = scene.objects.count

    f32t, i32t, cam, light = _pack_scene(scene)
    if origin is None:
        org = jnp.zeros((1, 2), jnp.int32)
    else:
        org = jnp.stack(
            [jnp.asarray(origin[0]), jnp.asarray(origin[1])]
        ).astype(jnp.int32).reshape(1, 2)
    kernel = _make_kernel(cfg, n, tile_rows, tile_cols, col_grid)

    out_shape = jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    r, g, b = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem(), smem(), smem(), smem(), smem()],
        out_specs=(out_spec,) * 3,
        out_shape=(out_shape,) * 3,
        interpret=interpret,
    )(f32t, i32t, cam, light, org)

    if h_pad != h or w_pad != w:
        r, g, b = r[:h, :w], g[:h, :w], b[:h, :w]
    return Color(r, g, b)
