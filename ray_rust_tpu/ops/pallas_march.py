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
    _tile_cond,
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

    RAY-PARAMETRIC FORM (unrolled regime): a march lap travels a straight
    line, so every object's SDF along it is a function of the scalar travel
    ``t`` with per-lap constants — ``sqrt(perp^2 + (t - s*)^2) - r`` for
    spheres (s* = closest-approach offset, perp = line distance), affine
    ``d0 + slope*t`` for floors. The per-step scene sweep drops from full
    3D point SDFs to ~half the arithmetic, the carried state drops the 3
    position arrays (travel alone determines the position), and the
    floor-tail shortcut reuses the same constants for its winner-stability
    roots. Travel accumulates the exact same step lengths in the same order
    as the reference's position update; evaluated distances round
    differently at ~ulp scale (the usual knife-edge contract). The
    fori_loop regime (>64 objects) keeps the position-based sweep
    (per-object constants would need N tile-shaped arrays).

    ``record_glow`` additionally tracks the glow argmin's sample position
    (as its travel offset), object index and step index (ops/march.py's
    glow_pos/glow_iter contract) — carried state for the site-recording
    backward (ops/pallas_bwd.py); the pure forward kernel leaves it off.

    ``need_glow=False`` drops the glow-metric min channel entirely: shadow
    marches only consume the hit/escape decision (travel/iter,
    render.rs:1053-1067) and glow-off renders never read ``min_dist``, so
    the per-object glow multiply+compare every step and the tail shortcut's
    closed-form glow argmin are dead work on those paths (the reference
    computes and discards the same values, render.rs:1244-1247). The
    returned ``min_dist`` is +inf. It also enables the NEVER-CONVERGES fast
    path: when every object's distance provably stays > 2*eps over the
    whole forward ray, no sample of any distance can dip below eps on any
    step phasing, so the lane cannot hit anything and must exit by
    travel>far or the iteration cap — which produce identical consumed
    decisions (shadow ``lit``, primary miss) — and the lane finishes in
    zero steps."""
    shape = jnp.shape(init_pos.x)
    if record_glow:
        need_glow = True
    if not ks.unrolled:
        return _march_single_fori(ks, cfg, init_pos, eye, ig, active,
                                  record_glow, need_glow)
    eps = np.float32(cfg.march_eps)
    far = np.float32(cfg.far_away)
    cap = np.int32(cfg.march_max_iter)

    # per-lap ray-parametric constants
    geom = []
    for j, o in enumerate(ks.objs):
        w = o["org"] - init_pos
        s_star = w.dot(eye)
        pv = w - eye * s_star
        geom.append(dict(
            s_star=s_star,
            perp2=pv.squared_len(),
            d0=-(w.dot(o["normal"])),      # (p0 - org).n
            slope=eye.dot(o["normal"]),
            r=o["radius"], gd=o["glow_dist"],
            is_sph=o["kind"] == KIND_SPHERE,
            skip=jnp.int32(j) == ig,
        ))

    def dist_at(g, t):
        dt = t - g["s_star"]
        d_sph = jnp.maximum(jnp.sqrt(g["perp2"] + dt * dt) - g["r"], 0.0)
        d_flo = jnp.maximum(g["d0"] + g["slope"] * t, 0.0)
        return jnp.where(g["is_sph"], d_sph, d_flo)

    def estimate(t, with_glow, with_gobj=False):
        closest = jnp.full(shape, _BIG, jnp.float32)
        idx = jnp.zeros(shape, jnp.int32)
        glowing = jnp.full(shape, _BIG, jnp.float32) if with_glow else None
        gobj = (jnp.zeros(shape, jnp.int32)
                if (with_glow and with_gobj) else None)
        for j, g in enumerate(geom):
            d = dist_at(g, t)
            closer = ~g["skip"] & (d < closest)
            closest = jnp.where(closer, d, closest)
            idx = jnp.where(closer, jnp.int32(j), idx)
            if with_glow:
                glow = d * g["gd"]
                gupd = ~g["skip"] & (glow > 0.0) & (glow < glowing)
                glowing = jnp.where(gupd, glow, glowing)
                if gobj is not None:
                    gobj = jnp.where(gupd, jnp.int32(j), gobj)
        return closest, idx, glowing, gobj

    done0 = (~active).astype(jnp.int32)
    travel0 = jnp.zeros(shape, jnp.float32)
    fd0 = jnp.zeros(shape, jnp.float32)
    it0 = jnp.zeros(shape, jnp.int32)
    if not need_glow:
        # NEVER-CONVERGES fast path (see docstring): min forward distance
        # per object over [0, inf) — perp - r past the closest approach,
        # current distance if behind (spheres); floors clear only when not
        # descending toward them.
        clear = jnp.ones(shape, bool)
        for g in geom:
            perp = jnp.sqrt(g["perp2"])
            w0 = jnp.sqrt(g["perp2"] + g["s_star"] * g["s_star"])
            dmin_s = jnp.where(g["s_star"] > 0.0, perp, w0) - g["r"]
            dmin_f = jnp.where(g["slope"] >= 0.0, g["d0"], -_BIG)
            dmin = jnp.where(g["is_sph"], dmin_s, dmin_f)
            clear = clear & (g["skip"] | (dmin > 2.0 * eps))
        resolved = active & clear
        done0 = jnp.maximum(done0, resolved.astype(jnp.int32))
        travel0 = jnp.where(resolved, far, travel0)
        fd0 = jnp.where(resolved, far, fd0)
        it0 = jnp.where(resolved, jnp.int32(1), it0)

    # done carried as int32 (1 = done): Mosaic fails to legalize while_loops
    # with vector-of-i1 carries ('scf.yield' legalization error).
    state = (
        travel0,
        it0,
        jnp.full(shape, _BIG, jnp.float32),      # min glow
        fd0,
        jnp.zeros(shape, jnp.int32),             # idx
        done0,
    )
    if not need_glow:
        state = state[:2] + state[3:]            # drop the min-glow slot

    def unpack(s):
        if need_glow:
            return s[:6]
        travel, it, fd, idx, done = s[:5]
        return travel, it, None, fd, idx, done

    if record_glow:
        state = state + (
            jnp.zeros(shape, jnp.float32),        # glow argmin travel
            jnp.zeros(shape, jnp.int32),          # glow argmin object
            jnp.full(shape, -1, jnp.int32),       # glow argmin step (pre-inc)
        )
    n_core = 6 if need_glow else 5

    def once(s):
        travel, it, mind, fd, idx, done = unpack(s)
        dist, i, glow, gobj = estimate(travel, need_glow, record_glow)
        live = done == 0
        new_it = it + 1
        stop = (dist < eps) | (dist > far) | (new_it > cap)
        out = (
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
            g_t, g_o, g_i = s[6:]
            out = out + (
                jnp.where(gupd, travel, g_t),
                jnp.where(gupd, gobj, g_o),
                jnp.where(gupd, it, g_i),
            )
        return out

    chunk = max(1, cfg.pallas_march_chunk)

    def steps(s):
        for _ in range(chunk):
            s = once(s)
        return s

    def body(s):
        if cfg.march_floor_skip:
            s = _floor_tail(cfg, geom, estimate, s, record_glow, need_glow)
            # The closed form resolves every floor-winner lane at once — on
            # the default scene most tiles (sky, open floor) finish right
            # here, so gate the chunk of masked step-by-step iterations on
            # a lane still being live.
            s = _tile_cond(jnp.min(s[n_core - 1]) == 0, steps, s)
        else:
            s = steps(s)
        return s

    state = lax.while_loop(lambda s: jnp.min(s[n_core - 1]) == 0, body, state)
    travel, it, mind, fd, idx, _done = unpack(state)
    if mind is None:
        mind = jnp.full(shape, _BIG, jnp.float32)
    res = MarchResult(
        final_dist=fd, idx=idx, pos=init_pos + eye * travel, iter=it,
        travel_dist=travel, min_dist=mind,
    )
    if record_glow:
        g_t, g_o, g_i = state[6:]
        res = res._replace(glow_pos=init_pos + eye * g_t, glow_iter=g_i)
        return res, g_o
    return res


def _march_single_fori(ks: _KernelScene, cfg: RenderConfig, init_pos: Vec3,
                       eye: Vec3, ig, active, record_glow: bool,
                       need_glow: bool) -> MarchResult:
    """Position-based march for the fori_loop scene regime (>64 objects):
    the scene sweep reads the SMEM table at traced indices
    (ks.distance_estimate), so per-object ray constants cannot be
    precomputed and the floor-tail shortcut does not apply."""
    shape = jnp.shape(init_pos.x)
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

    def body(s):
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


def _floor_tail(cfg: RenderConfig, geom, estimate, s,
                record_glow: bool, need_glow: bool = True):
    """Closed-form PARTIAL resolution of a floor-winner march tail (see
    ``cfg.march_floor_skip``), over the ray-parametric state.

    While the nearest object is a floor, the evaluated distances form
    ``h_k = h * rho^k`` with ``rho = 1 + e.n`` (each step moves ``h_k``
    along the ray, changing the floor distance by ``h_k * e.n``):

    * rho < 1: hits at the first k with h_k < eps;
    * rho > 1: escapes at the first k with h_k > far;
    * either way the iteration cap (render.rs:1255) bounds k;
    * travel is the geometric sum, the final position one step past the
      stopping evaluation (mirroring the update-then-check loop order);
    * the glow channel's sampled minimum over the resolved samples is found
      in closed form: per object the distance along the ray is unimodal in
      travel, so the discrete argmin over the geometric sample points is at
      the endpoints or the two samples bracketing the continuous argmin —
      four candidate evaluations replace up to 10^4 steps. (Within the
      resolved segment every non-winner distance stays above the winner
      floor's distance > 0, so the ``glow > 0`` filter never clips a
      candidate interval.)

    The closed form is valid exactly while the floor REMAINS the SDF
    winner. With ``a = rho - 1`` the floor's distance along the tail is the
    affine ``h + a*s`` and each other object's distance along the ray is
    convex (spheres) or affine (floors), so the first travel offset where
    an object would tie the floor — ``s_break`` — is a closed-form root
    (quadratic / linear). The tail is resolved only over samples strictly
    inside ``[0, s_break)``: lanes whose geometric stop lands inside finish
    outright; lanes interrupted by an approaching object FAST-FORWARD to
    the boundary and hand back to the step-by-step loop, still skipping the
    long geometric crawl (horizon-grazing rays have tiny ``|a|`` and
    distant interlopers, so their thousands-of-step tails resolve in one or
    two fast-forwards). Every resolved sample equals the step-by-step
    loop's sample exactly (up to f32 rounding), on BOTH branches — the
    round-4 check compared objects against the initial ``h`` only, which
    was unsound for rho > 1 (ADVICE r4, high).

    ``need_glow=False`` adds a decision-only relaxation for escape lanes:
    when every other object clears the whole undisturbed tail by > 2*eps, a
    mid-tail winner switch cannot change any consumed output — the lane
    cannot converge anywhere, so it exits by travel>far or the iteration
    cap, and shadow ``lit`` / primary hit decisions coincide for all three
    exits.
    """
    if need_glow:
        travel, it, mind, fd, idx, done = s[:6]
    else:
        travel, it, fd, idx, done = s[:5]
        mind = None
    shape = jnp.shape(travel)
    live = done == 0
    eps = np.float32(cfg.march_eps)
    far = np.float32(cfg.far_away)
    cap = np.int32(cfg.march_max_iter)
    T = travel

    # fresh winner sweep at the current travel (one extra scene sweep per
    # while trip — ~1/chunk overhead)
    h, win, _, _ = estimate(T, False)

    # pass 1 over objects: winner kind; rho = 1 + e.n_win = 1 + slope_win
    win_is_floor = jnp.zeros(shape, bool)
    rho = jnp.ones(shape, jnp.float32)
    for j, g in enumerate(geom):
        is_win_floor = (win == jnp.int32(j)) & ~g["is_sph"]
        win_is_floor = win_is_floor | is_win_floor
        rho = jnp.where(is_win_floor, 1.0 + g["slope"], rho)

    pre = (live & win_is_floor & (h > eps) & (h < far) & (rho > 1e-6))

    # --- undisturbed geometric stop step (0-based stopping evaluation) -----
    rho_s = jnp.where(pre, rho, 0.5)
    h_s = jnp.where(pre, h, 1.0)
    log_rho = jnp.log(rho_s)
    lr_ok = jnp.abs(log_rho) > 1e-7
    lr_s = jnp.where(lr_ok, log_rho, 1.0)
    k_hit = jnp.ceil((jnp.log(eps) - jnp.log(h_s)) / lr_s)
    k_esc = jnp.ceil((jnp.log(far) - jnp.log(h_s)) / lr_s)
    k_geo = jnp.where(rho_s < 1.0, k_hit, k_esc)
    k_cap = (cap - it).astype(jnp.float32)
    k_stop = jnp.where(lr_ok, jnp.minimum(k_geo, k_cap), k_cap)
    k_stop = jnp.maximum(k_stop, 0.0)

    geo_ok = jnp.abs(1.0 - rho_s) > 1e-6
    a = rho_s - 1.0

    def s_of(i_f):
        """travel offset of sample i (= sum of the first i step lengths)."""
        rho_i = jnp.exp(i_f * log_rho)
        return h_s * jnp.where(geo_ok, (1.0 - rho_i) / (1.0 - rho_s), i_f)

    # full undisturbed tail horizon (for the clearance check's range)
    S_stop = s_of(k_stop + 1.0)

    # pass 2 over objects: winner-stability break point (see docstring)
    quad_ok = jnp.abs(a) < 0.99
    a_q = jnp.where(quad_ok, a, 0.0)
    A2 = jnp.maximum(1.0 - a_q * a_q, 1e-4) * 2.0
    s_break = jnp.full(shape, _BIG, jnp.float32)
    for j, g in enumerate(geom):
        s_rel = g["s_star"] - T
        wlen2 = g["perp2"] + s_rel * s_rel
        r = g["r"]
        rh = r + h
        # sphere root: (1-a^2) s^2 - 2(s_rel + a*rh) s + (wlen2 - rh^2) = 0
        B = -2.0 * (s_rel + a_q * rh)
        C = wlen2 - rh * rh
        D = B * B - 2.0 * A2 * C
        sqrtD = jnp.sqrt(jnp.maximum(D, 0.0))
        r_lo = (-B - sqrtD) / A2
        r_hi = (-B + sqrtD) / A2
        sb_sph = jnp.where(
            (D >= 0.0) & quad_ok,
            jnp.where(r_lo > 0.0, r_lo,
                      jnp.where(r_hi > 0.0, 0.0, _BIG)),
            jnp.where(quad_ok, _BIG, 0.0),
        )
        # floor root: (d0_rel - h) + (slope - a) s = 0
        d0_rel = g["d0"] + g["slope"] * T
        sl_a = g["slope"] - a
        sb_flo = jnp.where(
            d0_rel > h,
            jnp.where(sl_a >= 0.0, _BIG,
                      (d0_rel - h) / jnp.maximum(-sl_a, 1e-12)),
            0.0,
        )
        sb_j = jnp.where(g["is_sph"], sb_sph, sb_flo)
        if not need_glow:
            # decision-only clearance over [0, S_stop] (escape lanes)
            dS = jnp.sqrt(g["perp2"]
                          + (S_stop - s_rel) * (S_stop - s_rel))
            w0 = jnp.sqrt(wlen2)
            interior = (s_rel > 0.0) & (s_rel < S_stop)
            d_min_s = jnp.minimum(
                jnp.minimum(w0, dS),
                jnp.where(interior, jnp.sqrt(g["perp2"]), _BIG),
            ) - r
            d_min_f = jnp.minimum(d0_rel, d0_rel + g["slope"] * S_stop)
            d_min = jnp.where(g["is_sph"], d_min_s, d_min_f)
            clear = (a > 0.0) & (d_min > 2.0 * eps)
            sb_j = jnp.where(clear, _BIG, sb_j)
        skip_j = (win == jnp.int32(j)) | g["skip"]
        s_break = jnp.minimum(s_break, jnp.where(skip_j, _BIG, sb_j))

    # largest sample index with s_of(k) strictly inside the safe zone:
    # s_of(k) < s_break  <=>  rho^k `vs` 1 + s_break*a/h (direction by the
    # sign of log rho)
    arg2 = 1.0 + s_break * a / h_s
    arg2_ok = arg2 > 0.0
    k_bound = jnp.where(
        lr_ok,
        jnp.where(arg2_ok,
                  jnp.log(jnp.where(arg2_ok, arg2, 1.0)) / lr_s,
                  jnp.where(a < 0.0, np.float32(3e7), 0.0)),
        s_break / h_s,
    )
    k_safe = jnp.ceil(jnp.minimum(k_bound, 3e7)) - 1.0

    done2 = k_stop <= k_safe
    progress = done2 | (k_safe >= 1.0)
    applicable = pre & progress

    kf = jnp.maximum(jnp.where(done2, k_stop, k_safe), 0.0)
    k_i = kf.astype(jnp.int32)
    kf = k_i.astype(jnp.float32)

    rho_k = jnp.exp(kf * log_rho)
    m_f = kf + 1.0
    S = h_s * jnp.where(geo_ok, (1.0 - rho_k * rho_s) / (1.0 - rho_s), m_f)
    fd2 = h_s * rho_k
    travel2 = travel + S
    it2 = it + k_i + 1

    def pick(new, old):
        return jnp.where(applicable, new, old)

    out = (pick(travel2, travel), pick(it2, it))

    if need_glow:
        # --- glow channel over the resolved tail samples --------------------
        best_v = jnp.full(shape, _BIG, jnp.float32)
        best_i = jnp.zeros(shape, jnp.float32)
        best_j = jnp.zeros(shape, jnp.int32)
        for j, g in enumerate(geom):
            gd = g["gd"]
            s_star_rel = jnp.clip(g["s_star"] - T, 0.0, S)
            # sample index whose travel offset is nearest the continuous
            # argmin
            arg = 1.0 - s_star_rel * (1.0 - rho_s) / h_s
            i_star = jnp.where(
                geo_ok,
                jnp.log(jnp.maximum(arg, 1e-30)) / lr_s,
                s_star_rel / h_s,
            )
            i1 = jnp.clip(jnp.floor(i_star), 0.0, kf)
            for i_c in (jnp.zeros(shape, jnp.float32), i1,
                        jnp.minimum(i1 + 1.0, kf), kf):
                t_c = T + s_of(i_c)
                dt = t_c - g["s_star"]
                d_sph = jnp.maximum(
                    jnp.sqrt(g["perp2"] + dt * dt) - g["r"], 0.0)
                d_flo = jnp.maximum(g["d0"] + g["slope"] * t_c, 0.0)
                d_c = jnp.where(g["is_sph"], d_sph, d_flo)
                g_c = d_c * gd
                ok_c = (g_c > 0.0) & ~g["skip"]
                upd = ok_c & (g_c < best_v)
                best_v = jnp.where(upd, g_c, best_v)
                best_i = jnp.where(upd, i_c, best_i)
                best_j = jnp.where(upd, jnp.int32(j), best_j)

        gupd = applicable & (best_v < mind)
        out = out + (jnp.where(gupd, best_v, mind),)

    out = out + (
        pick(fd2, fd), pick(win, idx),
        # partial fast-forwards (k_safe binds) leave the lane LIVE at its
        # advanced position; only a geometric/cap stop inside the safe zone
        # finishes it
        jnp.maximum(done, (applicable & done2).astype(jnp.int32)),
    )
    if record_glow:
        g_t, g_o, g_i = s[6:]
        out = out + (
            jnp.where(gupd, T + s_of(best_i), g_t),
            jnp.where(gupd, best_j, g_o),
            jnp.where(gupd, it + best_i.astype(jnp.int32), g_i),
        )
    else:
        out = out + tuple(s[(6 if need_glow else 5):])
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
        # Tile-level divergence skip (same as the trace kernel's _shading):
        # the refraction sub-march only contributes where a transparent
        # material was hit; tiles with no such live lane skip the whole
        # sub-trace. Exact — lanes with f == 0 discard fc2 in the blend
        # below, and inactive f > 0 lanes are discarded by the caller's
        # shaded mask.
        fc2 = _tile_cond(
            jnp.any(sub_active),
            lambda _z: _raymarch(ks, cfg, pt3, ray, nest, idx, sub_flags,
                                 sub_active),
            Color.zero(jnp.shape(f)),
        )
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
        shaded = active & hit

        # Tile-level skip of the whole shading/reflect body: pure-sky tiles
        # (no hit anywhere) and settled tiles on later laps (every surviving
        # lane is a bg-re-adding miss) pay one condition check instead of
        # the gather + shadow march + pattern + reflect chain. Exact: every
        # skipped op is fully masked by ``shaded``/``upd`` anyway.
        def lap_work(carry, res=res, hit=hit, pt=pt, shaded=shaded,
                     lev_i=lev_i):
            (rr, rg, rb, fr, fg, fb, px, py, pz, ex, ey, ez, fl, igv,
             _ch) = carry
            ret_c = Color(rr, rg, rb)
            fcs_c = Color(fr, fg, fb)
            eye_c = Vec3(ex, ey, ez)
            fields = ks.gather(res.idx)
            n = ks.normal_at(fields, pt)
            face = _shading(ks, cfg, res.idx, fields, n, pt, eye_c, lev_i,
                            shaded)
            ret2, fcs2 = _accumulate(ret_c, fcs_c, face, fields.specular,
                                     shaded, fl)
            cont_hit = (
                hit
                & (res.idx != 0)
                & (fcs2.sum() > 0.1)
                & (lev_i < cfg.raymarch_max_reflections)
            )
            upd = shaded & cont_hit
            pos2, eye2, fl2, ig2 = _reflect_update(
                Vec3(px, py, pz), eye_c, fl, igv, pt, n, res.idx, upd)
            return (ret2.r, ret2.g, ret2.b, fcs2.r, fcs2.g, fcs2.b,
                    pos2.x, pos2.y, pos2.z, eye2.x, eye2.y, eye2.z,
                    fl2, ig2, cont_hit.astype(jnp.int32))

        carry = (ret.r, ret.g, ret.b, fcs.r, fcs.g, fcs.b,
                 pos.x, pos.y, pos.z, eye.x, eye.y, eye.z,
                 flags, ig, jnp.zeros(shape, jnp.int32))
        carry = _tile_cond(jnp.any(shaded), lap_work, carry)
        (rr, rg, rb, fr, fg, fb, px, py, pz, ex, ey, ez, flags, ig,
         ch_i) = carry
        ret = Color(rr, rg, rb)
        fcs = Color(fr, fg, fb)
        pos = Vec3(px, py, pz)
        eye = Vec3(ex, ey, ez)
        cont_hit = ch_i != 0

        miss = active & ~hit
        bg = bg_fn(ks.light, eye)
        ret = Color(
            ret.r + jnp.where(miss, bg.r * fcs.r, 0.0),
            ret.g + jnp.where(miss, bg.g * fcs.g, 0.0),
            ret.b + jnp.where(miss, bg.b * fcs.b, 0.0),
        )

        cont = active & (cont_hit | ~hit)
        upd = active & cont_hit
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
                 tile_cols: int, col_grid: bool, use_gtbl: bool = False):
    def kernel(f32_ref, i32_ref, cam_ref, light_ref, org_ref, *rest):
        gtbl = None
        if use_gtbl:
            gtbl = rest[0]
            rest = rest[1:]
        r_ref, g_ref, b_ref = rest[0:3]
        ks = _KernelScene(f32_ref, i32_ref, light_ref, n_objects, gtbl=gtbl)
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
    tile_rows = cfg.pallas_march_rows
    grid, out_spec, (h_pad, w_pad), tile_cols, col_grid = fwd_grid_spec(
        cfg.with_(pallas_cols=cfg.pallas_march_cols,
                  pallas_rows=cfg.pallas_march_rows), (h, w))
    n = scene.objects.count

    f32t, i32t, cam, light = _pack_scene(scene)
    if origin is None:
        org = jnp.zeros((1, 2), jnp.int32)
    else:
        org = jnp.stack(
            [jnp.asarray(origin[0]), jnp.asarray(origin[1])]
        ).astype(jnp.int32).reshape(1, 2)
    from .pallas_trace import _KERNEL_UNROLL_MAX, _pack_gather_table

    use_gtbl = n > _KERNEL_UNROLL_MAX
    kernel = _make_kernel(cfg, n, tile_rows, tile_cols, col_grid,
                          use_gtbl=use_gtbl)

    out_shape = jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    in_specs = [smem(), smem(), smem(), smem(), smem()]
    inputs = [f32t, i32t, cam, light, org]
    if use_gtbl:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)]
        inputs += [_pack_gather_table(scene)]
    r, g, b = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec,) * 3,
        out_shape=(out_shape,) * 3,
        interpret=interpret,
    )(*inputs)

    if h_pad != h or w_pad != w:
        r, g, b = r[:h, :w], g[:h, :w], b[:h, :w]
    return Color(r, g, b)
