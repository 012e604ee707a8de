"""Site-reparameterized fused backward kernel for the Whitted trace.

The round-3 backward kernel (ops/pallas_trace.py:_make_bwd_kernel) re-traces
the whole program under ``jax.vjp``, so the differentiated code contains every
N-object raycast min-loop — O(N) compare-selects *and their transposes* at
every one of the ~11 raycast sites — and cannot cover textures (the chunk
gather rides a ``while_loop``) or >64 objects (per-object scalar args must
unroll). This kernel removes all three limits with one idea:

**the nearest hit's t is an explicit function of the winner's own fields.**

At the winner, the min-reduce's result equals ``object_candidate_t`` of the
winning object evaluated with ``t_running = +inf`` (a strictly-closer
candidate would have beaten it; root selection inside the candidate is
unaffected because the near root bounds the far root). The argmin itself is
piecewise-constant in the scene parameters — exactly the subgradient contract
the jnp path already implements by differentiating only through the winning
object (ops/gather.py). So the backward splits into three phases, all inside
one kernel invocation per tile:

1. **Record** (primal, non-differentiable): run the trace exactly like the
   forward kernel — fori_loop raycasts for any object count, while-loop
   texture-chunk gathers, tile-level early exits — and record per hit-site:
   the winner index, masks (hit/lit/flags), the winner's 19 table fields, and
   the four packed texture taps. Also classifies the tile (terminal /
   reflective / refractive), folding the old separate probe pass into the
   recording pass.
2. **Replay** (differentiable): re-run the trace with the recorded winner
   fields as ``jax.vjp`` arguments: ``t`` is recomputed from the winner's
   fields, shadows use the recorded lit mask (boolean — no gradient, same as
   the jnp path), texture taps are recorded constants with only the bilinear
   weight chain (uv -> fu/fv) differentiated (texels are u8 — no gradient
   exists), and the refraction tree follows the recorded site structure. The
   differentiated program contains NO raycast loops — its size is O(sites),
   independent of the object count.
3. **Scatter**: reduce each site's field cotangents into the per-object table
   by recorded winner index (masked sums — the in-kernel transpose of the
   gather), plus camera/light reductions; one small (N+1, 128) block
   accumulates across the grid.

Tile pruning (``cfg.pallas_bwd_prune``) dispatches one of three
pre-differentiated replay variants from the recorded classification, as
before; variants consume a prefix of the recorded sites and are exactly equal
on the tiles they serve (the pruned work is fully masked in the full
program).

Reference: the backward of src/render.rs:1142-1224 (raytrace), 1020-1140
(shading), 249-316 (texture lookup) — which is *not differentiable at all*;
the gradient contract follows SURVEY.md §7 stage 5.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..models.scene import KIND_SPHERE, Scene
from ..models.vec import Color, Vec3
from .intersect import F32_EPSILON, INONLY, OUTONLY, object_candidate_t
from .sky import get_bg
from .texture import get_uv
from .trace import _accumulate
from .pallas_trace import (
    _BIG,
    _F32_COLS,
    _KernelScene,
    _Rows,
    _pack_scene,
    _pack_textures,
    _pattern_diffuse,
    _powf,
    _tex_blend,
    _tile_cond,
    _tile_origin,
    _tile_rays,
    pallas_supported,
)

__all__ = ["render_color_pallas_grads_site"]

_N_INT = 7  # idx, hit, flags, lit, kind, uvmap, pattern
_N_TEX = 8  # p00, p10, p01, p11, wf, hf (f32); bilin, want (i32)


# --------------------------------------------------------------------------
# static site layout: one node per raycast site of the unrolled ray tree,
# ids allocated in phase-1 execution order (site before its refraction
# subtree), so variants consume a prefix of each level.
# --------------------------------------------------------------------------
class _Node(NamedTuple):
    sid: int
    children: tuple


def _unroll_cap(cfg: RenderConfig) -> int:
    cap = cfg.max_refractions
    if cfg.refraction_unroll is not None:
        cap = min(cap, cfg.refraction_unroll)
    return cap


def _site_nodes(cfg: RenderConfig, lev: int = 0, counter=None):
    if counter is None:
        counter = [0]
    nodes = []
    cap = _unroll_cap(cfg)
    for step in range(max(1, cfg.max_reflections - lev)):
        lev_i = lev + 1 + step
        sid = counter[0]
        counter[0] += 1
        children = (
            _site_nodes(cfg, lev_i, counter) if lev_i < cap else ()
        )
        nodes.append(_Node(sid, children))
    return tuple(nodes)


def _count_sites(nodes) -> int:
    return sum(1 + _count_sites(n.children) for n in nodes)


def _consumed_sids(nodes, vcfg: RenderConfig, lev: int = 0, out=None):
    """Site ids a replay variant actually walks (prefix of each level)."""
    if out is None:
        out = []
    cap = _unroll_cap(vcfg)
    for step, node in enumerate(nodes[: max(1, vcfg.max_reflections - lev)]):
        lev_i = lev + 1 + step
        out.append(node.sid)
        if node.children and lev_i < cap:
            _consumed_sids(node.children, vcfg, lev_i, out)
    return out


# --------------------------------------------------------------------------
# phase 1: record
# --------------------------------------------------------------------------
def _raw_to_f19(raw: dict):
    """gather_raw dict -> 19-tuple in the _F32_COLS table column order (so
    scatter indices ARE table columns)."""
    return (
        raw["org"].x, raw["org"].y, raw["org"].z,
        raw["normal"].x, raw["normal"].y, raw["normal"].z,
        raw["diffuse"].r, raw["diffuse"].g, raw["diffuse"].b,
        raw["specular"].r, raw["specular"].g, raw["specular"].b,
        raw["pn"], raw["transparency"], raw["refraction"],
        raw["pattern_scale"], raw["pattern_angle_scale"],
        raw["radius"], raw["glow_dist"],
    )


def _zero_rec(shape, textured: bool):
    zf = lambda: jnp.zeros(shape, jnp.float32)  # noqa: E731
    zi = lambda: jnp.zeros(shape, jnp.int32)  # noqa: E731
    f19 = tuple(zf() for _ in range(_F32_COLS))
    ints = tuple(zi() for _ in range(_N_INT))
    tex = ((zf(),) * 6 + (zi(), zi())) if textured else ()
    return (f19, ints, tex)


def _zero_recs(nodes, shape, textured: bool) -> dict:
    out = {}
    for n in nodes:
        out[n.sid] = _zero_rec(shape, textured)
        out.update(_zero_recs(n.children, shape, textured))
    return out


def _p1_trace(ks: _KernelScene, cfg: RenderConfig, textured: bool, nodes,
              vi: Vec3, eye: Vec3, flags, ig, active, lev: int, top: bool):
    """Primal recording recursion. ``lev`` mirrors _raytrace's static level."""
    shape = jnp.shape(eye.x)
    fcs = Color.full(1.0, 1.0, 1.0, shape)
    zero_i = jnp.zeros(shape, jnp.int32)
    recs = {}
    anyr = jnp.int32(0)
    cont1 = jnp.int32(0)

    state = (vi, eye, flags, ig, fcs, active.astype(jnp.int32), anyr)

    for step, node in enumerate(nodes):
        lev_i = lev + 1 + step

        def step_fn(st, node=node, lev_i=lev_i):
            (vi, eye, flags, ig, fcs, active_i, anyr), _rec = st
            active = active_i != 0
            t, idx = ks.raycast(vi, eye, ig, flags)
            hit = jnp.isfinite(t)
            shaded = active & hit
            t_safe = jnp.where(hit, t, 0.0)
            pt = vi + eye * t_safe
            raw = ks.gather_raw(idx)
            sphere_n = (pt - raw["org"]).normalized()
            n = sphere_n.where(raw["kind"] == KIND_SPHERE, raw["normal"])

            # shadow (render.rs:1048-1082) — recorded as a boolean only
            light = ks.light
            shadow_org = pt + light * F32_EPSILON
            t_s, i_s = ks.raycast(shadow_org, light.broadcast_to(pt.shape),
                                  idx, zero_i)
            btrans = ks.gather_scalar(i_s, 13)  # blocker transparency col
            lit = ~jnp.isfinite(t_s) | (btrans > 0.0)

            texrec = ()
            if textured:
                u, v = get_uv(pt - raw["org"], raw["uvmap"],
                              raw["pattern_scale"],
                              raw["pattern_angle_scale"])
                want = (raw["tid"] >= 0) & shaded
                taps = ks.fetch_taps(raw["tid"], u, v, want)
                texrec = (*taps[:6], taps[6], want.astype(jnp.int32))

            site_rec = (
                _raw_to_f19(raw),
                (idx, hit.astype(jnp.int32), flags, lit.astype(jnp.int32),
                 raw["kind"], raw["uvmap"], raw["pattern"]),
                texrec,
            )

            child_recs = _zero_recs(node.children, shape, textured)
            if node.children:
                f = raw["transparency"]
                sp = eye.dot(n)
                fracn = raw["refraction"]
                fracn_safe = jnp.where(
                    (f > 0.0) & (jnp.abs(fracn) > 1e-6), fracn, 1.0
                )
                bend = sp * (jnp.where(sp > 0.0, fracn_safe,
                                       1.0 / fracn_safe) - 1.0)
                ray = (eye + Vec3(n.x * bend, n.y * bend,
                                  n.z * bend)).normalized()
                pt3 = pt + ray * F32_EPSILON
                sub_flags = jnp.where(sp < 0.0, OUTONLY, INONLY).astype(
                    jnp.int32)

                def sub_fn(zrecs, node=node, pt3=pt3, ray=ray,
                           sub_flags=sub_flags, idx=idx, f=f, lev_i=lev_i):
                    sub_recs, _, _ = _p1_trace(
                        ks, cfg, textured, node.children, pt3, ray,
                        sub_flags, idx, f > 0.0, lev_i, False
                    )
                    return sub_recs

                # same tile-level skip condition as the forward kernel
                # (pallas_trace._shading: any transparent hit in the tile)
                child_recs = _tile_cond(jnp.any(f > 0.0), sub_fn, child_recs)

            if top:
                anyr = jnp.maximum(
                    anyr,
                    jnp.any(shaded & (raw["transparency"] > 0.0)).astype(
                        jnp.int32),
                )

            # throughput + terminations (same masks as _raytrace)
            _zero = Color.zero(shape)
            _, fcs = _accumulate(_zero, fcs, _zero, raw["specular"], shaded,
                                 flags)
            cont = (shaded & (idx != 0) & (fcs.sum() > 0.1)
                    & (lev_i < cfg.max_reflections))
            from .trace import _reflect_update

            vi2, eye2, flags2, ig2 = _reflect_update(vi, eye, flags, ig, pt,
                                                     n, idx, cont)
            return ((vi2, eye2, flags2, ig2, fcs, cont.astype(jnp.int32),
                     anyr),
                    (site_rec, child_recs))

        rec_zero = (_zero_rec(shape, textured),
                    _zero_recs(node.children, shape, textured))
        if step > 0:
            # tile-level skip of dead bounces — primal-only, so the
            # while-based skip is fine here (unlike the replay).
            state, (site_rec, child_recs) = _tile_cond(
                jnp.max(state[5]) > 0, step_fn, (state, rec_zero)
            )
        else:
            state, (site_rec, child_recs) = step_fn((state, rec_zero))

        recs[node.sid] = site_rec
        recs.update(child_recs)
        if top and step == 0:
            cont1 = jnp.max(state[5])

    return recs, state[6], cont1


# --------------------------------------------------------------------------
# phase 2: differentiable replay
# --------------------------------------------------------------------------
class _SiteFields:
    """View of a site's 19-field vjp argument tuple (table column order)."""

    def __init__(self, t):
        self.org = Vec3(t[0], t[1], t[2])
        self.normal = Vec3(t[3], t[4], t[5])
        self.diffuse = Color(t[6], t[7], t[8])
        self.specular = Color(t[9], t[10], t[11])
        self.pn = t[12]
        self.transparency = t[13]
        self.refraction = t[14]
        self.pattern_scale = t[15]
        self.pattern_angle_scale = t[16]
        self.radius = t[17]
        self.glow_dist = t[18]


class _KdFields(NamedTuple):
    diffuse: Color
    pattern: jnp.ndarray


def _p2_replay(vcfg: RenderConfig, nodes, recs: dict, sargs, light: Vec3,
               bg_fn, vi: Vec3, eye: Vec3, lev: int, active) -> Color:
    """Differentiable replay of the trace over recorded sites (mirrors
    pallas_trace._raytrace/_shading with raycasts replaced by the winner-t
    recompute and recorded masks)."""
    shape = jnp.shape(eye.x)
    fcs = Color.full(1.0, 1.0, 1.0, shape)
    ret = Color.zero(shape)
    active = jnp.broadcast_to(active, shape)
    cap = _unroll_cap(vcfg)
    inf_t = jnp.full(shape, _BIG, jnp.float32)

    for step, node in enumerate(nodes[: max(1, vcfg.max_reflections - lev)]):
        lev_i = lev + 1 + step
        _, ints, tex = recs[node.sid]
        idx_r, hit_i, flags_r, lit_i, kind_r, uvmap_r, pattern_r = ints
        sa = _SiteFields(sargs[node.sid])
        hit = hit_i != 0

        # winner-t recompute: equals the min-reduce's result at the winner
        # (see module docstring); guarded branches keep the backward NaN-free
        # on non-hit lanes.
        t_w = object_candidate_t(kind_r, sa.org, sa.radius, sa.normal, vi,
                                 eye, inf_t, flags_r)
        t_safe = jnp.where(hit, t_w, 0.0)
        pt = vi + eye * t_safe
        if vcfg.grad_distance_cutoff is not None:
            near = t_safe < vcfg.grad_distance_cutoff
            pt = pt.where(near, Vec3(*(lax.stop_gradient(c) for c in pt)))
        sphere_n = (pt - sa.org).normalized()
        n = sphere_n.where(kind_r == KIND_SPHERE, sa.normal)
        shaded = active & hit

        # shading (render.rs:1020-1090) with the recorded lit mask
        li = light.dot(n)
        ln2 = 2.0 * li
        rtl = Vec3(n.x * ln2, n.y * ln2, n.z * ln2) - light
        di = jnp.maximum(li, 0.0)
        ri = -rtl.dot(eye)
        ri_safe = jnp.where(ri > 0.0, ri, 1.0)
        refl_int = jnp.where((sa.pn != 0.0) & (ri > 0.0),
                             _powf(ri_safe, sa.pn), 0.0)
        lit = lit_i != 0
        k1 = jnp.where(lit, jnp.minimum(0.2 + di, 1.0), 0.2)
        k2 = jnp.where(lit, refl_int, 0.0)

        # Zero-recorded sites (skipped bounces) carry pattern_scale == 0;
        # u = x/ps then makes cot_ps = 0 * (-x/ps^2) = NaN even though every
        # consuming cotangent is masked off. Guard the divisors — identical
        # on real sites (materials have nonzero scales; a true zero is
        # degenerate in the reference too: u = x/0).
        ps_safe = jnp.where(sa.pattern_scale != 0.0, sa.pattern_scale, 1.0)
        pas_safe = jnp.where(sa.pattern_angle_scale != 0.0,
                             sa.pattern_angle_scale, 1.0)
        uv = get_uv(pt - sa.org, uvmap_r, ps_safe, pas_safe)
        kd = _pattern_diffuse(_KdFields(sa.diffuse, pattern_r), uv)
        if tex:
            # recorded taps are constants; only the uv->weight chain
            # differentiates (texels are u8 — no gradient exists)
            taps = tex[:7]
            want_i = tex[7]
            tex_col = _tex_blend(taps, uv[0], uv[1])
            kd = tex_col.where(want_i != 0, kd)

        base = Color(kd.r * k1 + k2, kd.g * k1 + k2, kd.b * k1 + k2)

        if node.children and lev_i < cap:
            f = sa.transparency
            sp = eye.dot(n)
            fracn_safe = jnp.where(
                (f > 0.0) & (jnp.abs(sa.refraction) > 1e-6),
                sa.refraction, 1.0)
            bend = sp * (jnp.where(sp > 0.0, fracn_safe,
                                   1.0 / fracn_safe) - 1.0)
            ray = (eye + Vec3(n.x * bend, n.y * bend,
                              n.z * bend)).normalized()
            pt3 = pt + ray * F32_EPSILON
            fc2 = _p2_replay(vcfg, node.children, recs, sargs, light, bg_fn,
                             pt3, ray, lev_i, f > 0.0)
            blended = Color(
                (kd.r * k1 + k2) * (1.0 - f) + fc2.r * f,
                (kd.g * k1 + k2) * (1.0 - f) + fc2.g * f,
                (kd.b * k1 + k2) * (1.0 - f) + fc2.b * f,
            )
            face = blended.where(f > 0.0, base)
        else:
            face = base

        ret, fcs = _accumulate(ret, fcs, face, sa.specular, shaded, flags_r)

        miss = active & ~hit
        bg = bg_fn(light, eye)
        ret = Color(
            ret.r + jnp.where(miss, bg.r * fcs.r, 0.0),
            ret.g + jnp.where(miss, bg.g * fcs.g, 0.0),
            ret.b + jnp.where(miss, bg.b * fcs.b, 0.0),
        )

        cont = (shaded & (idx_r != 0) & (fcs.sum() > 0.1)
                & (lev_i < vcfg.max_reflections))
        # mirror bounce (render.rs:1199-1201); flags come from the next
        # site's record, so only the ray state updates here
        en2 = -2.0 * eye.dot(n)
        new_eye = eye + Vec3(n.x * en2, n.y * en2, n.z * en2)
        vi = pt.where(cont, vi)
        eye = new_eye.where(cont, eye)
        active = cont

    return ret


# --------------------------------------------------------------------------
# phase 3: scatter site cotangents into the object table
# --------------------------------------------------------------------------
def _basis_row(col: int):
    return (lax.broadcasted_iota(jnp.int32, (1, 128), 1) == col).astype(
        jnp.float32)


def _scatter_block(gsa, gc, gl, consumed, recs, n_objects: int,
                   rows_out: int):
    """Masked-sum transpose of the per-site winner gathers: block row i =
    object i's 19 field cotangents (table column order), row ``n_objects`` =
    camera(7) + light(3). glow_dist (col 18) is structurally zero for trace
    sites (XLA folds those sums away) but live for march glow sites."""
    rows = []
    for i in range(n_objects):
        per_f = [None] * _F32_COLS
        for sid in consumed:
            idx_r = recs[sid][1][0]
            m = idx_r == jnp.int32(i)
            for f in range(_F32_COLS):
                contrib = jnp.where(m, gsa[sid][f], 0.0)
                per_f[f] = contrib if per_f[f] is None else per_f[f] + contrib
        row = jnp.zeros((1, 128), jnp.float32)
        for f in range(_F32_COLS):
            row = row + jnp.sum(per_f[f]) * _basis_row(f)
        rows.append(row)

    cl = jnp.zeros((1, 128), jnp.float32)
    for k in range(7):
        cl = cl + jnp.sum(gc[k]) * _basis_row(k)
    for k in range(3):
        cl = cl + jnp.sum(gl[k]) * _basis_row(7 + k)
    rows.append(cl)

    pad = rows_out - (n_objects + 1)
    if pad:
        rows.append(jnp.zeros((pad, 128), jnp.float32))
    return jnp.concatenate(rows, axis=0)


# --------------------------------------------------------------------------
# kernel assembly
# --------------------------------------------------------------------------
def _make_site_bwd_kernel(cfg: RenderConfig, n_objects: int, tile_rows: int,
                          tile_cols: int, rows_out: int, col_grid: bool,
                          tex_meta=None):
    nodes = _site_nodes(cfg)
    textured = tex_meta is not None
    bg_fn = get_bg(cfg.bg)

    if cfg.pallas_bwd_prune and cfg.max_reflections > 1:
        variants = [
            cfg.with_(max_reflections=1, refraction_unroll=0),
            cfg.with_(refraction_unroll=0),
            cfg,
        ]
    else:
        variants = None

    def kernel(f32_ref, i32_ref, cam_ref, light_ref, gr_ref, gg_ref, gb_ref,
               *rest):
        if textured:
            tbl_ref, meta_ref = rest[0], rest[1]
            tex = (tbl_ref, meta_ref) + tex_meta
            out_ref, pr_ref, pg_ref, pb_ref = rest[2:6]
        else:
            tex = None
            out_ref, pr_ref, pg_ref, pb_ref = rest[0:4]

        shape = (tile_rows, tile_cols)
        ks = _KernelScene(f32_ref, i32_ref, light_ref, n_objects, tex=tex)
        row0, col0 = _tile_origin(tile_rows, tile_cols, col_grid)
        vi0, eye0 = _tile_rays(cam_ref, cfg, tile_rows, tile_cols, row0, col0)

        recs, anyr, cont1 = _p1_trace(
            ks, cfg, textured, nodes, vi0, eye0,
            jnp.zeros(shape, jnp.int32), jnp.full(shape, -1, jnp.int32),
            jnp.ones(shape, bool), 0, True,
        )
        sargs_all = tuple(recs[sid][0] for sid in sorted(recs))

        camargs = tuple(jnp.broadcast_to(cam_ref[0, k], shape)
                        for k in range(7))
        lightargs = tuple(jnp.broadcast_to(light_ref[0, k], shape)
                          for k in range(3))
        g = (gr_ref[...], gg_ref[...], gb_ref[...])

        def grads_for(vcfg: RenderConfig):
            def tile_fn(sargs, camargs, lightargs):
                vi, eye = _tile_rays(_Rows((camargs,)), vcfg, tile_rows,
                                     tile_cols, row0, col0)
                light = Vec3(lightargs[0], lightargs[1], lightargs[2])
                out = _p2_replay(vcfg, nodes, recs, sargs, light, bg_fn, vi,
                                 eye, 0, jnp.ones(shape, bool))
                return out.r, out.g, out.b

            primal, vjpf = jax.vjp(tile_fn, sargs_all, camargs, lightargs)
            gsa, gc, gl = vjpf(g)
            block = _scatter_block(gsa, gc, gl,
                                   _consumed_sids(nodes, vcfg), recs,
                                   n_objects, rows_out)
            return (block,) + tuple(primal)

        if variants is None:
            state = grads_for(cfg)
        else:
            case = jnp.where(anyr > 0, jnp.int32(2),
                             jnp.where(cont1 > 0, jnp.int32(1), jnp.int32(0)))
            state = (
                jnp.zeros((rows_out, 128), jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
            )
            for case_id, vcfg in enumerate(variants):
                state = _tile_cond(case == jnp.int32(case_id),
                                   lambda _s, c=vcfg: grads_for(c), state)

        block, pr, pg, pb = state
        pr_ref[:], pg_ref[:], pb_ref[:] = pr, pg, pb

        # grid runs sequentially on one core: accumulate in the VMEM-resident
        # output block (constant index_map)
        first = pl.program_id(0) == 0
        if col_grid:
            first = first & (pl.program_id(1) == 0)
        out_ref[:] = jnp.where(first, 0.0, out_ref[:]) + block

    return kernel


def render_color_pallas_grads_site(scene: Scene, cfg: RenderConfig, g: Color,
                                   interpret: bool | None = None,
                                   return_primal: bool = False):
    """Scene cotangent via the site-reparameterized backward kernel. Covers
    everything the forward kernel covers (textures, fori_loop object counts) —
    ``pallas_supported`` is the support predicate.

    ``return_primal=True`` additionally returns the replay's own image (the
    forward whose exact derivative the cotangent is)."""
    if not pallas_supported(scene, cfg):
        raise ValueError("scene/config outside the fused kernel's support; "
                         "use the jnp VJP")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    h, w = cfg.yres, cfg.xres
    tile_rows = cfg.pallas_rows
    tile_cols = min(cfg.pallas_bwd_cols, w) if cfg.pallas_bwd_cols else w
    h_pad = ((h + tile_rows - 1) // tile_rows) * tile_rows
    w_pad = ((w + tile_cols - 1) // tile_cols) * tile_cols
    n = scene.objects.count
    rows_out = ((n + 1 + 7) // 8) * 8

    f32t, i32t, cam, light = _pack_scene(scene)

    def pad_hw(a):
        if h_pad != h or w_pad != w:
            return jnp.pad(a, ((0, h_pad - h), (0, w_pad - w)))
        return a

    gr, gg, gb = pad_hw(g.r), pad_hw(g.g), pad_hw(g.b)

    n_col_tiles = w_pad // tile_cols
    col_grid = n_col_tiles > 1
    if col_grid:
        grid = (h_pad // tile_rows, n_col_tiles)
        img_spec = pl.BlockSpec((tile_rows, tile_cols), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((rows_out, 128), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)
    else:
        grid = (h_pad // tile_rows,)
        img_spec = pl.BlockSpec((tile_rows, tile_cols), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((rows_out, 128), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)

    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    in_specs = [smem(), smem(), smem(), smem()] + [img_spec] * 3
    inputs = [f32t, i32t, cam, light, gr, gg, gb]
    tex_meta = None
    if scene.textures is not None:
        tbl, meta = _pack_textures(scene)
        tex_meta = (scene.textures.data.shape[0],
                    scene.textures.data.shape[2])
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM), smem()]
        inputs += [tbl, meta]

    kernel = _make_site_bwd_kernel(cfg, n, tile_rows, tile_cols, rows_out,
                                   col_grid, tex_meta)
    img_shape = jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32)
    partials, pr, pg, pb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec,) + (img_spec,) * 3,
        out_shape=(jax.ShapeDtypeStruct((rows_out, 128), jnp.float32),)
        + (img_shape,) * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ) if not interpret else None,
        interpret=interpret,
    )(*inputs)

    g_f32t = partials[:n, :_F32_COLS]
    g_cam = jnp.concatenate([partials[n, :7], jnp.zeros(1, jnp.float32)])
    g_cam = g_cam.reshape(1, 8)
    g_light = jnp.concatenate([partials[n, 7:10], jnp.zeros(1, jnp.float32)])
    g_light = g_light.reshape(1, 4)

    def pack_f32(s):
        ft, _, c, l = _pack_scene(s)
        return ft, c, l

    _, pvjp = jax.vjp(pack_f32, scene)
    (scene_ct,) = pvjp((g_f32t, g_cam, g_light))
    if return_primal:
        if h_pad != h or w_pad != w:
            pr, pg, pb = pr[:h, :w], pg[:h, :w], pb[:h, :w]
        return scene_ct, Color(pr, pg, pb)
    return scene_ct


# ==========================================================================
# March-mode site backward (render.rs:1299-1411 gradients)
#
# Same three-phase scheme, with the raycast winner-t recompute replaced by a
# NEWTON-STEP REPARAMETERIZATION of the sphere-traced hit: the march's
# converged t* is a root of the winner's SDF along the ray, so
#
#     t(p0, e, th) = stop(t*) - (D_w(p0 + e*stop(t*); th) - stop(D_w)) / ddt
#
# has value exactly t* and gradient exactly the implicit-function-theorem
# pullback dt* = -(grad_D . dp0 + t* grad_D . de + D_th dth) / (grad_D . e)
# (ops/march.py's closed-form implicit VJP, evaluated against the winner's
# recorded fields; ddt = grad_D . e is closed-form for sphere/floor SDFs).
# The glow channel replays ops/march.py's envelope contract: the argmin
# sample position is a recorded constant (interior case) or tied to the
# replayed hit point (endpoint case), and the glow metric differentiates
# through the recorded argmin object's fields.
# ==========================================================================


def _march_unroll_nodes(cfg: RenderConfig):
    """March laps use the compile-time reflection cap (render.rs:1368,1391)."""
    return _site_nodes(cfg.with_(max_reflections=cfg.raymarch_max_reflections))


def _glow_sid_map(nodes, n_sites: int):
    """One glow record per _raymarch invocation, keyed by the parent site id
    (-1 = root); sids allocated after the per-lap site ids."""
    mapping = {}
    ctr = [n_sites]

    def walk(nodes, parent):
        mapping[parent] = ctr[0]
        ctr[0] += 1
        for n in nodes:
            if n.children:
                walk(n.children, n.sid)

    walk(nodes, -1)
    return mapping


def _winner_sdf(kind, sa: _SiteFields, x: Vec3, clamped: bool):
    """The winner object's SDF at ``x`` from its recorded fields
    (render.rs:473-475, 571-573), differentiable in the fields."""
    d = x - sa.org
    sq = d.squared_len()
    ln = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    d_sphere = jnp.where(sq > 0, ln, 0.0) - sa.radius
    d_floor = d.dot(sa.normal)
    if clamped:
        d_sphere = jnp.maximum(d_sphere, 0.0)
        d_floor = jnp.maximum(d_floor, 0.0)
    return jnp.where(kind == KIND_SPHERE, d_sphere, d_floor)


def _winner_ddt(raw: dict, pt: Vec3, eye: Vec3):
    """grad_D . e of the winner at the hit, closed form (primal only)."""
    d = pt - raw["org"]
    sq = d.squared_len()
    ln = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    sph = d.dot(eye) / jnp.where(sq > 0, ln, 1.0)
    flo = raw["normal"].dot(eye)
    return jnp.where(raw["kind"] == KIND_SPHERE, sph, flo)


_N_MEXT = 2   # per-site march extras: travel t*, ddt
_N_GEXT = 6   # glow extras: min_dist, gpos xyz, end flag, lap index


def _zero_march_recs(nodes, glow_map, parent_key, shape) -> dict:
    """Zero records for a skipped march-record subtree (tile-level gate):
    the replay consumes them as all-miss sites (hit=0 -> bg re-add path)
    and a finite, value-irrelevant glow record — exactly the contract the
    trace-side _zero_recs already implements (see _p2_march_replay: gated
    tiles' subtree output is discarded by the caller's f>0 blend)."""
    zf = lambda: jnp.zeros(shape, jnp.float32)  # noqa: E731
    zi = lambda: jnp.zeros(shape, jnp.int32)  # noqa: E731

    def site():
        return (tuple(zf() for _ in range(_F32_COLS)),
                tuple(zi() for _ in range(_N_INT)),
                (zf(), zf()))

    def glow():
        return (tuple(zf() for _ in range(_F32_COLS)),
                tuple(zi() for _ in range(_N_INT)),
                tuple(zf() for _ in range(_N_GEXT)))

    out = {glow_map[parent_key]: glow()}
    for n in nodes:
        out[n.sid] = site()
        if n.children:
            out.update(_zero_march_recs(n.children, glow_map, n.sid, shape))
    return out


def _p1_march(ks: _KernelScene, cfg: RenderConfig, nodes, glow_map,
              parent_key, vi: Vec3, eye: Vec3, flags, ig, active, lev: int):
    """Primal march recording (mirrors pallas_march._raymarch lap-for-lap,
    including the cached-march reuse and miss-keeps-lapping quirk)."""
    from .pallas_march import _march_single

    shape = jnp.shape(eye.x)
    fcs = Color.full(1.0, 1.0, 1.0, shape)
    recs = {}
    pos = vi
    light = ks.light
    zero_i = jnp.zeros(shape, jnp.int32)

    min_min = jnp.full(shape, _BIG, jnp.float32)
    g_pos = Vec3(*(jnp.zeros(shape, jnp.float32) for _ in range(3)))
    g_obj = jnp.zeros(shape, jnp.int32)
    g_end = jnp.zeros(shape, jnp.int32)
    g_lap = jnp.zeros(shape, jnp.int32)

    need_march = active
    res = None
    res_gobj = None
    for step, node in enumerate(nodes):
        lev_i = lev + 1 + step

        new_res, new_gobj = _march_single(ks, cfg, pos, eye, ig, need_march,
                                          record_glow=True)
        if res is None:
            res, res_gobj = new_res, new_gobj
        else:
            res = jax.tree_util.tree_map(
                lambda new, old: jnp.where(need_march, new, old), new_res, res
            )
            res_gobj = jnp.where(need_march, new_gobj, res_gobj)

        hit = res.final_dist < cfg.march_eps
        # glow argmin across laps (march kernel's min_min_dist), with the
        # per-march endpoint flag (ops/march.py end_arg contract)
        gupd = active & (res.min_dist < min_min)
        min_min = jnp.where(gupd, res.min_dist, min_min)
        g_pos = res.glow_pos.where(gupd, g_pos)
        g_obj = jnp.where(gupd, res_gobj, g_obj)
        end_arg = hit & (res.glow_iter == res.iter - 1)
        g_end = jnp.where(gupd, end_arg.astype(jnp.int32), g_end)
        g_lap = jnp.where(gupd, jnp.int32(step), g_lap)

        pt = res.pos
        raw = ks.gather_raw(res.idx)
        sphere_n = (pt - raw["org"]).normalized()
        n = sphere_n.where(raw["kind"] == KIND_SPHERE, raw["normal"])
        shaded = active & hit

        ddt = _winner_ddt(raw, pt, eye)

        # shadow via sphere tracing; march-mode lit checks the SHADED
        # object's transparency (reference quirk, render.rs:1053-1080).
        # Decision-only: the glow-min channel is dead on shadow marches.
        sres = _march_single(ks, cfg, pt + light * F32_EPSILON,
                             light.broadcast_to(pt.shape), res.idx, shaded,
                             need_glow=False)
        lit = ((sres.travel_dist >= cfg.far_away)
               | (sres.iter >= cfg.march_max_iter)
               | (raw["transparency"] > 0.0))

        recs[node.sid] = (
            _raw_to_f19(raw),
            (res.idx, hit.astype(jnp.int32), flags, lit.astype(jnp.int32),
             raw["kind"], raw["uvmap"], raw["pattern"]),
            (res.travel_dist, ddt),
        )

        if node.children:
            f = raw["transparency"]
            sp = eye.dot(n)
            fracn_safe = jnp.where(
                (f > 0.0) & (jnp.abs(raw["refraction"]) > 1e-6),
                raw["refraction"], 1.0)
            bend = sp * (jnp.where(sp > 0.0, fracn_safe,
                                   1.0 / fracn_safe) - 1.0)
            ray = (eye + Vec3(n.x * bend, n.y * bend,
                              n.z * bend)).normalized()
            pt3 = pt + ray * F32_EPSILON
            sub_flags = jnp.where(sp < 0.0, OUTONLY, INONLY).astype(jnp.int32)
            sub_active = (f > 0.0) & shaded

            def sub_fn(zrecs, node=node, pt3=pt3, ray=ray,
                       sub_flags=sub_flags, res=res, sub_active=sub_active,
                       lev_i=lev_i):
                return _p1_march(ks, cfg, node.children, glow_map, node.sid,
                                 pt3, ray, sub_flags, res.idx, sub_active,
                                 lev_i)

            # tile-level skip of the refraction subtree's record pass (same
            # condition the forward march kernel gates on): tiles with no
            # live transparent hit substitute zero records
            sub = _tile_cond(
                jnp.any(sub_active), sub_fn,
                _zero_march_recs(node.children, glow_map, node.sid, shape))
            recs.update(sub)

        _zero = Color.zero(shape)
        _, fcs = _accumulate(_zero, fcs, _zero, raw["specular"], shaded,
                             flags)
        cont_hit = (hit & (res.idx != 0) & (fcs.sum() > 0.1)
                    & (lev_i < cfg.raymarch_max_reflections))
        cont = active & (cont_hit | ~hit)
        upd = active & cont_hit
        from .trace import _reflect_update

        pos, eye, flags, ig = _reflect_update(pos, eye, flags, ig, pt, n,
                                              res.idx, upd)
        active = cont
        need_march = upd

    glow_raw = ks.gather_raw(g_obj)
    recs[glow_map[parent_key]] = (
        _raw_to_f19(glow_raw),
        (g_obj, zero_i, zero_i, zero_i,
         glow_raw["kind"], zero_i, zero_i),
        (min_min, g_pos.x, g_pos.y, g_pos.z,
         g_end.astype(jnp.float32), g_lap.astype(jnp.float32)),
    )
    return recs


def _p2_march_replay(vcfg: RenderConfig, nodes, recs: dict, sargs, glow_map,
                     parent_key, light: Vec3, bg_fn, vi: Vec3, eye: Vec3,
                     lev: int, active) -> Color:
    """Differentiable march replay (mirrors pallas_march._raymarch) with the
    Newton-reparameterized hit t and the recorded-argmin glow factor."""
    shape = jnp.shape(eye.x)
    fcs = Color.full(1.0, 1.0, 1.0, shape)
    ret = Color.zero(shape)
    active = jnp.broadcast_to(active, shape)
    pos = vi
    pts = []
    cap = _unroll_cap(vcfg)

    for step, node in enumerate(nodes):
        lev_i = lev + 1 + step
        _, ints, mext = recs[node.sid]
        idx_r, hit_i, flags_r, lit_i, kind_r, uvmap_r, pattern_r = ints
        t_rec, ddt_rec = mext
        sa = _SiteFields(sargs[node.sid])
        hit = hit_i != 0

        # Newton reparameterization of the sphere-traced hit
        t_c = lax.stop_gradient(t_rec)
        x_hat = pos + eye * t_c
        D = _winner_sdf(kind_r, sa, x_hat, clamped=False)
        safe = hit & (jnp.abs(ddt_rec) > 1e-5)
        t = t_c - jnp.where(
            safe, (D - lax.stop_gradient(D)) / jnp.where(safe, ddt_rec, 1.0),
            0.0)
        pt = pos + eye * t
        if vcfg.grad_distance_cutoff is not None:
            near = t_c < vcfg.grad_distance_cutoff
            pt = pt.where(near, Vec3(*(lax.stop_gradient(c) for c in pt)))
        pts.append(pt)
        sphere_n = (pt - sa.org).normalized()
        n = sphere_n.where(kind_r == KIND_SPHERE, sa.normal)
        shaded = active & hit

        # shading (recorded lit, no textures in march mode)
        li = light.dot(n)
        ln2 = 2.0 * li
        rtl = Vec3(n.x * ln2, n.y * ln2, n.z * ln2) - light
        di = jnp.maximum(li, 0.0)
        ri = -rtl.dot(eye)
        ri_safe = jnp.where(ri > 0.0, ri, 1.0)
        refl_int = jnp.where((sa.pn != 0.0) & (ri > 0.0),
                             _powf(ri_safe, sa.pn), 0.0)
        lit = lit_i != 0
        k1 = jnp.where(lit, jnp.minimum(0.2 + di, 1.0), 0.2)
        k2 = jnp.where(lit, refl_int, 0.0)
        ps_safe = jnp.where(sa.pattern_scale != 0.0, sa.pattern_scale, 1.0)
        pas_safe = jnp.where(sa.pattern_angle_scale != 0.0,
                             sa.pattern_angle_scale, 1.0)
        uv = get_uv(pt - sa.org, uvmap_r, ps_safe, pas_safe)
        kd = _pattern_diffuse(_KdFields(sa.diffuse, pattern_r), uv)
        base = Color(kd.r * k1 + k2, kd.g * k1 + k2, kd.b * k1 + k2)

        if node.children and lev_i < cap:
            f = sa.transparency
            sp = eye.dot(n)
            fracn_safe = jnp.where(
                (f > 0.0) & (jnp.abs(sa.refraction) > 1e-6),
                sa.refraction, 1.0)
            bend = sp * (jnp.where(sp > 0.0, fracn_safe,
                                   1.0 / fracn_safe) - 1.0)
            ray = (eye + Vec3(n.x * bend, n.y * bend,
                              n.z * bend)).normalized()
            pt3 = pt + ray * F32_EPSILON
            fc2 = _p2_march_replay(vcfg, node.children, recs, sargs,
                                   glow_map, node.sid, light, bg_fn, pt3,
                                   ray, lev_i, (f > 0.0) & shaded)
            blended = Color(
                (kd.r * k1 + k2) * (1.0 - f) + fc2.r * f,
                (kd.g * k1 + k2) * (1.0 - f) + fc2.g * f,
                (kd.b * k1 + k2) * (1.0 - f) + fc2.b * f,
            )
            face = blended.where(f > 0.0, base)
        else:
            face = base

        ret, fcs = _accumulate(ret, fcs, face, sa.specular, shaded, flags_r)

        # march-mode miss re-adds the background every remaining lap
        # (reference quirk, render.rs:1385-1391)
        miss = active & ~hit
        bg = bg_fn(light, eye)
        ret = Color(
            ret.r + jnp.where(miss, bg.r * fcs.r, 0.0),
            ret.g + jnp.where(miss, bg.g * fcs.g, 0.0),
            ret.b + jnp.where(miss, bg.b * fcs.b, 0.0),
        )

        cont_hit = (hit & (idx_r != 0) & (fcs.sum() > 0.1)
                    & (lev_i < vcfg.raymarch_max_reflections))
        cont = active & (cont_hit | ~hit)
        upd = active & cont_hit
        en2 = -2.0 * eye.dot(n)
        new_eye = eye + Vec3(n.x * en2, n.y * en2, n.z * en2)
        pos = pt.where(upd, pos)
        eye = new_eye.where(upd, eye)
        active = cont

    if vcfg.glow_effect is not None:
        gf19, gints, gext = recs[glow_map[parent_key]]
        gsa = _SiteFields(sargs[glow_map[parent_key]])
        gkind = gints[4]
        min_rec, gpx, gpy, gpz, g_end, g_lap = gext
        has = jnp.isfinite(min_rec)

        xg = Vec3(lax.stop_gradient(gpx), lax.stop_gradient(gpy),
                  lax.stop_gradient(gpz))
        # endpoint argmin: the sample position tracks the moving surface —
        # tie it to the argmin lap's replayed (differentiable) hit point,
        # value unchanged (ops/march.py's end_arg routing)
        pt_sel = pts[0]
        for k in range(1, len(pts)):
            pt_sel = pts[k].where(g_lap == float(k), pt_sel)
        xg_end = pt_sel + (xg - Vec3(*(lax.stop_gradient(c)
                                       for c in pt_sel)))
        xg = xg_end.where(g_end != 0, xg)

        d_go = _winner_sdf(gkind, gsa, xg, clamped=True)
        minv = d_go * gsa.glow_dist
        g = jnp.float32(vcfg.glow_effect)
        factor = jnp.where(has, 1.0 + g * _powf(jnp.float32(0.99),
                                                jnp.where(has, minv, 0.0)),
                           1.0)
        ret = Color(ret.r * factor, ret.g * factor, ret.b * factor)
    return ret


def _make_march_bwd_kernel(cfg: RenderConfig, n_objects: int, tile_rows: int,
                           tile_cols: int, rows_out: int, col_grid: bool):
    nodes = _march_unroll_nodes(cfg)
    n_sites = _count_sites(nodes)
    glow_map = _glow_sid_map(nodes, n_sites)
    n_all = n_sites + len(glow_map)
    bg_fn = get_bg(cfg.bg)
    all_sids = list(range(n_all))

    def kernel(f32_ref, i32_ref, cam_ref, light_ref, gr_ref, gg_ref, gb_ref,
               out_ref, pr_ref, pg_ref, pb_ref):
        shape = (tile_rows, tile_cols)
        ks = _KernelScene(f32_ref, i32_ref, light_ref, n_objects)
        row0, col0 = _tile_origin(tile_rows, tile_cols, col_grid)
        vi0, eye0 = _tile_rays(cam_ref, cfg, tile_rows, tile_cols, row0, col0)

        recs = _p1_march(ks, cfg, nodes, glow_map, -1, vi0, eye0,
                         jnp.zeros(shape, jnp.int32),
                         jnp.full(shape, -1, jnp.int32),
                         jnp.ones(shape, bool), 0)
        sargs_all = tuple(recs[sid][0] for sid in sorted(recs))

        camargs = tuple(jnp.broadcast_to(cam_ref[0, k], shape)
                        for k in range(7))
        lightargs = tuple(jnp.broadcast_to(light_ref[0, k], shape)
                          for k in range(3))
        g = (gr_ref[...], gg_ref[...], gb_ref[...])

        def tile_fn(sargs, camargs, lightargs):
            vi, eye = _tile_rays(_Rows((camargs,)), cfg, tile_rows,
                                 tile_cols, row0, col0)
            light = Vec3(lightargs[0], lightargs[1], lightargs[2])
            out = _p2_march_replay(cfg, nodes, recs, sargs, glow_map, -1,
                                   light, bg_fn, vi, eye, 0,
                                   jnp.ones(shape, bool))
            return out.r, out.g, out.b

        primal, vjpf = jax.vjp(tile_fn, sargs_all, camargs, lightargs)
        gsa, gc, gl = vjpf(g)
        block = _scatter_block(gsa, gc, gl, all_sids, recs, n_objects,
                               rows_out)

        pr_ref[:], pg_ref[:], pb_ref[:] = primal
        first = pl.program_id(0) == 0
        if col_grid:
            first = first & (pl.program_id(1) == 0)
        out_ref[:] = jnp.where(first, 0.0, out_ref[:]) + block

    return kernel


def render_color_pallas_march_grads(scene: Scene, cfg: RenderConfig,
                                    g: Color, interpret: bool | None = None,
                                    return_primal: bool = False):
    """Scene cotangent for march mode via the site-recording backward kernel
    (fwd support predicate: pallas_march_supported)."""
    from .pallas_march import pallas_march_supported

    if not pallas_march_supported(scene, cfg):
        raise ValueError("scene/config outside the fused march kernel's "
                         "support; use the jnp VJP")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Smaller record-phase step chunk than the forward's: Mosaic compile
    # time scales with the total unrolled while-body size, and the record
    # phase instantiates a chunk-unrolled march per site (~10 sites) — the
    # forward-tuned 32 put the kernel at ~83 s cold compile (VERDICT r4
    # #9). 16 compiles in ~half with ~equal step time (the floor tail, not
    # the chunk, resolves the long tails). Chunking only regroups steps;
    # recorded values match the forward up to knife-edge phasing, which the
    # masked-agreement tests already budget for.
    cfg = cfg.with_(pallas_march_chunk=min(cfg.pallas_march_chunk, 16))

    h, w = cfg.yres, cfg.xres
    # phase 1's marches dominate — tile like the forward march kernel
    tile_rows = cfg.pallas_march_rows
    tile_cols = min(cfg.pallas_march_cols, w) if cfg.pallas_march_cols else w
    h_pad = ((h + tile_rows - 1) // tile_rows) * tile_rows
    w_pad = ((w + tile_cols - 1) // tile_cols) * tile_cols
    n = scene.objects.count
    rows_out = ((n + 1 + 7) // 8) * 8

    f32t, i32t, cam, light = _pack_scene(scene)

    def pad_hw(a):
        if h_pad != h or w_pad != w:
            return jnp.pad(a, ((0, h_pad - h), (0, w_pad - w)))
        return a

    gr, gg, gb = pad_hw(g.r), pad_hw(g.g), pad_hw(g.b)

    n_col_tiles = w_pad // tile_cols
    col_grid = n_col_tiles > 1
    if col_grid:
        grid = (h_pad // tile_rows, n_col_tiles)
        img_spec = pl.BlockSpec((tile_rows, tile_cols), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((rows_out, 128), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)
    else:
        grid = (h_pad // tile_rows,)
        img_spec = pl.BlockSpec((tile_rows, tile_cols), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((rows_out, 128), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)

    kernel = _make_march_bwd_kernel(cfg, n, tile_rows, tile_cols, rows_out,
                                    col_grid)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    img_shape = jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32)
    partials, pr, pg, pb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem(), smem(), smem(), smem()] + [img_spec] * 3,
        out_specs=(out_spec,) + (img_spec,) * 3,
        out_shape=(jax.ShapeDtypeStruct((rows_out, 128), jnp.float32),)
        + (img_shape,) * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ) if not interpret else None,
        interpret=interpret,
    )(f32t, i32t, cam, light, gr, gg, gb)

    g_f32t = partials[:n, :_F32_COLS]
    g_cam = jnp.concatenate([partials[n, :7], jnp.zeros(1, jnp.float32)])
    g_cam = g_cam.reshape(1, 8)
    g_light = jnp.concatenate([partials[n, 7:10], jnp.zeros(1, jnp.float32)])
    g_light = g_light.reshape(1, 4)

    def pack_f32(s):
        ft, _, c, l = _pack_scene(s)
        return ft, c, l

    _, pvjp = jax.vjp(pack_f32, scene)
    (scene_ct,) = pvjp((g_f32t, g_cam, g_light))
    if return_primal:
        if h_pad != h or w_pad != w:
            pr, pg, pb = pr[:h, :w], pg[:h, :w], pb[:h, :w]
        return scene_ct, Color(pr, pg, pb)
    return scene_ct
