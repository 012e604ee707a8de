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
from ..models.scene import Scene
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
                  record_glow: bool = False) -> MarchResult:
    """Kernel-side sphere tracing (render.rs:1266-1297); mirrors
    ops/march.py:march_single's while mode. The whole tile's march state is a
    while_loop carry in VMEM; the loop exits when every live lane converges,
    escapes, or passes the iteration cap.

    ``record_glow`` additionally tracks the glow argmin's sample position,
    object index and step index (ops/march.py's glow_pos/glow_iter contract)
    — carried state for the site-recording backward (ops/pallas_bwd.py);
    the pure forward kernel leaves it off."""
    shape = jnp.shape(init_pos.x)
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
    if record_glow:
        state = state + (
            init_pos.x, init_pos.y, init_pos.z,   # glow argmin pos
            jnp.zeros(shape, jnp.int32),          # glow argmin object
            jnp.full(shape, -1, jnp.int32),       # glow argmin step (pre-inc)
        )

    def once(s):
        px, py, pz, travel, it, mind, fd, idx, done = s[:9]
        dist, i, glow, gobj = ks.distance_estimate(
            Vec3(px, py, pz), ig, with_glow_idx=record_glow)
        live = done == 0
        new_it = it + 1
        stop = (
            (dist < cfg.march_eps)
            | (dist > cfg.far_away)
            | (new_it > cfg.march_max_iter)
        )
        gupd = live & (glow < mind)
        out = (
            jnp.where(live, px + eye.x * dist, px),
            jnp.where(live, py + eye.y * dist, py),
            jnp.where(live, pz + eye.z * dist, pz),
            jnp.where(live, travel + dist, travel),
            jnp.where(live, new_it, it),
            jnp.where(gupd, glow, mind),
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

    state = lax.while_loop(lambda s: jnp.min(s[8]) == 0, body, state)
    px, py, pz, travel, it, mind, fd, idx = state[:8]
    res = MarchResult(
        final_dist=fd, idx=idx, pos=Vec3(px, py, pz), iter=it,
        travel_dist=travel, min_dist=mind,
    )
    if record_glow:
        gx, gy, gz, go, gi = state[9:]
        res = res._replace(glow_pos=Vec3(gx, gy, gz), glow_iter=gi)
        return res, go
    return res


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
    res = _march_single(
        ks, cfg, shadow_org, light.broadcast_to(pt.shape), idx, active
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
    for step in range(n_iters):
        lev_i = lev + 1 + step

        new_res = _march_single(ks, cfg, pos, eye, ig, need_march)
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
