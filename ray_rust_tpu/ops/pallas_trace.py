"""Fused Pallas TPU kernel for the Whitted trace forward pass.

This is SURVEY.md §7 stage 6: the "native hot-path equivalent" of the
reference's render core (src/render.rs:801-1224). The whole per-pixel program —
camera-ray generation (render.rs:808-815), the unrolled reflection loop
(render.rs:1142-1224), shading with shadow rays (render.rs:1020-1090), the
pseudo-refraction subtree (render.rs:1093-1132), procedural patterns
(render.rs:301-314) and the sky (src/main.rs:231-260) — runs inside ONE Pallas
kernel over row tiles. Nothing but the final RGB tile ever touches HBM: the
jnp path materializes (H, W) intermediates at every XLA fusion boundary
(notably around the per-bounce one-hot gathers), while here every bounce's
state lives in VMEM/registers for the lifetime of the tile.

Scene scalars (object table, per-object material rows, camera pose, light)
ride in SMEM — they are a few hundred bytes and every lane reads the same
values, exactly the role SMEM exists for. Per-hit property fetch is an
unrolled compare-select over the object axis (N is a static Python int),
replacing both the reference's pointer chase (render.rs:1021) and the jnp
path's one-hot MXU contraction (ops/gather.py).

Scope (checked by :func:`pallas_supported`): ray-trace mode, with or without
image textures. Procedural patterns are computed in-kernel; image textures
are fetched in-kernel by a *chunk-visitation gather*
(:meth:`_KernelScene.fetch_texture`): the neighborhood-packed atlas
(models/material.py:TextureBank.packed) lives in VMEM as 128-texel chunks,
and at each shading site a ``while_loop`` visits exactly the chunks the
tile's lanes need — one ``tpu.dynamic_gather`` (128-lane pick) per chunk per
channel — exploiting the spatial coherence of texture hits. XLA's own gather
is scalar-core bound (~30 ms for a 1080p image on v5e, measured); this loop
is VPU-vectorized and costs microseconds per tile. March mode stays in its
own kernel (ops/pallas_march.py). The jnp path remains the autodiff path —
:func:`render_color_fast` pairs this forward kernel with the fused backward
kernel or the jnp VJP via ``jax.custom_vjp`` (the backward re-traces, i.e.
whole-program rematerialization: zero forward residuals).

The jnp path (ops/trace.py) is the correctness oracle; tests/test_pallas.py
compares the two pixel-for-pixel (interpret mode on CPU, compiled on TPU).
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
from ..models.material import PATTERN_CHECKERBOARD, PATTERN_GRADATION
from ..models.scene import KIND_SPHERE, Scene
from ..models.vec import Color, Vec3
from ..utils.modutil import fmod
from .gather import HitFields
from .intersect import F32_EPSILON, INONLY, OUTONLY, object_candidate_t
from .sky import get_bg
from .texture import get_uv
from .trace import _accumulate, _reflect_update

__all__ = ["pallas_supported", "render_color_pallas", "render_color_fast"]

_BIG = np.float32(np.inf)

# f32 table column layout (one row per object; material fields pre-joined
# through the object->material indirection at pack time)
_F32_COLS = 19  # org xyz, normal xyz, diffuse rgb, specular rgb, pn, t, n,
#                 pattern_scale, pattern_angle_scale, radius, glow_dist
_I32_COLS = 4  # kind, pattern, uvmap, pad


# Object count up to which the kernel's raycast/gather/SDF loops fully unroll
# into straight-line compare-selects; above it they become ``fori_loop``s over
# the SMEM table (dynamic scalar reads — no code-size blowup, same values).
_KERNEL_UNROLL_MAX = 64
# Hard cap: the object table must fit SMEM comfortably (19 f32 + 4 i32 per
# object ≈ 92 B/object; 512 objects ≈ 47 KB).
_KERNEL_OBJECT_MAX = 512

# Texture chunking for the in-kernel chunk-visitation gather: 128 texels per
# chunk (one vreg lane row — tpu.dynamic_gather picks within a single vreg
# width). The VMEM texture table is (4, chunks, 128) f32 = 2 KB per chunk;
# cap the atlas at 2048 chunks (4 MB, = 256K texels with the quad packing) so
# the table plus the kernel's working set stays comfortably inside VMEM —
# larger atlases fall back to the jnp path via pallas_supported (ADVICE r3:
# the old 8 MB cap could push 16 MB-class parts past their budget and fail at
# Mosaic compile time instead of falling back).
# Atlases up to _TEXTURE_UNROLL_MAX chunks use a straight-line unrolled
# sweep (static loads, fully pipelined); larger ones use the while-loop
# chunk-visitation path (dynamic loads, trips = chunks actually touched).
_TEXTURE_CHUNK = 128
_TEXTURE_CHUNK_MAX = 2048
_TEXTURE_UNROLL_MAX = 192
# Chunks visited per trip of the while-loop gather (one dynamic
# (GROUP, 128) load + GROUP static row selects per tap) — amortizes the
# per-trip min-scan/bookkeeping for atlas-scattered (horizon) tiles.
# Swept on-chip on the textured-1080p default scene (1-tap): forward
# 8 -> 23.9 ms, 16 -> 17.4, 32 -> 13.3, 64 -> 12.0, 128 -> 10.9 device —
# BUT the site-backward kernel's record phase falls off a VMEM cliff past
# 32 (fwd+bwd single-dispatch: G=16 51 ms, G=32 43.9, G=64 14,110 — the
# reverse sweep's live set plus the group row buffer spills); 32 is the
# joint optimum.
_TEXTURE_GROUP = 32


def pallas_supported(scene: Scene, cfg: RenderConfig) -> bool:
    """The fused kernel covers ray-trace mode, textured or not.

    Image textures are fetched in-kernel from a VMEM chunk table
    (:meth:`_KernelScene.fetch_texture`), so the atlas must fit the chunk
    cap. Only structural properties are checked — this predicate must hold
    under ``jit`` tracing (a :class:`TextureBank` exists iff some material
    has a texture, and its padded extent is static shape information)."""
    if cfg.use_raymarching:
        return False
    if scene.textures is not None:
        if not cfg.pallas_textures:
            return False
        t, hmax, wmax = scene.textures.data.shape[:3]
        per_tex = -(-(hmax * wmax) // _TEXTURE_CHUNK)
        if t * per_tex > _TEXTURE_CHUNK_MAX:
            return False
    return scene.objects.count <= _KERNEL_OBJECT_MAX


def _pack_scene(scene: Scene):
    """Flatten the scene pytree into the kernel's SMEM tables.

    Differentiable: every f32 entry is a traced function of scene leaves, so
    ``jax.vjp`` through the pack composes (used only for shape plumbing here —
    the actual backward goes through the jnp path)."""
    objs, mats = scene.objects, scene.materials
    m = objs.mat

    def mt(field):
        return jnp.take(field, m)

    f32t = jnp.stack(
        [
            objs.org.x, objs.org.y, objs.org.z,
            objs.normal.x, objs.normal.y, objs.normal.z,
            mt(mats.diffuse.r), mt(mats.diffuse.g), mt(mats.diffuse.b),
            mt(mats.specular.r), mt(mats.specular.g), mt(mats.specular.b),
            mt(mats.pn), mt(mats.transparency), mt(mats.refraction),
            mt(mats.pattern_scale), mt(mats.pattern_angle_scale),
            objs.radius,
            mt(mats.glow_dist),
        ],
        axis=1,
    ).astype(jnp.float32)  # (N, 19)

    i32t = jnp.stack(
        [
            objs.kind,
            jnp.take(mats.pattern, m),
            objs.uvmap,
            jnp.take(mats.texture_id, m),
        ],
        axis=1,
    ).astype(jnp.int32)  # (N, 4)

    cam = jnp.stack(
        [
            scene.camera.position.x, scene.camera.position.y,
            scene.camera.position.z,
            scene.camera.rotation.x, scene.camera.rotation.y,
            scene.camera.rotation.z, scene.camera.rotation.w,
            jnp.float32(0.0),
        ]
    ).astype(jnp.float32).reshape(1, 8)

    light = jnp.stack(
        [scene.light.x, scene.light.y, scene.light.z, jnp.float32(0.0)]
    ).astype(jnp.float32).reshape(1, 4)

    return f32t, i32t, cam, light


_GATHER_COLS = _F32_COLS + _I32_COLS  # 19 f32 + 4 int-valued rows


def _pack_gather_table(scene: Scene):
    """Lane-major object table for the fori regime's O(1) per-hit gather:
    ``(23, Npad)`` f32 with the object axis padded to 128-lane chunks. Rows
    0-18 are the f32 table columns, rows 19-22 the i32 columns (kind,
    pattern, uvmap, tid) as exactly-representable float words. One
    ``tpu.dynamic_gather`` (via take_along_axis) per field replaces the
    N-iteration compare-select sweep — 101-object scenes drop from ~1600
    selects per gather site to ~23 gathers."""
    f32t, i32t, _, _ = _pack_scene(scene)
    tbl = jnp.concatenate([f32t, i32t.astype(jnp.float32)], axis=1)  # (N, 23)
    n = tbl.shape[0]
    npad = -(-n // 128) * 128
    if npad != n:
        tbl = jnp.pad(tbl, ((0, npad - n), (0, 0)))
    return jnp.transpose(tbl, (1, 0))  # (23, Npad)


def _pack_textures(scene: Scene):
    """Chunk the neighborhood-packed atlas for the in-kernel gather.

    Returns ``(tbl, meta)``: ``tbl (4, C, 128) f32`` — tap-major chunked
    texels, each tap's RGB packed into one integer-valued f32 word
    (``r | g<<8 | b<<16`` < 2^24, exactly representable; the hardware gather
    path is f32-only, so the words ride as floats and the kernel casts back
    to i32 to unpack) so
    a trip of the chunk loop needs four gathers, not twelve; each texture
    occupies a fixed ``ceil(Hmax*Wmax/128)``-chunk region, row-major with
    stride ``Wmax``. ``meta (T, 4) i32`` rows are
    ``[width, height, base_texel, filter]``. Wrap indices use each texture's
    TRUE width/height (render.rs:267-296); only the region layout uses the
    padded extent (static, so the table shape is known at trace time)."""
    bank = scene.textures
    t, hmax, wmax = bank.data.shape[:3]
    per_tex_texels = hmax * wmax
    per_tex_chunks = -(-per_tex_texels // _TEXTURE_CHUNK)
    pad = per_tex_chunks * _TEXTURE_CHUNK - per_tex_texels

    # nearest-only scenes (bank.n_taps == 1, static aux) pack only p00 —
    # the chunk loop then does a quarter of the gathers
    n_taps = getattr(bank, "n_taps", 4)
    quads = bank.packed.astype(jnp.int32).reshape(t, per_tex_texels, 4, 3)
    if n_taps == 1:
        quads = quads[:, :, :1, :]
    words = (
        quads[..., 0] | (quads[..., 1] << 8) | (quads[..., 2] << 16)
    ).astype(jnp.float32)
    if pad:
        words = jnp.pad(words, ((0, 0), (0, pad), (0, 0)))
    # (t, chunks, 128, n_taps) -> (n_taps, t*chunks, 128)
    tbl = words.reshape(t, per_tex_chunks, _TEXTURE_CHUNK, n_taps)
    tbl = jnp.transpose(tbl, (3, 0, 1, 2)).reshape(
        n_taps, t * per_tex_chunks, _TEXTURE_CHUNK
    )
    # pad the chunk axis to the group-visitation stride so the kernel's
    # dynamic (GROUP, 128) loads never run off the table
    total = t * per_tex_chunks
    gpad = -total % _TEXTURE_GROUP
    if gpad:
        tbl = jnp.pad(tbl, ((0, 0), (0, gpad), (0, 0)))

    # texture id -> filter of its owner material. build_material_table
    # assigns a unique texture id per material, but guard against shared ids
    # anyway (ADVICE r3): scatter-max instead of scatter-add, so duplicate
    # ids resolve to "bilinear if any owner wants bilinear" rather than a
    # meaningless filter sum silently degrading to nearest in-kernel.
    mats = scene.materials
    tid_m = mats.texture_id
    filt_by_tid = jnp.zeros((t,), jnp.int32).at[
        jnp.clip(tid_m, 0, t - 1)
    ].max(jnp.where(tid_m >= 0, mats.texture_filter, 0))

    base = jnp.arange(t, dtype=jnp.int32) * np.int32(
        per_tex_chunks * _TEXTURE_CHUNK
    )
    meta = jnp.stack(
        [
            bank.widths.astype(jnp.int32),
            bank.heights.astype(jnp.int32),
            base,
            filt_by_tid,
        ],
        axis=1,
    )  # (T, 4)
    return tbl, meta


class _KernelScene:
    """Per-object scalars from SMEM + scene-free trace helpers.

    Two regimes by object count: up to ``_KERNEL_UNROLL_MAX`` every
    raycast/gather/SDF loop fully unrolls into straight-line compare-selects
    over rank-0 values read at trace time; above it the loops become
    ``lax.fori_loop``s whose bodies read the SMEM table at the traced index —
    the TPU-native form of the reference's unbounded linear scan
    (src/render.rs:993-1018) with O(1) code size in the object count.
    ``unroll=True`` forces the unrolled regime (required when the table rows
    are traced scalar tuples — the backward kernel's ``_Rows`` adapters can't
    be indexed dynamically)."""

    def __init__(self, f32_ref, i32_ref, light_ref, n_objects: int,
                 unroll: bool | None = None, tex=None, gtbl=None):
        self.n = n_objects
        self.f32 = f32_ref
        self.i32 = i32_ref
        # (23, Npad) lane-major object table for O(1) fori-regime gathers
        # (see _pack_gather_table); None outside the forward fori kernels
        self.gtbl = gtbl
        self.light = Vec3(light_ref[0, 0], light_ref[0, 1], light_ref[0, 2])
        self.unrolled = (n_objects <= _KERNEL_UNROLL_MAX if unroll is None
                         else unroll)
        self.objs = (
            [self._obj_at(i) for i in range(n_objects)] if self.unrolled
            else None
        )
        # (tbl_ref, meta_ref, n_textures, wmax) from _pack_textures, or None
        self.tex = tex

    def _obj_ray_at(self, i):
        """The subset of fields the raycast consumes (kind, org, radius,
        normal) — the fori_loop regime's scan bodies load 8 SMEM scalars per
        object instead of _obj_at's 23."""
        f, g = self.f32, self.i32
        return dict(
            org=Vec3(f[i, 0], f[i, 1], f[i, 2]),
            normal=Vec3(f[i, 3], f[i, 4], f[i, 5]),
            radius=f[i, 17],
            kind=g[i, 0],
        )

    def _obj_at(self, i):
        """One object's fields; ``i`` is a static int in the unrolled regime,
        a traced index in the fori_loop regime (SMEM scalar reads support
        dynamic indices)."""
        f, g = self.f32, self.i32
        return dict(
            org=Vec3(f[i, 0], f[i, 1], f[i, 2]),
            normal=Vec3(f[i, 3], f[i, 4], f[i, 5]),
            diffuse=Color(f[i, 6], f[i, 7], f[i, 8]),
            specular=Color(f[i, 9], f[i, 10], f[i, 11]),
            pn=f[i, 12],
            transparency=f[i, 13],
            refraction=f[i, 14],
            pattern_scale=f[i, 15],
            pattern_angle_scale=f[i, 16],
            radius=f[i, 17],
            glow_dist=f[i, 18],
            kind=g[i, 0],
            pattern=g[i, 1],
            uvmap=g[i, 2],
            tid=g[i, 3],
        )

    # -- nearest hit (render.rs:993-1018) ------------------------------------
    def raycast(self, vi: Vec3, eye: Vec3, ig, flags, cand=None):
        """``cand=(sph_ref, n_sph, flo_ref, n_flo)`` restricts the fori_loop
        regime's scan to per-tile KIND-SPLIT candidate lists (see
        :func:`_build_candidates`) — the TPU-native BVH-lite the reference's
        brute-force scan lacks (render.rs:993-1018), with each list scanned
        by a body specialized to its primitive's intersection math. The
        lists are conservative (every object any relevant ray could hit is
        present), so the min-reduce result matches the full scan; the only
        ordering difference is that floors are processed before spheres,
        which can flip EXACT float t-ties between a floor and a sphere
        (measure-zero knife-edge; identical on every test scene)."""
        t = jnp.full(vi.shape, _BIG, jnp.float32)
        idx = jnp.zeros(vi.shape, jnp.int32)

        def one(i, o, t, idx):
            cand_t = object_candidate_t(
                o["kind"], o["org"], o["radius"], o["normal"], vi, eye, t,
                flags
            )
            cand_t = jnp.where(i == ig, _BIG, cand_t)
            closer = cand_t < t
            return jnp.where(closer, cand_t, t), jnp.where(closer, i, idx)

        if self.unrolled:
            for i, o in enumerate(self.objs):
                t, idx = one(jnp.int32(i), o, t, idx)
            return t, idx

        if cand is not None:
            sph_ref, n_sph, flo_ref, n_flo = cand
            f = self.f32
            outonly = (flags & OUTONLY) != 0
            inonly = (flags & INONLY) != 0

            def flo_body(k, carry):
                t, idx = carry
                i = flo_ref[k]
                org = Vec3(f[i, 0], f[i, 1], f[i, 2])
                normal = Vec3(f[i, 3], f[i, 4], f[i, 5])
                wpt = vi - org
                w = normal.dot(eye)
                denom = jnp.where(w < 0.0, w, -1.0)
                t0f = -normal.dot(wpt) / denom
                take = (w < 0.0) & (t0f >= 0.0) & (t0f < t) & (i != ig)
                return (jnp.where(take, t0f, t), jnp.where(take, i, idx))

            def sph_body(k, carry):
                t, idx = carry
                i = sph_ref[k]
                org = Vec3(f[i, 0], f[i, 1], f[i, 2])
                radius = f[i, 17]
                wpt = vi - org
                b = 2.0 * eye.dot(wpt)
                c = wpt.dot(wpt) - radius * radius
                d2 = b * b - 4.0 * c
                has = d2 >= F32_EPSILON
                d = jnp.sqrt(jnp.where(has, d2, 1.0))
                t0 = (-b - d) / 2.0
                far = t0 + d
                take_near = has & ~outonly & (t0 >= 0.0) & (t0 < t)
                take_far = has & ~inonly & (far > 0.0) & (far < t)
                cand_t = jnp.where(take_near, t0,
                                   jnp.where(take_far, far, _BIG))
                cand_t = jnp.where(i == ig, _BIG, cand_t)
                closer = cand_t < t
                return (jnp.where(closer, cand_t, t),
                        jnp.where(closer, i, idx))

            carry = lax.fori_loop(0, n_flo, flo_body, (t, idx))
            return lax.fori_loop(0, n_sph, sph_body, carry)

        def body(i, carry):
            return one(i, self._obj_ray_at(i), *carry)

        return lax.fori_loop(0, self.n, body, (t, idx))

    def _lane_gather(self, col: int, idx):
        """One gather-table row picked at the per-lane object index — a
        128-lane dynamic gather per column block instead of an N-iteration
        compare-select sweep (``col`` is static)."""
        ref = self.gtbl
        rows, cols = jnp.shape(idx)
        npad = ref.shape[1]
        n_blk = -(-cols // 128)
        pad_cols = n_blk * 128 - cols
        idx_p = (jnp.pad(idx, ((0, 0), (0, pad_cols))) if pad_cols else idx)
        acc = None
        for ch in range(npad // 128):
            row = ref[col, ch * 128:(ch + 1) * 128]
            rowb = jnp.broadcast_to(jnp.reshape(row, (1, 128)), (rows, 128))
            blks = []
            for b in range(n_blk):
                p = idx_p[:, b * 128:(b + 1) * 128] - jnp.int32(ch * 128)
                g = jnp.take_along_axis(rowb, jnp.clip(p, 0, 127), axis=1)
                if npad > 128:
                    g = jnp.where((p >= 0) & (p < 128), g, 0.0)
                blks.append(g)
            vals = blks[0] if n_blk == 1 else jnp.concatenate(blks, axis=1)
            if pad_cols:
                vals = vals[:, :cols]
            acc = vals if acc is None else acc + vals
        return acc

    # -- per-hit field fetch (replaces ops/gather.py) ------------------------
    def gather_raw(self, idx, cand=None) -> dict:
        """All per-object fields of the hit object as a dict of tile arrays
        (includes radius/glow_dist/tid, which :class:`HitFields` drops) —
        the site-reparameterized backward records these (ops/pallas_bwd.py).
        ``cand`` as in :meth:`raycast`: when ``idx`` came from a
        candidate-restricted raycast, only candidates (plus the default 0)
        can appear in it."""
        shape = jnp.shape(idx)

        if self.unrolled:
            out = jax.tree_util.tree_map(
                lambda v: jnp.broadcast_to(v, shape), self.objs[0]
            )
            for i in range(1, self.n):
                out = jax.tree_util.tree_map(
                    lambda cur, new: jnp.where(idx == jnp.int32(i), new, cur),
                    out, self.objs[i],
                )
        elif self.gtbl is not None:
            v = [self._lane_gather(c, idx) for c in range(_GATHER_COLS)]

            def iv(c):
                return v[c].astype(jnp.int32)

            out = dict(
                org=Vec3(v[0], v[1], v[2]),
                normal=Vec3(v[3], v[4], v[5]),
                diffuse=Color(v[6], v[7], v[8]),
                specular=Color(v[9], v[10], v[11]),
                pn=v[12], transparency=v[13], refraction=v[14],
                pattern_scale=v[15], pattern_angle_scale=v[16],
                radius=v[17], glow_dist=v[18],
                kind=iv(19), pattern=iv(20), uvmap=iv(21), tid=iv(22),
            )
        else:
            zero = self._obj_at(jnp.int32(0))
            out = jax.tree_util.tree_map(
                lambda v: jnp.broadcast_to(v, shape), zero
            )

            def body_i(i, out):
                o = self._obj_at(i)
                return jax.tree_util.tree_map(
                    lambda cur, new: jnp.where(idx == i, new, cur), out, o
                )

            if cand is not None:
                cref, cnt = cand
                out = lax.fori_loop(
                    0, cnt, lambda k, o: body_i(cref[k], o), out)
            else:
                out = lax.fori_loop(1, self.n, body_i, out)
        return out

    def gather_scalar(self, idx, f32_col: int, cand=None):
        """One f32 table column of the hit object (shadow-blocker
        transparency needs 1 of the 19 fields — 19x cheaper than gather)."""
        shape = jnp.shape(idx)
        if self.unrolled:
            out = jnp.broadcast_to(self.f32[0, f32_col], shape)
            for i in range(1, self.n):
                out = jnp.where(idx == jnp.int32(i), self.f32[i, f32_col], out)
            return out

        if self.gtbl is not None:
            return self._lane_gather(f32_col, idx)

        def body(i, out):
            return jnp.where(idx == i, self.f32[i, f32_col], out)

        if cand is not None:
            cref, cnt = cand
            return lax.fori_loop(
                0, cnt, lambda k, o: body(cref[k], o),
                jnp.broadcast_to(self.f32[0, f32_col], shape))

        return lax.fori_loop(
            1, self.n, body, jnp.broadcast_to(self.f32[0, f32_col], shape)
        )

    def gather(self, idx, cand=None) -> HitFields:
        shape = jnp.shape(idx)
        out = self.gather_raw(idx, cand=cand)
        zero_i = jnp.zeros(shape, jnp.int32)
        return HitFields(
            kind=out["kind"],
            uvmap=out["uvmap"],
            mat_id=zero_i,
            pattern=out["pattern"],
            texture_id=out["tid"],
            texture_filter=zero_i,
            org=out["org"],
            normal=out["normal"],
            diffuse=out["diffuse"],
            specular=out["specular"],
            pn=out["pn"],
            transparency=out["transparency"],
            refraction=out["refraction"],
            pattern_scale=out["pattern_scale"],
            pattern_angle_scale=out["pattern_angle_scale"],
        )

    def normal_at(self, fields: HitFields, pt: Vec3) -> Vec3:
        sphere_n = (pt - fields.org).normalized()
        return sphere_n.where(fields.kind == KIND_SPHERE, fields.normal)

    # -- scene SDF + glow metric (render.rs:1226-1251) -----------------------
    def distance_estimate(self, pos: Vec3, ig, with_glow_idx: bool = False,
                          with_glow: bool = True):
        """Mirrors ops/march.py:distance_estimate over the SMEM object table.

        Returns ``(closest, idx, glowing, glow_idx)``; ``glow_idx`` (the
        glow-metric argmin's object) is tracked only when ``with_glow_idx``
        (the site-recording backward needs it), else None. ``with_glow=False``
        skips the glow-metric min entirely (returns None for both) — shadow
        marches and glow-off renders never consume it, and the per-object
        multiply+compare is live inner-loop cost (render.rs:1244-1247 runs it
        unconditionally; its result is simply unused on those paths)."""
        closest = jnp.full(pos.shape, _BIG, jnp.float32)
        idx = jnp.zeros(pos.shape, jnp.int32)
        glowing = (jnp.full(pos.shape, _BIG, jnp.float32) if with_glow
                   else None)
        glow_idx = (jnp.zeros(pos.shape, jnp.int32)
                    if (with_glow and with_glow_idx) else None)

        def one(i, o, closest, idx, glowing, glow_idx):
            delta = o["org"] - pos
            sq = delta.squared_len()
            length = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
            d_sphere = jnp.maximum(
                jnp.where(sq > 0, length, 0.0) - o["radius"], 0.0
            )
            d_floor = jnp.maximum((pos - o["org"]).dot(o["normal"]), 0.0)
            dist = jnp.where(o["kind"] == KIND_SPHERE, d_sphere, d_floor)
            skip = i == ig
            closer = ~skip & (dist < closest)
            closest = jnp.where(closer, dist, closest)
            idx = jnp.where(closer, i, idx)
            if glowing is not None:
                glow = dist * o["glow_dist"]
                gupd = ~skip & (glow > 0.0) & (glow < glowing)
                glowing = jnp.where(gupd, glow, glowing)
                if glow_idx is not None:
                    glow_idx = jnp.where(gupd, i, glow_idx)
            return closest, idx, glowing, glow_idx

        if self.unrolled:
            for i, o in enumerate(self.objs):
                closest, idx, glowing, glow_idx = one(
                    jnp.int32(i), o, closest, idx, glowing, glow_idx)
            return closest, idx, glowing, glow_idx

        def sdf_fields(i):
            o = self._obj_ray_at(i)
            o["glow_dist"] = self.f32[i, 18]
            return o

        if not with_glow:
            def body_ng(i, carry):
                return one(i, sdf_fields(i), *carry, None, None)[:2]

            out = lax.fori_loop(0, self.n, body_ng, (closest, idx))
            return out + (None, None)

        if with_glow_idx:
            def body_g(i, carry):
                return one(i, sdf_fields(i), *carry)

            return lax.fori_loop(0, self.n, body_g,
                                 (closest, idx, glowing, glow_idx))

        def body(i, carry):
            return one(i, sdf_fields(i), *carry, None)[:3]

        out = lax.fori_loop(0, self.n, body, (closest, idx, glowing))
        return out + (None,)

    # -- in-kernel image texture sample (render.rs:249-316) ------------------
    def fetch_taps(self, tid, u, v, want):
        """Gather the four packed texel taps (+ per-lane texture meta) from
        the VMEM chunk table at (tid, u, v) with the reference's wrap
        semantics — the non-differentiable half of the texture sample; pair
        with :func:`_tex_blend` for the color. Returns
        ``(p00w, p10w, p01w, p11w, wf, hf, bilin_i32)`` — packed words plus
        the selected texture's dimensions and filter, all tile-shaped.

        Small atlases (≤ ``_TEXTURE_UNROLL_MAX`` chunks) use a straight-line
        sweep: for every chunk, one 128-lane ``tpu.dynamic_gather`` per
        packed tap + a masked select — static loads, fully pipelined, no
        loop state. Large atlases use a ``while_loop`` that visits only the
        chunks some wanted lane needs (texture hits are spatially coherent,
        so trips-per-tile ≈ the tile's texel footprint, not the atlas size).
        The whole gather — wrap arithmetic included — is wrapped in a
        tile-level skip, so a tile with no wanted lane pays one condition
        check. Exact: every lane receives precisely the texels the jnp path
        gathers."""
        from ..utils.modutil import fimod, imod

        tbl_ref, meta_ref, n_tex, wmax = self.tex
        shape = jnp.shape(u)
        n_chunks = tbl_ref.shape[1]

        def compute(_zeros):
            def meta_sel(col):
                out = jnp.broadcast_to(meta_ref[0, col], shape)
                for ti in range(1, n_tex):
                    out = jnp.where(tid == ti, meta_ref[ti, col], out)
                return out

            w = meta_sel(0)
            h = meta_sel(1)
            base = meta_sel(2)
            filt = meta_sel(3)
            wf = w.astype(jnp.float32)
            hf = h.astype(jnp.float32)

            # Nearest truncates toward zero (render.rs:253-266); Bilinear
            # floors (render.rs:267-296). Identical arithmetic to
            # sample_texture_packed.
            nx = imod(jnp.trunc(u * wf).astype(jnp.int32), w)
            ny = imod(jnp.trunc(v * hf).astype(jnp.int32), h)
            _fu, iu = fimod(u * wf, wf)
            _fv, iv = fimod(v * hf, hf)
            bilin = filt == 1  # FILTER_BILINEAR
            ix = jnp.where(bilin, iu, nx)
            iy = jnp.where(bilin, iv, ny)

            # Defensive clamp: ix/iy are imod-bounded for any finite input,
            # but horizon-grazing hits reach t ~ 1e38 and the f32->i32
            # conversions feeding them are target-defined on overflow —
            # garbage indices on such (value-irrelevant, aliased-anyway)
            # lanes must never reach the dynamic-slice/gather below
            # (observed: an unclamped garbage index crashed the TPU worker
            # at 320-wide configs).
            flat = jnp.clip(base + iy * np.int32(wmax) + ix,
                            0, np.int32(n_chunks * _TEXTURE_CHUNK - 1))
            chunk = flat // _TEXTURE_CHUNK
            pos = flat % _TEXTURE_CHUNK

            rows, cols = shape
            n_blk = -(-cols // _TEXTURE_CHUNK)
            pad_cols = n_blk * _TEXTURE_CHUNK - cols
            pos_p = (jnp.pad(pos, ((0, 0), (0, pad_cols)))
                     if pad_cols else pos)

            def gather_chunk(row_slice, sel, accs):
                """One chunk visit: gather every packed tap at ``pos`` from
                the chunk's rows and merge them into ``accs`` where
                ``sel``."""
                new_accs = []
                for j in range(len(accs)):
                    rowb = jnp.broadcast_to(row_slice(j),
                                            (rows, _TEXTURE_CHUNK))
                    blks = []
                    for b in range(n_blk):
                        p = pos_p[:, b * _TEXTURE_CHUNK:
                                  (b + 1) * _TEXTURE_CHUNK]
                        blks.append(jnp.take_along_axis(rowb, p, axis=1))
                    vals = (blks[0] if n_blk == 1
                            else jnp.concatenate(blks, axis=1))
                    if pad_cols:
                        vals = vals[:, :cols]
                    new_accs.append(jnp.where(sel, vals, accs[j]))
                return new_accs

            n_taps = tbl_ref.shape[0]
            accs = [jnp.zeros(shape, jnp.float32) for _ in range(n_taps)]

            if n_chunks <= _TEXTURE_UNROLL_MAX:
                for k in range(n_chunks):
                    accs = gather_chunk(
                        lambda j, k=k: tbl_ref[j, pl.dslice(k, 1), :],
                        chunk == k, accs,
                    )
            else:
                # GROUP-visitation loop: each trip serves one group of
                # _TEXTURE_GROUP adjacent chunks with a single dynamic
                # (GROUP, 128) load per tap and static inner row selects.
                # Near tiles (spatially coherent texels) finish in a trip;
                # horizon tiles whose wrapped texels scatter across the
                # whole atlas approach the static full sweep's per-chunk
                # cost instead of paying the min-scan + dynamic single-row
                # load every chunk (measured on the textured 1080p default
                # scene: chunk-at-a-time loop 84 ms/frame device, static
                # 512-chunk sweep 50; this loop + 1-tap packing 12.0).
                big = jnp.int32(np.int32(2**31 - 1))
                grp = chunk // _TEXTURE_GROUP
                sub = chunk - grp * _TEXTURE_GROUP
                pending0 = jnp.where(want, grp, big)

                def cond(state):
                    return jnp.min(state[0]) < big

                n_groups = n_chunks // _TEXTURE_GROUP

                def body(state):
                    pending = state[0]
                    cur_raw = jnp.min(pending)
                    # second bound on the dynamic load's origin (cur_raw is
                    # already clamped transitively via ``flat``)
                    cur = jnp.clip(cur_raw, 0, np.int32(n_groups - 1))
                    sel = pending == cur_raw
                    new_accs = list(state[1:])
                    rows = [
                        tbl_ref[j, pl.dslice(cur * _TEXTURE_GROUP,
                                             _TEXTURE_GROUP), :]
                        for j in range(n_taps)
                    ]
                    for r in range(_TEXTURE_GROUP):
                        selr = sel & (sub == jnp.int32(r))
                        new_accs = gather_chunk(
                            lambda j, r=r: rows[j][r:r + 1, :],
                            selr, new_accs,
                        )
                    return (jnp.where(sel, big, pending), *new_accs)

                out = lax.while_loop(cond, body, (pending0, *accs))
                accs = list(out[1:])

            if len(accs) == 1:
                # nearest-only scene (TextureBank.n_taps == 1): only p00 was
                # packed/gathered; duplicate it so the return layout (and
                # _tex_blend) stay uniform — bilin is statically false for
                # every lane, so the duplicated taps are never blended.
                accs = accs * 4
            return (*accs, wf, hf, bilin.astype(jnp.int32))

        zeros_f = jnp.zeros(shape, jnp.float32)
        zeros_i = jnp.zeros(shape, jnp.int32)
        # Tile-level skip around the whole gather (wrap arithmetic included):
        # lanes outside `want` discard the result, so zeros are exact.
        return _tile_cond(jnp.any(want), compute,
                          (zeros_f,) * 6 + (zeros_i,))

    def fetch_texture(self, tid, u, v, want) -> Color:
        """Full texture sample — taps gather + filter blend; the kernel twin
        of ops/texture.py:sample_texture_packed."""
        return _tex_blend(self.fetch_taps(tid, u, v, want), u, v)


def _tex_blend(taps, u, v) -> Color:
    """Filter blend of pre-gathered packed taps (render.rs:253-296, blend
    order pixelutil.rs:4-13). Differentiable in ``u``/``v`` through the
    bilinear weights; the taps themselves are integer-valued constants (u8
    texels carry no gradient), so the backward kernel replays this blend with
    phase-1-recorded taps (ops/pallas_bwd.py). ``wf``/``hf`` are zero on
    skipped tiles — guarded so the dead lanes' NaNs never leave a select."""
    from ..utils.modutil import fimod

    p00w, p10w, p01w, p11w, wf, hf, bilin_i = taps
    bilin = bilin_i != 0
    wf_s = jnp.where(wf > 0, wf, 1.0)
    hf_s = jnp.where(hf > 0, hf, 1.0)
    fu, _ = fimod(u * wf_s, wf_s)
    fv, _ = fimod(v * hf_s, hf_s)

    def unpack(word_f):
        # r | g<<8 | b<<16 (_pack_textures; integer-valued f32 word)
        word = word_f.astype(jnp.int32)
        return tuple(
            ((word >> (8 * c)) & jnp.int32(0xFF)).astype(jnp.float32)
            for c in range(3)
        )

    # tap layout (TextureBank.packed): p00, p10(x+1), p01(y+1), p11
    p00, p10, p01, p11 = (unpack(wd) for wd in (p00w, p10w, p01w, p11w))
    ch = []
    for c in range(3):
        bi = (
            (1.0 - fu) * (1.0 - fv) * p00[c]
            + (1.0 - fu) * fv * p01[c]
            + fu * (1.0 - fv) * p10[c]
            + fu * fv * p11[c]
        )
        ch.append(jnp.where(bilin, bi, p00[c]) / 256.0)
    return Color(*ch)


def _pattern_diffuse(fields: HitFields, uv) -> Color:
    """Procedural-pattern diffuse (render.rs:301-314) — the texture-free slice
    of ops/texture.py:lookup_diffuse."""
    u, v = uv
    diffuse = fields.diffuse
    pattern = fields.pattern

    ix = jnp.floor(u).astype(jnp.int32)
    iy = jnp.floor(v).astype(jnp.int32)
    checker_black = (pattern == PATTERN_CHECKERBOARD) & (jnp.mod(ix + iy, 2) == 0)
    col = Color(
        jnp.where(checker_black, 0.0, diffuse.r),
        jnp.where(checker_black, 0.0, diffuse.g),
        jnp.where(checker_black, 0.0, diffuse.b),
    )
    grad = Color(diffuse.r * fmod(u, 1.0), diffuse.g * fmod(v, 1.0), diffuse.b)
    return grad.where(pattern == PATTERN_GRADATION, col)


def _powf(base, exponent):
    """``powf`` for positive base as exp/log (Mosaic-safe array-exponent pow);
    callers guard base > 0."""
    return jnp.exp(exponent * jnp.log(base))


def _tile_cond(pred, fn, state):
    """Run ``fn(state)`` once when ``pred`` is true, else return ``state`` —
    a 0/1-trip ``lax.while_loop``. Mosaic cannot legalize ``lax.cond`` with
    vector results (scf.if) but legalizes scf.while, so this is the kernel-
    side tile-level skip primitive. NOT reverse-mode differentiable (while);
    the backward kernel traces with early exit disabled instead. ``state``
    leaves must be while-carry-compatible (no bool vectors — use int32)."""
    flag = pred.astype(jnp.int32)

    def c(carry):
        return carry[0] > 0

    def b(carry):
        return (jnp.int32(0), fn(carry[1]))

    return lax.while_loop(c, b, (flag, state))[1]


def _shading(ks: _KernelScene, cfg: RenderConfig, idx, fields: HitFields,
             n: Vec3, pt: Vec3, eye: Vec3, nest: int, active=None,
             shadow_cand=None, rest_cand=None) -> Color:
    """Kernel-side shading (render.rs:1020-1140): Lambert + Phong + shadow +
    pattern/texture + pseudo-refraction. Mirrors ops/trace.py:shading; image
    textures are fetched in-kernel (:meth:`_KernelScene.fetch_texture`).
    ``active`` (lanes whose face color is actually consumed) only gates the
    texture fetch — a tile with no live textured lane skips the chunk loop
    outright. ``shadow_cand`` restricts the shadow raycast to the tile's
    shadow-reachable candidate list (primary sites only — reflected hit
    points leave the pyramid the list was built from)."""
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

    zero_flags = jnp.zeros(jnp.shape(pt.x), jnp.int32)
    t_s, i_s = ks.raycast(shadow_org, light.broadcast_to(pt.shape), idx,
                          zero_flags, cand=shadow_cand)
    # blocker transparency is the only field consumed (render.rs:1069-1080)
    btrans = ks.gather_scalar(i_s, 13, cand=shadow_cand)
    lit = ~jnp.isfinite(t_s) | (btrans > 0.0)

    k1 = jnp.where(lit, jnp.minimum(0.2 + diffuse_intensity, 1.0), 0.2)
    k2 = jnp.where(lit, reflection_intensity, 0.0)

    uv = get_uv(pt - fields.org, fields.uvmap, fields.pattern_scale,
                fields.pattern_angle_scale)
    kd = _pattern_diffuse(fields, uv)

    if ks.tex is not None:
        # Image texture replaces the pattern color (render.rs:249-316,
        # texture.py:lookup_diffuse). Fetch gated to live textured lanes —
        # the chunk loop costs one condition check when none exist.
        want = fields.texture_id >= 0
        if active is not None:
            want = want & active
        tex_col = ks.fetch_texture(fields.texture_id, uv[0], uv[1], want)
        kd = tex_col.where(want, kd)

    base = Color(kd.r * k1 + k2, kd.g * k1 + k2, kd.b * k1 + k2)

    unroll_cap = cfg.max_refractions
    if cfg.refraction_unroll is not None:
        unroll_cap = min(unroll_cap, cfg.refraction_unroll)
    if nest < unroll_cap:
        f = fields.transparency
        sp = eye.dot(n)
        fracn = fields.refraction
        fracn_safe = jnp.where((f > 0.0) & (jnp.abs(fracn) > 1e-6), fracn, 1.0)
        bend = sp * (jnp.where(sp > 0.0, fracn_safe, 1.0 / fracn_safe) - 1.0)
        ray = (eye + Vec3(n.x * bend, n.y * bend, n.z * bend)).normalized()
        pt3 = pt + ray * F32_EPSILON
        sub_flags = jnp.where(sp < 0.0, OUTONLY, INONLY).astype(jnp.int32)

        if cfg.pallas_early_exit:
            # Tile-level divergence skip: the refraction sub-tree only
            # contributes where a transparent material was hit; tiles with no
            # such lane (most of the image) skip the whole sub-trace. The
            # result is exact — lanes with f == 0 discard fc2 entirely below.
            fc2 = _tile_cond(
                jnp.any(f > 0.0),
                lambda _z: _raytrace(ks, cfg, pt3, ray, nest, idx, sub_flags,
                                     active=f > 0.0, prim_cand=rest_cand,
                                     shadow_cand=rest_cand,
                                     rest_cand=rest_cand),
                Color.zero(jnp.shape(f)),
            )
        else:
            fc2 = _raytrace(ks, cfg, pt3, ray, nest, idx, sub_flags,
                            active=f > 0.0, prim_cand=rest_cand,
                            shadow_cand=rest_cand, rest_cand=rest_cand)
        blended = Color(
            (kd.r * k1 + k2) * (1.0 - f) + fc2.r * f,
            (kd.g * k1 + k2) * (1.0 - f) + fc2.g * f,
            (kd.b * k1 + k2) * (1.0 - f) + fc2.b * f,
        )
        return blended.where(f > 0.0, base)
    return base


def _raytrace(ks: _KernelScene, cfg: RenderConfig, vi: Vec3, eye: Vec3,
              lev: int, ig, flags, active=None, prim_cand=None,
              shadow_cand=None, rest_cand=None) -> Color:
    """Kernel-side unrolled Whitted loop (render.rs:1142-1224); mirrors
    ops/trace.py:raytrace step-for-step (same terminations, same IGNORE
    guards, same miss semantics). ``active`` masks lanes whose result is
    consumed at all (refraction sub-traces pass the transparent-lane mask) —
    dead lanes' values are discarded by the caller's blend, and the mask
    tightens the tile-level early exits and texture-fetch gates.
    ``prim_cand``/``shadow_cand`` (fori regime): per-tile pyramid-culled
    candidate lists applied to the FIRST bounce's raycast/shadow;
    ``rest_cand`` (the full kind-split lists) serves every later bounce and
    the refraction subtrees — reflected rays leave the pyramid the culled
    lists were built from, but still benefit from the kind-specialized
    scan."""
    shape = jnp.shape(eye.x)
    fcs = Color.full(1.0, 1.0, 1.0, shape)
    ret = Color.zero(shape)
    if active is None:
        active = jnp.ones(shape, bool)
    else:
        active = jnp.broadcast_to(active, shape)
    bg_fn = get_bg(cfg.bg)

    def make_step(lev_i, pcand=None, scand=None):
        def step_fn(state):
            vi, eye, flags, ig, fcs, ret, active_i = state
            active = active_i != 0  # int32 carry: see _tile_cond
            t, idx = ks.raycast(vi, eye, ig, flags, cand=pcand)  # noqa
            hit = jnp.isfinite(t)
            t_safe = jnp.where(hit, t, 0.0)
            pt = vi + eye * t_safe
            if cfg.grad_distance_cutoff is not None:
                # backward hygiene, same as ops/trace.py:_raytrace_step:
                # knife-edge horizon hits are constants in the backward
                # (forward no-op)
                near = t_safe < cfg.grad_distance_cutoff
                pt = pt.where(near, Vec3(*(lax.stop_gradient(c) for c in pt)))
            fields = ks.gather(idx)
            n = ks.normal_at(fields, pt)
            face = _shading(ks, cfg, idx, fields, n, pt, eye, lev_i,
                            active=active & hit, shadow_cand=scand,
                            rest_cand=rest_cand)
            ret, fcs = _accumulate(ret, fcs, face, fields.specular,
                                   active & hit, flags)

            miss = active & ~hit
            bg = bg_fn(ks.light, eye)
            ret = Color(
                ret.r + jnp.where(miss, bg.r * fcs.r, 0.0),
                ret.g + jnp.where(miss, bg.g * fcs.g, 0.0),
                ret.b + jnp.where(miss, bg.b * fcs.b, 0.0),
            )

            cont = (
                active & hit & (idx != 0)
                & (fcs.sum() > 0.1)
                & (lev_i < cfg.max_reflections)
            )
            vi2, eye2, flags2, ig2 = _reflect_update(vi, eye, flags, ig, pt,
                                                     n, idx, cont)
            return (vi2, eye2, flags2, ig2, fcs, ret,
                    cont.astype(jnp.int32))

        return step_fn

    state = (vi, eye, flags, ig, fcs, ret, active.astype(jnp.int32))
    n_iters = max(1, cfg.max_reflections - lev)
    for step in range(n_iters):
        step_fn = make_step(lev + 1 + step,
                            pcand=prim_cand if step == 0 else rest_cand,
                            scand=shadow_cand if step == 0 else rest_cand)
        if cfg.pallas_early_exit and step > 0:
            # Tile-level divergence skip for later bounces: after the first
            # bounce most tiles have no surviving lane (sky / diffuse-only
            # tiles) — skip the bounce body when the whole tile is dead.
            # Exact: a bounce over an all-false active mask is a no-op on
            # every carried value.
            state = _tile_cond(jnp.max(state[6]) > 0, step_fn, state)
        else:
            state = step_fn(state)

    return state[5]


def _tile_origin(tile_rows: int, tile_cols: int, col_grid: bool):
    """This program's global pixel origin. Must be evaluated at kernel top
    level (``pl.program_id`` has no lowering inside traced while bodies in
    interpret mode); pass the result into :func:`_tile_rays`."""
    row0 = pl.program_id(0) * tile_rows
    col0 = pl.program_id(1) * tile_cols if col_grid else 0
    return row0, col0


def _tile_rays(cam_ref, cfg: RenderConfig, tile_rows: int, width: int,
               row0, col0):
    """This tile's camera rays (render.rs:808-815): pixel grid offset by the
    tile's global origin ``(row0, col0)``, rotated by the camera quaternion
    from SMEM scalars. Ray formulas keep absolute pixel coordinates, so the
    same kernel serves monolithic renders, column-tiled grids, and per-device
    shards (the origin then includes the device offset)."""
    xres, yres = cfg.xres, cfg.yres
    xfov = np.float32(cfg.xfov)
    yfov = np.float32(cfg.resolved_yfov())

    ix = lax.broadcasted_iota(jnp.int32, (tile_rows, width), 1) + col0
    iy = lax.broadcasted_iota(jnp.int32, (tile_rows, width), 0) + row0

    ex = jnp.ones((tile_rows, width), jnp.float32)
    ey = (ix - xres // 2).astype(jnp.float32) * (2.0 * xfov) / np.float32(xres)
    ez = -(iy - yres // 2).astype(jnp.float32) * (2.0 * yfov) / np.float32(yres)

    # Quaternion rotation q * (v,0) * conj(q) (quat.rs:74-80), with the
    # camera quat as SMEM scalars.
    qx, qy, qz, qw = (cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5], cam_ref[0, 6])
    # q * (v, 0)
    rx = qy * ez - qz * ey + qw * ex
    ry = qz * ex - qx * ez + qw * ey
    rz = qx * ey - qy * ex + qw * ez
    rw = -qx * ex - qy * ey - qz * ez
    # (...) * conj(q)
    vx = ry * (-qz) - rz * (-qy) + rx * qw + rw * (-qx)
    vy = rz * (-qx) - rx * (-qz) + ry * qw + rw * (-qy)
    vz = rx * (-qy) - ry * (-qx) + rz * qw + rw * (-qz)
    eye = Vec3(vx, vy, vz).normalized()

    # broadcast_to (not jnp.full): the backward kernel passes camera entries
    # pre-broadcast to tile shape as vjp arguments
    vi = Vec3(
        jnp.broadcast_to(cam_ref[0, 0], (tile_rows, width)),
        jnp.broadcast_to(cam_ref[0, 1], (tile_rows, width)),
        jnp.broadcast_to(cam_ref[0, 2], (tile_rows, width)),
    )
    return vi, eye


def _corner_dir(cam_ref, cfg: RenderConfig, ix, iy):
    """Unnormalized world-space direction of the camera ray at pixel
    (ix, iy) — scalar twin of :func:`_tile_rays`' per-lane formula."""
    xres, yres = cfg.xres, cfg.yres
    xfov = np.float32(cfg.xfov)
    yfov = np.float32(cfg.resolved_yfov())
    ex = jnp.float32(1.0)
    ey = (ix - xres // 2).astype(jnp.float32) * (2.0 * xfov) / np.float32(xres)
    ez = -(iy - yres // 2).astype(jnp.float32) * (2.0 * yfov) / np.float32(
        yres)
    qx, qy, qz, qw = (cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5],
                      cam_ref[0, 6])
    rx = qy * ez - qz * ey + qw * ex
    ry = qz * ex - qx * ez + qw * ey
    rz = qx * ey - qy * ex + qw * ez
    rw = -qx * ex - qy * ey - qz * ez
    vx = ry * (-qz) - rz * (-qy) + rx * qw + rw * (-qx)
    vy = rz * (-qx) - rx * (-qz) + ry * qw + rw * (-qy)
    vz = rx * (-qy) - ry * (-qx) + rz * qw + rw * (-qz)
    return (vx, vy, vz)


def _build_candidates(ks: _KernelScene, cfg: RenderConfig, cam_ref,
                      light_ref, tile_rows: int, tile_cols: int, row0, col0,
                      sphA_ref, sphS_ref, sphF_ref, flo_ref):
    """Per-tile object prefilter (``cfg.pallas_prefilter``; fori regime).

    The tile's rays all lie inside the convex pyramid over the rectangle of
    unnormalized ray directions at the tile's four corner pixels (the
    directions are an affine function of the pixel index, so the rectangle's
    pyramid is EXACTLY the set of positive ray directions). A sphere lying
    strictly more than its radius outside any of the pyramid's four planes
    (all through the camera) intersects no tile ray — cull it. Floors are
    always kept.

    Four SMEM candidate lists are written (KIND-SPLIT so the raycast scans
    each with a body specialized to its primitive):
    * ``sphA`` — primary-visible spheres (all four planes);
    * ``sphS`` — shadow-reachable spheres: shadow rays start on primary hit
      points (inside the pyramid) and travel along the light direction L,
      so their reachable region is the pyramid swept by [0,inf)*L. A
      halfspace {n.x >= 0} containing the pyramid still contains the swept
      region iff n.L >= 0 (the translate only increases n.x); only those
      planes cull.
    * ``sphF`` — ALL spheres (reflection bounces leave the pyramid, so
      later laps scan the full kind-split lists);
    * ``flo`` — all floors (never culled).

    Returns ``(nA, nS, nF, n_flo)`` as traced scalars. The
    unconditional-store trick keeps the loop branch-free: slot ``n`` is
    always written, and the cursor only advances past survivors."""
    c0 = jnp.int32(col0)
    r0 = jnp.int32(row0)
    corners = [
        _corner_dir(cam_ref, cfg, c0, r0),
        _corner_dir(cam_ref, cfg, c0 + (tile_cols - 1), r0),
        _corner_dir(cam_ref, cfg, c0 + (tile_cols - 1),
                    r0 + (tile_rows - 1)),
        _corner_dir(cam_ref, cfg, c0, r0 + (tile_rows - 1)),
    ]
    vc = tuple(sum(c[k] for c in corners) for k in range(3))
    lx, ly, lz = light_ref[0, 0], light_ref[0, 1], light_ref[0, 2]

    planes = []
    for a, b in zip(corners, corners[1:] + corners[:1]):
        nx = a[1] * b[2] - a[2] * b[1]
        ny = a[2] * b[0] - a[0] * b[2]
        nz = a[0] * b[1] - a[1] * b[0]
        s = nx * vc[0] + ny * vc[1] + nz * vc[2]
        flip = jnp.where(s < 0.0, jnp.float32(-1.0), jnp.float32(1.0))
        nx, ny, nz = nx * flip, ny * flip, nz * flip
        inv = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
        nx, ny, nz = nx * inv, ny * inv, nz * inv
        keep_s = (nx * lx + ny * ly + nz * lz) >= 0.0
        planes.append((nx, ny, nz, keep_s))

    camx, camy, camz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
    f, g = ks.f32, ks.i32

    def body(i, carry):
        nA, nS, nF, nfl = carry
        dx = f[i, 0] - camx
        dy = f[i, 1] - camy
        dz = f[i, 2] - camz
        r = f[i, 17]
        outA = jnp.bool_(False)
        outS = jnp.bool_(False)
        for nx, ny, nz, keep_s in planes:
            out_i = (nx * dx + ny * dy + nz * dz) < -r
            outA = outA | out_i
            outS = outS | (out_i & keep_s)
        is_sph = g[i, 0] == KIND_SPHERE
        keepA = is_sph & ~outA
        keepS = is_sph & ~outS
        sphA_ref[nA] = i
        sphS_ref[nS] = i
        sphF_ref[nF] = i
        flo_ref[nfl] = i
        return (nA + keepA.astype(jnp.int32),
                nS + keepS.astype(jnp.int32),
                nF + is_sph.astype(jnp.int32),
                nfl + (~is_sph).astype(jnp.int32))

    return lax.fori_loop(
        0, ks.n, body,
        (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)))


def _make_kernel(cfg: RenderConfig, n_objects: int, tile_rows: int,
                 tile_cols: int, col_grid: bool, tex_meta=None,
                 prefilter: bool = False, use_gtbl: bool = False):
    """Kernel body: generate this tile's camera rays (render.rs:808-815) and
    trace them to completion without leaving VMEM. ``org_ref`` carries the
    caller's global pixel origin (nonzero when this launch renders one
    device's shard of a mesh-partitioned image — parallel/shard.py).
    ``tex_meta = (n_textures, wmax)`` adds the texture chunk-table inputs
    (see :func:`_pack_textures`) for in-kernel texture fetch. ``prefilter``
    (fori regime) adds two SMEM scratch candidate lists filled by
    :func:`_build_candidates` at tile start."""

    def kernel(f32_ref, i32_ref, cam_ref, light_ref, org_ref, *rest):
        shape = (tile_rows, tile_cols)
        gtbl = None
        if use_gtbl:
            gtbl = rest[0]
            rest = rest[1:]
        if tex_meta is not None:
            tbl_ref, meta_ref = rest[0], rest[1]
            tex = (tbl_ref, meta_ref) + tex_meta
            rest = rest[2:]
        else:
            tex = None
        r_ref, g_ref, b_ref = rest[0:3]
        ks = _KernelScene(f32_ref, i32_ref, light_ref, n_objects, tex=tex,
                          gtbl=gtbl)
        row0, col0 = _tile_origin(tile_rows, tile_cols, col_grid)
        row0 = row0 + org_ref[0, 0]
        col0 = col0 + org_ref[0, 1]
        vi, eye = _tile_rays(cam_ref, cfg, tile_rows, tile_cols, row0, col0)

        prim_cand = shadow_cand = rest_cand = None
        if prefilter:
            sphA_ref, sphS_ref, sphF_ref, flo_ref = rest[3:7]
            nA, nS, nF, nfl = _build_candidates(
                ks, cfg, cam_ref, light_ref, tile_rows, tile_cols, row0,
                col0, sphA_ref, sphS_ref, sphF_ref, flo_ref)
            prim_cand = (sphA_ref, nA, flo_ref, nfl)
            shadow_cand = (sphS_ref, nS, flo_ref, nfl)
            rest_cand = (sphF_ref, nF, flo_ref, nfl)

        ig = jnp.full(shape, -1, jnp.int32)
        flags = jnp.zeros(shape, jnp.int32)
        out = _raytrace(ks, cfg, vi, eye, 0, ig, flags,
                        prim_cand=prim_cand, shadow_cand=shadow_cand,
                        rest_cand=rest_cand)

        r_ref[:] = out.r
        g_ref[:] = out.g
        b_ref[:] = out.b

    return kernel


def fwd_grid_spec(cfg: RenderConfig, shape=None):
    """Shared forward-kernel tiling: (grid, out_specs, padded shape,
    tile_cols, col_grid). Column tiles (``cfg.pallas_cols``) bound each
    tile's worst lane: the tile-level early exit (_tile_cond) and the march
    while_loop both run to their slowest lane, so narrower tiles skip more
    dead work. 0 = full image width (single column tile, 1D grid).
    ``shape`` overrides the output extent (a device's shard of the image)."""
    h, w = shape if shape is not None else (cfg.yres, cfg.xres)
    tile_rows = cfg.pallas_rows
    tile_cols = min(cfg.pallas_cols, w) if cfg.pallas_cols else w
    h_pad = ((h + tile_rows - 1) // tile_rows) * tile_rows
    w_pad = ((w + tile_cols - 1) // tile_cols) * tile_cols
    n_col_tiles = w_pad // tile_cols
    col_grid = n_col_tiles > 1
    if col_grid:
        grid = (h_pad // tile_rows, n_col_tiles)
        out_spec = pl.BlockSpec((tile_rows, tile_cols), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
    else:
        grid = (h_pad // tile_rows,)
        out_spec = pl.BlockSpec((tile_rows, tile_cols), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    return grid, out_spec, (h_pad, w_pad), tile_cols, col_grid


def render_color_pallas(scene: Scene, cfg: RenderConfig,
                        interpret: bool | None = None,
                        origin=None, shape=None) -> Color:
    """Forward render through the fused Pallas kernel. Not differentiable —
    use :func:`render_color_fast` for the custom-VJP pairing.

    ``interpret=None`` auto-selects: compiled on TPU, interpreter elsewhere
    (the Mosaic compiler only targets TPU; interpret mode keeps the whole
    path testable on the CPU backend).

    ``origin``/``shape`` render a sub-rectangle of the global image — the
    ray formulas keep absolute pixel coordinates, so a device holding one
    shard of a mesh-partitioned image passes its global offset here
    (parallel/shard.py); origin components may be traced (axis_index).

    Textured scenes additionally ship the chunked atlas to VMEM and fetch
    texels in-kernel (:meth:`_KernelScene.fetch_texture`)."""
    if not pallas_supported(scene, cfg):
        raise ValueError("scene/config outside the fused kernel's support "
                         "(march mode, oversized scene, or atlas beyond the "
                         "VMEM chunk cap); use the jnp path")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    h, w = shape if shape is not None else (cfg.yres, cfg.xres)
    tile_rows = cfg.pallas_rows
    grid, out_spec, (h_pad, w_pad), tile_cols, col_grid = fwd_grid_spec(
        cfg, (h, w))
    n = scene.objects.count

    f32t, i32t, cam, light = _pack_scene(scene)
    if origin is None:
        org = jnp.zeros((1, 2), jnp.int32)
    else:
        org = jnp.stack(
            [jnp.asarray(origin[0]), jnp.asarray(origin[1])]
        ).astype(jnp.int32).reshape(1, 2)

    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    in_specs = [smem(), smem(), smem(), smem(), smem()]
    inputs = [f32t, i32t, cam, light, org]
    use_gtbl = n > _KERNEL_UNROLL_MAX
    if use_gtbl:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)]
        inputs += [_pack_gather_table(scene)]
    tex_meta = None
    if scene.textures is not None:
        tbl, meta = _pack_textures(scene)
        tex_meta = (scene.textures.data.shape[0],
                    scene.textures.data.shape[2])
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM), smem()]
        inputs += [tbl, meta]
    prefilter = cfg.pallas_prefilter and n > _KERNEL_UNROLL_MAX
    kernel = _make_kernel(cfg, n, tile_rows, tile_cols, col_grid, tex_meta,
                          prefilter=prefilter, use_gtbl=use_gtbl)

    out_shape = jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32)
    r, g, b = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec,) * 3,
        out_shape=(out_shape,) * 3,
        scratch_shapes=(
            [pltpu.SMEM((n,), jnp.int32)] * 4 if prefilter else []
        ),
        interpret=interpret,
    )(*inputs)

    if h_pad != h or w_pad != w:
        r, g, b = r[:h, :w], g[:h, :w], b[:h, :w]
    return Color(r, g, b)


class _Rows:
    """Adapter giving ``x[i, c]`` access over nested tuples of scalars, so
    :class:`_KernelScene` / :func:`_tile_rays` work identically on Pallas refs
    (forward kernel) and on traced scalar values (backward kernel, where the
    scene table entries must be jax.vjp-differentiable arguments)."""

    def __init__(self, rows):
        self.rows = rows

    def __getitem__(self, key):
        i, c = key
        return self.rows[i][c]


def _probe_case(ks: _KernelScene, cfg: RenderConfig, cam_ref, tile_rows: int,
                tile_cols: int, row0, col0):
    """Cheap in-kernel forward probe classifying this tile for the pruned
    backward (no shadows, no sky, no shading — just the bounce chain's
    raycast/throughput/termination logic, render.rs:1156-1209):

    * 0 — every lane terminates at bounce 1 and no transparent hit: the
      one-bounce refraction-free program's gradients equal the full ones.
    * 1 — reflections continue but no transparent hit anywhere in the chain:
      the refraction-free full-depth program suffices (no sub-trace ever
      spawns because subtrees only spawn at transparent hits).
    * 2 — some lane hits a transparent material: full program.

    Conservative by construction: flags are OR'd over exactly the lanes whose
    shading contributions are unmasked in the real program."""
    shape = (tile_rows, tile_cols)
    vi, eye = _tile_rays(cam_ref, cfg, tile_rows, tile_cols, row0, col0)
    state = (
        vi, eye,
        jnp.zeros(shape, jnp.int32),              # flags
        jnp.full(shape, -1, jnp.int32),           # ig
        Color.full(1.0, 1.0, 1.0, shape),          # fcs
        jnp.ones(shape, jnp.int32),                # active
        jnp.int32(0),                              # any_refr
    )

    def make_step(lev_i):
        def fn(state):
            vi, eye, flags, ig, fcs, active_i, any_refr = state
            active = active_i != 0
            t, idx = ks.raycast(vi, eye, ig, flags)
            hit = jnp.isfinite(t)
            fields = ks.gather(idx)
            m = active & hit
            any_refr = jnp.maximum(
                any_refr,
                jnp.any(m & (fields.transparency > 0.0)).astype(jnp.int32),
            )
            fcs = Color(
                jnp.where(m, fcs.r * fields.specular.r, fcs.r),
                jnp.where(m, fcs.g * fields.specular.g, fcs.g),
                jnp.where(m, fcs.b * fields.specular.b, fcs.b),
            )
            cont = (m & (idx != 0) & (fcs.sum() > 0.1)
                    & (lev_i < cfg.max_reflections))
            t_safe = jnp.where(hit, t, 0.0)
            pt = vi + eye * t_safe
            n = ks.normal_at(fields, pt)
            vi, eye, flags, ig = _reflect_update(vi, eye, flags, ig, pt, n,
                                                 idx, cont)
            return (vi, eye, flags, ig, fcs, cont.astype(jnp.int32), any_refr)

        return fn

    cont1 = jnp.int32(0)
    for step in range(cfg.max_reflections):
        fn = make_step(step + 1)
        if step > 0:
            # skip dead bounces — probe cost for terminal tiles is 1 raycast
            state = _tile_cond(jnp.max(state[5]) > 0, fn, state)
        else:
            state = fn(state)
        if step == 0:
            cont1 = jnp.max(state[5])
    any_refr = state[6]
    return jnp.where(any_refr > 0, jnp.int32(2),
                     jnp.where(cont1 > 0, jnp.int32(1), jnp.int32(0)))


def _make_bwd_kernel(cfg: RenderConfig, n_objects: int, tile_rows: int,
                     tile_cols: int, n_out: int, col_grid: bool):
    """Backward kernel body: re-trace this tile (whole-program remat — zero
    forward residuals cross HBM) and run the reverse sweep in VMEM, reducing
    the tile's scene-parameter cotangents to ``n_out`` SMEM scalars.

    The differentiation happens at TRACE time: ``jax.vjp`` over the tile-level
    trace function emits plain jnp forward+transpose ops, which Mosaic
    compiles like any other kernel body. This is the hand-scheduled
    equivalent of a hand-written backward kernel, derived mechanically.

    The grid is 2D (row tiles × column tiles): the reverse sweep keeps every
    forward intermediate of the tile live at once, so tiles are bounded in
    BOTH dimensions to fit the register/VMEM budget (a full 1920-wide row
    tile spills ~140MB at f32).

    Tile-level early exit is disabled in the traced functions: the skip
    primitive is a while_loop (_tile_cond), which reverse-mode AD cannot
    cross. The pruning equivalent (``cfg.pallas_bwd_prune``) happens one
    level up instead: a cheap forward probe (:func:`_probe_case`) classifies
    the tile, and one of three *pre-differentiated* program variants runs —
    the while skip then wraps already-differentiated code, which reverse-mode
    AD never sees. The variants' outputs are exactly equal on the tiles they
    are dispatched to (the pruned work is fully masked in the full program),
    so this is a pure scheduling optimization."""
    cfg = cfg.with_(pallas_early_exit=False)
    # (probe case -> program): 0 = one bounce, no refraction; 1 = full
    # reflections, no refraction; 2 = full program.
    if cfg.pallas_bwd_prune and cfg.max_reflections > 1:
        variants = [
            cfg.with_(max_reflections=1, refraction_unroll=0),
            cfg.with_(refraction_unroll=0),
            cfg,
        ]
    else:
        variants = None

    def kernel(f32_ref, i32_ref, cam_ref, light_ref, gr_ref, gg_ref, gb_ref,
               out_ref, pr_ref, pg_ref, pb_ref):
        shape_t = (tile_rows, tile_cols)
        irows = tuple(
            tuple(i32_ref[i, c] for c in range(_I32_COLS))
            for i in range(n_objects)
        )
        # Every differentiable scene scalar enters the vjp PRE-BROADCAST to
        # tile shape. This keeps the whole reverse sweep elementwise: the
        # transpose of a use is an elementwise add into the arg's tile-shaped
        # cotangent, never a cross-lane reduction. (With rank-0 args, every
        # one of the ~n_out uses transposes into its own tile->scalar
        # reduction — measured to dominate the whole backward: a one-bounce
        # backward cost ~32 ms at 1080p, nearly the same as full depth.)
        fargs = tuple(
            tuple(jnp.broadcast_to(f32_ref[i, c], shape_t)
                  for c in range(_F32_COLS))
            for i in range(n_objects)
        )
        camargs = tuple(jnp.broadcast_to(cam_ref[0, k], shape_t)
                        for k in range(7))
        lightargs = tuple(jnp.broadcast_to(light_ref[0, k], shape_t)
                          for k in range(3))
        row0, col0 = _tile_origin(tile_rows, tile_cols, col_grid)

        def make_tile_fn(c: RenderConfig):
            def tile_fn(fargs, camargs, lightargs):
                ks = _KernelScene(_Rows(fargs), _Rows(irows),
                                  _Rows((lightargs,)), n_objects, unroll=True)
                vi, eye = _tile_rays(_Rows((camargs,)), c, tile_rows,
                                     tile_cols, row0, col0)
                ig = jnp.full(shape_t, -1, jnp.int32)
                flags = jnp.zeros(shape_t, jnp.int32)
                out = _raytrace(ks, c, vi, eye, 0, ig, flags)
                return out.r, out.g, out.b

            return tile_fn

        g = (gr_ref[...], gg_ref[...], gb_ref[...])

        def grads_for(c: RenderConfig):
            primal, vjp = jax.vjp(make_tile_fn(c), fargs, camargs, lightargs)
            gf, gc, gl = vjp(g)
            mats = [x for row in gf for x in row] + list(gc) + list(gl)
            assert len(mats) == n_out
            # One (n_out*tile_rows, tile_cols) block of per-pixel cotangents;
            # the scalar reduction happens ONCE, outside the kernel.
            ct = jnp.concatenate(mats, axis=0)
            # The re-traced primal rides along: the gradients are exact
            # derivatives of THIS forward (compiled as its own while body, its
            # rounding can flip knife-edge decisions vs the forward kernel);
            # exposing it lets callers/tests mask cotangents to pixels where
            # it agrees with their forward of record.
            return (ct,) + tuple(primal)

        if variants is None:
            state = grads_for(cfg)
        else:
            ks = _KernelScene(f32_ref, i32_ref, light_ref, n_objects)
            case = _probe_case(ks, cfg, cam_ref, tile_rows, tile_cols,
                               row0, col0)
            state = (
                jnp.zeros((n_out * tile_rows, tile_cols), jnp.float32),
                jnp.zeros(shape_t, jnp.float32),
                jnp.zeros(shape_t, jnp.float32),
                jnp.zeros(shape_t, jnp.float32),
            )
            for case_id, vcfg in enumerate(variants):
                state = _tile_cond(case == jnp.int32(case_id),
                                   lambda _s, c=vcfg: grads_for(c), state)

        ct, primal = state[0], state[1:]
        pr_ref[:], pg_ref[:], pb_ref[:] = primal

        # The TPU grid runs sequentially on one core, so the per-tile
        # cotangent blocks accumulate in place into the single VMEM output
        # block (constant index_map -> the accumulator never leaves VMEM
        # until the grid finishes). One vector add per tile.
        first = pl.program_id(0) == 0
        if col_grid:
            first = first & (pl.program_id(1) == 0)
        out_ref[:] = jnp.where(first, 0.0, out_ref[:]) + ct

    return kernel


def render_color_pallas_grads(scene: Scene, cfg: RenderConfig, g: Color,
                              interpret: bool | None = None,
                              return_primal: bool = False):
    """Scene cotangent via the round-3 re-trace backward kernel: per-tile
    partials summed over the grid, then pulled back through the
    (differentiable) scene pack.

    STATUS (r5): demoted to SECOND-OPINION ORACLE. The production gradient
    path is the site-reparameterized kernel (ops/pallas_bwd.py) — it covers
    strictly more (textures, fori_loop object counts) and measures faster
    (12.50 vs 14.39 ms chained fwd+bwd at 1080p, BENCH_NOTES r4). This
    kernel is kept because it derives the same cotangents by a completely
    independent mechanism (jax.vjp over a full re-trace, O(N) raycast loops
    and all, vs recorded-winner replay), which makes it a strong
    cross-check: tests/test_pallas_bwd.py::test_site_bwd_matches_retrace_
    oracle compares the two kernel-for-kernel. Not reachable from any
    config flag.

    ``return_primal=True`` additionally returns the backward's own re-traced
    image (the forward whose exact derivative the cotangent is — see
    :func:`_make_bwd_kernel`)."""
    if scene.objects.count > _KERNEL_UNROLL_MAX:
        raise ValueError(
            f"fused backward kernel supports <= {_KERNEL_UNROLL_MAX} objects "
            "(per-object scalar cotangents are unrolled); use the jnp VJP"
        )
    if scene.textures is not None:
        raise ValueError("fused backward kernel does not cover image "
                         "textures; use the jnp VJP")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    h, w = cfg.yres, cfg.xres
    tile_rows = cfg.pallas_rows
    tile_cols = min(cfg.pallas_bwd_cols, w) if cfg.pallas_bwd_cols else w
    h_pad = ((h + tile_rows - 1) // tile_rows) * tile_rows
    w_pad = ((w + tile_cols - 1) // tile_cols) * tile_cols
    n = scene.objects.count
    nf = n * _F32_COLS
    n_out = nf + 7 + 3

    f32t, i32t, cam, light = _pack_scene(scene)

    def pad_hw(a):
        # Zero cotangents for pad rows/cols: their rays are regular (finite)
        # out-of-frame camera rays, so zero incoming cotangent means zero
        # contribution to the scene gradient.
        if h_pad != h or w_pad != w:
            return jnp.pad(a, ((0, h_pad - h), (0, w_pad - w)))
        return a

    gr, gg, gb = pad_hw(g.r), pad_hw(g.g), pad_hw(g.b)

    # Single-column-tile images keep the 1D grid (bit-identical to the
    # untiled layout — a traced column offset, even a constant zero, reorders
    # interpret/compile-mode rounding enough to flip knife-edge decisions in
    # the re-trace); wide images tile columns so the reverse sweep's live set
    # fits VMEM.
    n_col_tiles = w_pad // tile_cols
    col_grid = n_col_tiles > 1
    if col_grid:
        grid = (h_pad // tile_rows, n_col_tiles)
        img_spec = pl.BlockSpec((tile_rows, tile_cols), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((n_out * tile_rows, tile_cols),
                                lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    else:
        grid = (h_pad // tile_rows,)
        img_spec = pl.BlockSpec((tile_rows, tile_cols), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((n_out * tile_rows, tile_cols),
                                lambda i: (0, 0), memory_space=pltpu.VMEM)

    kernel = _make_bwd_kernel(cfg, n, tile_rows, tile_cols, n_out, col_grid)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    img_shape = jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32)
    partials, pr, pg, pb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem(), smem(), smem(), smem()] + [img_spec] * 3,
        out_specs=(out_spec,) + (img_spec,) * 3,
        out_shape=(jax.ShapeDtypeStruct((n_out * tile_rows, tile_cols),
                                        jnp.float32),) + (img_shape,) * 3,
        # The reverse sweep's live set slightly exceeds Mosaic's default 16MB
        # scoped-vmem budget at 8x512 tiles; the chip has 128MB — let the
        # kernel use it rather than shrinking tiles (smaller tiles waste
        # cycles on pipeline bubbles).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ) if not interpret else None,
        interpret=interpret,
    )(f32t, i32t, cam, light, gr, gg, gb)

    # Single batched reduction of the accumulated per-pixel cotangent block.
    flat = partials.reshape(n_out, tile_rows, tile_cols).sum(axis=(1, 2))
    g_f32t = flat[:nf].reshape(n, _F32_COLS)
    g_cam = jnp.concatenate([flat[nf:nf + 7], jnp.zeros(1, jnp.float32)])
    g_cam = g_cam.reshape(1, 8)
    g_light = jnp.concatenate([flat[nf + 7:], jnp.zeros(1, jnp.float32)])
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


@functools.lru_cache(maxsize=None)
def _fast_fn(cfg: RenderConfig):
    """custom_vjp pairing: Pallas forward; backward either the fused Pallas
    backward kernel (``cfg.pallas_bwd``) or the jnp path's VJP. Both backwards
    re-trace (whole-program remat): zero saved residuals beyond the scene."""
    from .rays import camera_rays
    from .trace import trace_image

    def jnp_forward(scene):
        vi, eye = camera_rays(scene.camera.position, scene.camera.rotation, cfg)
        return trace_image(scene, cfg, vi, eye)

    @jax.custom_vjp
    def f(scene):
        return render_color_pallas(scene, cfg)

    def fwd(scene):
        return render_color_pallas(scene, cfg), scene

    def bwd(scene, g):
        if cfg.pallas_bwd_enabled():
            # Site-reparameterized backward: covers everything the forward
            # kernel covers (textures, fori_loop object counts). The round-3
            # re-trace backward (render_color_pallas_grads) is retained only
            # as the test suite's second-opinion oracle — see its docstring.
            from .pallas_bwd import render_color_pallas_grads_site

            return (render_color_pallas_grads_site(scene, cfg, g),)
        _, vjp = jax.vjp(jnp_forward, scene)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def _fast_march_fn(cfg: RenderConfig):
    """custom_vjp pairing for march mode: fused Pallas march kernel forward
    (ops/pallas_march.py), jnp while-march backward. The backward re-renders
    through the batched while_loop march, whose gradients are the closed-form
    implicit VJP (ops/march.py) — no fixed-budget scan unrolling."""
    from .rays import camera_rays
    from .trace import trace_image

    def jnp_forward(scene):
        vi, eye = camera_rays(scene.camera.position, scene.camera.rotation, cfg)
        return trace_image(scene, cfg, vi, eye)

    from .pallas_march import render_color_pallas_march

    @jax.custom_vjp
    def f(scene):
        return render_color_pallas_march(scene, cfg)

    def fwd(scene):
        return render_color_pallas_march(scene, cfg), scene

    def bwd(scene, g):
        if cfg.pallas_bwd_enabled():
            # Site-recording march backward (ops/pallas_bwd.py): re-marches in
            # kernel (whole-program remat) and replays with the Newton-
            # reparameterized hit — ~a second march-kernel pass instead of the
            # jnp while-march re-render (~10x at 720p, and none of its
            # multi-thousand-second XLA compile).
            from .pallas_bwd import render_color_pallas_march_grads

            return (render_color_pallas_march_grads(scene, cfg, g),)
        _, vjp = jax.vjp(jnp_forward, scene)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def render_color_fast(scene: Scene, cfg: RenderConfig) -> Color:
    """Differentiable render with the fused Pallas forward kernels (trace or
    march) and the fused-backward/jnp VJP. Falls back to the jnp path when no
    kernel covers the scene/config (differentiable march, >512 objects)."""
    if pallas_supported(scene, cfg):
        return _fast_fn(cfg)(scene)
    from .pallas_march import pallas_march_supported

    if pallas_march_supported(scene, cfg):
        return _fast_march_fn(cfg)(scene)
    from .rays import camera_rays
    from .trace import trace_image

    vi, eye = camera_rays(scene.camera.position, scene.camera.rotation, cfg)
    return trace_image(scene, cfg, vi, eye)
