"""UV mapping, procedural patterns, and texture sampling.

Replaces the reference's ``get_uv`` (src/render.rs:220-233) and
``lookup_texture`` (render.rs:249-316): all four UV projections and all three
patterns are computed branch-free and selected per hit; image textures sample a
padded atlas with the reference's exact wrap arithmetic (modutil) and the
Nearest/Bilinear filters (render.rs:253-296, pixel blend pixelutil.rs:4-13).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.material import (
    FILTER_BILINEAR,
    PATTERN_CHECKERBOARD,
    PATTERN_GRADATION,
    UVMAP_LL,
    UVMAP_YZ,
    UVMAP_ZX,
)
from ..models.scene import Scene
from ..models.vec import Color, Vec3
from ..utils.fastmath import atan2
from ..utils.modutil import fimod, fmod, imod, umod

__all__ = ["get_uv", "lookup_diffuse", "sample_texture_packed"]


def get_uv(rel: Vec3, uvmap, pattern_scale, pattern_angle_scale):
    """UV coordinates of the hit position relative to the object origin
    (render.rs:220-233). ``uvmap`` is the per-hit projection id."""
    ps = pattern_scale
    u = rel.x / ps
    v = rel.y / ps
    u = jnp.where(uvmap == UVMAP_YZ, rel.y / ps, u)
    v = jnp.where(uvmap == UVMAP_YZ, rel.z / ps, v)
    u = jnp.where(uvmap == UVMAP_ZX, rel.z / ps, u)
    v = jnp.where(uvmap == UVMAP_ZX, rel.x / ps, v)
    # Lat-long projection (render.rs:225-232); atan2 via utils/fastmath so the
    # same code lowers under Mosaic in the fused Pallas kernel.
    u_ll = atan2(rel.z, rel.x) / pattern_angle_scale
    v_ll = atan2(jnp.sqrt(rel.x * rel.x + rel.z * rel.z), rel.y) / pattern_angle_scale
    u = jnp.where(uvmap == UVMAP_LL, u_ll, u)
    v = jnp.where(uvmap == UVMAP_LL, v_ll, v)
    return u, v


def _sample_texture(bank, tex_id, filt, u, v) -> Color:
    """Sample the texture atlas with wrap-around, Nearest or Bilinear
    (render.rs:253-296). ``tex_id`` must be pre-clamped to valid rows."""
    w = jnp.take(bank.widths, tex_id)
    h = jnp.take(bank.heights, tex_id)
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    def texel(x, y):
        # (T,Hmax,Wmax,3) advanced-indexing gather; u8 -> f32 in [0,256)
        p = bank.data[tex_id, y, x]
        return p.astype(jnp.float32)

    # Nearest (render.rs:253-266): `(u*w) as i32` truncates toward zero.
    nx = imod(jnp.trunc(u * wf).astype(jnp.int32), w)
    ny = imod(jnp.trunc(v * hf).astype(jnp.int32), h)
    p_near = texel(nx, ny)

    # Bilinear (render.rs:267-296)
    fu, iu = fimod(u * wf, wf)
    fv, iv = fimod(v * hf, hf)
    p00 = texel(iu, iv)
    p01 = texel(iu, umod(iv + 1, h))
    p10 = texel(umod(iu + 1, w), iv)
    p11 = texel(umod(iu + 1, w), umod(iv + 1, h))
    fu = fu[..., None]
    fv = fv[..., None]
    p_bi = (
        (1.0 - fu) * (1.0 - fv) * p00
        + (1.0 - fu) * fv * p01
        + fu * (1.0 - fv) * p10
        + fu * fv * p11
    )

    p = jnp.where((filt == FILTER_BILINEAR)[..., None], p_bi, p_near) / 256.0
    return Color(p[..., 0], p[..., 1], p[..., 2])


def sample_texture_packed(bank, tex_id, filt, u, v) -> Color:
    """Single-gather texture sample against the neighborhood-packed atlas
    (``TextureBank.packed``). Numerically identical to
    :func:`_sample_texture` — same wrap arithmetic (render.rs:253-296), same
    bilinear term order (pixelutil.rs:4-13) — but both filters are served by
    ONE gather of 12 u8 channels. This is the deferred texture pass behind
    the fused Pallas kernel (ops/pallas_trace.py records per-hit uv/weight
    slots; this function resolves them)."""
    w = jnp.take(bank.widths, tex_id)
    h = jnp.take(bank.heights, tex_id)
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    # Nearest indices (render.rs:253-266): `(u*w) as i32` truncates to zero.
    nx = imod(jnp.trunc(u * wf).astype(jnp.int32), w)
    ny = imod(jnp.trunc(v * hf).astype(jnp.int32), h)
    # Bilinear base indices (render.rs:267-296).
    fu, iu = fimod(u * wf, wf)
    fv, iv = fimod(v * hf, hf)

    bilin = filt == FILTER_BILINEAR
    ix = jnp.where(bilin, iu, nx)
    iy = jnp.where(bilin, iv, ny)
    quad = bank.packed[tex_id, iy, ix].astype(jnp.float32)  # (..., 12)
    p00 = quad[..., 0:3]
    p10 = quad[..., 3:6]
    p01 = quad[..., 6:9]
    p11 = quad[..., 9:12]
    fu = fu[..., None]
    fv = fv[..., None]
    p_bi = (
        (1.0 - fu) * (1.0 - fv) * p00
        + (1.0 - fu) * fv * p01
        + fu * (1.0 - fv) * p10
        + fu * fv * p11
    )
    p = jnp.where(bilin[..., None], p_bi, p00) / 256.0
    return Color(p[..., 0], p[..., 1], p[..., 2])


def lookup_diffuse(scene: Scene, fields, uv) -> Color:
    """Diffuse color at a hit: image texture if present, else pattern
    (render.rs:249-316). ``fields`` carries the pre-gathered per-hit material
    properties (ops/gather.py)."""
    u, v = uv
    diffuse = fields.diffuse
    pattern = fields.pattern

    # Checkerboard (render.rs:301-309): black when floor(u)+floor(v) is even.
    ix = jnp.floor(u).astype(jnp.int32)
    iy = jnp.floor(v).astype(jnp.int32)
    checker_black = jnp.mod(ix + iy, 2) == 0

    col = diffuse
    col = Color(
        jnp.where((pattern == PATTERN_CHECKERBOARD) & checker_black, 0.0, col.r),
        jnp.where((pattern == PATTERN_CHECKERBOARD) & checker_black, 0.0, col.g),
        jnp.where((pattern == PATTERN_CHECKERBOARD) & checker_black, 0.0, col.b),
    )
    # RepeatedGradation (render.rs:310-314)
    grad = Color(diffuse.r * fmod(u, 1.0), diffuse.g * fmod(v, 1.0), diffuse.b)
    is_grad = pattern == PATTERN_GRADATION
    col = grad.where(is_grad, col)

    if scene.textures is not None:
        tex_id = fields.texture_id
        filt = fields.texture_filter
        tid_safe = jnp.maximum(tex_id, 0)
        # Packed sampler: numerically identical to _sample_texture but ONE
        # gather instead of four (XLA gather is scalar-core bound on TPU).
        tex_col = sample_texture_packed(scene.textures, tid_safe, filt, u, v)
        col = tex_col.where(tex_id >= 0, col)
    return col
