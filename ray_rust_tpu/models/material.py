"""Materials: host-side spec + device-side structure-of-arrays table.

Replaces the reference's ``RenderMaterial`` (src/render.rs:82-317). Where the
reference shares one ``Arc<RenderMaterial>`` per object, the TPU build stacks
every material field into a table of ``(M,)`` arrays; objects refer to rows by
index and the shading kernel gathers per-hit fields with ``jnp.take``. All
continuous fields are differentiable scene parameters.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .vec import Color

__all__ = [
    "PATTERN_SOLID",
    "PATTERN_CHECKERBOARD",
    "PATTERN_GRADATION",
    "FILTER_NEAREST",
    "FILTER_BILINEAR",
    "UVMAP_XY",
    "UVMAP_YZ",
    "UVMAP_ZX",
    "UVMAP_LL",
    "MaterialSpec",
    "MaterialTable",
    "TextureBank",
    "build_material_table",
    "load_texture",
]

# RenderPattern (render.rs:44-49)
PATTERN_SOLID = 0
PATTERN_CHECKERBOARD = 1
PATTERN_GRADATION = 2

# TextureFilter (render.rs:59-63)
FILTER_NEAREST = 0
FILTER_BILINEAR = 1

# UVMap (render.rs:51-57)
UVMAP_XY = 0
UVMAP_YZ = 1
UVMAP_ZX = 2
UVMAP_LL = 3

PATTERN_NAMES = {PATTERN_SOLID: "Solid", PATTERN_CHECKERBOARD: "Checkerboard",
                 PATTERN_GRADATION: "RepeatedGradation"}
PATTERN_IDS = {v: k for k, v in PATTERN_NAMES.items()}
FILTER_NAMES = {FILTER_NEAREST: "Nearest", FILTER_BILINEAR: "Bilinear"}
FILTER_IDS = {v: k for k, v in FILTER_NAMES.items()}
UVMAP_NAMES = {UVMAP_XY: "XY", UVMAP_YZ: "YZ", UVMAP_ZX: "ZX", UVMAP_LL: "LL"}
UVMAP_IDS = {v: k for k, v in UVMAP_NAMES.items()}


@dataclasses.dataclass
class MaterialSpec:
    """Host-side material description (builder analogue of render.rs:106-181)."""

    name: str
    diffuse: tuple = (0.0, 0.0, 0.0)
    specular: tuple = (0.0, 0.0, 0.0)
    pn: int = 0  # Phong exponent
    transparency: float = 0.0  # ``t``
    refraction: float = 0.0  # ``n``
    glow_dist: float = 0.0
    frac: tuple = (1.0, 1.0, 1.0)  # per-spectrum refraction (vestigial)
    pattern: int = PATTERN_SOLID
    pattern_scale: float = 1.0
    pattern_angle_scale: float = 1.0
    texture_name: str = ""
    texture_filter: int = FILTER_NEAREST
    texture: Optional[np.ndarray] = None  # (H, W, 3) uint8, RGB only

    def texture_ok(self, path: str) -> "MaterialSpec":
        """Attach a texture image, quietly ignoring load failure
        (render.rs:177-181)."""
        self.texture_name = path
        self.texture = load_texture(path)
        return self


def load_texture(path: str) -> Optional[np.ndarray]:
    """Load an RGB8 texture. Returns None on failure or non-RGB images — the
    reference only samples ``DynamicImage::ImageRgb8`` (render.rs:251) and
    falls back to the procedural pattern otherwise."""
    try:
        from PIL import Image

        img = Image.open(path)
    except Exception:
        return None
    if img.mode != "RGB":
        return None
    return np.asarray(img, dtype=np.uint8)


@jax.tree_util.register_pytree_node_class
class TextureBank:
    """Stacked, zero-padded texture atlas: ``data (T, Hmax, Wmax, 3)`` u8 with
    per-texture true sizes. Lives in HBM; lookups gather per-hit texels.

    ``packed`` additionally stores each texel's 2x2 wrap-around neighborhood
    (p00, p10, p01, p11 — x-then-y order, 12 u8 channels), so a bilinear
    sample needs ONE gather of 12 channels instead of four 3-channel gathers.
    This is what makes the deferred texture pass behind the fused Pallas
    kernel (ops/pallas_trace.py) cheap: per texture-hit slot, exactly one
    XLA gather against ``packed``.

    ``n_taps`` is STATIC pytree aux (1 when no textured material uses
    bilinear filtering — the reference's default (render.rs:59-63) — else
    4): the fused kernels read it at trace time and pack/gather only the
    taps the scene can ever blend, quartering the in-kernel chunk gather's
    work for nearest-only scenes. The jnp path keeps using the full
    12-channel ``packed``."""

    def __init__(self, data, heights, widths, packed, n_taps: int = 4):
        self.data = data
        self.heights = heights
        self.widths = widths
        self.packed = packed
        self.n_taps = int(n_taps)

    def tree_flatten(self):
        return ((self.data, self.heights, self.widths, self.packed),
                self.n_taps)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, n_taps=aux)


class MaterialTable(NamedTuple):
    """Device-side SoA material table; every leaf has leading dim ``(M,)``."""

    diffuse: Color
    specular: Color
    pn: jnp.ndarray  # f32 (powers are computed in f32)
    transparency: jnp.ndarray
    refraction: jnp.ndarray
    glow_dist: jnp.ndarray
    frac: Color
    pattern: jnp.ndarray  # int32
    pattern_scale: jnp.ndarray
    pattern_angle_scale: jnp.ndarray
    texture_id: jnp.ndarray  # int32, -1 = none
    texture_filter: jnp.ndarray  # int32


def build_material_table(specs: Sequence[MaterialSpec]):
    """Stack host specs into a :class:`MaterialTable` (+ optional TextureBank).

    Returns ``(table, bank_or_None)``; ``specs`` order defines material ids.
    """
    def f32(vals):
        return jnp.asarray(np.asarray(vals, np.float32))

    def i32(vals):
        return jnp.asarray(np.asarray(vals, np.int32))

    textures = []
    tex_ids = []
    for s in specs:
        if s.texture is not None:
            tex_ids.append(len(textures))
            textures.append(s.texture)
        else:
            tex_ids.append(-1)

    bank = None
    if textures:
        hmax = max(t.shape[0] for t in textures)
        wmax = max(t.shape[1] for t in textures)
        data = np.zeros((len(textures), hmax, wmax, 3), np.uint8)
        packed = np.zeros((len(textures), hmax, wmax, 12), np.uint8)
        hs, ws = [], []
        for i, t in enumerate(textures):
            h, w = t.shape[:2]
            data[i, :h, :w] = t
            xp = (np.arange(w) + 1) % w
            yp = (np.arange(h) + 1) % h
            packed[i, :h, :w, 0:3] = t
            packed[i, :h, :w, 3:6] = t[:, xp]  # (x+1 wrap, y)
            packed[i, :h, :w, 6:9] = t[yp, :]  # (x, y+1 wrap)
            packed[i, :h, :w, 9:12] = t[yp][:, xp]  # (x+1, y+1)
            hs.append(h)
            ws.append(w)
        any_bilinear = any(
            s.texture is not None and s.texture_filter == FILTER_BILINEAR
            for s in specs
        )
        bank = TextureBank(jnp.asarray(data), i32(hs), i32(ws),
                           jnp.asarray(packed),
                           n_taps=4 if any_bilinear else 1)

    table = MaterialTable(
        diffuse=Color(*(f32([s.diffuse[c] for s in specs]) for c in range(3))),
        specular=Color(*(f32([s.specular[c] for s in specs]) for c in range(3))),
        pn=f32([s.pn for s in specs]),
        transparency=f32([s.transparency for s in specs]),
        refraction=f32([s.refraction for s in specs]),
        glow_dist=f32([s.glow_dist for s in specs]),
        frac=Color(*(f32([s.frac[c] for s in specs]) for c in range(3))),
        pattern=i32([s.pattern for s in specs]),
        pattern_scale=f32([s.pattern_scale for s in specs]),
        pattern_angle_scale=f32([s.pattern_angle_scale for s in specs]),
        texture_id=i32(tex_ids),
        texture_filter=i32([s.texture_filter for s in specs]),
    )
    return table, bank
