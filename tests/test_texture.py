"""Texture sampling parity vs the scalar oracle.

Covers the reference's ``lookup_texture`` image path (render.rs:249-296):
nearest (truncate-toward-zero + imod wrap) and bilinear (fimod fractional
split + umod-wrapped 4-texel blend, pixel math pixelutil.rs:4-13), on
non-square textures and negative/fractional UVs, through the padded-atlas
TextureBank (models/material.py).
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, "tests")
from oracle import OMat, lookup_texture  # noqa: E402

from ray_rust_tpu.models.material import (
    FILTER_BILINEAR,
    FILTER_NEAREST,
    MaterialSpec,
    build_material_table,
)
from ray_rust_tpu.ops.texture import _sample_texture


@pytest.fixture(scope="module")
def bank_and_textures():
    rng = np.random.default_rng(42)
    tex_a = rng.integers(0, 256, (3, 5, 3), np.uint8)  # (H=3, W=5)
    tex_b = rng.integers(0, 256, (7, 4, 3), np.uint8)  # (H=7, W=4)
    specs = [
        MaterialSpec(name="a", texture=tex_a),
        MaterialSpec(name="b", texture=tex_b),
    ]
    table, bank = build_material_table(specs)
    assert bank is not None and bank.data.shape == (2, 7, 5, 3)
    return bank, [tex_a, tex_b]


UVS = [
    (0.0, 0.0), (0.3, 0.7), (0.999, 0.001), (1.5, 2.25), (-0.3, -1.7),
    (-5.25, 3.8), (0.5, -0.5), (12.34, -56.78),
]


@pytest.mark.parametrize("filt_name,filt_id", [("nearest", FILTER_NEAREST),
                                               ("bilinear", FILTER_BILINEAR)])
@pytest.mark.parametrize("tex_id", [0, 1])
def test_sample_matches_oracle(bank_and_textures, filt_name, filt_id, tex_id):
    bank, textures = bank_and_textures
    mat = OMat(diffuse=(1, 1, 1), specular=(0, 0, 0), pn=0, t=0.0, n=0.0,
               texture=textures[tex_id], texture_filter=filt_name)

    us = jnp.asarray([u for u, _ in UVS], jnp.float32)
    vs = jnp.asarray([v for _, v in UVS], jnp.float32)
    tid = jnp.full(us.shape, tex_id, jnp.int32)
    fid = jnp.full(us.shape, filt_id, jnp.int32)
    got = _sample_texture(bank, tid, fid, us, vs)
    got = np.stack([np.asarray(got.r), np.asarray(got.g), np.asarray(got.b)], -1)

    want = np.stack(
        [lookup_texture(mat, np.float32(u), np.float32(v)) for u, v in UVS]
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_mixed_filters_per_hit(bank_and_textures):
    """Filter id is a per-hit array — both filters in one batched call."""
    bank, textures = bank_and_textures
    u, v = 0.3, 0.7
    tid = jnp.asarray([0, 0], jnp.int32)
    fid = jnp.asarray([FILTER_NEAREST, FILTER_BILINEAR], jnp.int32)
    got = _sample_texture(bank, tid, fid,
                          jnp.full(2, u, jnp.float32), jnp.full(2, v, jnp.float32))
    for i, name in enumerate(["nearest", "bilinear"]):
        mat = OMat(diffuse=(1, 1, 1), specular=(0, 0, 0), pn=0, t=0.0, n=0.0,
                   texture=textures[0], texture_filter=name)
        want = lookup_texture(mat, np.float32(u), np.float32(v))
        np.testing.assert_allclose(
            [float(got.r[i]), float(got.g[i]), float(got.b[i])], want, atol=1e-6
        )
