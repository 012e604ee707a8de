"""Background shaders.

The reference's background is a fn pointer on the env (``bgproc``,
src/render.rs:661); the only implementation is the procedural stripe-grid sky
with a 3-tier sun glare in src/main.rs:231-260. Here backgrounds are a small
registry of jnp functions keyed by name (the key is what scene files persist,
since code pointers never serialize — render.rs:741-743 note).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.vec import Color, Vec3
from ..utils.fastmath import asin, atan2
from ..utils.modutil import rust_rem

__all__ = ["default_sky", "black_bg", "get_bg", "BACKGROUNDS"]

_PI = np.float32(np.pi)


def default_sky(light: Vec3, direction: Vec3) -> Color:
    """Angular stripe grid + sun glare (exact port of main.rs:231-260).

    ``light`` is the normalized scene light direction; ``direction`` the
    (normalized) ray direction. Fully branch-free.
    """
    # Mosaic-lowerable inverse trig (utils/fastmath.py) — shared by the jnp
    # and Pallas paths so both stay numerically aligned.
    phi = atan2(direction.z, direction.x)
    the = asin(jnp.clip(direction.y, -1.0, 1.0))
    # Rust `%` is a truncated remainder; arguments here are always positive so
    # it coincides with floor-mod, but rust_rem keeps exact semantics.
    d = rust_rem(50.0 * _PI + phi * 10.0 * _PI, 2.0 * _PI) - _PI
    dd = rust_rem(50.0 * _PI + the * 10.0 * _PI, 2.0 * _PI) - _PI

    base_r = 0.5 / (15.0 * (d * d * dd * dd) + 1.0)
    base_g = 0.25 - direction.y / 4.0
    base_b = 0.25 - direction.y / 4.0

    dot = light.dot(direction)

    # tier: dot > 0.995 adds (dot-0.995)*150 to all channels
    glare = jnp.where(dot > 0.995, (dot - 0.995) * 150.0, 0.0)
    # tier: dot > 0.9 adds (dot-0.9)*5 to r and g only
    dot2 = jnp.where(dot > 0.9, (dot - 0.9) * 5.0, 0.0)

    r = base_r + glare + dot2
    g = base_g + glare + dot2
    b = base_b + glare

    # innermost tier: dot > 0.9995 → pure white (2,2,2)
    sun = dot > 0.9995
    return Color(
        jnp.where(sun, 2.0, r),
        jnp.where(sun, 2.0, g),
        jnp.where(sun, 2.0, b),
    )


def black_bg(light: Vec3, direction: Vec3) -> Color:
    z = jnp.zeros_like(direction.x)
    return Color(z, z, z)


BACKGROUNDS = {
    "default_sky": default_sky,
    "black": black_bg,
}


def get_bg(name: str):
    try:
        return BACKGROUNDS[name]
    except KeyError:
        raise KeyError(f"unknown background {name!r}; known: {list(BACKGROUNDS)}")
