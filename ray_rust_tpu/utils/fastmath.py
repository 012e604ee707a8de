"""Mosaic-lowerable f32 inverse-trig: atan / atan2 / asin.

Pallas TPU (Mosaic) has no lowering for ``atan2``/``asin``/``atan``, which the
sky shader (src/main.rs:233-236) and the lat-long UV projection
(src/render.rs:225-232) need. These are branch-free Cephes ``atanf``/``asinf``
style implementations (range reduction + odd minimax polynomial) — accurate to
a couple of f32 ulps, the same construction libm's f32 entry points use, so
they sit at least as close to the Rust reference's ``f32::atan2``/``asin`` as
XLA's own lowering does. Used by BOTH the jnp and Pallas trace paths so the
two stay numerically aligned.

Only plain jnp elementwise ops are used (mul/add/div/sqrt/select), so the same
code traces under XLA and Mosaic and is differentiable everywhere it is smooth.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["atan", "atan2", "asin"]

_PI = np.float32(np.pi)
_PIO2 = np.float32(np.pi / 2)
_PIO4 = np.float32(np.pi / 4)
_TAN3PIO8 = np.float32(2.414213562373095)  # tan(3π/8)
_TANPIO8 = np.float32(0.4142135623730950)  # tan(π/8)


def atan(x):
    """f32 arctangent (Cephes atanf): range-reduce to [0, tan(π/8)] then a
    degree-9 odd minimax polynomial."""
    x = jnp.asarray(x, jnp.float32)
    sign = jnp.where(x < 0.0, jnp.float32(-1.0), jnp.float32(1.0))
    a = jnp.abs(x)

    big = a > _TAN3PIO8
    mid = (a > _TANPIO8) & ~big

    a_safe = jnp.where(big, a, 1.0)  # divisor guard (a > 2.41 when used)
    xr = jnp.where(big, -1.0 / a_safe, jnp.where(mid, (a - 1.0) / (a + 1.0), a))
    y0 = jnp.where(big, _PIO2, jnp.where(mid, _PIO4, jnp.float32(0.0)))

    z = xr * xr
    p = (
        ((np.float32(8.05374449538e-2) * z - np.float32(1.38776856032e-1)) * z
         + np.float32(1.99777106478e-1)) * z
        - np.float32(3.33329491539e-1)
    ) * z * xr + xr
    return sign * (y0 + p)


def atan2(y, x):
    """f32 ``atan2(y, x)`` with the libm quadrant/axis conventions the Rust
    reference inherits (f32::atan2 -> atan2f)."""
    y = jnp.asarray(y, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    x_zero = x == 0.0
    x_safe = jnp.where(x_zero, jnp.float32(1.0), x)
    z = atan(y / x_safe)
    w = jnp.where(x < 0.0, jnp.where(y < 0.0, -_PI, _PI), jnp.float32(0.0))
    res = w + z
    on_axis = jnp.where(
        y > 0.0, _PIO2, jnp.where(y < 0.0, -_PIO2, jnp.float32(0.0))
    )
    return jnp.where(x_zero, on_axis, res)


def asin(x):
    """f32 arcsine (Cephes asinf); inputs are clamped to [-1, 1] (callers in
    the render path clip anyway, matching the reference's pre-clamped use)."""
    x = jnp.asarray(x, jnp.float32)
    sign = jnp.where(x < 0.0, jnp.float32(-1.0), jnp.float32(1.0))
    a = jnp.minimum(jnp.abs(x), 1.0)

    flag = a > 0.5
    z = jnp.where(flag, 0.5 * (1.0 - a), a * a)
    # safe sqrt argument: when flag is False the sqrt branch is unselected, but
    # its VJP would still be 0/(2*sqrt(0)) = NaN at z == 0 (e.g. rays with
    # y == 0); feed it 1.0 there so the masked cotangent stays finite.
    xr = jnp.where(flag, jnp.sqrt(jnp.where(flag, z, 1.0)), a)

    p = (
        (((np.float32(4.2163199048e-2) * z + np.float32(2.4181311049e-2)) * z
          + np.float32(4.5470025998e-2)) * z
         + np.float32(7.4953002686e-2)) * z
        + np.float32(1.6666752422e-1)
    ) * z * xr + xr
    res = jnp.where(flag, _PIO2 - 2.0 * p, p)
    return sign * res
