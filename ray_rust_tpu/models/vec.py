"""Batched 3-vector and RGB color pytrees.

TPU-first replacement for the reference's scalar ``Vec3`` (src/vec3.rs:4-108)
and ``RenderColor`` (src/render.rs:23-42). Instead of arrays with a trailing
``(..., 3)`` axis — which would put a size-3 dimension in the TPU lane position —
each component is its own array. A ``Vec3`` of shape ``(H, W)`` components keeps
the image width in the 128-lane minor dimension, so every op maps cleanly onto
the VPU, and the whole structure is a JAX pytree (differentiable, shardable).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["Vec3", "Color", "v3", "color"]


class Vec3(NamedTuple):
    """Structure-of-arrays 3-vector; components broadcast like jnp arrays."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- arithmetic (mirrors vec3.rs operator impls, but batched) -----------
    def __add__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __neg__(self) -> "Vec3":
        return Vec3(-self.x, -self.y, -self.z)

    def __mul__(self, s) -> "Vec3":
        return Vec3(self.x * s, self.y * s, self.z * s)

    __rmul__ = __mul__

    def dot(self, o: "Vec3"):
        """Scalar product (vec3.rs:24-26)."""
        return self.x * o.x + self.y * o.y + self.z * o.z

    def squared_len(self):
        return self.dot(self)

    def len(self):
        return jnp.sqrt(self.squared_len())

    def normalized(self) -> "Vec3":
        """Unit vector (vec3.rs:36-39): ``v / sqrt(v·v)`` with the reference's
        exact sqrt+divide formulation (not rsqrt — parity over speed); safe at
        zero length for autodiff."""
        sq = self.squared_len()
        ln = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
        ok = sq > 0
        return Vec3(
            jnp.where(ok, self.x / ln, 0.0),
            jnp.where(ok, self.y / ln, 0.0),
            jnp.where(ok, self.z / ln, 0.0),
        )

    def cross(self, o: "Vec3") -> "Vec3":
        return Vec3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def where(self, mask, other: "Vec3") -> "Vec3":
        """Elementwise select: ``mask ? self : other``."""
        return Vec3(
            jnp.where(mask, self.x, other.x),
            jnp.where(mask, self.y, other.y),
            jnp.where(mask, self.z, other.z),
        )

    def astype(self, dtype) -> "Vec3":
        return Vec3(self.x.astype(dtype), self.y.astype(dtype), self.z.astype(dtype))

    @property
    def shape(self):
        return jnp.shape(self.x)

    def broadcast_to(self, shape) -> "Vec3":
        return Vec3(
            jnp.broadcast_to(self.x, shape),
            jnp.broadcast_to(self.y, shape),
            jnp.broadcast_to(self.z, shape),
        )

    def take(self, idx, axis=0) -> "Vec3":
        return Vec3(
            jnp.take(self.x, idx, axis=axis),
            jnp.take(self.y, idx, axis=axis),
            jnp.take(self.z, idx, axis=axis),
        )

    @staticmethod
    def zero(shape=(), dtype=jnp.float32) -> "Vec3":
        z = jnp.zeros(shape, dtype)
        return Vec3(z, z, z)

    @staticmethod
    def stack_scalar(x, y, z) -> "Vec3":
        """Build from python/np scalars as f32 arrays."""
        return Vec3(
            jnp.asarray(x, jnp.float32),
            jnp.asarray(y, jnp.float32),
            jnp.asarray(z, jnp.float32),
        )


def jax_rsqrt(x):
    import jax.lax as lax

    return lax.rsqrt(x)


class Color(NamedTuple):
    """Structure-of-arrays RGB color (reference RenderColor, render.rs:23-42)."""

    r: jnp.ndarray
    g: jnp.ndarray
    b: jnp.ndarray

    def __add__(self, o: "Color") -> "Color":
        return Color(self.r + o.r, self.g + o.g, self.b + o.b)

    def __sub__(self, o: "Color") -> "Color":
        return Color(self.r - o.r, self.g - o.g, self.b - o.b)

    def __mul__(self, s) -> "Color":
        if isinstance(s, Color):
            return Color(self.r * s.r, self.g * s.g, self.b * s.b)
        return Color(self.r * s, self.g * s, self.b * s)

    __rmul__ = __mul__

    def sum(self):
        return self.r + self.g + self.b

    def where(self, mask, other: "Color") -> "Color":
        return Color(
            jnp.where(mask, self.r, other.r),
            jnp.where(mask, self.g, other.g),
            jnp.where(mask, self.b, other.b),
        )

    def astype(self, dtype) -> "Color":
        return Color(self.r.astype(dtype), self.g.astype(dtype), self.b.astype(dtype))

    def take(self, idx, axis=0) -> "Color":
        return Color(
            jnp.take(self.r, idx, axis=axis),
            jnp.take(self.g, idx, axis=axis),
            jnp.take(self.b, idx, axis=axis),
        )

    def broadcast_to(self, shape) -> "Color":
        return Color(
            jnp.broadcast_to(self.r, shape),
            jnp.broadcast_to(self.g, shape),
            jnp.broadcast_to(self.b, shape),
        )

    @property
    def shape(self):
        return jnp.shape(self.r)

    @staticmethod
    def zero(shape=(), dtype=jnp.float32) -> "Color":
        z = jnp.zeros(shape, dtype)
        return Color(z, z, z)

    @staticmethod
    def full(r, g, b, shape=(), dtype=jnp.float32) -> "Color":
        return Color(
            jnp.full(shape, r, dtype),
            jnp.full(shape, g, dtype),
            jnp.full(shape, b, dtype),
        )

    def to_array(self):
        """Stack into a dense ``(..., 3)`` array (host-side image output)."""
        return jnp.stack([self.r, self.g, self.b], axis=-1)


def v3(x, y, z) -> Vec3:
    return Vec3(
        jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32),
        jnp.asarray(z, jnp.float32),
    )


def color(r, g, b) -> Color:
    return Color(
        jnp.asarray(r, jnp.float32),
        jnp.asarray(g, jnp.float32),
        jnp.asarray(b, jnp.float32),
    )
