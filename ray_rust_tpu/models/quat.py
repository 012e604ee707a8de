"""Batched quaternion math (parity with reference src/quat.rs:6-134).

Quaternions drive the camera pose (ray-grid rotation) and keyframe animation
(slerp). Stored as a structure-of-arrays pytree like :class:`Vec3`, so camera
poses are differentiable scene parameters.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .vec import Vec3

__all__ = ["Quat"]


class Quat(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    w: jnp.ndarray

    @staticmethod
    def new(x, y, z, w) -> "Quat":
        return Quat(
            jnp.asarray(x, jnp.float32),
            jnp.asarray(y, jnp.float32),
            jnp.asarray(z, jnp.float32),
            jnp.asarray(w, jnp.float32),
        )

    @staticmethod
    def identity() -> "Quat":
        return Quat.new(0.0, 0.0, 0.0, 1.0)

    def dot(self, o: "Quat"):
        return self.x * o.x + self.y * o.y + self.z * o.z + self.w * o.w

    def squared_len(self):
        return self.dot(self)

    def len(self):
        return jnp.sqrt(self.squared_len())

    def normalized(self) -> "Quat":
        inv = 1.0 / self.len()
        return Quat(self.x * inv, self.y * inv, self.z * inv, self.w * inv)

    def conjugated(self) -> "Quat":
        return Quat(-self.x, -self.y, -self.z, self.w)

    def __mul__(self, o: "Quat") -> "Quat":
        """Hamilton product, component layout as in quat.rs:63-72."""
        qa, qb = self, o
        return Quat(
            qa.y * qb.z - qa.z * qb.y + qa.x * qb.w + qa.w * qb.x,
            qa.z * qb.x - qa.x * qb.z + qa.y * qb.w + qa.w * qb.y,
            qa.x * qb.y - qa.y * qb.x + qa.z * qb.w + qa.w * qb.z,
            -qa.x * qb.x - qa.y * qb.y - qa.z * qb.z + qa.w * qb.w,
        )

    def transform(self, v: Vec3) -> Vec3:
        """Rotate a vector: ``q * (v,0) * conj(q)`` (quat.rs:74-80)."""
        qc = self.conjugated()
        q = Quat(v.x, v.y, v.z, jnp.zeros_like(v.x))
        qr = self * q
        qret = qr * qc
        return Vec3(qret.x, qret.y, qret.z)

    @staticmethod
    def rotation(p, sx, sy, sz) -> "Quat":
        """Axis-angle rotation; axis must be normalized (quat.rs:92-95)."""
        p = jnp.asarray(p, jnp.float32)
        half = p / 2.0
        s = jnp.sin(half)
        return Quat(
            s * jnp.asarray(sx, jnp.float32),
            s * jnp.asarray(sy, jnp.float32),
            s * jnp.asarray(sz, jnp.float32),
            jnp.cos(half),
        )

    def slerp(self, o: "Quat", t) -> "Quat":
        """Spherical interpolation with the long-path sign fix (quat.rs:97-127).

        Branchless version of the reference: when ``1 - dot^2`` is below
        sqrt(1e-10) (nearly parallel), returns ``self`` unchanged.
        """
        t = jnp.asarray(t, jnp.float32)
        qr = self.dot(o)
        ss = 1.0 - qr * qr
        eps = jnp.sqrt(jnp.float32(1e-10))
        degenerate = ss <= eps

        safe_ss = jnp.where(degenerate, 1.0, ss)
        sp = jnp.sqrt(safe_ss)
        ph = jnp.arccos(jnp.clip(qr, -1.0, 1.0))
        pt = ph * t
        t1 = jnp.sin(pt) / sp
        t0 = jnp.sin(ph - pt) / sp
        t1 = jnp.where(qr < 0.0, -t1, t1)  # long path (quat.rs:116-118)

        out = Quat(
            self.x * t0 + o.x * t1,
            self.y * t0 + o.y * t1,
            self.z * t0 + o.z * t1,
            self.w * t0 + o.w * t1,
        )
        return Quat(
            jnp.where(degenerate, self.x, out.x),
            jnp.where(degenerate, self.y, out.y),
            jnp.where(degenerate, self.z, out.z),
            jnp.where(degenerate, self.w, out.w),
        )

    @staticmethod
    def from_pyr(pyr: Vec3) -> "Quat":
        """Pitch-yaw-roll to quaternion with the reference's axis convention
        (quat.rs:129-134): roll about +X, yaw about +Z, pitch about +Y,
        composed ``rot(z-axis-less) = mx * my * mp``."""
        mx = Quat.rotation(pyr.z, 1.0, 0.0, 0.0)
        my = Quat.rotation(pyr.y, 0.0, 0.0, 1.0)
        mp = Quat.rotation(pyr.x, 0.0, 1.0, 0.0)
        return mx * my * mp
