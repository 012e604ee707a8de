"""Camera ray generation.

Batched replacement for the per-pixel eye-ray setup in the reference's render
loop (src/render.rs:806-815): the whole ``(H, W)`` grid of directions is built
on-device in one shot and rotated by the camera quaternion.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..config import RenderConfig
from ..models.quat import Quat
from ..models.vec import Vec3

__all__ = ["camera_rays"]


def camera_rays(camera_position: Vec3, camera_rotation: Quat, cfg: RenderConfig):
    """Build origin + direction grids for every pixel.

    Per reference semantics (render.rs:808-815):
    ``eye = normalize(rot · (1, (ix - xres/2)·2·xfov/xres,
    -(iy - yres/2)·2·yfov/yres))`` with integer ``xres/2`` division, and the
    origin is the camera position.

    Returns ``(vi, eye)`` as Vec3 of ``(H, W)`` components.
    """
    xres, yres = cfg.xres, cfg.yres
    xfov = jnp.float32(cfg.xfov)
    yfov = jnp.float32(cfg.resolved_yfov())

    ix = lax.broadcasted_iota(jnp.int32, (yres, xres), 1)
    iy = lax.broadcasted_iota(jnp.int32, (yres, xres), 0)

    ex = jnp.ones((yres, xres), jnp.float32)
    ey = (ix - xres // 2).astype(jnp.float32) * (2.0 * xfov) / jnp.float32(xres)
    ez = -(iy - yres // 2).astype(jnp.float32) * (2.0 * yfov) / jnp.float32(yres)

    eye = camera_rotation.transform(Vec3(ex, ey, ez)).normalized()
    vi = camera_position.broadcast_to((yres, xres))
    return vi, eye
