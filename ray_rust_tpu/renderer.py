"""Top-level render entry points.

Replaces the reference's ``render()`` frame driver + scanline thread pool
(src/render.rs:801-900): the pixel grid is generated on-device and traced as
one batched, jitted program — device layout replaces the atomic-row-counter
work stealing and mpsc gather entirely. Multi-chip sharding lives in
:mod:`ray_rust_tpu.parallel`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .config import RenderConfig
from .models.scene import Scene
from .models.vec import Color
from .ops.rays import camera_rays
from .ops.trace import trace_image

__all__ = ["render_color", "render", "render_u8", "to_u8"]


def render_color(scene: Scene, cfg: RenderConfig) -> Color:
    """Pure forward render: scene pytree -> Color of (H, W) components.

    Differentiable w.r.t. every continuous leaf of ``scene`` (use
    ``cfg.differentiable=True`` for march mode). With ``cfg.use_pallas`` the
    forward runs through the fused Pallas kernel (ops/pallas_trace.py) when
    supported, with gradients routed through the jnp path.
    """
    if cfg.pallas_enabled():
        from .ops.pallas_trace import render_color_fast

        return render_color_fast(scene, cfg)
    vi, eye = camera_rays(scene.camera.position, scene.camera.rotation, cfg)
    return trace_image(scene, cfg, vi, eye)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _render_jit(scene: Scene, cfg: RenderConfig) -> Color:
    return render_color(scene, cfg)


def render(scene: Scene, cfg: RenderConfig) -> Color:
    """Jitted render (compiled once per config)."""
    return _render_jit(scene, cfg)


def to_u8(img: Color) -> jnp.ndarray:
    """Float color -> (H, W, 3) u8 with the reference's saturating conversion
    ``(c*255).min(255) as u8`` (src/main.rs:148-152): truncation toward zero,
    negatives and NaNs clamp to 0."""
    def chan(c):
        c = jnp.nan_to_num(c * 255.0, nan=0.0, posinf=255.0, neginf=0.0)
        return jnp.clip(jnp.trunc(jnp.minimum(c, 255.0)), 0.0, 255.0).astype(jnp.uint8)

    return jnp.stack([chan(img.r), chan(img.g), chan(img.b)], axis=-1)


def render_u8(scene: Scene, cfg: RenderConfig) -> np.ndarray:
    """Render straight to a host (H, W, 3) uint8 buffer."""
    return np.asarray(_render_u8_jit(scene, cfg))


@functools.partial(jax.jit, static_argnames=("cfg",))
def _render_u8_jit(scene: Scene, cfg: RenderConfig):
    return to_u8(render_color(scene, cfg))
