"""Inverse rendering: differentiable training step over a device mesh.

The reference renderer has no gradient path at all — this is the TPU build's
headline extension (BASELINE.json north star): the rendered image is
differentiable w.r.t. every continuous scene parameter (sphere centers/radii,
material colors, light, camera pose), so a scene can be optimized by gradient
descent against a target image.

Sharding: the target image and all per-pixel intermediates partition over the
``(dp, sp)`` mesh; scene parameters are replicated, so XLA inserts a single
fused all-reduce over ICI for the parameter gradients during the backward pass
(the analogue of gradient all-reduce in data-parallel training, overlapped by
the compiler with the remaining backward work).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderConfig
from ..models.scene import Scene
from ..renderer import render_color

__all__ = ["render_loss", "make_train_step", "sgd_train_step", "TrainState"]


def render_loss(scene: Scene, cfg: RenderConfig, target_rgb: jnp.ndarray) -> jnp.ndarray:
    """MSE between the rendered image and an (H, W, 3) float target."""
    img = render_color(scene, cfg)
    stacked = jnp.stack([img.r, img.g, img.b], axis=-1)
    return jnp.mean((stacked - target_rgb) ** 2)


class TrainState(NamedTuple):
    scene: Scene
    opt_state: Any


def make_train_step(cfg: RenderConfig, optimizer, mesh: Mesh = None):
    """Build a jitted ``step(state, target) -> (state, loss)``.

    ``optimizer`` is an optax GradientTransformation applied to the whole
    scene pytree (mask out discrete leaves via optax.masked upstream if
    desired — int32 leaves get zero gradients automatically).
    """

    def step(state: TrainState, target):
        if mesh is not None:
            target = jax.lax.with_sharding_constraint(
                target, NamedSharding(mesh, P("dp", "sp", None))
            )
        loss, grads = jax.value_and_grad(render_loss, allow_int=True)(
            state.scene, cfg, target
        )
        grads = _zero_int_grads(state.scene, grads)
        # Sanitize before the optimizer: silhouette subgradients and
        # near-tangent rays are heavy-tailed and can go non-finite once the
        # optimizer drifts the scene into degenerate configurations (e.g. a
        # Phong exponent crossing zero); a single NaN would otherwise poison
        # every leaf through clip_by_global_norm / Adam's second moment.
        grads = jax.tree_util.tree_map(
            lambda g2: jnp.nan_to_num(g2, nan=0.0, posinf=0.0, neginf=0.0)
            if getattr(g2, "dtype", None) == jnp.float32 else g2,
            grads,
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.scene)
        scene = optax_apply(state.scene, updates)
        return TrainState(scene, opt_state), loss

    return jax.jit(step)


def _zero_int_grads(params, grads):
    """Discrete leaves (object kinds, material ids, patterns) get float0
    cotangents from ``allow_int=True``; replace them with the parameter itself
    as a zero-update placeholder so optimizers pass them through unchanged."""
    import jax.dtypes

    def fix(p, g):
        if g is not None and getattr(g, "dtype", None) == jax.dtypes.float0:
            return jnp.zeros((), jnp.float32)  # broadcast-zero; never applied
        return g

    return jax.tree_util.tree_map(fix, params, grads)


def optax_apply(scene: Scene, updates):
    """optax.apply_updates that leaves integer (discrete) leaves untouched."""
    def upd(p, u):
        if p is None:
            return None
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.integer) or jnp.asarray(
            p
        ).dtype == jnp.uint8:
            return p
        return p + u

    return jax.tree_util.tree_map(upd, scene, updates)


@functools.partial(jax.jit, static_argnames=("cfg", "lr", "grad_clip"))
def sgd_train_step(scene: Scene, cfg: RenderConfig, target, lr: float = 1e-2,
                   grad_clip: float = 1e3):
    """Minimal dependency-free SGD step (used by the multi-chip dry run).
    Gradients are sanitized and elementwise-clamped — silhouette subgradients
    and near-tangent rays can produce heavy-tailed gradient outliers."""
    loss, grads = jax.value_and_grad(render_loss, allow_int=True)(scene, cfg, target)

    def upd(p, g):
        p = jnp.asarray(p)
        if jnp.issubdtype(p.dtype, jnp.integer) or p.dtype == jnp.uint8:
            return p
        g = jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0)
        g = jnp.clip(g, -grad_clip, grad_clip)
        return p - lr * g

    new_scene = jax.tree_util.tree_map(upd, scene, grads)
    return new_scene, loss
