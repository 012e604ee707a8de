"""SDF evaluation and sphere-tracing march.

Replaces the reference's ``distance_estimate`` (src/render.rs:1226-1251) and
``raymarch_single`` (render.rs:1266-1297). The scene SDF is a min over the
object table — unrolled straight-line code for small scenes (one fused kernel
per march step) and a ``lax.scan`` above ``_UNROLL_MAX`` objects. The march
runs in one of two modes:

* ``while``: a batched ``lax.while_loop`` stepping every ray until all lanes
  converge/escape — fast forward path, exact reference iteration semantics
  (eps/far/max-iter, render.rs:1253-1255, 1286). Each while iteration
  executes ``cfg.march_chunk`` masked steps to amortize the loop's fixed
  per-iteration cost (cond reduce + state roundtrip).
* ``scan`` (``cfg.differentiable``): a fixed-budget masked ``lax.scan``,
  reverse-mode differentiable; rays not settled within the budget report
  ``iter`` past the max-iter cap, matching the reference's treatment of
  exhausted marches as escaped.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from ..config import RenderConfig
from ..models.scene import KIND_SPHERE, Scene
from ..models.vec import Vec3

__all__ = ["MarchResult", "distance_estimate", "march_single"]

_INF = np.float32(np.inf)
_UNROLL_MAX = 32


class MarchResult(NamedTuple):
    """Per-ray march outcome (reference RaymarchSingleResult, render.rs:1257-1264)."""

    final_dist: jnp.ndarray
    idx: jnp.ndarray
    pos: Vec3
    iter: jnp.ndarray  # int32
    travel_dist: jnp.ndarray
    min_dist: jnp.ndarray  # running min of the glow metric


def _object_distance(kind, org: Vec3, fnorm: Vec3, radius, pos: Vec3):
    """One object's SDF: sphere ``max(|org-p|-r, 0)`` (render.rs:473-475),
    floor ``max((p-o)·n, 0)`` (render.rs:571-573)."""
    delta = org - pos
    sq = delta.squared_len()
    length = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    d_sphere = jnp.maximum(jnp.where(sq > 0, length, 0.0) - radius, 0.0)
    d_floor = jnp.maximum((pos - org).dot(fnorm), 0.0)
    return jnp.where(kind == KIND_SPHERE, d_sphere, d_floor)


def distance_estimate(scene: Scene, pos: Vec3, ig):
    """Scene SDF: nearest object distance + index + glow metric
    (render.rs:1226-1251). Glow metric is ``dist * material.glow_dist``,
    min-tracked over objects where positive. ``ig`` object excluded."""
    objs = scene.objects
    mats = scene.materials
    n = objs.count
    glow_per_obj = jnp.take(mats.glow_dist, objs.mat)

    closest = jnp.full(pos.shape, _INF, jnp.float32)
    idx = jnp.zeros(pos.shape, jnp.int32)
    glowing = jnp.full(pos.shape, _INF, jnp.float32)

    def one(i, kind, org, fnorm, radius, gd, carry):
        closest, idx, glowing = carry
        dist = _object_distance(kind, org, fnorm, radius, pos)
        skip = i == ig
        closer = ~skip & (dist < closest)
        closest = jnp.where(closer, dist, closest)
        idx = jnp.where(closer, i, idx)
        glow = dist * gd
        gupd = ~skip & (glow > 0.0) & (glow < glowing)
        glowing = jnp.where(gupd, glow, glowing)
        return closest, idx, glowing

    if n <= _UNROLL_MAX:
        carry = (closest, idx, glowing)
        for i in range(n):
            carry = one(
                jnp.int32(i),
                objs.kind[i],
                Vec3(objs.org.x[i], objs.org.y[i], objs.org.z[i]),
                Vec3(objs.normal.x[i], objs.normal.y[i], objs.normal.z[i]),
                objs.radius[i],
                glow_per_obj[i],
                carry,
            )
        return carry

    def step(carry, xs):
        i, kind, ox, oy, oz, radius, nx, ny, nz, gd = xs
        return one(i, kind, Vec3(ox, oy, oz), Vec3(nx, ny, nz), radius, gd, carry), None

    xs = (
        jnp.arange(n, dtype=jnp.int32),
        objs.kind,
        objs.org.x, objs.org.y, objs.org.z,
        objs.radius,
        objs.normal.x, objs.normal.y, objs.normal.z,
        glow_per_obj,
    )
    carry, _ = lax.scan(step, (closest, idx, glowing), xs)
    return carry


def march_single(scene: Scene, cfg: RenderConfig, init_pos: Vec3, eye: Vec3, ig,
                 active=None) -> MarchResult:
    """Sphere-trace one ray batch until ``dist < eps``, ``dist > far`` or the
    iteration cap (render.rs:1266-1297). Position/travel/iter update *before*
    the stop check, as in the reference, so the returned position includes the
    final step.

    ``active``: optional lane mask — inactive lanes start done, so the batched
    while exits as soon as the lanes that actually need this march settle
    (e.g. shadow/refraction sub-marches only concern hit/transparent lanes).
    Inactive lanes return their initial state; callers mask the results.
    """
    shape = jnp.broadcast_shapes(init_pos.shape, eye.shape)
    eye = eye.broadcast_to(shape)
    done0 = (
        jnp.zeros(shape, bool)
        if active is None
        else ~jnp.broadcast_to(active, shape)
    )
    state = dict(
        pos=init_pos.broadcast_to(shape),
        travel=jnp.zeros(shape, jnp.float32),
        iter=jnp.zeros(shape, jnp.int32),
        min_dist=jnp.full(shape, _INF, jnp.float32),
        final_dist=jnp.zeros(shape, jnp.float32),
        idx=jnp.zeros(shape, jnp.int32),
        done=done0,
    )

    def body(s):
        dist, idx, glow = distance_estimate(scene, s["pos"], ig)
        live = ~s["done"]
        new_pos = s["pos"] + eye * dist
        new_iter = s["iter"] + 1
        stop = (dist < cfg.march_eps) | (dist > cfg.far_away) | (new_iter > cfg.march_max_iter)
        return dict(
            pos=new_pos.where(live, s["pos"]),
            travel=jnp.where(live, s["travel"] + dist, s["travel"]),
            iter=jnp.where(live, new_iter, s["iter"]),
            min_dist=jnp.where(live & (glow < s["min_dist"]), glow, s["min_dist"]),
            final_dist=jnp.where(live, dist, s["final_dist"]),
            idx=jnp.where(live, idx, s["idx"]),
            done=s["done"] | (live & stop),
        )

    if cfg.differentiable:
        def scan_body(s, _):
            return body(s), None

        state, _ = lax.scan(scan_body, state, None, length=cfg.march_budget)
        # Budget-exhausted rays count as escaped (reference lets them run to
        # MAX_ITER and then treats them as lit/sky); force iter past the cap.
        exhausted = ~state["done"]
        state["iter"] = jnp.where(
            exhausted, jnp.int32(cfg.march_max_iter + 1), state["iter"]
        )
        state["final_dist"] = jnp.where(
            exhausted, jnp.float32(cfg.far_away * 2), state["final_dist"]
        )
    else:
        chunk = max(1, cfg.march_chunk)

        def chunk_body(s):
            for _ in range(chunk):
                s = body(s)
            return s

        state = lax.while_loop(
            lambda s: jnp.any(~s["done"]),
            chunk_body,
            state,
        )

    return MarchResult(
        final_dist=state["final_dist"],
        idx=state["idx"],
        pos=state["pos"],
        iter=state["iter"],
        travel_dist=state["travel"],
        min_dist=state["min_dist"],
    )
