"""Scaling-efficiency harness.

BASELINE.md's north star asks for >=80% scaling efficiency at 1 chip, 1 host,
and N>=2 hosts. The reference's only scaling story is its CPU scanline pool
(src/render.rs:836-898, default ``-t 8``); the TPU equivalent is the pixel
grid sharded over a device mesh (parallel/shard.py). Rays are independent, so
forward scaling should be embarrassingly parallel; the training step adds one
scene-parameter all-reduce over ICI in the backward.

This harness times the SAME per-device workload at increasing mesh sizes
(weak scaling: the image grows with the mesh, H = rows_per_device * dp), so
perfect scaling = constant step time and

    efficiency(n) = t(1 device) / t(n devices).

Run on real hardware via ``python -m ray_rust_tpu.parallel.scaling``; tests
exercise it on the virtual CPU mesh (mechanism only — XLA:CPU "devices" share
the same cores, so efficiency numbers there are not meaningful).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import RenderConfig
from ..models.scene import default_scene
from .shard import make_mesh, render_sharded
from .train import sgd_train_step

__all__ = ["measure_scaling", "format_report"]


def _time_best(fn: Callable[[], object], iters: int = 3) -> float:
    """Best-of-n wall time of ``fn`` (first call excluded by the caller)."""
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def measure_scaling(
    device_counts: Optional[List[int]] = None,
    rows_per_device: int = 128,
    width: int = 256,
    cfg: Optional[RenderConfig] = None,
    train: bool = True,
    iters: int = 3,
) -> List[Dict]:
    """Weak-scaling sweep over growing device meshes.

    For each n in ``device_counts`` (default: 1, 2, 4, ... up to all local
    devices) renders an ``(n * rows_per_device, width)`` image sharded over an
    ``(n, 1)`` mesh, and optionally runs one full fwd+bwd training step.
    Returns a list of dicts with per-n times and efficiencies.
    """
    devices = jax.devices()
    if device_counts is None:
        device_counts = []
        n = 1
        while n <= len(devices):
            device_counts.append(n)
            n *= 2
    scene, _ = default_scene()

    results: List[Dict] = []
    for n in device_counts:
        if n > len(devices):
            break
        mesh = make_mesh(devices[:n], dp=n, sp=1)
        h = rows_per_device * n
        c = (cfg or RenderConfig()).with_(xres=width, yres=h)

        with mesh:
            fwd = lambda: render_sharded(scene, c, mesh)  # noqa: E731
            jax.block_until_ready(fwd())  # compile
            t_fwd = _time_best(fwd, iters)

            entry: Dict = {
                "devices": n,
                "image": (h, width),
                "fwd_s": t_fwd,
                "fwd_rays_per_s_per_device": h * width / t_fwd / n,
            }

            if train:
                target = jax.device_put(
                    jnp.zeros((h, width, 3), jnp.float32),
                    NamedSharding(mesh, P("dp", "sp", None)),
                )
                step = lambda: sgd_train_step(scene, c, target, lr=1e-3)  # noqa: E731
                jax.block_until_ready(step())
                entry["step_s"] = _time_best(step, iters)
            results.append(entry)

    base = results[0]
    for r in results:
        r["fwd_efficiency"] = base["fwd_s"] / r["fwd_s"]
        if train and "step_s" in r:
            r["step_efficiency"] = base["step_s"] / r["step_s"]
    return results


def format_report(results: List[Dict]) -> str:
    lines = [
        f"{'devices':>8} {'image':>12} {'fwd ms':>9} {'fwd eff':>8} "
        f"{'step ms':>9} {'step eff':>9}"
    ]
    for r in results:
        step_ms = f"{r['step_s'] * 1e3:9.1f}" if "step_s" in r else " " * 9
        step_eff = (
            f"{r['step_efficiency'] * 100:8.1f}%" if "step_efficiency" in r else " " * 9
        )
        lines.append(
            f"{r['devices']:>8} {str(r['image']):>12} {r['fwd_s'] * 1e3:9.1f} "
            f"{r['fwd_efficiency'] * 100:7.1f}% {step_ms} {step_eff}"
        )
    return "\n".join(lines)


if __name__ == "__main__":
    res = measure_scaling()
    print(format_report(res))
