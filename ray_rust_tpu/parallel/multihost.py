"""Multi-host (multi-process) rendering and training glue.

The reference's only gather is an intra-process mpsc channel funneling
scanline buffers to the main thread (src/render.rs:846,861-886). The TPU
equivalent spans hosts: every process holds a shard of the pixel grid on its
local chips, XLA moves data over ICI/DCN, and host 0 materializes full frames
only when writing output.

Usage on a pod slice (one process per host, standard JAX multi-process):

    from ray_rust_tpu.parallel import multihost
    multihost.init_distributed()            # no-op single-process
    mesh = multihost.global_mesh()          # (dp, sp) over ALL chips
    img = multihost.render_multihost(scene, cfg, mesh)   # np array on host 0

Training runs unchanged through parallel/train.py: under a global mesh, jit
inserts the scene-gradient all-reduce over ICI automatically (data-parallel
pixels, replicated parameters — the classic DP layout).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax

from ..config import RenderConfig
from ..models.scene import Scene
from .shard import make_mesh, render_sharded

__all__ = ["init_distributed", "global_mesh", "render_multihost",
           "is_primary"]


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize JAX's multi-process runtime; returns True if distributed.

    With no arguments, relies on the environment (TPU pod metadata or the
    ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``
    variables, which this maps to ``jax.distributed.initialize`` arguments).
    A plain single-process run (no coordinator anywhere) is a no-op — the
    same binary works on a laptop CPU, one chip, or a pod slice.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    on_pod = bool(coordinator_address) or (
        os.environ.get("TPU_WORKER_HOSTNAMES") not in (None, "")
        and os.environ.get("TPU_SKIP_MDS_QUERY") is None
    )
    if not on_pod:
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_primary() -> bool:
    return jax.process_index() == 0


def global_mesh(dp: Optional[int] = None, sp: int = 1):
    """(dp, sp) mesh over ALL devices of ALL processes (``jax.devices()`` is
    global after ``init_distributed``)."""
    return make_mesh(jax.devices(), dp=dp, sp=sp)


def render_multihost(scene: Scene, cfg: RenderConfig, mesh) -> np.ndarray:
    """Render sharded over the global mesh and gather the full (H, W, 3)
    float image to every host (cheap for frames; hosts other than 0 can drop
    it). The DCN gather only happens at output time — the render itself
    communicates nothing (rays are independent)."""
    from jax.experimental import multihost_utils

    with mesh:
        col = render_sharded(scene, cfg, mesh)
    img = jax.numpy.stack([col.r, col.g, col.b], axis=-1)
    if jax.process_count() == 1:
        return np.asarray(img)
    # tiled=True: treat the global sharded array as one logical array and
    # allgather the missing shards over DCN.
    return np.asarray(multihost_utils.process_allgather(img, tiled=True))
