"""Checkpoint / resume for inverse-rendering runs.

The reference's only persistence is scene YAML (src/render.rs:735-798, the
CLI ``-s``/``-d`` flags) — there is no mid-run resume because nothing in the
reference iterates. The TPU build optimizes scenes by gradient descent
(parallel/train.py), so training state — the scene pytree *and* the optimizer
state — must survive preemption. This module provides atomic, self-describing
checkpoints of any JAX pytree:

* leaves are stored in one compressed ``.npz`` (portable, no pickle for data);
* the pytree structure is recorded as its treedef string and verified on load
  against a caller-supplied template, so a checkpoint can never silently
  deserialize into the wrong structure;
* writes are atomic (tempfile + rename) so a preempted run can't leave a
  truncated checkpoint behind;
* ``latest_step``/``all_steps`` give orbax-style step management with plain
  files.

Scene *metadata* (material names, background key, camera motion) is static
host state — persist it next to the checkpoint with the YAML serializer
(models/serialize.py), exactly like the reference persists scenes.

Multi-host note: call :func:`save` from process 0 only (state is replicated;
per-process shards are not needed because scene/optimizer pytrees are tiny).
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from typing import Any, Optional, Tuple

import numpy as np
import jax

__all__ = ["save", "restore", "latest_step", "all_steps", "Checkpointer"]

_STEP_RE = re.compile(r"^step_(\d+)\.npz$")


def _path_for(directory: str, step: int) -> str:
    return os.path.join(directory, f"step_{step:08d}.npz")


def save(directory: str, step: int, state: Any) -> str:
    """Atomically write ``state`` (any pytree) as ``step_<step>.npz``.

    Returns the final path. Integer/bool/float leaves of any shape are
    supported; ``None`` subtrees are preserved through the treedef.
    """
    os.makedirs(directory, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {f"leaf_{i:05d}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    header = json.dumps({"step": step, "n_leaves": len(leaves),
                         "treedef": str(treedef)})
    payload["__header__"] = np.frombuffer(header.encode(), np.uint8)

    final = _path_for(directory, step)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(f, **payload)
        os.replace(tmp, final)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return final


def restore(directory: str, template: Any, step: Optional[int] = None) -> Tuple[Any, int]:
    """Load a checkpoint into the structure of ``template``.

    ``step=None`` loads the latest. The stored treedef string must match the
    template's exactly — a mismatch (different optimizer, different scene
    structure) raises instead of mis-assigning leaves. Returns
    ``(state, step)`` with leaves as jnp arrays on the default device.
    """
    import jax.numpy as jnp

    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory!r}")
    path = _path_for(directory, step)
    with np.load(path) as z:
        header = json.loads(bytes(z["__header__"]).decode())
        leaves = [z[f"leaf_{i:05d}"] for i in range(header["n_leaves"])]

    t_leaves, t_def = jax.tree_util.tree_flatten(template)
    if str(t_def) != header["treedef"]:
        raise ValueError(
            "checkpoint treedef mismatch:\n"
            f"  stored:   {header['treedef']}\n"
            f"  template: {t_def}"
        )
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"leaf count mismatch: stored {len(leaves)}, template {len(t_leaves)}"
        )
    state = jax.tree_util.tree_unflatten(t_def, [jnp.asarray(x) for x in leaves])
    return state, header["step"]


def all_steps(directory: str) -> list:
    """Sorted list of checkpointed step numbers under ``directory``."""
    if not os.path.isdir(directory):
        return []
    steps = []
    for name in os.listdir(directory):
        m = _STEP_RE.match(name)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest_step(directory: str) -> Optional[int]:
    steps = all_steps(directory)
    return steps[-1] if steps else None


class Checkpointer:
    """Keep-last-N checkpoint manager around :func:`save`/:func:`restore`.

    >>> ckpt = Checkpointer(run_dir, keep=3)
    >>> state, start = ckpt.restore_or(init_state)   # resume if possible
    >>> for step in range(start, n_steps):
    ...     state, loss = train_step(state, target)
    ...     if step % 100 == 0:
    ...         ckpt.save(step, state)
    """

    def __init__(self, directory: str, keep: int = 3):
        self.directory = directory
        self.keep = keep

    def save(self, step: int, state: Any) -> str:
        path = save(self.directory, step, state)
        if self.keep:
            for old in all_steps(self.directory)[: -self.keep]:
                os.unlink(_path_for(self.directory, old))
        return path

    def restore_or(self, init_state: Any) -> Tuple[Any, int]:
        """Resume from the latest checkpoint, or return ``(init_state, 0)``."""
        step = latest_step(self.directory)
        if step is None:
            return init_state, 0
        state, step = restore(self.directory, init_state, step)
        return state, step + 1
