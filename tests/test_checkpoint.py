"""Checkpoint/resume round-trips (ray_rust_tpu/checkpoint.py).

The reference has no training loop to resume (SURVEY.md §5 — scene YAML is
its only persistence); these tests cover the TPU build's optimizer-state
checkpointing for inverse rendering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import ray_rust_tpu as rt
from ray_rust_tpu import checkpoint
from ray_rust_tpu.parallel.train import TrainState


@pytest.fixture(scope="module")
def scene():
    s, _ = rt.default_scene()
    return s


def _tree_allclose(a, b):
    la, da = jax.tree_util.tree_flatten(a)
    lb, db = jax.tree_util.tree_flatten(b)
    assert str(da) == str(db)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0, atol=0)


def test_scene_roundtrip(tmp_path, scene):
    path = checkpoint.save(str(tmp_path), 7, scene)
    assert path.endswith("step_00000007.npz")
    loaded, step = checkpoint.restore(str(tmp_path), scene)
    assert step == 7
    _tree_allclose(loaded, scene)


def test_train_state_roundtrip(tmp_path, scene):
    opt = optax.adam(1e-2)
    state = TrainState(scene, opt.init(scene))
    checkpoint.save(str(tmp_path), 0, state)
    loaded, _ = checkpoint.restore(str(tmp_path), state)
    _tree_allclose(loaded, state)


def test_latest_and_keep(tmp_path, scene):
    ck = checkpoint.Checkpointer(str(tmp_path), keep=2)
    for s in (1, 5, 9):
        ck.save(s, scene)
    assert checkpoint.all_steps(str(tmp_path)) == [5, 9]
    assert checkpoint.latest_step(str(tmp_path)) == 9
    loaded, nxt = ck.restore_or(scene)
    assert nxt == 10
    _tree_allclose(loaded, scene)


def test_restore_or_fresh(tmp_path, scene):
    ck = checkpoint.Checkpointer(str(tmp_path / "empty"))
    st, step = ck.restore_or(scene)
    assert step == 0
    assert st is scene


def test_treedef_mismatch_raises(tmp_path, scene):
    checkpoint.save(str(tmp_path), 0, scene)
    with pytest.raises(ValueError, match="treedef mismatch"):
        checkpoint.restore(str(tmp_path), {"not": "a scene", "x": jnp.zeros(3)})


def test_restore_missing_raises(tmp_path, scene):
    with pytest.raises(FileNotFoundError):
        checkpoint.restore(str(tmp_path / "nope"), scene)
