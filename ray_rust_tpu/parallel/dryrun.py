"""Multi-chip dry run body: sharded forward render + one full training step
on a (dp, sp) mesh. Called by __graft_entry__.dryrun_multichip (which handles
platform/device-count plumbing)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def run(n_devices: int) -> None:
    from ray_rust_tpu import RenderConfig, default_scene
    from ray_rust_tpu.parallel.shard import make_mesh, render_sharded
    from ray_rust_tpu.parallel.train import sgd_train_step

    devices = jax.devices()[:n_devices]
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)} ({devices})"
    )
    sp = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    mesh = make_mesh(devices, dp=n_devices // sp, sp=sp)

    H = 8 * mesh.shape["dp"]
    W = 16 * mesh.shape["sp"]
    cfg = RenderConfig(xres=W, yres=H, max_refractions=2)

    scene, _ = default_scene()

    with mesh:
        img = render_sharded(scene, cfg, mesh)
        jax.block_until_ready(img)

        target = jnp.zeros((H, W, 3), jnp.float32)
        target = jax.device_put(target, NamedSharding(mesh, P("dp", "sp", None)))
        new_scene, loss = sgd_train_step(scene, cfg, target, lr=1e-3)
        jax.block_until_ready(loss)
        assert np.isfinite(float(loss)), f"non-finite loss {loss}"
        moved = float(jnp.abs(new_scene.objects.org.x - scene.objects.org.x).max())
        assert np.isfinite(moved)

    print(
        f"dryrun_multichip ok: mesh {dict(mesh.shape)}, image {H}x{W}, "
        f"loss {float(loss):.5f}"
    )
