"""Multi-chip sharded rendering.

TPU-native replacement for the reference's scanline thread pool
(src/render.rs:836-898): instead of 8 CPU threads stealing rows off an atomic
counter and funneling them through an mpsc channel, the pixel grid is sharded
over a device mesh — rows over the ``dp`` axis, columns over the ``sp`` axis —
and XLA lays out the whole trace so each chip owns its tile. Rays never
communicate (no ring exchange needed); the only collectives are the gradient
all-reduces in the training step (see parallel/train.py) and the host-0 gather
when materializing a full image.

For images too large for one launch (4K/8K), ``render_tiled`` loops row-bands
on the host, each band jitted+sharded, bounding HBM/VMEM per step.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderConfig
from ..models.scene import Scene
from ..models.vec import Color
from ..renderer import render_color, to_u8

try:  # jax >= 0.5 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from jax.sharding import PartitionSpec

__all__ = ["make_mesh", "render_sharded", "render_sharded_pallas",
           "render_tiled_u8"]


def make_mesh(devices=None, dp: Optional[int] = None, sp: int = 1) -> Mesh:
    """Build a ``(dp, sp)`` mesh over the given (default: all) devices.

    ``dp`` shards image rows (the analogue of the reference's ``-t`` thread
    rows), ``sp`` shards columns. Defaults to all devices on the dp axis.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if dp is None:
        dp = n // sp
    assert dp * sp == n, f"mesh {dp}x{sp} != {n} devices"
    dev_array = np.asarray(devices).reshape(dp, sp)
    return Mesh(dev_array, ("dp", "sp"))


def _image_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp", "sp"))


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def _render_sharded_jit(scene: Scene, cfg: RenderConfig, mesh: Mesh) -> Color:
    out = render_color(scene, cfg)
    sh = _image_sharding(mesh)
    return Color(*(jax.lax.with_sharding_constraint(c, sh) for c in out))


def render_sharded(scene: Scene, cfg: RenderConfig, mesh: Mesh) -> Color:
    """Forward render with the pixel grid sharded over the mesh. The scene is
    replicated (objects/materials are tiny); every per-pixel op partitions
    trivially, so no communication is inserted for the forward pass.

    With ``cfg.use_pallas`` (and a kernel-supported scene/config) each device
    runs the fused Pallas kernel on its own shard — the hot path and the
    parallel layer are one thing, like the reference's threaded scanline
    renderer (src/render.rs:836-898)."""
    if cfg.yres % mesh.shape["dp"] or cfg.xres % mesh.shape["sp"]:
        raise ValueError(
            f"image {cfg.yres}x{cfg.xres} not divisible by mesh "
            f"{mesh.shape['dp']}x{mesh.shape['sp']}"
        )
    if cfg.pallas_enabled():
        from ..ops.pallas_trace import pallas_supported
        from ..ops.pallas_march import pallas_march_supported

        if pallas_supported(scene, cfg) or pallas_march_supported(scene, cfg):
            return render_sharded_pallas(scene, cfg, mesh)
    return _render_sharded_jit(scene, cfg, mesh)


def render_sharded_pallas(scene: Scene, cfg: RenderConfig, mesh: Mesh,
                          interpret: bool | None = None) -> Color:
    """Fused-kernel render sharded over the ``(dp, sp)`` mesh via shard_map:
    each device launches the kernel for its own pixel rectangle, passing its
    global origin (the kernel's ray formulas use absolute pixel coordinates).
    Rays never communicate, so there are no collectives — device placement
    replaces the reference's atomic row counter (src/render.rs:844)."""
    from jax import lax

    from ..ops.pallas_march import pallas_march_supported
    from ..ops.pallas_trace import render_color_pallas

    dp, sp = mesh.shape["dp"], mesh.shape["sp"]
    h_loc, w_loc = cfg.yres // dp, cfg.xres // sp
    march = pallas_march_supported(scene, cfg)

    def device_fn(s: Scene):
        i = lax.axis_index("dp")
        j = lax.axis_index("sp")
        origin = (i * h_loc, j * w_loc)
        if march:
            from ..ops.pallas_march import render_color_pallas_march

            return render_color_pallas_march(s, cfg, interpret,
                                             origin=origin,
                                             shape=(h_loc, w_loc))
        return render_color_pallas(s, cfg, interpret, origin=origin,
                                   shape=(h_loc, w_loc))

    fn = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(PartitionSpec(),),
        out_specs=Color(*(PartitionSpec("dp", "sp"),) * 3),
        # pallas_call out_shapes carry no varying-mesh-axes annotation;
        # the outputs are trivially per-device (device-varying) here.
        check_vma=False,
    )
    return fn(scene)


def render_tiled_u8(
    scene: Scene, cfg: RenderConfig, mesh: Mesh, rows_per_tile: int = 256
) -> np.ndarray:
    """Large-image path: render row bands sequentially (each sharded over the
    mesh), gathering u8 tiles to host 0. Replaces the reference's per-row
    mpsc gather (render.rs:870-886) with banded device launches."""
    assert cfg.yres % rows_per_tile == 0 or rows_per_tile > cfg.yres
    rows_per_tile = min(rows_per_tile, cfg.yres)
    out = np.empty((cfg.yres, cfg.xres, 3), np.uint8)
    yfov = cfg.resolved_yfov()
    for y0 in range(0, cfg.yres, rows_per_tile):
        tile = _render_tile_jit(scene, cfg, mesh, y0, rows_per_tile, yfov)
        out[y0 : y0 + rows_per_tile] = np.asarray(tile)
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "y0", "nrows", "yfov"))
def _render_tile_jit(scene: Scene, cfg: RenderConfig, mesh: Mesh, y0: int,
                     nrows: int, yfov: float):
    """One row band: full-resolution ray math, restricted to rows
    [y0, y0+nrows). Ray formulas keep global pixel coordinates
    (render.rs:808-815 semantics are absolute in iy)."""
    from jax import lax

    from ..models.vec import Vec3
    from ..ops.trace import trace_image

    xres, yres = cfg.xres, cfg.yres
    xfov = jnp.float32(cfg.xfov)
    yfovf = jnp.float32(yfov)
    ix = lax.broadcasted_iota(jnp.int32, (nrows, xres), 1)
    iy = lax.broadcasted_iota(jnp.int32, (nrows, xres), 0) + y0
    ex = jnp.ones((nrows, xres), jnp.float32)
    ey = (ix - xres // 2).astype(jnp.float32) * (2.0 * xfov) / jnp.float32(xres)
    ez = -(iy - yres // 2).astype(jnp.float32) * (2.0 * yfovf) / jnp.float32(yres)
    eye = scene.camera.rotation.transform(Vec3(ex, ey, ez)).normalized()
    vi = scene.camera.position.broadcast_to((nrows, xres))
    col = trace_image(scene, cfg, vi, eye)
    sh = _image_sharding(mesh)
    col = Color(*(jax.lax.with_sharding_constraint(c, sh) for c in col))
    return to_u8(col)
