"""Static render configuration.

The reference folds config into ``RenderEnv`` (src/render.rs:646-666) alongside
scene data. The TPU build splits them: traced, differentiable scene state lives
in :class:`ray_rust_tpu.models.scene.Scene`; everything that shapes the compiled
program (resolution, unroll depths, render mode) lives here as a hashable
frozen dataclass usable as a ``jax.jit`` static argument.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

__all__ = ["RenderConfig"]

# Reference compile-time constants (src/render.rs:11-12, 1253-1255)
REF_MAX_REFLECTIONS = 3
REF_MAX_REFRACTIONS = 10
RAYMARCH_EPS = 1e-3
FAR_AWAY = 1e4
MARCH_MAX_ITER = 10000


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    xres: int = 320
    yres: int = 240
    xfov: float = 1.0
    yfov: Optional[float] = None  # defaults to yres/xres (src/main.rs:135-136)

    # Whitted trace unroll depths. These are *static*: the reference's dynamic
    # recursion (render.rs:1142-1224, 1093-1115) becomes a fixed unrolled
    # program; every call site passes a compile-time level.
    max_reflections: int = REF_MAX_REFLECTIONS
    max_refractions: int = REF_MAX_REFRACTIONS
    # Static unroll cap for the refraction recursion. The semantic depth cap
    # stays ``max_refractions`` (serialization parity with render.rs:12), but
    # the *program* only unrolls min(max_refractions, refraction_unroll)
    # levels: deeper pseudo-refraction chains need >=3 stacked transparent
    # interfaces, which the throughput cutoff usually kills anyway — on the
    # reference default scene depth 3 is bit-identical to depth 10 (measured
    # with the scalar oracle), while compile time scales ~3x per extra level.
    # Set to None for the exact reference unroll.
    refraction_unroll: Optional[int] = 4

    use_raymarching: bool = False
    # Glow strength (reference ``glow_effect: Option<f32>``, render.rs:663).
    # None disables the glow post-multiply entirely (static branch).
    glow_effect: Optional[float] = None

    # Ray-march loop constants (render.rs:1253-1255). The raymarch reflection
    # loop is capped by the reference's *compile-time* MAX_REFLECTIONS, not the
    # env's field (render.rs:1368,1391) — kept as its own knob for parity.
    march_eps: float = RAYMARCH_EPS
    far_away: float = FAR_AWAY
    march_max_iter: int = MARCH_MAX_ITER
    raymarch_max_reflections: int = REF_MAX_REFLECTIONS

    # When True, the march uses a fixed-budget masked scan (reverse-mode
    # differentiable); when False, a batched while_loop that exits as soon as
    # every lane converges (fast forward-only path).
    differentiable: bool = False
    march_budget: int = 512  # scan length in differentiable mode

    # March steps executed per while_loop iteration (masked on done lanes):
    # amortizes the loop's fixed per-iteration cost (cond reduce + HBM state
    # roundtrip) at the price of up to chunk-1 wasted masked steps per lane.
    march_chunk: int = 8

    # Row-band tiling for march mode: the batched while_loop runs until its
    # worst lane settles, and horizon-grazing rays need ~1500 sphere-tracing
    # steps — banding the image confines that cost to the bands that contain
    # such rays (lax.map runs bands sequentially, each exiting early). The
    # TPU-native analogue of the reference's scanline work units. 1 = off;
    # auto-disabled when yres isn't divisible.
    march_tiles: int = 8

    # Background shader registry key (the reference's ``bgproc`` fn pointer,
    # render.rs:661, is never serialized — sky is always code).
    bg: str = "default_sky"

    # Fused Pallas kernels (ops/pallas_trace.py, ops/pallas_march.py). When
    # enabled and the scene/config is in a kernel's support, the forward runs
    # as one VMEM-resident kernel over row tiles; gradients route through the
    # fused backward kernel or the jnp path via custom_vjp. ``None`` = auto:
    # kernels on when running on TPU (the reference binary's default path IS
    # its fastest path, src/main.rs:338 — ours too), jnp path elsewhere
    # (interpret-mode kernels are slower than XLA:CPU). pallas_rows is the
    # tile height (sublane-aligned multiples of 8).
    use_pallas: Optional[bool] = None
    # Row-tile height for the TRACE kernels. Swept on-chip at 1080p (r5):
    # fwd 16x256 = 4.05-4.13 ms vs 4.38 at 8x256; with the backward's
    # column tile halved to keep its live set constant (16x128), the
    # fwd+bwd headline lands at 11.2 vs 11.6 ms. March keeps its own 8-row
    # tiles (pallas_march_rows) — its any()-gated lap bodies lose more to
    # wider tiles than the grid overhead saves (12.3 -> 24.9 ms at 16).
    pallas_rows: int = 16
    # Column-tile width for the FORWARD kernels (trace + march). Narrower
    # tiles bound each tile's worst lane: the tile-level early exit and the
    # march while_loop run to the slowest lane in the tile, so column tiling
    # converts per-lane divergence into per-tile work skipped. 0 = full
    # image width (single column tile).
    pallas_cols: int = 256
    # March-kernel tiling/chunking (ops/pallas_march.py): narrower column
    # tiles than the trace kernel (every march/shadow while_loop runs to the
    # slowest live lane in the tile, and march divergence spans 10..1500
    # steps) and more masked steps per while iteration. Swept on-chip at
    # 720p: cols 128 + chunk 32 = 98.7 ms vs 125.7 at the trace kernel's
    # 256/8 (r4 BENCH_NOTES).
    pallas_march_cols: int = 128
    pallas_march_chunk: int = 32
    pallas_march_rows: int = 8
    # Closed-form floor-tail shortcut in the march kernel: while a lane's
    # nearest object is a floor, the remaining evaluations form a geometric
    # sequence h_k = h*rho^k (rho = 1 + e.n) whose stop step, travel sum,
    # final state and sampled glow minimum all have closed forms; the tail
    # is resolved up to the first travel offset where another object would
    # tie the floor as SDF winner (exact quadratic/linear roots — see
    # ops/pallas_march.py:_floor_tail), so interrupted lanes FAST-FORWARD
    # instead of crawling. Values match the step-by-step loop up to f32
    # rounding on every branch. Kernel-only; the jnp path stays the exact
    # oracle.
    march_floor_skip: bool = True
    # In-kernel image textures for the fused trace kernel: the
    # neighborhood-packed atlas rides in VMEM as 128-texel chunks and each
    # shading site fetches texels with a chunk-visitation gather loop
    # (ops/pallas_trace.py:_KernelScene.fetch_texture) — exact reference
    # semantics, cost proportional to the chunks a tile actually touches.
    # False sends textured scenes to the jnp path.
    pallas_textures: bool = True
    # Per-tile object prefilter for the fori_loop (>64 object) regime: at
    # kernel start each tile tests every sphere against its exact view
    # pyramid (4 planes through the camera spanned by the tile's corner
    # rays) and records survivors in an SMEM candidate list; the primary
    # raycast/gather then scan candidates instead of all N objects. A
    # second, relaxed list (planes the light direction does not violate)
    # serves the primary shadow rays, whose reachable region is the view
    # pyramid swept along the light. Conservative by construction — floors
    # always pass, and a sphere is culled only when it provably misses
    # every ray the tile can generate — so the min-reduce result is
    # identical. The TPU-native BVH-lite the reference's brute-force scan
    # lacks (render.rs:993-1018).
    pallas_prefilter: bool = True
    # Tile-level divergence skip inside the fused trace kernel: wrap the
    # refraction sub-trace and bounces >1 in a 0/1-trip while_loop
    # (_tile_cond) so a tile whose lanes are all dead (no transparent hit /
    # no surviving reflection) skips the work entirely. Exact — skipped work
    # is fully masked out anyway. The TPU-native analogue of warp-coherent
    # early exit. Forward-only (reverse-mode AD cannot cross the while).
    pallas_early_exit: bool = True
    # Backward pass as a second fused Pallas kernel: the site-reparameterized
    # backward (ops/pallas_bwd.py) records each raycast site's winner in a
    # primal pass and differentiates a replay whose hit-t is recomputed from
    # the winner's own fields — covers everything the forward kernels cover
    # (textures, fori_loop object counts, march mode via the Newton/IFT
    # replay). ``None`` = auto, same rule as ``use_pallas``: fused backward
    # on TPU, jnp VJP elsewhere (the reference binary's default path IS its
    # fastest path, src/main.rs:338 — the zero-flag jax.grad(render_color)
    # hits the measured fwd+bwd kernel path on chip). False forces the jnp
    # VJP everywhere.
    pallas_bwd: Optional[bool] = None
    # Tile-level pruning for the backward kernel: a cheap in-kernel forward
    # probe classifies each tile (all-terminal / reflective / refractive) and
    # dispatches one of three pre-differentiated program variants — the
    # backward's answer to the forward's tile-level early exit, which
    # reverse-mode AD cannot cross (see ops/pallas_trace.py:_make_bwd_kernel).
    pallas_bwd_prune: bool = True
    # Column-tile width for the backward kernel's 2D grid. The reverse sweep
    # holds every forward intermediate of a tile live simultaneously, so the
    # tile must be bounded in both dimensions: a full 1920-wide row tile
    # spills ~140MB of f32 state (>16MB VMEM). 256 measured fastest for the
    # site backward at 1080p (12.50 ms/step chained fwd+bwd vs 13.56 at 512);
    # the round-3 re-trace backward preferred 384. None/0 = full image
    # width. r5: 128 at the new 16-row trace tiles (same live-set area).
    pallas_bwd_cols: int = 128

    # Rematerialize each bounce step in the backward pass (recompute instead
    # of storing every (H, W) intermediate — the unrolled trace is otherwise
    # residual-bound on HBM traffic).
    remat: bool = True

    # Backward-pass hygiene: hits beyond this distance (knife-edge horizon
    # rays grazing the floor at t ~ 1e8) are treated as constants in the
    # backward pass — their ~t^2-scale gradient contributions are degenerate
    # (measure-zero pixels) and otherwise explode scene-parameter gradients.
    # Forward output is unchanged. Set to None to disable.
    grad_distance_cutoff: Optional[float] = 1e6

    def resolved_yfov(self) -> float:
        return self.yfov if self.yfov is not None else self.yres / self.xres

    def pallas_enabled(self) -> bool:
        """Resolve the ``use_pallas`` tri-state (None = on-TPU auto)."""
        if self.use_pallas is not None:
            return self.use_pallas
        import jax

        return jax.default_backend() == "tpu"

    def pallas_bwd_enabled(self) -> bool:
        """Resolve the ``pallas_bwd`` tri-state (None = on-TPU auto)."""
        if self.pallas_bwd is not None:
            return self.pallas_bwd
        import jax

        return jax.default_backend() == "tpu"

    def with_(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)
