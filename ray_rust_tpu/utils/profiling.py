"""Tracing, profiling and structured metrics.

The reference's only instrumentation is a wall-clock print —
``Instant::now()`` at src/main.rs:316 emitted as ``Rendering time: s.micros``
(src/main.rs:343-348) — plus ad-hoc ``println!`` progress lines. The TPU
build keeps that exact print for CLI parity (cli.py) and adds what SURVEY.md
§5 calls for: ``jax.profiler`` device traces and structured per-config
throughput reporting (the BASELINE metric is Mrays/s/chip).
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Optional

__all__ = ["RenderTimer", "device_trace", "Metrics", "metrics"]


class RenderTimer:
    """Context manager timing a render and deriving rays/s.

    >>> with RenderTimer(1920, 1080, what="fwd") as t:
    ...     jax.block_until_ready(render(scene, cfg))
    >>> t.mrays_per_s
    """

    def __init__(self, xres: int, yres: int, what: str = "render",
                 emit: bool = True):
        self.xres, self.yres, self.what, self.emit = xres, yres, what, emit
        self.seconds: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        if self.emit and exc[0] is None:
            metrics.log(
                event=self.what,
                seconds=round(self.seconds, 6),
                xres=self.xres,
                yres=self.yres,
                mrays_per_s=round(self.mrays_per_s, 3),
            )

    @property
    def mrays_per_s(self) -> float:
        """Primary rays per second (W·H / wall seconds / 1e6)."""
        if not self.seconds:
            return 0.0
        return self.xres * self.yres / self.seconds / 1e6


@contextlib.contextmanager
def device_trace(log_dir: str):
    """``jax.profiler`` device trace around a block; view with TensorBoard or
    Perfetto (`xprof`). The structured replacement for the reference's
    wall-clock-only instrumentation."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Metrics:
    """Structured JSON-lines metrics (rays/s, step time, loss, ...).

    Defaults to stderr; point at a file for experiment logs. One line per
    event: ``{"ts": ..., "event": ..., **fields}``.
    """

    def __init__(self, stream=None):
        self._stream = stream

    def to_file(self, path: str) -> "Metrics":
        self._stream = open(path, "a", buffering=1)
        return self

    def log(self, event: str = "metric", **fields) -> None:
        rec = {"ts": round(time.time(), 3), "event": event}
        rec.update(fields)
        stream = self._stream or sys.stderr
        print(json.dumps(rec), file=stream, flush=True)


metrics = Metrics()
