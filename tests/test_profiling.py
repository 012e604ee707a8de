"""Observability utilities (utils/profiling.py) + traced-ray accounting
(ops/accounting.py)."""

import io
import json

from ray_rust_tpu.utils.profiling import Metrics, RenderTimer


def test_count_traced_rays_matches_oracle(monkeypatch):
    """count_traced_rays == the number of raycast calls the reference's
    recursion performs (BASELINE.md:34-37 accounting): count them directly by
    wrapping the scalar oracle's raycast during a full render."""
    import jax
    import numpy as np

    import ray_rust_tpu as rt
    from ray_rust_tpu.ops.accounting import count_traced_rays
    import tests.oracle as oracle

    xres, yres = 32, 24
    scene, _ = rt.default_scene()
    cfg = rt.RenderConfig(xres=xres, yres=yres)

    ours = float(jax.jit(lambda s: count_traced_rays(s, cfg))(scene))

    env = oracle.default_env(xres, yres)
    calls = {"n": 0}
    real_raycast = oracle.raycast

    def counting_raycast(*a, **kw):
        calls["n"] += 1
        return real_raycast(*a, **kw)

    monkeypatch.setattr(oracle, "raycast", counting_raycast)
    oracle.render_oracle(env)
    # Exact equality holds at matched float contraction (verified: 1350 ==
    # 1350 on the single-device CPU backend), but XLA's vectorization under
    # the suite's 8-virtual-device config flips a handful of knife-edge
    # comparisons (throughput-cutoff / shadow-hit ties) on ~0.8% of rays —
    # the SURVEY §6 f32-parity caveat. Pin to a tight relative budget.
    assert abs(ours - calls["n"]) <= 0.02 * calls["n"], (ours, calls["n"])
    # sanity: strictly more than primary (shadow rays exist)
    assert ours > xres * yres


def test_render_timer_mrays():
    import time

    with RenderTimer(1000, 1000, what="t", emit=False) as t:
        time.sleep(0.01)
    assert t.seconds >= 0.01
    assert 0 < t.mrays_per_s <= 100.0  # 1e6 rays / >=0.01 s


def test_metrics_jsonl():
    buf = io.StringIO()
    m = Metrics(stream=buf)
    m.log(event="step", loss=0.5, step=3)
    m.log(event="render", mrays_per_s=117.0)
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert lines[0]["event"] == "step" and lines[0]["loss"] == 0.5
    assert lines[1]["mrays_per_s"] == 117.0
    assert all("ts" in l for l in lines)


def test_render_timer_emits_metric(monkeypatch):
    import ray_rust_tpu.utils.profiling as prof

    buf = io.StringIO()
    monkeypatch.setattr(prof, "metrics", Metrics(stream=buf))
    with prof.RenderTimer(10, 10, what="fwd") as t:
        pass
    rec = json.loads(buf.getvalue())
    assert rec["event"] == "fwd" and rec["xres"] == 10
