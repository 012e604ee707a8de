"""Observability utilities (utils/profiling.py)."""

import io
import json

from ray_rust_tpu.utils.profiling import Metrics, RenderTimer


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
