"""Native C++ host runtime (native/png_io.cpp): PNG codec + frame writer.

The codec is validated by round-trip through an independent decoder (PIL);
the writer pool by submitting frames out of order and draining. These tests
skip if the native toolchain is unavailable (the package falls back to PIL).
"""

import os

import numpy as np
import pytest

from ray_rust_tpu.utils.native import (
    FrameWriter,
    encode_png_native,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def _rand_img(rng, h, w):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_png_encode_roundtrip():
    from PIL import Image
    import io

    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (7, 13), (64, 128), (33, 257)]:
        img = _rand_img(rng, h, w)
        data = encode_png_native(img)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        back = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(back, img)


def test_png_encode_smooth_image_compresses():
    """Filter heuristic should make gradients tiny (sub/up filters win)."""
    y = np.arange(128, dtype=np.uint8)[:, None, None]
    img = np.broadcast_to(y, (128, 128, 3)).copy()
    data = encode_png_native(img)
    assert len(data) < 128 * 128 * 3 // 10


def test_save_png_dispatches_native(tmp_path):
    from PIL import Image

    from ray_rust_tpu.utils.image import save_png

    rng = np.random.default_rng(5)
    img = _rand_img(rng, 24, 32)
    p = tmp_path / "x.png"
    save_png(str(p), img)
    back = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(back, img)


def test_frame_writer_pool(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(9)
    frames = [_rand_img(rng, 16, 16) for _ in range(12)]
    with FrameWriter(n_threads=3) as w:
        for i, f in enumerate(frames):
            w.submit(str(tmp_path / f"f{i}.png"), f)
        assert w.drain() == 0
    for i, f in enumerate(frames):
        back = np.asarray(Image.open(tmp_path / f"f{i}.png").convert("RGB"))
        np.testing.assert_array_equal(back, f)


def test_frame_writer_reports_errors(tmp_path):
    with FrameWriter(n_threads=1) as w:
        w.submit(str(tmp_path / "no_such_dir" / "f.png"),
                 np.zeros((4, 4, 3), np.uint8))
        assert w.drain() == 1


def test_baseline_ref_matches_oracle_golden(tmp_path):
    """The C++ baseline stand-in (native/baseline_ref.cpp — bench.py's
    measured `vs_baseline` source) must render the default scene like the
    Python oracle: a second, independent-language implementation of the
    reference's semantics pinning the checked-in golden. Budget matches the
    golden tests (knife-edge horizon/silhouette pixels flip between any two
    f32 op orderings)."""
    import json
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        pytest.skip("g++ unavailable")
    root = os.path.join(os.path.dirname(__file__), "..")
    src = os.path.join(root, "native", "baseline_ref.cpp")
    exe = str(tmp_path / "baseline_ref")
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-o", exe, src, "-lpthread"],
        check=True, capture_output=True, timeout=300,
    )
    dump = str(tmp_path / "out.f32")
    out = subprocess.run(
        [exe, "320", "240", "2", "--dump", dump],
        check=True, capture_output=True, text=True, timeout=300,
    )
    stats = json.loads(out.stdout)
    assert stats["w"] == 320 and stats["primary_mrays"] > 0
    img = np.fromfile(dump, np.float32).reshape(240, 320, 3)
    golden = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                                  "default_trace_320x240.npz"))["img"]
    diff = np.abs(img - golden)
    bad = (diff.max(-1) > 1e-3).mean()
    assert bad <= 0.02, f"{bad:.2%} pixels differ from the oracle golden"
    assert diff.mean() <= 0.01
