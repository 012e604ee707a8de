"""Parity tests for the modulo helpers — same vectors as the reference's own
unit tests (src/modutil.rs:16-55)."""

import numpy as np

from ray_rust_tpu.utils.modutil import fimod, fmod, imod, rust_rem, umod


def test_fmod():
    assert float(fmod(2.5, 2.5)) == 0.0
    assert float(fmod(2.5, 5.0)) == 2.5
    assert float(fmod(1.25, 2.0)) == 1.25
    assert float(fmod(5.0, 2.5)) == 0.0
    assert float(fmod(-2.75, 5.5)) == 2.75


def test_imod():
    assert int(imod(3, 5)) == 3
    assert int(imod(5, 3)) == 2
    assert int(imod(-2, 3)) == 1
    assert int(imod(-5, 7)) == 2


def test_umod():
    assert int(umod(3, 5)) == 3
    assert int(umod(5, 3)) == 2
    assert int(umod(4, 3)) == 1
    assert int(umod(9, 7)) == 2


def test_fimod():
    def near2(got, want):
        f, i = got
        assert abs(float(f) - want[0]) < 1e-6
        assert int(i) == want[1]

    near2(fimod(3.2, 5.0), (0.2, 3))
    near2(fimod(5.7, 3.0), (0.7, 2))
    near2(fimod(-2.5, 3.0), (0.5, 0))
    near2(fimod(-5.9, 7.0), (0.1, 1))


def test_fmod_batched():
    x = np.linspace(-10, 10, 101).astype(np.float32)
    got = np.asarray(fmod(x, 2.5))
    want = x - np.floor(x / np.float32(2.5)) * np.float32(2.5)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_rust_rem_matches_truncated():
    a = np.array([5.5, -5.5, 158.0, 0.1], np.float32)
    b = np.float32(2 * np.pi)
    np.testing.assert_allclose(np.asarray(rust_rem(a, b)), np.fmod(a, b), rtol=1e-6)
