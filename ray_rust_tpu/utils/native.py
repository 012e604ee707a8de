"""ctypes bindings for the native host runtime (native/png_io.cpp).

Loads ``libpng_io.so``, building it from source on first use (g++ + zlib —
both baked into this environment; pybind11 is not, hence the C ABI + ctypes).
Every entry point has a pure-Python/PIL fallback in utils/image.py, so the
package works even where the native toolchain is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

__all__ = ["get_lib", "native_available", "FrameWriter", "encode_png_native",
           "write_png_native"]

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build(src: str, out: str) -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out,
           "-lz", "-lpthread"]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        return res.returncode == 0
    except Exception:
        return False


def get_lib():
    """The loaded CDLL, or None when the native library can't be built."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        src = os.path.join(root, "native", "png_io.cpp")
        out = os.path.join(root, "native", "libpng_io.so")
        if not os.path.exists(out) or (
            os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(out)
        ):
            if not os.path.exists(src) or not _build(src, out):
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(out)
        except OSError:
            _lib_failed = True
            return None

        lib.rrt_png_encode.restype = ctypes.c_int
        lib.rrt_png_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.rrt_png_write.restype = ctypes.c_int
        lib.rrt_png_write.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.rrt_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        lib.rrt_writer_create.restype = ctypes.c_void_p
        lib.rrt_writer_create.argtypes = [ctypes.c_int]
        lib.rrt_writer_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.rrt_writer_drain.restype = ctypes.c_int
        lib.rrt_writer_drain.argtypes = [ctypes.c_void_p]
        lib.rrt_writer_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def _as_bytes(data) -> tuple[bytes, int, int]:
    import numpy as np

    arr = np.ascontiguousarray(np.asarray(data, np.uint8))
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) u8, got {arr.shape}")
    h, w, _ = arr.shape
    return arr.tobytes(), w, h


def encode_png_native(data, level: int = 6) -> bytes:
    """PNG-encode an (H, W, 3) u8 buffer via the native encoder."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native png_io unavailable")
    raw, w, h = _as_bytes(data)
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_size_t()
    rc = lib.rrt_png_encode(raw, w, h, level, ctypes.byref(out),
                            ctypes.byref(out_len))
    if rc != 0:
        raise RuntimeError("native PNG encode failed")
    try:
        return ctypes.string_at(out, out_len.value)
    finally:
        lib.rrt_free(out)


def write_png_native(path: str, data, level: int = 6) -> None:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native png_io unavailable")
    raw, w, h = _as_bytes(data)
    rc = lib.rrt_png_write(path.encode(), raw, w, h, level)
    if rc != 0:
        raise RuntimeError(f"native PNG write failed: {path}")


class FrameWriter:
    """Async PNG frame writer over the native pthread pool.

    The animation driver renders frame i+1 on the TPU while frames ≤ i are
    encoded and written by native threads — the host-side analogue of the
    reference's worker/mpsc pipeline (src/render.rs:836-898), applied to the
    part of our pipeline that is still host-bound. Falls back to synchronous
    PIL writes when the native library is unavailable.
    """

    def __init__(self, n_threads: int = 2, level: int = 6):
        self._level = level
        self._lib = get_lib()
        self._handle = (
            self._lib.rrt_writer_create(n_threads) if self._lib else None
        )

    def submit(self, path: str, data) -> None:
        if self._handle:
            raw, w, h = _as_bytes(data)
            self._lib.rrt_writer_submit(self._handle, path.encode(), raw,
                                        w, h, self._level)
        else:
            from .image import save_png

            save_png(path, data)

    def drain(self) -> int:
        """Block until all submitted frames are on disk; returns error count."""
        if self._handle:
            return self._lib.rrt_writer_drain(self._handle)
        return 0

    def close(self) -> None:
        if self._handle:
            self.drain()
            self._lib.rrt_writer_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
