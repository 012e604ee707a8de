"""Host-side image IO (PNG save/load, gradient prefill).

Replaces the reference's uses of the ``image`` crate: PNG save
(src/main.rs:340), the debug gradient prefill (main.rs:140-146) and PNG
encoding for the webserver (src/webserver.rs:275-287). Encoding goes through
the native C++ codec (native/png_io.cpp via utils/native.py) — the native
runtime equivalent of the reference's ``image`` crate — with a PIL fallback
when the toolchain is unavailable.
"""

from __future__ import annotations

import io

import numpy as np

__all__ = ["save_png", "encode_png", "gradient_prefill"]


def save_png(path: str, data: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 buffer as PNG (native codec, PIL fallback)."""
    from .native import native_available, write_png_native

    if native_available():
        write_png_native(path, data)
        return
    from PIL import Image

    Image.fromarray(np.asarray(data, np.uint8), "RGB").save(path, format="PNG")


def encode_png(data: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 buffer to PNG bytes (webserver response)."""
    from .native import encode_png_native, native_available

    if native_available():
        return encode_png_native(data)
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.asarray(data, np.uint8), "RGB").save(buf, format="PNG")
    return buf.getvalue()


def gradient_prefill(width: int, height: int) -> np.ndarray:
    """The reference's debug gradient the render buffer starts from
    (main.rs:140-146). Only visible if a pixel is never written; kept for
    byte-parity of partial outputs."""
    x = np.arange(width)[None, :]
    y = np.arange(height)[:, None]
    data = np.zeros((height, width, 3), np.uint8)
    data[..., 0] = (x * 255 // width).astype(np.uint8)
    data[..., 1] = (y * 255 // height).astype(np.uint8)
    data[..., 2] = ((x + y) % 32 + 32).astype(np.uint8)
    return data
