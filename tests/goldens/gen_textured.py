"""Generate the textured golden fixtures (run once; artifacts checked in).

The fixture texture is a deterministic synthesized 256x256 RGB image
(seed 101) standing in for the reference's optional ``bar.png``
(src/main.rs:169 — none ships with the reference repo). 256x256 = 512
atlas chunks, which keeps the fused kernel on its group-visitation
while-loop path (not the small-atlas unrolled sweep), so the golden pins
the chunk-gather + wrap + filter chain end-to-end at full reference depth.

Run from the repo root:  python tests/goldens/gen_textured.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import oracle  # noqa: E402

OUT = os.path.dirname(os.path.abspath(__file__))


def fixture_texture() -> np.ndarray:
    rng = np.random.default_rng(101)
    return rng.integers(0, 256, (256, 256, 3)).astype(np.uint8)


def textured_env(xres, yres, filt):
    import dataclasses

    env = oracle.default_env(xres, yres)
    floor = env.objects[0]
    env.objects[0] = dataclasses.replace(
        floor,
        mat=dataclasses.replace(floor.mat, texture=fixture_texture(),
                                texture_filter=filt),
    )
    return env


def save(name, img):
    np.savez_compressed(os.path.join(OUT, f"{name}.npz"), img=img)
    from PIL import Image

    u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(u8, "RGB").save(os.path.join(OUT, f"{name}.png"))
    print("wrote", name, img.shape)


if __name__ == "__main__":
    img = oracle.render_oracle(textured_env(320, 240, "nearest"))
    save("default_textured_nearest_320x240", img)
    img = oracle.render_oracle(textured_env(160, 120, "bilinear"))
    save("default_textured_bilinear_160x120", img)
