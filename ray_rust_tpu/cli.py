"""Command-line interface with the reference's exact flag surface
(src/main.rs:32-93): positional width/height, -t/--threads, -o/--output,
-m/--raymarch, -g/--gloweffect, -s/--serialize_file, -d/--deserialize_file,
-w/--webserver, -p/--port_no.

``--threads`` is accepted for compatibility; on TPU the scanline thread pool
is replaced by on-device tiling, so it maps to the jnp march path's row-band
count (``RenderConfig.march_tiles``) and to the animation frame-writer pool
size — the two places host/band concurrency still exists.

On TPU the fused Pallas kernels are the default render path (the reference
binary's default path is its fastest path, src/main.rs:338); ``--no-pallas``
forces the jnp/XLA path.
"""

from __future__ import annotations

import argparse
import sys
import time

from .config import RenderConfig
from .models.scene import default_scene
from .models.serialize import deserialize_scene, serialize_scene
from .renderer import render_u8
from .utils.image import save_png


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ray-rust-tpu",
        description="TPU-native differentiable ray tracer (capabilities of ray-rust)",
    )
    p.add_argument("width", type=int, help="Width of the image [px]")
    p.add_argument("height", type=int, help="Height of the image [px]")
    p.add_argument("-t", "--threads", type=int, default=8,
                   help="thread count (compat; maps to march row-band count "
                        "and the animation frame-writer pool size)")
    p.add_argument("-o", "--output", default="foo.png", help="Output file name")
    p.add_argument("-m", "--raymarch", action="store_true", help="Use ray marching")
    p.add_argument("-g", "--gloweffect", type=float, default=None,
                   help="Enable glow effect and set its strength (ray marching)")
    p.add_argument("-s", "--serialize_file", default=None,
                   help="File name for serialized scene output")
    p.add_argument("-d", "--deserialize_file", default=None,
                   help="File name for deserialized scene input")
    p.add_argument("-w", "--webserver", action="store_true",
                   help="Launch a web server that responds with rendered images")
    p.add_argument("-p", "--port_no", type=int, default=3000,
                   help="Port number, if use web server")
    # TPU-build extensions (not in the reference flag surface): control the
    # static unroll of the compiled trace program.
    p.add_argument("--refraction_unroll", type=int, default=None,
                   help="Static refraction unroll depth (default 4; the "
                        "semantic cap from the scene file still applies)")
    p.add_argument("--max_refractions", type=int, default=None,
                   help="Override the scene's refraction depth cap")
    p.add_argument("--max_reflections", type=int, default=None,
                   help="Override the scene's reflection depth cap")
    p.add_argument("--no-pallas", action="store_true",
                   help="Force the jnp/XLA path (fused kernels are the "
                        "default on TPU)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    for name in ("width", "height", "threads", "output"):
        print(f"Value for {name}: {getattr(args, name)}")

    xfov = 1.0
    yfov = args.height / args.width  # main.rs:135-136

    scene, meta = default_scene()
    caps = {}
    if args.deserialize_file:
        with open(args.deserialize_file) as f:
            scene, meta, caps = deserialize_scene(f.read())

    if args.max_refractions is not None:
        caps["max_refractions"] = args.max_refractions
    if args.max_reflections is not None:
        caps["max_reflections"] = args.max_reflections
    if args.refraction_unroll is not None:
        caps["refraction_unroll"] = args.refraction_unroll

    cfg = RenderConfig(
        xres=args.width,
        yres=args.height,
        xfov=xfov,
        yfov=yfov,
        use_raymarching=args.raymarch,
        glow_effect=args.gloweffect,
        march_tiles=max(1, args.threads),
        use_pallas=False if args.no_pallas else None,  # None = on-TPU auto
        **caps,
    )

    if args.webserver:
        from .webserver import run_webserver

        run_webserver(scene, meta, cfg, args.port_no)
        return 0

    if args.serialize_file:
        with open(args.serialize_file, "w") as f:
            f.write(serialize_scene(scene, meta))

    start = time.time()
    if meta.camera_motion:
        from .animation import render_frames
        from .utils.native import FrameWriter

        # Frames are PNG-encoded + written by the native pthread pool while
        # the TPU renders the next one (utils/native.py; falls back to
        # synchronous PIL writes without the native toolchain).
        with FrameWriter(n_threads=max(1, args.threads // 2)) as writer:
            def frame_proc(i, data):
                writer.submit(f"{args.output}{i}.png", data)

            render_frames(scene, meta, cfg, frame_proc)
            errors = writer.drain()
            if errors:
                print(f"frame writer: {errors} failed writes", file=sys.stderr)
    else:
        # Start from the reference's debug gradient prefill (main.rs:138-146)
        # — visible only where the renderer leaves pixels unwritten (it never
        # does for a full-frame render; kept for byte-parity of the buffer
        # lifecycle).
        from .utils.image import gradient_prefill

        buf = gradient_prefill(args.width, args.height)
        buf[:, :] = render_u8(scene, cfg)
        save_png(args.output, buf)
    elapsed = time.time() - start
    # "Rendering time: s.micros" (main.rs:343-348)
    print("Rendering time: %d.%06d" % (int(elapsed), int((elapsed % 1) * 1e6)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
