"""Application-layer tests: CLI flag surface, webserver routes, animation."""

import io
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

import ray_rust_tpu as rt


def test_cli_static_render(tmp_path):
    from ray_rust_tpu.cli import main

    out = tmp_path / "out.png"
    rc = main(["32", "24", "-o", str(out), "--max_refractions", "1"])
    assert rc == 0
    img = np.asarray(Image.open(out))
    assert img.shape == (24, 32, 3)
    assert img.mean() > 1  # not black


def test_cli_serialize_deserialize(tmp_path):
    from ray_rust_tpu.cli import main

    yml = tmp_path / "scene.yaml"
    out1 = tmp_path / "a.png"
    out2 = tmp_path / "b.png"
    main(["32", "24", "-o", str(out1), "-s", str(yml), "--max_refractions", "1"])
    assert yml.exists()
    main(["32", "24", "-o", str(out2), "-d", str(yml), "--max_refractions", "1"])
    a = np.asarray(Image.open(out1))
    b = np.asarray(Image.open(out2))
    np.testing.assert_array_equal(a, b)


def test_cli_raymarch_glow(tmp_path):
    from ray_rust_tpu.cli import main

    out = tmp_path / "m.png"
    rc = main(["24", "16", "-m", "-g", "1.0", "-o", str(out), "--max_refractions", "1"])
    assert rc == 0
    assert Image.open(out).size == (24, 16)


def test_webserver_routes():
    from ray_rust_tpu.webserver import make_server

    scene, meta = rt.default_scene()
    cfg = rt.RenderConfig(xres=24, yres=16, max_refractions=1)
    server = make_server(scene, meta, cfg, 0)
    port = server.server_address[1]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        root = urllib.request.urlopen(f"http://127.0.0.1:{port}/").read()
        assert b"ray-rust-tpu web interface" in root
        assert b"buttonStates" in root  # embedded JS client

        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?x=0&y=-150&z=-300&yaw=-90&pitch=0"
        )
        assert png.headers["Content-Type"] == "image/png"
        assert png.headers["Cache-Control"] == "no-cache"
        img = np.asarray(Image.open(io.BytesIO(png.read())))
        assert img.shape == (16, 24, 3)

        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
        assert ei.value.code == 404
        assert ei.value.read() == b"empty"
    finally:
        server.shutdown()


def test_webserver_camera_matches_direct_render():
    """/render with the default pose must equal a direct render with the
    camera pose rebuilt from yaw/pitch degrees (webserver.rs:268-274)."""
    from ray_rust_tpu.webserver import make_server
    from ray_rust_tpu.models.quat import Quat
    from ray_rust_tpu.models.vec import v3

    scene, meta = rt.default_scene()
    cfg = rt.RenderConfig(xres=24, yres=16, max_refractions=1)
    server = make_server(scene, meta, cfg, 0)
    port = server.server_address[1]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?x=10&y=-100&z=-250&yaw=-90&pitch=5"
        ).read()
        got = np.asarray(Image.open(io.BytesIO(png)))
        pyr = v3(5 * np.pi / 180, -90 * np.pi / 180, float(scene.camera.pyr.z))
        cam = scene.camera._replace(
            position=v3(10.0, -100.0, -250.0), pyr=pyr, rotation=Quat.from_pyr(pyr)
        )
        want = rt.render_u8(scene._replace(camera=cam), cfg)
        np.testing.assert_array_equal(got, want)
    finally:
        server.shutdown()


def test_animation_hermite():
    from ray_rust_tpu.animation import hermite_interpolate_f32

    # endpoints and velocity consistency (render.rs:907-916)
    assert hermite_interpolate_f32(0.0, 1.0, 5.0, 0.0, 0.0) == 1.0
    assert abs(hermite_interpolate_f32(1.0, 1.0, 5.0, 0.0, 0.0) - 5.0) < 1e-5
    # derivative at t=0 equals v0
    eps = 1e-3
    d = (
        hermite_interpolate_f32(eps, 0.0, 1.0, 2.0, -1.0)
        - hermite_interpolate_f32(0.0, 0.0, 1.0, 2.0, -1.0)
    ) / eps
    assert abs(d - 2.0) < 0.05


def test_animation_frames(tmp_path):
    from ray_rust_tpu.animation import render_frames
    from ray_rust_tpu.models.scene import Camera, CameraKeyframe
    from ray_rust_tpu.models.vec import v3

    scene, meta = rt.default_scene()
    kf = CameraKeyframe(
        camera=Camera.from_pyr(v3(50.0, -150.0, -300.0), scene.camera.pyr),
        velocity=(10.0, 0.0, 0.0),
        camera_target=None,
        duration=1.0,
    )
    kf2 = CameraKeyframe(
        camera=Camera.from_pyr(v3(100.0, -150.0, -300.0), scene.camera.pyr),
        velocity=(0.0, 0.0, 0.0),
        camera_target=(0.0, -30.0, 172.0),
        duration=1.0,
    )
    meta2 = meta.__class__(
        material_names=meta.material_names,
        texture_names=meta.texture_names,
        bg=meta.bg,
        camera_motion=(kf, kf2),
    )
    frames = []
    cfg = rt.RenderConfig(xres=24, yres=16, max_refractions=1)
    n = render_frames(scene, meta2, cfg, lambda i, img: frames.append((i, img)))
    assert n == 4  # duration 1.0 / 0.5 per keyframe
    assert frames[0][1].shape == (16, 24, 3)
    # camera moved between frames -> images differ
    assert not np.array_equal(frames[0][1], frames[1][1])
