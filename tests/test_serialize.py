"""Scene YAML serialization tests (reference render.rs:735-798 semantics)."""

import numpy as np
import pytest

import ray_rust_tpu as rt
from ray_rust_tpu.models.serialize import (
    DeserializeError,
    deserialize_scene,
    serialize_scene,
)


def test_roundtrip_exact():
    scene, meta = rt.default_scene()
    text = serialize_scene(scene, meta)
    s2, m2, caps = deserialize_scene(text)
    cfg = rt.RenderConfig(xres=32, yres=24, max_refractions=1)
    a = rt.render_u8(scene, cfg)
    b = rt.render_u8(s2, cfg)
    np.testing.assert_array_equal(a, b)
    assert caps == {"max_reflections": 3, "max_refractions": 10}


def test_serialize_reference_quirks():
    scene, meta = rt.default_scene()
    text = serialize_scene(scene, meta)
    # compile-time consts + empty motion written regardless (render.rs:741-743)
    assert "max_reflections: 3" in text
    assert "max_refractions: 10" in text
    assert "camera_motion: []" in text
    assert text.startswith("---\n")
    # enum unit variants as plain strings (serde_yaml 0.8)
    assert "pattern: RepeatedGradation" in text
    assert "texture_filter: Nearest" in text


def test_unknown_material_raises():
    bad = """---
camera:
  position: {x: 0.0, y: 0.0, z: 0.0}
  pyr: {x: 0.0, y: 0.0, z: 0.0}
camera_motion: []
max_reflections: 3
max_refractions: 10
materials: {}
objects:
- Sphere:
    material: nope
    r: 10.0
    org: {x: 0.0, y: 0.0, z: 0.0}
    uvmap: XY
"""
    with pytest.raises(DeserializeError, match="couldn't find material nope"):
        deserialize_scene(bad)


def test_serde_yaml_09_tags_accepted():
    scene, meta = rt.default_scene()
    text = serialize_scene(scene, meta)
    # rewrite "- Sphere:" maps into 0.9-style "- !Sphere" tags
    tagged = text.replace("- Sphere:\n", "- !Sphere\n").replace("- Floor:\n", "- !Floor\n")
    s2, _, _ = deserialize_scene(tagged)
    assert s2.objects.count == scene.objects.count


def test_camera_motion_roundtrip():
    scene, meta = rt.default_scene()
    text = serialize_scene(scene, meta)
    # splice a keyframe in (the reference always writes [], but reads them)
    motion = """camera_motion:
- camera:
    position: {x: 10.0, y: -150.0, z: -300.0}
    pyr: {x: 0.0, y: -1.57, z: -1.57}
  velocity: {x: 1.0, y: 0.0, z: 0.0}
  camera_target: {x: 0.0, y: -30.0, z: 172.0}
  duration: 2.0
"""
    text = text.replace("camera_motion: []\n", motion)
    s2, m2, _ = deserialize_scene(text)
    assert len(m2.camera_motion) == 1
    kf = m2.camera_motion[0]
    assert kf.duration == 2.0
    assert kf.camera_target == (0.0, -30.0, 172.0)
    assert kf.velocity == (1.0, 0.0, 0.0)
