"""YAML scene (de)serialization, wire-compatible with reference scene files.

Mirrors ``RenderEnv::serialize``/``deserialize`` (src/render.rs:735-798) and
the serial forms (materials render.rs:65-80, objects render.rs:319-339, camera
render.rs:600-615). The reference uses serde_yaml 0.8, whose conventions we
reproduce:

* externally tagged enums are single-key maps (``- Sphere: {...}``); the
  deserializer additionally accepts serde_yaml 0.9-style ``!Sphere`` tags;
* unit enum variants are plain strings (``pattern: Solid``);
* the camera-motion newtype serializes as a bare list;
* ``serialize`` writes the compile-time MAX_REFLECTIONS/MAX_REFRACTIONS and an
  empty camera_motion, exactly like the reference quirk (render.rs:741-743);
* textures are re-opened from ``texture_name`` on load (render.rs:215), and a
  missing material name is a hard error (render.rs:414-419).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import yaml

from ..config import REF_MAX_REFLECTIONS, REF_MAX_REFRACTIONS
from .material import (
    FILTER_IDS,
    FILTER_NAMES,
    MaterialSpec,
    PATTERN_IDS,
    PATTERN_NAMES,
    UVMAP_IDS,
    UVMAP_NAMES,
    load_texture,
)
from .scene import (
    Camera,
    CameraKeyframe,
    FloorSpec,
    KIND_SPHERE,
    Scene,
    SceneMeta,
    SphereSpec,
    build_scene,
)
from .vec import v3

__all__ = ["serialize_scene", "deserialize_scene"]


def _vec_yaml(x, y, z):
    return {"x": float(x), "y": float(y), "z": float(z)}


def _color_yaml(r, g, b):
    return {"r": float(r), "g": float(g), "b": float(b)}


def serialize_scene(scene: Scene, meta: SceneMeta) -> str:
    """Scene pytree -> reference-format YAML string (render.rs:735-760)."""
    mats = scene.materials
    materials = {}
    objs = scene.objects
    n = objs.count
    used = set(int(m) for m in np.asarray(objs.mat))
    for i in used:  # only materials referenced by objects (render.rs:751-756)
        name = meta.material_names[i]
        materials[name] = {
            "name": name,
            "diffuse": _color_yaml(mats.diffuse.r[i], mats.diffuse.g[i], mats.diffuse.b[i]),
            "specular": _color_yaml(mats.specular.r[i], mats.specular.g[i], mats.specular.b[i]),
            "pn": int(np.asarray(mats.pn[i])),
            "t": float(mats.transparency[i]),
            "n": float(mats.refraction[i]),
            "glow_dist": float(mats.glow_dist[i]),
            "frac": _color_yaml(mats.frac.r[i], mats.frac.g[i], mats.frac.b[i]),
            "pattern": PATTERN_NAMES[int(np.asarray(mats.pattern[i]))],
            "pattern_scale": float(mats.pattern_scale[i]),
            "pattern_angle_scale": float(mats.pattern_angle_scale[i]),
            "texture_name": meta.texture_names[i],
            "texture_filter": FILTER_NAMES[int(np.asarray(mats.texture_filter[i]))],
        }

    objects = []
    for i in range(n):
        mat_name = meta.material_names[int(np.asarray(objs.mat[i]))]
        uv = UVMAP_NAMES[int(np.asarray(objs.uvmap[i]))]
        org = _vec_yaml(objs.org.x[i], objs.org.y[i], objs.org.z[i])
        if int(np.asarray(objs.kind[i])) == KIND_SPHERE:
            objects.append(
                {"Sphere": {"material": mat_name, "r": float(objs.radius[i]),
                            "org": org, "uvmap": uv}}
            )
        else:
            normal = _vec_yaml(objs.normal.x[i], objs.normal.y[i], objs.normal.z[i])
            objects.append(
                {"Floor": {"material": mat_name, "org": org,
                           "face_normal": normal, "uvmap": uv}}
            )

    doc = {
        "camera": {
            "position": _vec_yaml(*(np.asarray(c) for c in scene.camera.position)),
            "pyr": _vec_yaml(*(np.asarray(c) for c in scene.camera.pyr)),
        },
        # reference writes the consts + empty motion (render.rs:741-743)
        "camera_motion": [],
        "max_reflections": REF_MAX_REFLECTIONS,
        "max_refractions": REF_MAX_REFRACTIONS,
        "materials": materials,
        "objects": objects,
    }
    return "---\n" + yaml.safe_dump(doc, sort_keys=False)


class _TaggedLoader(yaml.SafeLoader):
    """Accept serde_yaml 0.9-style local tags (``!Sphere``) by folding them
    back into single-key maps."""


def _tag_to_map(loader, tag_suffix, node):
    if isinstance(node, yaml.MappingNode):
        return {tag_suffix: loader.construct_mapping(node, deep=True)}
    if isinstance(node, yaml.SequenceNode):
        return {tag_suffix: loader.construct_sequence(node, deep=True)}
    return {tag_suffix: loader.construct_scalar(node)}


yaml.add_multi_constructor("!", _tag_to_map, Loader=_TaggedLoader)


def _get_vec(d) -> Tuple[float, float, float]:
    return (float(d["x"]), float(d["y"]), float(d["z"]))


class DeserializeError(ValueError):
    """Scene-file error (reference DeserializeError, render.rs:341-366)."""


def deserialize_scene(
    text: str,
    xres: int = 320,
    yres: int = 240,
    bg: str = "default_sky",
    texture_dir: str = ".",
):
    """YAML string -> (Scene, SceneMeta), per render.rs:762-798.

    Camera, camera motion, depth caps, materials (textures re-opened from
    disk) and objects are restored; objects referencing unknown materials
    raise :class:`DeserializeError`.
    """
    import os

    doc = yaml.load(text, Loader=_TaggedLoader)
    if not isinstance(doc, dict):
        raise DeserializeError("scene file is not a mapping")

    mat_specs = []
    for name, m in doc.get("materials", {}).items():
        spec = MaterialSpec(
            name=name,
            diffuse=(m["diffuse"]["r"], m["diffuse"]["g"], m["diffuse"]["b"]),
            specular=(m["specular"]["r"], m["specular"]["g"], m["specular"]["b"]),
            pn=int(m["pn"]),
            transparency=float(m["t"]),
            refraction=float(m["n"]),
            glow_dist=float(m.get("glow_dist", 0.0)),
            frac=(m["frac"]["r"], m["frac"]["g"], m["frac"]["b"]),
            pattern=PATTERN_IDS[_variant(m["pattern"])],
            pattern_scale=float(m.get("pattern_scale", 1.0)),
            pattern_angle_scale=float(m.get("pattern_angle_scale", 1.0)),
            texture_filter=FILTER_IDS[_variant(m.get("texture_filter", "Nearest"))],
        )
        tex_name = m.get("texture_name", "")
        if tex_name:
            spec.texture_name = tex_name
            spec.texture = load_texture(os.path.join(texture_dir, tex_name))
        mat_specs.append(spec)
    known = {s.name for s in mat_specs}

    objects = []
    for entry in doc.get("objects", []):
        if not isinstance(entry, dict) or len(entry) != 1:
            raise DeserializeError(f"malformed object entry {entry!r}")
        (variant, body), = entry.items()
        mat = body["material"]
        if mat not in known:
            raise DeserializeError(
                f"Render{variant} couldn't find material {mat}"
            )
        uv = UVMAP_IDS[_variant(body.get("uvmap", "XY"))]
        if variant == "Sphere":
            objects.append(SphereSpec(mat, float(body["r"]), _get_vec(body["org"]), uv))
        elif variant == "Floor":
            objects.append(
                FloorSpec(mat, _get_vec(body["org"]), _get_vec(body["face_normal"]), uv)
            )
        else:
            raise DeserializeError(f"unknown object variant {variant}")

    cam = doc["camera"]
    motion = []
    for kf in doc.get("camera_motion") or []:
        c = kf["camera"]
        motion.append(
            CameraKeyframe(
                camera=Camera.from_pyr(v3(*_get_vec(c["position"])), v3(*_get_vec(c["pyr"]))),
                velocity=_get_vec(kf["velocity"]),
                camera_target=_get_vec(kf["camera_target"])
                if kf.get("camera_target") is not None
                else None,
                duration=float(kf["duration"]),
            )
        )

    scene, meta = build_scene(
        materials=mat_specs,
        objects=objects,
        camera_position=_get_vec(cam["position"]),
        camera_pyr=_get_vec(cam["pyr"]),
        # the env's light is not serialized by the reference (render.rs:736-760)
        # — stays at the caller's default; reference keeps the pre-existing env
        # light too (deserialize never touches it, render.rs:762-798).
        light=(50.0, 60.0, -50.0),
        camera_motion=tuple(motion),
        bg=bg,
    )
    caps = {
        "max_reflections": int(doc.get("max_reflections", REF_MAX_REFLECTIONS)),
        "max_refractions": int(doc.get("max_refractions", REF_MAX_REFRACTIONS)),
    }
    return scene, meta, caps


def _variant(v) -> str:
    """Unit enum variant: plain string, or single-key map/tag fallback."""
    if isinstance(v, str):
        return v
    if isinstance(v, dict) and len(v) == 1:
        return next(iter(v))
    raise DeserializeError(f"bad enum variant {v!r}")
