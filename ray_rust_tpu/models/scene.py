"""Scene pytree: stacked object table + material table + camera + light.

Replaces the reference's ``RenderEnv`` (src/render.rs:646-733), ``RenderObject``
enum with trait dispatch (render.rs:585-598), and the sphere/floor structs
(render.rs:378-583). Instead of a heterogeneous object list with dynamic
dispatch, all objects live in one structure-of-arrays table with a ``kind``
discriminator; the intersection kernels evaluate both primitive equations and
select by kind — branch-free and batched over ``(rays, objects)``.

Everything continuous (centers, radii, normals, camera pose, light direction,
material colors) is a differentiable leaf of the pytree.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from .material import (
    MaterialSpec,
    MaterialTable,
    TextureBank,
    UVMAP_XY,
    build_material_table,
)
from .quat import Quat
from .vec import Color, Vec3, v3

__all__ = [
    "KIND_SPHERE",
    "KIND_FLOOR",
    "ObjectTable",
    "Camera",
    "CameraKeyframe",
    "Scene",
    "SceneMeta",
    "SphereSpec",
    "FloorSpec",
    "build_scene",
    "default_scene",
]

KIND_SPHERE = 0
KIND_FLOOR = 1


class ObjectTable(NamedTuple):
    """All scene objects stacked; leaves have leading dim ``(N,)``.

    ``kind`` discriminates sphere (uses ``org``/``radius``) vs floor (uses
    ``org``/``normal``); unused fields are zero. ``mat`` indexes the material
    table; ``uvmap`` selects the UV projection (render.rs:220-233).
    """

    kind: jnp.ndarray  # (N,) int32
    org: Vec3  # (N,) per component
    radius: jnp.ndarray  # (N,) f32
    normal: Vec3  # (N,) per component (floors)
    mat: jnp.ndarray  # (N,) int32
    uvmap: jnp.ndarray  # (N,) int32

    @property
    def count(self) -> int:
        return self.kind.shape[0]


class Camera(NamedTuple):
    """Camera pose (reference Camera, render.rs:617-622). ``rotation`` is the
    quaternion actually used for ray generation; ``pyr`` is kept for
    serialization parity."""

    position: Vec3
    pyr: Vec3
    rotation: Quat

    @staticmethod
    def from_pyr(position: Vec3, pyr: Vec3) -> "Camera":
        return Camera(position, pyr, Quat.from_pyr(pyr))


@dataclasses.dataclass
class CameraKeyframe:
    """Animation keyframe (reference CameraKeyframe, render.rs:634-640).
    Host-side: the animation driver interpolates on the host and re-renders."""

    camera: Camera
    velocity: tuple
    camera_target: Optional[tuple]
    duration: float


class Scene(NamedTuple):
    """The differentiable scene pytree passed into the renderer."""

    objects: ObjectTable
    materials: MaterialTable
    camera: Camera
    light: Vec3  # normalized direction toward the light
    textures: Optional[TextureBank]


@dataclasses.dataclass(frozen=True)
class SceneMeta:
    """Static host-side companion to :class:`Scene`: names and options that are
    not traced (used for YAML serialization and webserver/CLI plumbing)."""

    material_names: tuple  # row i of MaterialTable -> name
    texture_names: tuple  # per material row, '' if none
    bg: str = "default_sky"  # background shader registry key
    camera_motion: tuple = ()  # tuple of CameraKeyframe


# ---------------------------------------------------------------------------
# Host-side object specs + builder
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SphereSpec:
    material: str
    r: float
    org: tuple
    uvmap: int = UVMAP_XY


@dataclasses.dataclass
class FloorSpec:
    material: str
    org: tuple
    face_normal: tuple
    uvmap: int = UVMAP_XY


def build_scene(
    materials: List[MaterialSpec],
    objects: list,
    camera_position,
    camera_pyr,
    light,
    camera_motion: tuple = (),
    bg: str = "default_sky",
):
    """Assemble the device scene pytree + static meta from host specs.

    Objects keep their given order — reference semantics depend on it: the
    nearest-hit scan tie-breaks to the lowest index (render.rs:1003-1015) and
    index 0 is the terminal object in the trace loop (render.rs:1187-1189).
    """
    mat_ids = {m.name: i for i, m in enumerate(materials)}
    table, bank = build_material_table(materials)

    kinds, orgs, radii, normals, mats, uvmaps = [], [], [], [], [], []
    for o in objects:
        if isinstance(o, SphereSpec):
            kinds.append(KIND_SPHERE)
            orgs.append(o.org)
            radii.append(o.r)
            normals.append((0.0, 0.0, 0.0))
        elif isinstance(o, FloorSpec):
            kinds.append(KIND_FLOOR)
            orgs.append(o.org)
            radii.append(0.0)
            normals.append(o.face_normal)
        else:
            raise TypeError(f"unknown object spec {o!r}")
        if o.material not in mat_ids:
            raise KeyError(f"couldn't find material {o.material}")
        mats.append(mat_ids[o.material])
        uvmaps.append(o.uvmap)

    def f32(vals):
        return jnp.asarray(np.asarray(vals, np.float32))

    def i32(vals):
        return jnp.asarray(np.asarray(vals, np.int32))

    def vec_col(rows):
        a = np.asarray(rows, np.float32)
        return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))

    obj_table = ObjectTable(
        kind=i32(kinds),
        org=vec_col(orgs),
        radius=f32(radii),
        normal=vec_col(normals),
        mat=i32(mats),
        uvmap=i32(uvmaps),
    )

    scene = Scene(
        objects=obj_table,
        materials=table,
        camera=Camera.from_pyr(v3(*camera_position), v3(*camera_pyr)),
        light=v3(*light).normalized(),
        textures=bank,
    )
    meta = SceneMeta(
        material_names=tuple(m.name for m in materials),
        texture_names=tuple(m.texture_name for m in materials),
        bg=bg,
        camera_motion=tuple(camera_motion),
    )
    return scene, meta


def default_scene(texture_dir: str = ".", texture_filter: int = 0):
    """The reference's built-in scene, exactly (src/main.rs:154-276):

    materials: floor (yellow RepeatedGradation, pattern_scale 300, angle 0.2,
    optional ``bar.png`` texture), mirror (spec 1,1,1 pn 24), red (diffuse
    0.8,0,0, glow_dist 5), transparent (t=1, n=1.5, frac≈1.5/channel);
    objects: floor plane y=-300 (uv ZX), two mirror spheres r=80, red sphere
    r=80, glass sphere r=100; camera (0,-150,-300) pyr (0,-π/2,-π/2); light
    (50,60,-50) normalized.

    ``texture_filter`` applies to the optional floor texture (0 = Nearest,
    the reference's default, render.rs:59-63; 1 = Bilinear).
    """
    import os

    from .material import PATTERN_GRADATION, UVMAP_ZX

    pi = float(np.pi)
    floor = MaterialSpec(
        name="floor",
        diffuse=(1.0, 1.0, 0.0),
        specular=(0.0, 0.0, 0.0),
        pn=0,
        transparency=0.0,
        refraction=0.0,
        pattern=PATTERN_GRADATION,
        pattern_scale=300.0,
        pattern_angle_scale=0.2,
        texture_filter=texture_filter,
    ).texture_ok(os.path.join(texture_dir, "bar.png"))
    mirror = MaterialSpec(
        name="mirror",
        diffuse=(0.0, 0.0, 0.0),
        specular=(1.0, 1.0, 1.0),
        pn=24,
        frac=(1.0, 1.0, 1.0),
    )
    red = MaterialSpec(
        name="red",
        diffuse=(0.8, 0.0, 0.0),
        specular=(0.0, 0.0, 0.0),
        pn=24,
        glow_dist=5.0,
    )
    transparent = MaterialSpec(
        name="transparent",
        diffuse=(0.0, 0.0, 0.0),
        specular=(0.0, 0.0, 0.0),
        pn=0,
        transparency=1.0,
        refraction=1.5,
        frac=(1.49998, 1.49999, 1.5),
    )

    objects = [
        FloorSpec("floor", (0.0, -300.0, 0.0), (0.0, 1.0, 0.0), uvmap=UVMAP_ZX),
        SphereSpec("mirror", 80.0, (0.0, -30.0, 172.0)),
        SphereSpec("mirror", 80.0, (-200.0, -30.0, 172.0)),
        SphereSpec("red", 80.0, (-200.0, -200.0, 172.0)),
        SphereSpec("transparent", 100.0, (70.0, -200.0, 150.0)),
    ]

    return build_scene(
        materials=[floor, mirror, red, transparent],
        objects=objects,
        camera_position=(0.0, -150.0, -300.0),
        camera_pyr=(0.0, -pi / 2.0, -pi / 2.0),
        light=(50.0, 60.0, -50.0),
    )
