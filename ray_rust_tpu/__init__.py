"""ray_rust_tpu — a TPU-native differentiable ray tracer.

Brand-new JAX/XLA/Pallas framework with the full capabilities of the reference
CPU renderer msakuta/ray-rust (library facade parity: reference src/lib.rs:1-12
exposes quat/render/vec3; this package exposes the same concepts plus the
TPU-native extensions: differentiable rendering, sharding, Pallas kernels).
"""

from .config import RenderConfig
from .models.material import (
    FILTER_BILINEAR,
    FILTER_NEAREST,
    MaterialSpec,
    MaterialTable,
    PATTERN_CHECKERBOARD,
    PATTERN_GRADATION,
    PATTERN_SOLID,
    UVMAP_LL,
    UVMAP_XY,
    UVMAP_YZ,
    UVMAP_ZX,
)
from .models.quat import Quat
from .models.scene import (
    Camera,
    CameraKeyframe,
    FloorSpec,
    KIND_FLOOR,
    KIND_SPHERE,
    ObjectTable,
    Scene,
    SceneMeta,
    SphereSpec,
    build_scene,
    default_scene,
)
from .models.vec import Color, Vec3, color, v3
from .renderer import render, render_color, render_u8, to_u8

__version__ = "0.1.0"

__all__ = [
    "RenderConfig",
    "MaterialSpec",
    "MaterialTable",
    "Quat",
    "Camera",
    "CameraKeyframe",
    "FloorSpec",
    "SphereSpec",
    "ObjectTable",
    "Scene",
    "SceneMeta",
    "build_scene",
    "default_scene",
    "Color",
    "Vec3",
    "color",
    "v3",
    "render",
    "render_color",
    "render_u8",
    "to_u8",
    "KIND_FLOOR",
    "KIND_SPHERE",
    "PATTERN_SOLID",
    "PATTERN_CHECKERBOARD",
    "PATTERN_GRADATION",
    "FILTER_NEAREST",
    "FILTER_BILINEAR",
    "UVMAP_XY",
    "UVMAP_YZ",
    "UVMAP_ZX",
    "UVMAP_LL",
]
