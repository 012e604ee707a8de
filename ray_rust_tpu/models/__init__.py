from .vec import Vec3, Color, v3, color
from .quat import Quat
from .material import MaterialSpec, MaterialTable, TextureBank
from .scene import Scene, SceneMeta, ObjectTable, Camera, build_scene, default_scene
