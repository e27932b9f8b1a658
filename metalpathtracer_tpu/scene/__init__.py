from metalpathtracer_tpu.scene.obj_loader import ObjError, load_obj
from metalpathtracer_tpu.scene.types import (
    HostScene,
    Material,
    PackedScene,
    PRIM_NONE,
    PRIM_SPHERE,
    PRIM_TRIANGLE,
)
from metalpathtracer_tpu.scene.xml_loader import SceneParseError, load_scene_xml

__all__ = [
    "HostScene",
    "Material",
    "PackedScene",
    "PRIM_SPHERE",
    "PRIM_TRIANGLE",
    "PRIM_NONE",
    "load_obj",
    "ObjError",
    "load_scene_xml",
    "SceneParseError",
]
