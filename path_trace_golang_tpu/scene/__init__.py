from .io import dumps, load, loads, save
from .obj import load_obj
from .model import (
    MATERIAL_TYPES,
    OBJECT_TYPES,
    Camera,
    Color,
    Fog,
    Material,
    Object,
    RenderSettings,
    Scene,
    Sky,
    Vec3,
)

__all__ = [
    "Camera",
    "Color",
    "Fog",
    "Material",
    "Object",
    "RenderSettings",
    "Scene",
    "Sky",
    "Vec3",
    "MATERIAL_TYPES",
    "OBJECT_TYPES",
    "load",
    "save",
    "loads",
    "dumps",
    "load_obj",
]
