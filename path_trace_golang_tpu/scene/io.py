"""Scene JSON load/save (re-design of ``internal/scene/io.go:10-38``).

``save`` writes 2-space-indented JSON exactly like the reference's
``json.MarshalIndent(sc, "", "  ")`` so that UI "Save scene" output stays
diffable against reference-authored files.
"""

from __future__ import annotations

import json
import os
from typing import Union

from .model import Scene

__all__ = ["load", "save", "loads", "dumps"]


def loads(text: str) -> Scene:
    return Scene.from_json(json.loads(text))


def dumps(sc: Scene) -> str:
    # Go's json.MarshalIndent: 2-space indent, no trailing newline,
    # keys in struct order (our to_json dicts preserve that order).
    return json.dumps(sc.to_json(), indent=2)


def load(path: Union[str, os.PathLike]) -> Scene:
    """Load a scene from a JSON file (io.go:10-22).

    Mesh objects referencing an OBJ file (``"mesh": {"obj": "m.obj"}``,
    framework extension) are expanded here, relative to the scene file's
    directory — the in-memory Scene always carries concrete
    vertices/faces, so save() round-trips the expanded mesh."""
    with open(path, "r", encoding="utf-8") as f:
        sc = loads(f.read())
    base = os.path.dirname(os.path.abspath(os.fspath(path)))
    for o in sc.objects:
        if o.mesh is not None and "obj" in o.mesh:
            from .obj import resolve_mesh_dict

            o.mesh = resolve_mesh_dict(o.mesh, base)
    return sc


def save(path: Union[str, os.PathLike], sc: Scene) -> None:
    """Save a scene as indented JSON (io.go:25-38)."""
    tmp = f"{os.fspath(path)}.tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(dumps(sc))
    os.replace(tmp, path)
