"""Minimal Wavefront OBJ importer for the mesh extension.

The reference renderer has no mesh assets at all (spheres/planes/boxes
only — internal/engine/objects.go:37-222); meshes are this framework's
north-star extension, and real mesh content overwhelmingly ships as
OBJ.  This loads exactly the subset the extension consumes — positions
and faces — into the ``{"vertices", "faces"}`` dict `Object(type=
"mesh")` expects:

* ``v x y z`` vertex positions (extra components ignored)
* ``f a b c d ...`` faces; 1-based, negative (relative) indices and
  ``v/vt/vn`` slash forms accepted; polygons fan-triangulated
* everything else (normals, uvs, materials, groups) is skipped —
  smooth shading comes from the mesh extension's own area-weighted
  vertex normals (``"smooth": true``), not the file's ``vn`` records

Scene JSONs reference a file as ``"mesh": {"obj": "model.obj",
"smooth": true}``; ``scene.io.load`` expands it relative to the scene
file's directory at load time (so saves round-trip the expanded mesh).
"""

from __future__ import annotations

import os
from typing import List, Tuple


def load_obj(path: str | os.PathLike) -> Tuple[List[List[float]], List[List[int]]]:
    """Parse an OBJ file into (vertices, faces) lists."""
    verts: List[List[float]] = []
    faces: List[List[int]] = []
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for ln, raw in enumerate(f, 1):
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            tok = line.split()
            if tok[0] == "v":
                if len(tok) < 4:
                    raise ValueError(f"{path}:{ln}: vertex needs 3 coordinates")
                verts.append([float(tok[1]), float(tok[2]), float(tok[3])])
            elif tok[0] == "f":
                if len(tok) < 4:
                    raise ValueError(f"{path}:{ln}: face needs >= 3 vertices")
                idx = []
                for t in tok[1:]:
                    s = t.split("/", 1)[0]
                    i = int(s)
                    # OBJ is 1-based; negative counts back from the end
                    i = i - 1 if i > 0 else len(verts) + i
                    if not 0 <= i < len(verts):
                        raise ValueError(f"{path}:{ln}: vertex index {s} out of range")
                    idx.append(i)
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append([idx[0], idx[k], idx[k + 1]])
    if not faces:
        raise ValueError(f"{path}: no faces found")
    return verts, faces


def resolve_mesh_dict(mesh: dict, base_dir: str) -> dict:
    """Expand a ``{"obj": path, ...}`` mesh dict into vertices/faces.

    Non-obj dicts pass through unchanged; relative paths resolve against
    ``base_dir`` (the scene file's directory)."""
    if not isinstance(mesh, dict) or "obj" not in mesh:
        return mesh
    p = str(mesh["obj"])
    if not os.path.isabs(p):
        p = os.path.join(base_dir, p)
    verts, faces = load_obj(p)
    out = {k: v for k, v in mesh.items() if k != "obj"}
    out["vertices"] = verts
    out["faces"] = faces
    return out
