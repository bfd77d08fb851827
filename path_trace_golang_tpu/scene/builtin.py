"""Built-in demo scenes + reference-scene discovery.

The five canonical scene fixtures live in the (read-only) reference
checkout's ``scenes/`` directory; :func:`find_scene` resolves them via
``PATHTRACER_SCENES_DIR`` or the default mount.  For standalone use, this
module also *authors* two original demo scenes exercising the same feature
matrix (all five material types, all three primitives, sphere lights,
gradient/solid sky, fog, aperture defocus) — they are constructed
programmatically, not copied.
"""

from __future__ import annotations

import os
from typing import List, Optional

from .model import Camera, Color, Fog, Material, Object, RenderSettings, Scene, Sky, Vec3

__all__ = [
    "find_scene",
    "reference_scene_names",
    "demo_cornell",
    "demo_showcase",
    "demo_mesh",
    "bench_mesh",
    "builtin_scene",
]

_DEFAULT_DIRS = (
    os.environ.get("PATHTRACER_SCENES_DIR", ""),
    "scenes",
    "/root/reference/scenes",
)

REFERENCE_SCENE_NAMES = [
    "example_simple",
    "test_scene",
    "metal_glass_room",
    "test_comprehensive",
    "gpu_showcase",
]


def reference_scene_names() -> List[str]:
    return list(REFERENCE_SCENE_NAMES)


def find_scene(name: str) -> Optional[str]:
    """Resolve a scene name or path to a JSON file on disk."""
    if os.path.exists(name):
        return name
    base = name if name.endswith(".json") else f"{name}.json"
    for d in _DEFAULT_DIRS:
        if not d:
            continue
        p = os.path.join(d, base)
        if os.path.exists(p):
            return p
    return None


def builtin_scene(name: str) -> Optional[Scene]:
    if name in ("demo_cornell", "cornell"):
        return demo_cornell()
    if name in ("demo_showcase", "showcase"):
        return demo_showcase()
    if name in ("demo_mesh", "mesh"):
        return demo_mesh()
    if name == "bench_mesh":
        return bench_mesh()
    return None


def _m(id, type, albedo=(0, 0, 0), **kw):
    def c(v):
        return Color(*v) if isinstance(v, tuple) else v

    kw = {k: c(v) if k in ("albedo", "emit", "absorption", "tint") else v for k, v in kw.items()}
    return Material(id=id, type=type, albedo=Color(*albedo), **kw)


def _o(id, type, pos, size=(0, 0, 0), material_id=""):
    return Object(id=id, type=type, position=Vec3(*pos), size=Vec3(*size), material_id=material_id)


def _icosahedron(id, material_id, pos=(0, 0, 0), scale=1.0):
    """Unit icosahedron as a mesh object (triangle/BVH extension)."""
    phi = (1 + 5**0.5) / 2
    norm = (1 + phi * phi) ** 0.5
    raw = [
        (-1, phi, 0), (1, phi, 0), (-1, -phi, 0), (1, -phi, 0),
        (0, -1, phi), (0, 1, phi), (0, -1, -phi), (0, 1, -phi),
        (phi, 0, -1), (phi, 0, 1), (-phi, 0, -1), (-phi, 0, 1),
    ]
    verts = [[x / norm, y / norm, z / norm] for x, y, z in raw]
    faces = [
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ]
    return Object(
        id=id,
        type="mesh",
        material_id=material_id,
        position=Vec3(*pos),
        size=Vec3(scale, scale, scale),
        mesh={"vertices": verts, "faces": faces},
    )


def _uv_sphere_mesh(id, material_id, pos=(0, 0, 0), scale=1.0, n_lat=16, n_lon=24, smooth=True):
    """UV-sphere mesh (2*n_lat*n_lon triangles) exercising the hybrid
    dynamic BVH walk and smooth vertex-normal shading."""
    import math

    verts, faces = [], []
    for i in range(n_lat + 1):
        th = math.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * math.pi * j / n_lon
            verts.append(
                [math.sin(th) * math.cos(ph), math.cos(th), math.sin(th) * math.sin(ph)]
            )
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    return Object(
        id=id,
        type="mesh",
        material_id=material_id,
        position=Vec3(*pos),
        size=Vec3(scale, scale, scale),
        mesh={"vertices": verts, "faces": faces, "smooth": smooth},
    )


def demo_mesh() -> Scene:
    """Mesh showcase (original): a smooth-shaded 768-triangle UV sphere
    and a flat-shaded icosahedron over a checker-free floor, one area
    light, gradient sky, thin-lens disk bokeh — the triangle/BVH
    north-star extension end-to-end (hybrid dynamic walk + vertex-normal
    interpolation + lens="disk")."""
    return Scene(
        name="demo_mesh",
        camera=Camera(
            position=Vec3(0.0, 1.6, 4.2),
            target=Vec3(0.0, 0.9, 0.0),
            fov=48.0,
            aperture=0.08,
            lens="disk",
        ),
        materials=[
            _m("floor", "lambert", albedo=(0.4, 0.4, 0.45)),
            _m("silver", "metal", albedo=(0.85, 0.86, 0.9), smoothness=0.75),
            _m("clay", "lambert", albedo=(0.75, 0.45, 0.3)),
            _m("sun", "emissive", emit=(1.0, 0.95, 0.85), power=4.0),
        ],
        objects=[
            _o("ground", "plane", (0, 0, 0), material_id="floor"),
            _uv_sphere_mesh("blob", "silver", pos=(-0.75, 1.0, 0.0), scale=1.0),
            _icosahedron("ico", "clay", pos=(1.15, 0.62, 0.6), scale=0.62),
            _o("lamp", "sphere_light", (2.4, 4.2, 2.2), size=(0.7, 0.7, 0.7), material_id="sun"),
        ],
        sky=Sky(
            type="gradient",
            horizon=Color(0.16, 0.17, 0.2),
            zenith=Color(0.02, 0.04, 0.09),
        ),
        settings=RenderSettings(width=480, height=270, samples_per_px=4, max_depth=8),
    )


def bench_mesh(n_lat: int = 80, n_lon: int = 64) -> Scene:
    """The mesh/BVH benchmark scene: a 10,240-triangle flat-shaded UV
    sphere (gold metal) over a plane with one sphere light.

    This is the exact workload tools/perf/bvh_bench.py tracks across
    rounds (PERF.md "BVH at 10k triangles"); bench.py renders it at
    512x512, 1 pass, depth 8 for the driver-visible ``mesh_mrays``
    metric.  Gold metal + one light means every bounce iteration pays
    all three mesh traversals (closest-hit, NEE shadow, specular-NEE)."""
    return Scene(
        name="bench_mesh",
        camera=Camera(
            position=Vec3(0.0, 1.5, 4.5), target=Vec3(0.0, 1.0, 0.0), fov=50.0
        ),
        materials=[
            _m("grey", "lambert", albedo=(0.6, 0.6, 0.65)),
            _m("gold", "metal", albedo=(0.9, 0.7, 0.3), smoothness=0.6),
            _m("sun", "emissive", emit=(1.0, 0.95, 0.8), power=40.0),
        ],
        objects=[
            _o("floor", "plane", (0, 0, 0), material_id="grey"),
            _uv_sphere_mesh(
                "blob", "gold", pos=(0.0, 1.0, 0.0), scale=1.0,
                n_lat=n_lat, n_lon=n_lon, smooth=False,
            ),
            _o("lamp", "sphere_light", (3, 5, 2), size=(0.8, 0.8, 0.8), material_id="sun"),
        ],
        sky=Sky(
            type="gradient",
            horizon=Color(0.8, 0.85, 1.0),
            zenith=Color(0.3, 0.5, 0.9),
        ),
        settings=RenderSettings(width=512, height=512, samples_per_px=16, max_depth=8),
    )


def demo_cornell() -> Scene:
    """Cornell-style box: colored walls, a mirror sphere, a glass box, one
    ceiling sphere light.  Original composition."""
    return Scene(
        name="Demo Cornell (builtin)",
        camera=Camera(
            position=Vec3(0, 2.5, 9.5), target=Vec3(0, 2.5, 0), up=Vec3(0, 1, 0), fov=40
        ),
        sky=Sky(type="solid", color=Color(0, 0, 0)),
        settings=RenderSettings(width=400, height=400, samples_per_px=24, max_depth=12),
        materials=[
            _m("white", "lambert", (0.73, 0.73, 0.73)),
            _m("red", "lambert", (0.65, 0.05, 0.05)),
            _m("green", "lambert", (0.12, 0.45, 0.15)),
            _m("mirror", "mirror", (0.92, 0.92, 0.92)),
            _m("glass", "dielectric", ior=1.5, absorption=(0.4, 0.2, 0.05), absorption_scale=0.3),
            _m("lamp", "emissive", emit=(1.0, 0.85, 0.7), power=1.2),
        ],
        objects=[
            _o("floor", "box", (0, -0.25, 0), (11, 0.5, 11), "white"),
            _o("ceiling", "box", (0, 5.25, 0), (11, 0.5, 11), "white"),
            _o("back", "box", (0, 2.5, -5.25), (11, 6, 0.5), "white"),
            _o("left", "box", (-5.25, 2.5, 0), (0.5, 6, 11), "red"),
            _o("right", "box", (5.25, 2.5, 0), (0.5, 6, 11), "green"),
            _o("ball", "sphere", (-1.6, 1.2, -1.5), (1.2, 0, 0), "mirror"),
            _o("cube", "box", (1.7, 1.1, 0.6), (1.8, 2.2, 1.8), "glass"),
            _o("light", "sphere_light", (0, 4.6, 0), (0.7, 0, 0), "lamp"),
        ],
    )


def demo_showcase() -> Scene:
    """Open showcase: gradient sky, fog with god rays, all material types,
    thin-lens defocus.  Original composition sized like the reference's
    largest scenes."""
    mats = [
        _m("ground", "lambert", (0.45, 0.45, 0.48)),
        _m("wall", "lambert", (0.6, 0.55, 0.5)),
        _m("r", "lambert", (0.7, 0.12, 0.1)),
        _m("g", "lambert", (0.12, 0.6, 0.15)),
        _m("b", "lambert", (0.1, 0.2, 0.7)),
        _m("gold", "metal", (1.0, 0.75, 0.3), smoothness=0.85, reflectivity=0.95),
        _m("steel", "metal", (0.7, 0.7, 0.75), smoothness=0.45),
        _m("chrome", "mirror", (0.9, 0.9, 0.9)),
        _m("clear", "dielectric", ior=1.5),
        _m("amber", "dielectric", ior=1.45, absorption=(0.2, 0.6, 1.4), absorption_scale=0.4, tint=(1.0, 0.85, 0.6)),
        _m("lampw", "emissive", emit=(1, 1, 1), power=5.0),
        _m("lampo", "emissive", emit=(1.0, 0.6, 0.2), power=3.5),
        _m("lampb", "emissive", emit=(0.4, 0.6, 1.0), power=3.5),
    ]
    objs = [
        _o("ground", "plane", (0, 0, 0), material_id="ground"),
        _o("backdrop", "box", (0, 3, -7), (18, 6, 0.4), "wall"),
    ]
    # a row of material-test spheres
    row = [("r", -6), ("gold", -3.6), ("clear", -1.2), ("steel", 1.2), ("amber", 3.6), ("chrome", 6)]
    for mid, x in row:
        objs.append(_o(f"s-{mid}", "sphere", (x, 1.1, 0), (1.1, 0, 0), mid))
    # boxes
    objs += [
        _o("cube-g", "box", (-4.5, 0.8, 2.8), (1.6, 1.6, 1.6), "g"),
        _o("cube-b", "box", (4.5, 0.8, 2.8), (1.6, 1.6, 1.6), "b"),
        _o("slab", "box", (0, 0.25, 3.2), (3.0, 0.5, 1.2), "steel"),
    ]
    # three sphere lights for god rays
    objs += [
        _o("Lw", "sphere_light", (0, 6.5, 1), (0.5, 0, 0), "lampw"),
        _o("Lo", "sphere_light", (-5, 5.0, -2), (0.4, 0, 0), "lampo"),
        _o("Lb", "sphere_light", (5, 5.0, -2), (0.4, 0, 0), "lampb"),
    ]
    # an icosahedron mesh (triangle/BVH extension) floating center stage
    objs.append(_icosahedron("ico", "gold", pos=(0, 3.4, 0.5), scale=0.9))
    return Scene(
        name="Demo Showcase (builtin)",
        camera=Camera(
            position=Vec3(0, 2.8, 11),
            target=Vec3(0, 1.4, 0),
            up=Vec3(0, 1, 0),
            fov=42,
            aperture=0.08,
            focus_dist=11,
            aspect_ratio=16 / 9,
        ),
        sky=Sky(type="gradient", horizon=Color(0.35, 0.30, 0.28), zenith=Color(0.03, 0.05, 0.1)),
        settings=RenderSettings(width=800, height=450, samples_per_px=16, max_depth=12),
        fog=Fog(
            density=0.015,
            color=Color(0.9, 0.9, 1.0),
            scatter=0.8,
            sigma_s=0.012,
            sigma_a=0.006,
            g=0.25,
            hetero_strength=0.4,
            noise_scale=0.8,
            noise_octaves=3,
            affect_sky=False,
            gpu_volumetric=True,
        ),
        materials=mats,
        objects=objs,
    )
