"""Export a scene JSON to the flat text format baseline/cpu_proxy.cpp reads.

Reuses the framework's scene loader and SoA packer so the proxy sees the
exact pack-time defaults the reference applies (soa.py; gpu.go:1829-1912 /
materials.go:28-55).

Usage: python baseline/export_scene.py scene.json out.txt
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from path_trace_golang_tpu import scene as S  # noqa: E402
from path_trace_golang_tpu.soa import _MAT_CODE, _OBJ_CODE  # noqa: E402


def export(scene_path: str, out_path: str) -> None:
    sc = S.load(scene_path)
    lines = []
    lines.append(f"materials {len(sc.materials)}")
    for m in sc.materials:
        typ = _MAT_CODE.get(m.type, 0)
        # CPU-contract loader defaults (materials.go:28-55): emit*power;
        # metal rough = 1-smoothness handled in the proxy's scatter;
        # dielectric ior default 1.5 handled in the proxy.
        lines.append(
            f"{typ} {m.rough} {m.ior} {m.smoothness} "
            f"{m.albedo.r} {m.albedo.g} {m.albedo.b} {m.reflectivity} "
            f"{m.emit.r * m.power} {m.emit.g * m.power} {m.emit.b * m.power} "
            f"{m.absorption.r} {m.absorption.g} {m.absorption.b} {m.absorption_scale} "
            f"{m.tint.r} {m.tint.g} {m.tint.b}"
        )
    mat_index = sc.material_index()
    solid = [o for o in sc.objects if o.type not in ("triangle", "mesh")]
    lines.append(f"objects {len(solid)}")
    for o in solid:
        typ = _OBJ_CODE.get(o.type, 0)
        mi = mat_index.get(o.material_id, 0)
        lines.append(
            f"{typ} {mi} {o.position.x} {o.position.y} {o.position.z} "
            f"{o.size.x} {o.size.y} {o.size.z}"
        )
    c = sc.camera
    lines.append(
        f"camera {c.position.x} {c.position.y} {c.position.z} "
        f"{c.target.x} {c.target.y} {c.target.z} "
        f"{c.up.x} {c.up.y} {c.up.z} {c.fov} {c.aperture} {c.focus_dist} {c.aspect_ratio}"
    )
    if sc.sky is not None and sc.sky.type == "gradient":
        lines.append(
            f"sky 2 {sc.sky.horizon.r} {sc.sky.horizon.g} {sc.sky.horizon.b} "
            f"{sc.sky.zenith.r} {sc.sky.zenith.g} {sc.sky.zenith.b}"
        )
    elif sc.sky is not None:
        lines.append(f"sky 1 {sc.sky.color.r} {sc.sky.color.g} {sc.sky.color.b} 0 0 0")
    else:
        b = sc.background
        lines.append(f"sky 0 {b.r} {b.g} {b.b} 0 0 0")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    export(sys.argv[1], sys.argv[2])
    print(f"exported {sys.argv[1]} -> {sys.argv[2]}")
