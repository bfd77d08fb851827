"""Bound D11's many-light NEE cost: 7 lights vs 64 lights, in-process.

The reference shader iterates a fixed 8-light window (gpu.go:1019-1047);
this framework's >8-light design (D11, ops/lights.py) runs ONE masked
any-hit sweep per light over a contiguous light window — cost scales
with the LIGHT COUNT, not the window.  Fine at reference scale (<= 7
lights); this probe measures the scaling at 64 lights so the behavior
is a recorded number, not a guess.

Method: gpu_showcase (7 sphere lights) vs the same scene with the light
set replicated to 64 sphere lights (tiny jittered copies, same total
power budget irrelevant — only wall clock matters), rendered
interleaved A/B/A/B in ONE process on one tunnel worker.

Usage: python tools/perf/many_lights.py [reps] [width height passes]
"""

from __future__ import annotations

import copy
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 960
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 540
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    import path_trace_golang_tpu as pt
    from path_trace_golang_tpu.scene import builtin, io as scene_io
    from path_trace_golang_tpu.scene.model import Object, Vec3

    path = builtin.find_scene("gpu_showcase")
    base = scene_io.load(path) if path else builtin.demo_showcase()

    lights = [o for o in base.objects if o.type == "sphere_light"]
    n_base = len(lights)

    many = copy.deepcopy(base)
    i = 0
    while sum(1 for o in many.objects if o.type == "sphere_light") < 64:
        src = lights[i % n_base]
        i += 1
        many.objects.append(
            Object(
                id=f"L-extra-{i}",
                type="sphere_light",
                material_id=src.material_id,
                position=Vec3(
                    src.position.x + 0.9 * ((i * 37) % 13 - 6),
                    src.position.y + 0.4 * ((i * 17) % 7),
                    src.position.z + 0.9 * ((i * 23) % 11 - 5),
                ),
                size=Vec3(0.15, 0.15, 0.15),
            )
        )
    n_many = sum(1 for o in many.objects if o.type == "sphere_light")

    cfg = pt.RenderConfig(w, h, passes, 12)

    def timed(sc, seed):
        r = pt.Renderer(contract="gpu", seed=seed)
        t0 = time.perf_counter()
        img = r.render(sc, cfg)
        dt = time.perf_counter() - t0
        return r.stats.mrays_per_sec, dt, float(img.mean())

    # warm/compile both
    print(f"compiling {n_base}-light and {n_many}-light configs ...", flush=True)
    timed(base, 1)
    timed(many, 1)

    rows = []
    for rep in range(reps):
        a = timed(base, 2 + rep)
        b = timed(many, 2 + rep)
        rows.append((a, b))
        print(
            f"rep {rep}: {n_base} lights {a[0]:7.1f} Mrays/s ({a[1]:.2f}s, mean {a[2]:.1f})"
            f" | {n_many} lights {b[0]:7.1f} Mrays/s ({b[1]:.2f}s, mean {b[2]:.1f})",
            flush=True,
        )
    am = sorted(r[0][0] for r in rows)[reps // 2]
    bm = sorted(r[1][0] for r in rows)[reps // 2]
    print(
        f"median: {n_base} lights {am:.1f} Mrays/s, {n_many} lights {bm:.1f} "
        f"Mrays/s -> {am / bm:.2f}x slowdown at {n_many / n_base:.1f}x lights"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
