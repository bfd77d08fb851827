"""Attribute 10k-tri bench time across the three dynamic mesh walks.

Renders the bvh_bench scene repeatedly in ONE process (the only
trustworthy comparison on the shared tunnel — PERF.md round 5) with
PATHTRACER_BVH_DROP force-skipping each walk category:

  base             all three walks run (the shipping configuration)
  -closest         bounce-loop closest-hit walk skipped
  -shadow          NEE shadow any-hit walk skipped
  -spec            rough-metal specular-NEE any-hit walk skipped
  -all             every mesh walk skipped (floor: object sweep + shade)

The dropped-walk images are PHYSICS-WRONG by design; only the wall
clock matters.  Per-config deltas vs base attribute the render time.

Usage: python tools/perf/walk_attrib.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

CONFIGS = [
    ("base", ""),
    ("-closest", "closest"),
    ("-shadow", "shadow"),
    ("-spec", "spec"),
    ("-all", "closest,shadow,spec"),
]


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from bvh_bench import uv_sphere  # noqa: E402  (same directory)

    import path_trace_golang_tpu as pt
    from path_trace_golang_tpu.scene import model as M

    verts, faces = uv_sphere(80, 64)
    sc = M.Scene(
        camera=M.Camera(position=M.Vec3(0, 1.5, 4.5), target=M.Vec3(0, 1, 0), fov=50.0),
        materials=[
            M.Material(id="grey", type="lambert", albedo=M.Color(0.6, 0.6, 0.65)),
            M.Material(id="gold", type="metal", albedo=M.Color(0.9, 0.7, 0.3), smoothness=0.6),
            M.Material(id="sun", type="emissive", emit=M.Color(1, 0.95, 0.8), power=40.0),
        ],
        objects=[
            M.Object(id="floor", type="plane", material_id="grey", position=M.Vec3(0, 0, 0)),
            M.Object(
                id="blob", type="mesh", material_id="gold",
                mesh={"vertices": [list(v) for v in verts], "faces": [list(f) for f in faces]},
            ),
            M.Object(
                id="lamp", type="sphere_light", material_id="sun",
                position=M.Vec3(3, 5, 2), size=M.Vec3(0.8, 0.8, 0.8),
            ),
        ],
        sky=M.Sky(type="gradient", horizon=M.Color(0.8, 0.85, 1.0), zenith=M.Color(0.3, 0.5, 0.9)),
    )

    w = h = 512
    renderer = pt.Renderer(contract="gpu", seed=3)
    cfg = pt.RenderConfig(w, h, 1, 8)

    # warm every variant first (compiles), then timed interleaved reps.
    # try/finally: if a render raises, the physics-wrong drop knob must
    # not leak into the process env (ADVICE r3)
    times: dict[str, list[float]] = {n: [] for n, _ in CONFIGS}
    means: dict[str, float] = {}
    try:
        for name, drop in CONFIGS:
            os.environ["PATHTRACER_BVH_DROP"] = drop
            t0 = time.perf_counter()
            renderer.render(sc, cfg)
            print(f"warm {name:9s} {time.perf_counter() - t0:6.1f}s", flush=True)

        for _ in range(reps):
            for name, drop in CONFIGS:
                os.environ["PATHTRACER_BVH_DROP"] = drop
                t0 = time.perf_counter()
                img = renderer.render(sc, cfg)
                times[name].append(time.perf_counter() - t0)
                means[name] = float(img.mean())
    finally:
        os.environ.pop("PATHTRACER_BVH_DROP", None)

    base = min(times["base"])
    print(f"\n{'config':10s} {'best':>6s} {'all reps':>24s} {'share of base':>14s}  img mean")
    for name, _ in CONFIGS:
        best = min(times[name])
        share = "" if name == "base" else f"{(base - best) / base:13.1%}"
        reps_s = " ".join(f"{t:.2f}" for t in times[name])
        print(f"{name:10s} {best:6.2f} {reps_s:>24s} {share:>14s}  {means[name]:.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
