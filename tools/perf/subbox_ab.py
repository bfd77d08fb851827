"""A/B the round-4 mesh-walk changes on the 10k-triangle bench scene.

Knob under test: PATHTRACER_BVH_SUBBOX (sub-AABBs per page in the
prepass; 1 = single page box, the round-3 behavior modulo the center-fit
and direction-folded pop which are unconditional).  Each config builds
its own pack (the env var is read at BVH build time), warms its own
compile, then the timed windows run INTERLEAVED round-robin in one
process on one tunnel worker — the only regime PERF.md found holds
round-over-round significance.

Usage: python tools/perf/subbox_ab.py [k1 k2 ...] [--reps N]
Defaults: configs 1 2 4, 3 reps each.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    ks = [int(a) for a in args] or [1, 2, 4]
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    import path_trace_golang_tpu as pt
    from path_trace_golang_tpu.scene import builtin

    w = h = 512
    cfg = pt.RenderConfig(w, h, 1, 8)
    sc = builtin.bench_mesh()

    renderers = {}
    for k in ks:
        os.environ["PATHTRACER_BVH_SUBBOX"] = str(k)
        try:
            r = pt.Renderer(contract="gpu", seed=3)
            t0 = time.perf_counter()
            img = r.render(sc, cfg)
            dt = time.perf_counter() - t0
        finally:
            os.environ.pop("PATHTRACER_BVH_SUBBOX", None)
        print(
            f"SUBBOX={k}: warmup+compile {dt:.1f}s, image mean {img.mean():.1f}",
            flush=True,
        )
        renderers[k] = r

    times = {k: [] for k in ks}
    for rep in range(reps):
        for k in ks:
            os.environ["PATHTRACER_BVH_SUBBOX"] = str(k)
            try:
                t0 = time.perf_counter()
                renderers[k].render(sc, cfg)
                times[k].append(time.perf_counter() - t0)
            finally:
                os.environ.pop("PATHTRACER_BVH_SUBBOX", None)
    for k in ks:
        best = min(times[k])
        segs = renderers[k].stats.ray_segments
        print(
            f"SUBBOX={k}: best {best:.2f}s of {[round(t, 2) for t in times[k]]}"
            f" -> {segs / best / 1e6:.1f} Mrays/s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
