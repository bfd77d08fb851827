"""SUBBOX x N_BUCKETS A/B on the 10k-triangle bench (one process).

The windowed gather (round 5) is inert at 10k tris (P_pad=128 <=
window), so the remaining 10k levers are the page-marking knobs:
``PATHTRACER_BVH_SUBBOX`` (sub-AABBs per page — fewer wants -> fewer
rounds, costlier prepass) and ``bvh.N_BUCKETS`` (t-ordering ranges —
earlier stops vs more mask words in the carry).

All configs run INTERLEAVED in one process on one tunnel worker (the
only trustworthy regime, PERF.md "Measurement discipline").  SUBBOX is
part of the BVH build identity (soa cache key) so it switches cleanly;
N_BUCKETS changes the traced program without changing any jit static
key, so the jit cache is cleared at each switch (the persistent
compile cache makes later switches cheap).

Usage: python tools/perf/mesh_tuning.py [reps]
Writes tools/perf/mesh_tuning.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

os.environ.setdefault("PATHTRACER_NO_FALLBACK", "1")

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CONFIGS = [  # (subbox, buckets)
    (2, 4),  # shipping defaults
    (4, 4),
    (2, 8),
    (4, 8),
]


def main() -> int:
    import path_trace_golang_tpu as pt
    from path_trace_golang_tpu.ops import bvh
    from path_trace_golang_tpu.scene import builtin

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sc = builtin.bench_mesh()
    cfg = pt.RenderConfig(512, 512, 1, 8)

    results = {f"{sb}x{nb}": [] for sb, nb in CONFIGS}
    means = {}
    cur_buckets = None

    def run_one(sb, nb):
        nonlocal cur_buckets
        os.environ["PATHTRACER_BVH_SUBBOX"] = str(sb)
        if nb != cur_buckets:
            bvh.N_BUCKETS = nb
            jax.clear_caches()  # N_BUCKETS is not a jit static key
            cur_buckets = nb
        r = pt.Renderer(contract="gpu", seed=3)
        img = r.render(sc, cfg)  # compile (persistent-cached) / warm
        t0 = time.perf_counter()
        img = r.render(sc, cfg)
        dt = time.perf_counter() - t0
        means[f"{sb}x{nb}"] = round(float(img.mean()), 2)
        return dt, r.stats.ray_segments

    # interleaved rounds: every config once per round
    for rep in range(reps):
        for sb, nb in CONFIGS:
            dt, segs = run_one(sb, nb)
            results[f"{sb}x{nb}"].append((dt, segs))
            print(
                f"rep {rep} subbox={sb} buckets={nb}: {dt:6.3f}s "
                f"({segs / dt / 1e6:6.2f} Mrays/s)",
                flush=True,
            )

    rows = []
    for key, runs in results.items():
        best = min(dt for dt, _ in runs)
        segs = runs[0][1]
        rows.append(
            dict(
                config=key,
                best_s=round(best, 3),
                all_s=[round(dt, 3) for dt, _ in runs],
                mrays=round(segs / best / 1e6, 2),
                img_mean=means[key],
            )
        )
        print(f"{key}: best {best:.3f}s = {segs / best / 1e6:.2f} Mrays/s", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mesh_tuning.json")
    with open(out, "w") as f:
        json.dump(
            {
                "what": "SUBBOX x N_BUCKETS interleaved A/B, 10k-tri bench 512x512@1pass d8",
                "date": "2026-08-20 (round 5)",
                "reps": reps,
                "rows": rows,
            },
            f,
            indent=1,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
