"""GATHER_WINDOW x TEST_LIMBS sweep on the 100k-triangle bench (one process).

Round-5 follow-up to the windowed gather: the window caps the per-round
one-hot contraction at W pages (MACs ~ W x PAGE_TRIS per attr-limb), but
out-of-window lanes DEFER, adding rounds.  This sweep measures the
tradeoff on the 100k-tri mesh (p_pad 896), where the full-width wall was
1.5 Mrays/s and window=256 measured 2.35:

* window 256 vs 128 — halves per-round MACs, raises deferral rounds;
* TEST_LIMBS 3 vs 2 — drops a third of the gather matmuls at
  2^-16-relative selection precision (winner resolve stays exact
  3-limb); measured NEUTRAL at 80 pages, expected to matter at 896.

All configs run INTERLEAVED in one process on one tunnel worker
(PERF.md "Measurement discipline").  Both knobs change only the traced
program (not the pack cache key), so the jit cache is cleared at each
switch; the persistent compile cache makes revisits cheap.

Usage: python tools/perf/window_sweep.py [n_lat n_lon [reps]]
Writes tools/perf/window_sweep.json.
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

CONFIGS = [  # (window pages, test limbs)
    (256, 3),  # shipping defaults (tri_scaling round-5 row: 2.35 Mrays/s)
    (128, 3),
    (128, 2),
    (256, 2),
]


def main() -> int:
    import path_trace_golang_tpu as pt
    from path_trace_golang_tpu.ops import bvh
    from path_trace_golang_tpu.scene import builtin

    n_lat = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    n_lon = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    sc = builtin.bench_mesh(n_lat, n_lon)
    cfg = pt.RenderConfig(512, 512, 1, 8)
    rows = []
    for w, limbs in CONFIGS:
        bvh.GATHER_WINDOW = w
        bvh.TEST_LIMBS = limbs
        jax.clear_caches()
        r = pt.Renderer(contract="gpu", seed=3)
        t0 = time.perf_counter()
        img = r.render(sc, cfg)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            img = r.render(sc, cfg)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        row = dict(
            window=w,
            limbs=limbs,
            mrays=round(r.stats.ray_segments / dt / 1e6, 2),
            best_s=round(dt, 2),
            img_mean=round(float(img.mean()), 4),
            compile_s=round(compile_s, 1),
        )
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = dict(
        what=(
            "window x limbs interleaved sweep, bench_mesh"
            f"({n_lat},{n_lon}) 512x512 @1pass depth 8, real v5e"
        ),
        date=time.strftime("%Y-%m-%d"),
        rows=rows,
    )
    path = os.path.join(os.path.dirname(__file__), "window_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
