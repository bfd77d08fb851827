"""Kernel-path mesh scaling: Mrays/s at 10k/40k/100k triangles.

One process, one tunnel worker (the only trustworthy comparison regime —
PERF.md "Measurement discipline"); each size warms its own compile then
times 3 renders.  Writes tools/perf/tri_scaling.json.

Round-5 context: the per-round one-hot gather used to contract over ALL
P_pad pages (~1/P_pad throughput, round-4 rows 9.5/3.6/1.5); the
windowed gather (ops/bvh.GATHER_WINDOW) caps the contraction at a
fixed page window, so throughput should flatten with mesh size.

Usage: python tools/perf/tri_scaling.py [window]
  window: override PATHTRACER_BVH_GATHER_WINDOW (pages; 0 = full width).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

if len(sys.argv) > 1:
    os.environ["PATHTRACER_BVH_GATHER_WINDOW"] = sys.argv[1]
os.environ.setdefault("PATHTRACER_NO_FALLBACK", "1")

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SIZES = [
    (80, 64),  # 10,240 tris
    (160, 128),  # 40,960 tris
    (250, 200),  # 100,000 tris
]


def main() -> int:
    import path_trace_golang_tpu as pt
    from path_trace_golang_tpu.ops import bvh
    from path_trace_golang_tpu.scene import builtin
    from path_trace_golang_tpu.soa import pack_scene

    w = h = 512
    rows = []
    for n_lat, n_lon in SIZES:
        sc = builtin.bench_mesh(n_lat, n_lon)
        pack = pack_scene(sc, w, h)
        paged = pack.paged
        p_pad = pack.page_gather.shape[1]
        table_mib = pack.page_gather.size * 4 / (1 << 20)
        r = pt.Renderer(contract="gpu", seed=3)
        cfg = pt.RenderConfig(w, h, 1, 8)
        t0 = time.perf_counter()
        img = r.render(sc, cfg)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            img = r.render(sc, cfg)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        mrays = r.stats.ray_segments / dt / 1e6
        row = dict(
            triangles=pack.n_triangles,
            pages=paged.n_pages,
            p_pad=p_pad,
            window=bvh._window_for(p_pad) or p_pad,
            table_mib=round(table_mib, 1),
            mrays=round(mrays, 2),
            best_s=round(dt, 2),
            img_mean=round(float(img.mean()), 1),
            compile_s=round(compile_s, 1),
        )
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tri_scaling.json")
    with open(out, "w") as f:
        json.dump(
            {
                "what": (
                    "tri_scaling.py on real v5e, 512x512 @1pass depth 8, "
                    "gather-walk kernel path (f32 limb-planed table, windowed gather)"
                ),
                "date": "2026-08-20 (round 5)",
                "gather_window": bvh.GATHER_WINDOW,
                "rows": rows,
                "note": (
                    "Round-4 full-width contraction scaled ~1/P_pad "
                    "(9.5/3.6/1.5 Mrays/s at 10k/40k/100k); the windowed "
                    "gather contracts over min(P_pad, window) pages anchored "
                    "at each round's minimum live page, so per-round MAC cost "
                    "is size-independent beyond the window."
                ),
            },
            f,
            indent=1,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
