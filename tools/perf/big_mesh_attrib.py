"""Component attribution of the 100k-triangle walk via knob deltas.

The round-5 window x limbs sweep (window_sweep.json) showed that past
windowing, neither the window width (128 vs 256: neutral) nor the
gather matmul (limbs 3 -> 2: +10%) dominates the 100k walk.  The
remaining candidates scale with the PAGE COUNT per se:

  * the per-walk PREPASS (O(pages x SUBBOX) slab tests per lane) —
    halved by SUBBOX 2 -> 1 (at the price of more wants/rounds);
  * the per-round word machinery (pop scan, early-stop kill, loop
    carry: N_BUCKETS x ceil(pages/30) i32 words, each a (1,128) grid
    padded to a full (8,128) VPU tile) — halved by N_BUCKETS 4 -> 2,
    quartered by 1 (at the price of later early stops).

Each knob is confounded with its physics cost (more rounds / later
stops), so deltas are a LOWER bound on the component's share.  All
configs interleave in one process (PERF.md measurement discipline).

Usage: python tools/perf/big_mesh_attrib.py [n_lat n_lon [reps]]
Writes tools/perf/big_mesh_attrib.json.
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
    (2, 4),  # shipping defaults — matches tri_scaling round-5 row
    (2, 2),  # fewer buckets: pops closer to page order -> fewer window deferrals
    (2, 1),  # pure page-order pops, no bucketed early stop
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
    results = {f"sb{sb}xnb{nb}": [] for sb, nb in CONFIGS}
    means = {}
    cur_buckets = bvh.N_BUCKETS

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
        means[f"sb{sb}xnb{nb}"] = round(float(img.mean()), 4)
        return dt, r.stats.ray_segments

    for rep in range(reps):
        for sb, nb in CONFIGS:
            dt, segs = run_one(sb, nb)
            results[f"sb{sb}xnb{nb}"].append((dt, segs))
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

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "big_mesh_attrib.json"
    )
    with open(out, "w") as f:
        json.dump(
            {
                "what": (
                    f"SUBBOX x N_BUCKETS interleaved A/B, bench_mesh({n_lat},{n_lon}) "
                    "512x512@1pass d8, window=256 limbs=3"
                ),
                "date": time.strftime("%Y-%m-%d"),
                "reps": reps,
                "rows": rows,
            },
            f,
            indent=1,
        )
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
