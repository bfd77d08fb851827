"""Headline benchmark: Mrays/sec/chip on gpu_showcase.json + mesh BVH.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
     "spread": ..., "compile_s": ..., "mesh_mrays": ..., ...}

``value`` is the MEDIAN of >= 3 independently timed pass windows (the
axon tunnel varies ±30% across processes and ±15% across chips — a
single timed run carries no round-over-round significance; PERF.md
"Measurement discipline").  ``spread`` is (max - min) of the window
measurements in Mrays/s.

Baseline target (BASELINE.json): >= 100 Mrays/sec on one v5e chip;
headline config is gpu_showcase.json at 1080p (full GPU physics contract:
NEE over 7 sphere lights, volumetric fog march, GGX metals, dielectrics,
16 stratified samples per progressive pass).  "Rays" counts traced path
segments (primary + bounces, shadow/NEE rays not counted — conservative).

``mesh_mrays`` renders the 10,240-triangle UV-sphere scene
(scene.builtin.bench_mesh — the workload tools/perf/bvh_bench.py has
tracked since round 3) at 512x512, one full 8-pass window, depth 8
through the paged-BVH gather walk, so SUSTAINED mesh throughput is a
driver-tracked number, not a PERF.md-only one.

Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def _timed_windows(renderer_factory, scene, cfg, n_runs):
    """Render ``cfg`` ``n_runs`` times in fresh renderers; returns the
    per-run Mrays/s list (same process, same tunnel worker — the only
    comparison regime PERF.md found trustworthy)."""
    rates = []
    for i in range(n_runs):
        r = renderer_factory(i)
        r.render(scene, cfg)
        rates.append(r.stats.mrays_per_sec)
    return rates


def main() -> int:
    # a gpu-contract regression must fail the bench, not silently demote
    # to the cpu contract (render.py fallback)
    os.environ.setdefault("PATHTRACER_NO_FALLBACK", "1")
    import jax

    # persistent compile cache: spares repeat bench runs the multi-minute
    # warmup when the backend supports executable serialization
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import path_trace_golang_tpu as pt
    from path_trace_golang_tpu.scene import builtin, io as scene_io

    width, height = 1920, 1080
    max_depth = 12  # gpu_showcase settings (SURVEY.md §6)
    # The warmup must compile the SAME kernels the timed runs use: the
    # timed runs render whole pass windows (PATHTRACER_PASS_WINDOW,
    # default 8), so a 1-pass warmup would leave the window kernel's
    # compile inside the timed region whenever the persistent cache
    # misses (fresh backend/libtpu).  Warm one full window.
    window = max(1, int(os.environ.get("PATHTRACER_PASS_WINDOW", "8")))
    n_runs = max(3, int(os.environ.get("BENCH_RUNS", "3")))

    path = builtin.find_scene("gpu_showcase")
    if path is not None:
        sc = scene_io.load(path)
        name = os.path.basename(path)
    else:
        sc = builtin.demo_showcase()
        name = "demo_showcase(builtin)"
    print(f"bench scene: {name} @ {width}x{height}, depth {max_depth}", file=sys.stderr)

    cfg = pt.RenderConfig(width, height, window, max_depth)

    # warmup / compile — tracked in the JSON artifact (compile_s) so the
    # cold-start cost is a budgeted number across rounds, not a silent tax
    t0 = time.perf_counter()
    pt.Renderer(contract="gpu", seed=1).render(sc, cfg)
    compile_s = time.perf_counter() - t0
    print(f"warmup+compile: {compile_s:.1f}s", file=sys.stderr)

    # timed runs: n_runs independent windows, median + spread
    rates = _timed_windows(
        lambda i: pt.Renderer(contract="gpu", seed=2 + i), sc, cfg, n_runs
    )
    mrays = statistics.median(rates)
    spread = max(rates) - min(rates)
    for i, r in enumerate(rates):
        print(f"  window {i}: {r:.1f} Mrays/s", file=sys.stderr)
    print(
        f"headline: median {mrays:.1f} Mrays/s of {len(rates)} windows "
        f"(spread {spread:.1f})",
        file=sys.stderr,
    )

    # ---- mesh/BVH metric: 10,240-triangle bench scene ------------------
    # 8 passes = ONE full regeneration window in one dispatch: the
    # SUSTAINED walk throughput a 256-spp mesh render sees.  A 1-pass
    # config under-reports by ~25% because the ~0.2 s fixed per-render
    # cost (dispatch + finalize readback on the remote link) dominates a
    # 0.55 s pass (PERF.md round 4: 10.5 / 12.9 / 13.7 Mrays/s at
    # 1/4/8 passes).  First driver-recorded round for this metric, so
    # the definition is set here once, before any history exists.
    mesh_sc = builtin.bench_mesh()
    mesh_cfg = pt.RenderConfig(512, 512, window, 8)
    t0 = time.perf_counter()
    pt.Renderer(contract="gpu", seed=11).render(mesh_sc, mesh_cfg)
    mesh_compile_s = time.perf_counter() - t0
    print(f"mesh warmup+compile: {mesh_compile_s:.1f}s", file=sys.stderr)
    mesh_rates = _timed_windows(
        lambda i: pt.Renderer(contract="gpu", seed=12 + i), mesh_sc, mesh_cfg, n_runs
    )
    mesh_mrays = statistics.median(mesh_rates)
    print(
        f"mesh (10,240 tris @512x512/{window}pass/d8): median {mesh_mrays:.2f} "
        f"Mrays/s of {[round(r, 2) for r in mesh_rates]}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "Mrays/sec/chip (gpu_showcase 1080p, full GPU contract)",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 100.0, 3),
                "spread": round(spread, 2),
                "runs": len(rates),
                "compile_s": round(compile_s, 1),
                "mesh_mrays": round(mesh_mrays, 2),
                "mesh_spread": round(max(mesh_rates) - min(mesh_rates), 2),
                "mesh_compile_s": round(mesh_compile_s, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
