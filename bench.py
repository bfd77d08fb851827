"""Headline benchmark: Mrays/sec/chip on gpu_showcase.json.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline target (BASELINE.json): >= 100 Mrays/sec on one v5e chip;
headline config is gpu_showcase.json at 1080p (full GPU physics contract:
NEE over 7 sphere lights, volumetric fog march, GGX metals, dielectrics,
16 stratified samples per progressive pass).  "Rays" counts traced path
segments (primary + bounces, shadow/NEE rays not counted — conservative).

Diagnostics (per-scene table, wall-clock to 64 spp) go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time


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
    # The warmup must compile the SAME kernels the timed run uses: the
    # timed run renders whole pass windows (PATHTRACER_PASS_WINDOW,
    # default 8), so a 1-pass warmup would leave the window kernel's
    # ~90s compile inside the timed region whenever the persistent cache
    # misses (fresh backend/libtpu).  Warm one full window.
    window = max(1, int(os.environ.get("PATHTRACER_PASS_WINDOW", "8")))
    bench_passes = int(os.environ.get("BENCH_PASSES", "16"))
    bench_passes = max(bench_passes, window)
    warm_passes = min(window, bench_passes)

    path = builtin.find_scene("gpu_showcase")
    if path is not None:
        sc = scene_io.load(path)
        name = os.path.basename(path)
    else:
        sc = builtin.demo_showcase()
        name = "demo_showcase(builtin)"
    print(f"bench scene: {name} @ {width}x{height}, depth {max_depth}", file=sys.stderr)

    renderer = pt.Renderer(contract="gpu", seed=1)

    # warmup / compile — tracked in the JSON artifact (compile_s) so the
    # cold-start cost is a budgeted number across rounds, not a silent tax
    t0 = time.perf_counter()
    renderer.render(sc, pt.RenderConfig(width, height, warm_passes, max_depth))
    compile_s = time.perf_counter() - t0
    print(f"warmup+compile: {compile_s:.1f}s", file=sys.stderr)

    # timed run
    renderer = pt.Renderer(contract="gpu", seed=2)
    img = renderer.render(sc, pt.RenderConfig(width, height, bench_passes, max_depth))
    s = renderer.stats
    mrays = s.mrays_per_sec
    per_pass = s.wall_seconds / max(1, s.passes)
    print(
        f"{s.passes} passes in {s.wall_seconds:.2f}s ({per_pass:.2f}s/pass), "
        f"{s.ray_segments / 1e6:.0f}M segments, {mrays:.1f} Mrays/s, "
        f"image mean {img.mean():.1f}",
        file=sys.stderr,
    )
    print(
        f"projected wall-clock to 64 spp @1080p: {per_pass * 64:.1f}s",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "Mrays/sec/chip (gpu_showcase 1080p, full GPU contract)",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 100.0, 3),
                "compile_s": round(compile_s, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
