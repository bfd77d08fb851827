"""Attribute the bench cold-start: client trace+lower vs XLA/Mosaic
compile vs persistent-cache hit vs first-dispatch warmup.

VERDICT round-3 item 3: compile_s grew 48 -> 103.5 -> 158.1 s across
rounds with no owner.  This tool times the pieces for the two programs
bench.py actually builds (the 1080p showcase pass-window and the 512^2
mesh-bench pass), using jax's AOT API:

    traced   = jitted.trace(*args)      # Python trace -> jaxpr
    lowered  = traced.lower()           # jaxpr -> StableHLO
    compiled = lowered.compile()        # XLA/Mosaic (or cache hit)

Run it twice: with a COLD cache directory (attribute real compile) and
again with the warm one (measure the cache-hit path bench.py relies on).

Usage:
    python tools/perf/compile_attrib.py [--scene mesh|showcase] [--cache DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])


def main() -> int:
    which = "mesh"
    cache = ""
    args = sys.argv[1:]
    if "--scene" in args:
        which = args[args.index("--scene") + 1]
    if "--cache" in args:
        cache = args[args.index("--cache") + 1]

    import jax

    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import path_trace_golang_tpu as pt
    from path_trace_golang_tpu import render as R
    from path_trace_golang_tpu.scene import builtin, io as scene_io
    from path_trace_golang_tpu.soa import pack_scene
    from path_trace_golang_tpu.integrator import trace_config_for_scene

    os.environ.setdefault("PATHTRACER_NO_FALLBACK", "1")

    if which == "mesh":
        sc = builtin.bench_mesh()
        # bench.py's mesh metric renders one full 8-pass window
        w, h, depth = 512, 512, 8
        window = max(1, int(os.environ.get("PATHTRACER_PASS_WINDOW", "8")))
    else:
        path = builtin.find_scene("gpu_showcase")
        sc = scene_io.load(path) if path else builtin.demo_showcase()
        w, h, depth = 1920, 1080, 12
        window = max(1, int(os.environ.get("PATHTRACER_PASS_WINDOW", "8")))

    n = w * h
    lane_cap = R.max_chunk_lanes(sc)
    chunk = min(R.env_config.get_chunk_size(), n, lane_cap)
    n_pad = (-(-n // chunk)) * chunk
    pack = pack_scene(sc, w, h)
    tcfg = trace_config_for_scene(pack, sc, depth, "gpu", faithful_fog=False)
    accum = jnp.zeros((n_pad, 3), jnp.float32)
    statics = dict(
        tcfg=tcfg, width=w, height=h, n_strata=4, samples=16,
        has_aperture=sc.camera.aperture > 0, chunk=chunk,
        normalize_pass=False, n_passes=window,
    )

    t0 = time.perf_counter()
    traced = R._render_pass_chunk.trace(
        accum, pack, jnp.uint32(1), jnp.int32(0), **statics
    )
    t_trace = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered = traced.lower()
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(accum, pack, jnp.uint32(1), jnp.int32(0))
    jax.block_until_ready(out[0])
    t_first = time.perf_counter() - t0

    print(
        f"{which} pass-window program (chunk={chunk}, window={window}):\n"
        f"  trace   : {t_trace:7.1f} s\n"
        f"  lower   : {t_lower:7.1f} s\n"
        f"  compile : {t_compile:7.1f} s  (cache={'on:' + cache if cache else 'off'})\n"
        f"  first run: {t_first:6.1f} s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
