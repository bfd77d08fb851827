"""Dispatch-overhead scaling of the ("px","spp") mesh on virtual devices.

No real multi-chip hardware is reachable in this image, so this measures
the measurable remainder: host-side dispatch/collective overhead of
`parallel.MeshRenderer` at 1/2/4/8 virtual CPU devices on a FIXED
workload (same pixels, same passes — per-device work shrinks as devices
grow).  On real ICI the per-pass `psum` rides hardware; here it rides
shared memory, so the numbers bound the HOST overhead a real pod run
would add on top of single-chip math, not ICI time.

Usage: python tools/perf/mesh_scaling.py [width height spp]
Prints one table row per mesh shape; writes tools/perf/mesh_scaling.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

# 8 virtual CPU devices, pinned before any backend initializes (the
# image's sitecustomize force-sets an axon TPU platform otherwise)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main() -> int:
    from path_trace_golang_tpu import RenderConfig
    from path_trace_golang_tpu.parallel import MeshRenderer, make_mesh
    from path_trace_golang_tpu.scene import load

    args = sys.argv[1:]
    w = int(args[0]) if args else 128
    h = int(args[1]) if len(args) > 1 else 72
    spp = int(args[2]) if len(args) > 2 else 8

    sc = load("/root/reference/scenes/example_simple.json")
    cfg = RenderConfig(width=w, height=h, samples_per_px=spp, max_depth=8)

    shapes = [(1, 1), (2, 1), (4, 1), (8, 1), (4, 2), (2, 4), (1, 8)]
    rows = []
    base = None
    for n_px, n_spp in shapes:
        mesh = make_mesh(n_px, n_spp)
        r = MeshRenderer(mesh=mesh, contract="gpu", seed=11)
        t0 = time.perf_counter()
        img = r.render(sc, cfg)  # compile + run
        compile_s = time.perf_counter() - t0
        n_rep = 3
        t0 = time.perf_counter()
        for _ in range(n_rep):
            img = r.render(sc, cfg)
        dt = (time.perf_counter() - t0) / n_rep
        if base is None:
            base = dt
        rows.append(
            dict(
                mesh=f"{n_px}x{n_spp}",
                devices=n_px * n_spp,
                secs=round(dt, 3),
                vs_1dev=round(base / dt, 3),
                compile_s=round(compile_s, 1),
                img_mean=round(float(img.mean()), 2),
            )
        )
        print(
            f"mesh {n_px}x{n_spp} ({n_px * n_spp} dev): {dt:7.3f}s/render "
            f"(x{base / dt:4.2f} vs 1-dev), compile {compile_s:5.1f}s, "
            f"img mean {img.mean():6.2f}",
            flush=True,
        )

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mesh_scaling.json")
    with open(out, "w") as f:
        json.dump({"w": w, "h": h, "spp": spp, "rows": rows}, f, indent=1)
    # virtual CPU devices share host cores, so fixed-workload wall time
    # should stay ~flat as devices grow: flat == low host overhead.
    worst = max(r["secs"] for r in rows)
    print(json.dumps({"ok": worst < rows[0]["secs"] * 3.0, "worst_secs": worst}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
