"""Attribution of the virtual-device mesh 'scaling' numbers (VERDICT r4 #5).

mesh_scaling.py reports e.g. 4.16x at 8 virtual CPU devices on a FIXED
workload — but this host has ONE vCPU (nproc=1), so 8 virtual devices
cannot run compute in parallel: any apparent speedup is NOT parallelism.
This probe separates the three candidate components per mesh shape:

  * ``wall``        — the same fixed-workload wall mesh_scaling.py times.
  * ``shard_wall``  — ONE device rendering exactly one shard's workload
                      (px/n_px of the pixels, spp/n_spp of the passes).
                      ``n_dev x shard_wall`` bounds the serialized
                      compute the virtual mesh must pay on one core.
  * ``tiny_wall``   — the same mesh shape on a near-zero workload
                      (8x8 px, 1 spp): the per-shape fixed overhead
                      (host loop, dispatch, psum plumbing).

Reading: if wall ~= n_dev * shard_wall + tiny_wall, the 'scaling' table
is really measuring how much per-dispatch overhead each shape amortizes
(smaller per-device grids => cheaper per-pass host work), not parallel
compute — the expectation for real ICI hardware is then PIXEL-count
scaling of the compute term (each chip truly concurrent) plus the SAME
per-shape overhead term, i.e. the px-axis efficiency on a real pod
should be far higher than the virtual number.

Usage: python tools/perf/mesh_attrib.py [width height spp]
Appends an ``attrib`` section + note into tools/perf/mesh_scaling.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

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


def _timed(fn, reps=3):
    fn()  # compile / warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main() -> int:
    from path_trace_golang_tpu import RenderConfig
    from path_trace_golang_tpu.parallel import MeshRenderer, make_mesh
    from path_trace_golang_tpu.scene import load

    args = sys.argv[1:]
    w = int(args[0]) if args else 64
    h = int(args[1]) if len(args) > 1 else 36
    spp = int(args[2]) if len(args) > 2 else 4

    sc = load("/root/reference/scenes/gpu_showcase.json")
    cfg = RenderConfig(width=w, height=h, samples_per_px=spp, max_depth=8)

    shapes = [(1, 1), (8, 1), (4, 2), (1, 8)]
    rows = []
    for n_px, n_spp in shapes:
        mesh = make_mesh(n_px, n_spp)
        r = MeshRenderer(mesh=mesh, contract="gpu", seed=11)
        wall = _timed(lambda: r.render(sc, cfg))

        # one shard's workload on ONE device: px shard => h/n_px rows,
        # spp shard => spp/n_spp passes (height shards along rows)
        shard_cfg = RenderConfig(
            width=w,
            height=max(1, h // n_px),
            samples_per_px=max(1, spp // n_spp),
            max_depth=8,
        )
        r1 = MeshRenderer(mesh=make_mesh(1, 1), contract="gpu", seed=11)
        shard_wall = _timed(lambda: r1.render(sc, shard_cfg))

        # near-zero workload on the same mesh shape: fixed overhead
        tiny_cfg = RenderConfig(width=8, height=8, samples_per_px=1, max_depth=2)
        rt = MeshRenderer(mesh=mesh, contract="gpu", seed=11)
        tiny_wall = _timed(lambda: rt.render(sc, tiny_cfg))

        n_dev = n_px * n_spp
        model = n_dev * shard_wall + tiny_wall
        rows.append(
            dict(
                mesh=f"{n_px}x{n_spp}",
                devices=n_dev,
                wall=round(wall, 3),
                shard_wall=round(shard_wall, 3),
                serialized_model=round(model, 3),
                tiny_wall=round(tiny_wall, 3),
            )
        )
        print(
            f"mesh {n_px}x{n_spp}: wall {wall:6.3f}s | 1-dev shard "
            f"{shard_wall:6.3f}s (x{n_dev} = {n_dev * shard_wall:6.3f}) | "
            f"tiny {tiny_wall:6.3f}s | serialized model {model:6.3f}s",
            flush=True,
        )

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mesh_scaling.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data["attrib"] = {
        "nproc": os.cpu_count(),
        "rows": rows,
        "note": (
            "Host has nproc=1: virtual devices SERIALIZE compute, so the "
            "scaling table's speedups measure per-shape overhead "
            "amortization, not parallelism.  wall ~ devices*shard_wall + "
            "tiny_wall attributes each shape; on real ICI the compute "
            "term divides by the (truly concurrent) chip count while the "
            "overhead term stays, so real px-axis efficiency should far "
            "exceed the virtual figures."
        ),
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps({"ok": True, "rows": len(rows)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
