"""BVH scaling benchmark: >=10k-triangle mesh through the paged walk.

Builds a ~10k-triangle UV-sphere mesh (far above the 128-triangle
static-unroll cliff), renders it end-to-end (the Pallas kernel holds the
paged tables in VMEM at this size), and measures the paged walk's
iteration counts directly:

* coherent packets (camera rays of one tile) want few pages and take
  short per-lane walks inside them;
* incoherent packets (random rays) want most pages — the bounded worst
  case is the per-page iteration budget, not the node count, because
  every lane walks its own cursor within a page (PERF.md round 4).

Usage: python tools/perf/bvh_bench.py [n_lat] [n_lon]
Defaults build 2*80*64 = 10,240 triangles.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np


def uv_sphere(n_lat: int, n_lon: int, center=(0.0, 1.0, 0.0), radius=1.0):
    """Indexed UV-sphere mesh: 2 * n_lat * n_lon triangles (shared by the
    sibling perf probes; bench renders use scene.builtin.bench_mesh)."""
    cx, cy, cz = center
    verts = []
    for i in range(n_lat + 1):
        theta = np.pi * i / n_lat
        for j in range(n_lon):
            phi = 2 * np.pi * j / n_lon
            verts.append(
                (
                    cx + radius * np.sin(theta) * np.cos(phi),
                    cy + radius * np.cos(theta),
                    cz + radius * np.sin(theta) * np.sin(phi),
                )
            )
    faces = []
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append((a, b, c))
            faces.append((b, d, c))
    return verts, faces


def main() -> int:
    import os
    import subprocess

    # The walk-iteration counting runs the XLA (non-Pallas) path, which
    # the axon remote compiler takes tens of minutes on; a plain-CPU
    # subprocess (JAX_PLATFORMS=cpu skips the remote compile helper
    # entirely) compiles it in seconds.
    if (
        "--counts" not in sys.argv
        and "--render-only" not in sys.argv
        and os.environ.get("JAX_PLATFORMS", "") != "cpu"
    ):
        r = subprocess.run(
            [sys.executable, __file__, "--counts"] + [a for a in sys.argv[1:]],
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        if r.returncode:
            return r.returncode

    from path_trace_golang_tpu.ops import bvh as bvh_mod
    from path_trace_golang_tpu.ops.camera import camera_rays
    from path_trace_golang_tpu.ops.rng import LaneRng, seed_lanes
    from path_trace_golang_tpu.ops.vec import LANE, V3
    from path_trace_golang_tpu.scene import builtin
    from path_trace_golang_tpu.soa import pack_scene

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    counts_only = "--counts" in sys.argv
    n_lat = int(args[0]) if len(args) > 0 else 80
    n_lon = int(args[1]) if len(args) > 1 else 64
    # the SAME scene bench.py's mesh_mrays metric renders — one tracked
    # workload, two entry points
    sc = builtin.bench_mesh(n_lat, n_lon)

    w = h = 512
    pack = pack_scene(sc, w, h)
    paged = pack.paged
    n_budget = paged.n_pages  # full page-visit budget
    print(
        f"mesh: {pack.n_triangles} triangles, {paged.n_pages} pages "
        f"(dense paged sweep: {bvh_mod.use_dynamic_walk(pack.n_triangles)})"
    )
    assert pack.n_triangles >= 10_000, "benchmark wants >= 10k triangles"
    if not counts_only:
        # counting already ran in the CPU subprocess; go straight to the
        # end-to-end Pallas render
        return _render_bench(sc, w, h)

    # ---- node-visit counts of the packet walk -------------------------
    rows = 32  # one 4096-lane packet
    shape = (rows, LANE)

    def tile_rays(tile_x, tile_y):
        """Camera rays for one 64x64 pixel tile (coherent packet)."""
        idx = jnp.arange(rows * LANE, dtype=jnp.int32)
        px = tile_x * 64 + (idx % 64)
        py = tile_y * 64 + (idx // 64)
        u = px.astype(jnp.float32) / (w - 1)
        v = ((h - 1) - py).astype(jnp.float32) / (h - 1)
        rng = LaneRng(seed_lanes(px, py, jnp.uint32(1)))
        o, d = camera_rays(
            u.reshape(shape), v.reshape(shape), pack.cam, w, h, rng, False
        )
        return o, d

    def count_visits(o, d):
        fz = o.x * 0.0
        iz = fz.astype(jnp.int32)
        state = dict(
            best_t=jnp.full(shape, 1e20), best_m=iz, best_type=iz, best_mat=iz,
            best_mtyp=iz, b_rough=fz, b_ior=fz, b_smooth=fz, b_refl=fz, b_abss=fz,
            b_albedo=V3(fz, fz, fz), b_emit=V3(fz, fz, fz),
            b_absorb=V3(fz, fz, fz), b_tint=V3(fz, fz, fz), nx=fz, ny=fz, nz=fz,
        )
        _st, visits = bvh_mod.traverse_triangles_paged(
            o, d, pack, jnp.float32(0.001), state
        )
        return visits

    jcount = jax.jit(count_visits)

    total = 0
    tiles = [(x, y) for x in range(8) for y in range(8)]
    for tx, ty in tiles:
        o, d = tile_rays(tx, ty)
        total += int(jcount(o, d))
    coherent = total / len(tiles)

    # adversarial: 4096 fully random rays per packet
    r = np.random.RandomState(11)
    o = V3(*(jnp.asarray(r.uniform(-3, 3, shape).astype(np.float32)) for _ in range(3)))
    d = V3(*(jnp.asarray(r.uniform(-1, 1, shape).astype(np.float32)) for _ in range(3))).normalize()
    incoherent = int(jcount(o, d))

    print(
        f"pages swept per 4096-lane packet (of {n_budget} budget): "
        f"coherent {coherent:.1f} ({coherent / n_budget:.1%}), "
        f"incoherent {incoherent} ({incoherent / n_budget:.1%})",
        flush=True,
    )

    return 0


def _render_bench(sc, w, h) -> int:
    # ---- end-to-end render speed --------------------------------------
    import path_trace_golang_tpu as pt

    renderer = pt.Renderer(contract="gpu", seed=3)
    cfg = pt.RenderConfig(w, h, 1, 8)
    t0 = time.perf_counter()
    renderer.render(sc, cfg)  # warm/compile
    print(f"warmup+compile: {time.perf_counter() - t0:.1f}s", flush=True)
    # the axon tunnel's wall clock is noisy (shared hop): report best of 3
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        img = renderer.render(sc, cfg)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    s = renderer.stats
    print(
        f"render {w}x{h}@1pass depth 8: best {dt:.2f}s of {[round(t, 2) for t in times]}, "
        f"{s.ray_segments / dt / 1e6:.1f} Mrays/s, image mean {img.mean():.1f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
