"""Time the bucketed page prepass in isolation on the 10k bench scene.

The round-4 walk attribution (PERF.md) accounts the per-ROUND costs
(gather matmul, dense test, pop, stop) but not the per-WALK prepass:
``_page_prepass_bucketed`` pays O(pages x sub-boxes) slab tests per lane
per walk invocation, and the gpu contract runs ~16 samples x ~3 walks
per pass.  If the prepass is a co-dominator, cutting boxes (SUBBOX) or
sharing prepasses matters more than more round surgery.

Times three jitted variants over a (ROWS, 128) ray grid:
  * prepass only (bucketed, direction-folded — what the walks call)
  * prepass + one pop (adds the per-round pop machinery once)
  * full closest-hit gather walk

Usage: python tools/perf/prepass_bench.py [rows reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import numpy as np


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import jax
    import jax.numpy as jnp

    from path_trace_golang_tpu.ops import bvh as B
    from path_trace_golang_tpu.ops.vec import LANE, V3
    from path_trace_golang_tpu.scene import builtin
    from path_trace_golang_tpu.soa import pack_scene

    sc = builtin.bench_mesh()
    pack = pack_scene(sc, 512, 512)
    paged = pack.paged
    print(f"{pack.n_triangles} tris, {paged.n_pages} pages, rows={rows}")

    shape = (rows, LANE)
    rng = np.random.default_rng(11)
    n = rows * LANE
    o_np = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    o_np[:, 1] += 1.5
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = V3(*(jnp.asarray(o_np[:, k].reshape(shape)) for k in range(3)))
    d = V3(*(jnp.asarray(d_np[:, k].reshape(shape)) for k in range(3)))
    fz = jnp.zeros(shape, jnp.float32)
    iz = jnp.zeros(shape, jnp.int32)
    big = fz + 1e20

    def prepass_only(o, d):
        inv = V3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
        ax = paged.sort_axis
        d_ax = (d.x, d.y, d.z)[ax]
        bwords, splits = B._page_prepass_bucketed(
            o, d, inv, paged, jnp.float32(1e-3), big, fwd=d_ax >= 0
        )
        acc = bwords[0][0]
        for wb in bwords:
            for w in wb:
                acc = acc ^ w
        for s in splits:
            acc = acc + s.astype(jnp.int32)
        return acc

    state = dict(
        best_t=big, best_m=iz - 1, best_type=iz, best_mat=iz, best_mtyp=iz,
        b_rough=fz, b_ior=fz, b_smooth=fz, b_refl=fz, b_abss=fz,
        b_albedo=V3(fz, fz, fz), b_emit=V3(fz, fz, fz),
        b_absorb=V3(fz, fz, fz), b_tint=V3(fz, fz, fz), nx=fz, ny=fz, nz=fz,
    )

    def full_walk(o, d):
        st, visits = B.traverse_triangles_paged(o, d, pack, 1e-3, dict(state))
        return st["best_t"], visits

    def occl_walk(o, d):
        return B.occluded_triangles_paged(
            o, d, pack, 1e-3, 6.0, jnp.zeros(shape, bool)
        )

    fns = [("prepass", prepass_only), ("closest walk", full_walk), ("anyhit walk", occl_walk)]
    js = {name: jax.jit(fn) for name, fn in fns}
    for name, _ in fns:
        jax.block_until_ready(js[name](o, d))  # compile
    for name, _ in fns:
        f = js[name]
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(o, d))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name:>14}: {best * 1e3:8.2f} ms  ({best / rows * 1e6:.2f} us/row)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
