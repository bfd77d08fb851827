"""Rounds (while-loop trips) of the closest-hit gather walk at 100k tris.

Quantifies WINDOW DEFERRAL and its interaction with t-bucketed popping.
The window anchors each round at the minimum live POPPED page; bucketed
pops are t-ordered, not page-ordered, so a bucket-priority pop can sit
far beyond the anchor and defer for many rounds — the hypothesis behind
big_mesh_attrib's N_BUCKETS=1 > 4 result at 100k (2.67 vs 2.15 Mrays/s:
fewer deferral rounds, not cheaper word ops).

Every round pays the full gather matmul + dense MT test whether 128
lanes popped or 3, so rounds/row IS the cost model at big page counts.

Usage: JAX_PLATFORMS=cpu python tools/perf/rounds_100k.py [n_lat n_lon]
Prints rounds/row for (window, buckets) configs on camera + bounce rays.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from path_trace_golang_tpu.ops import bvh as B  # noqa: E402
from path_trace_golang_tpu.ops.vec import LANE, V3  # noqa: E402

ROWS = 16
CONFIGS = [(0, 4), (256, 4), (256, 1), (128, 1), (256, 2)]


def main() -> int:
    from bvh_bench import uv_sphere
    from path_trace_golang_tpu.scene import model as M
    from path_trace_golang_tpu.soa import pack_scene

    n_lat = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    n_lon = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    verts, faces = uv_sphere(n_lat, n_lon)
    sc = M.Scene(
        camera=M.Camera(position=M.Vec3(0, 1.5, 4.5), target=M.Vec3(0, 1, 0), fov=50.0),
        materials=[M.Material(id="g", type="lambert", albedo=M.Color(0.6, 0.6, 0.65))],
        objects=[
            M.Object(id="b", type="mesh", material_id="g",
                     mesh={"vertices": [list(v) for v in verts], "faces": [list(f) for f in faces]}),
        ],
    )
    pack = pack_scene(sc, 512, 512)
    paged = pack.paged
    print(f"tris: {pack.n_triangles}, pages: {paged.n_pages}")

    fz = jnp.zeros((ROWS, LANE), jnp.float32)
    iz = fz.astype(jnp.int32)

    def closest_rounds(o, d):
        state = dict(
            best_t=jnp.full((ROWS, LANE), 1e20), best_m=iz, best_type=iz,
            best_mat=iz, best_mtyp=iz, b_rough=fz, b_ior=fz, b_smooth=fz,
            b_refl=fz, b_abss=fz, b_albedo=V3(fz, fz, fz), b_emit=V3(fz, fz, fz),
            b_absorb=V3(fz, fz, fz), b_tint=V3(fz, fz, fz), nx=fz, ny=fz, nz=fz,
        )
        _st, visits = B._traverse_gather(
            o, d, pack, jnp.float32(1e-3), state, exclude_obj=None, t_max=None,
            lite=False,
        )
        return visits

    # camera packet + cosine bounce rays off the sphere shell
    r = np.random.RandomState(3)
    pos = np.array([0, 1.5, 4.5])
    idx = np.arange(ROWS * LANE)
    px = (idx % 512).reshape(ROWS, LANE)
    py = (idx // 512 + 220).reshape(ROWS, LANE)
    u = px / 511.0
    vv = (511 - py) / 511.0
    tgt = np.array([0, 1, 0])
    fwd = (tgt - pos) / np.linalg.norm(tgt - pos)
    right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    half = np.tan(np.radians(50) / 2)
    dirs = (fwd[None, None] + right[None, None] * ((u * 2 - 1) * half)[..., None]
            + up[None, None] * ((vv * 2 - 1) * half)[..., None])
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    o_c = V3(*(jnp.full((ROWS, LANE), p, jnp.float32) for p in pos))
    d_c = V3(*(jnp.asarray(dirs[..., c].astype(np.float32)) for c in range(3)))

    theta = r.uniform(0, np.pi, (ROWS, LANE)); phi = r.uniform(0, 2 * np.pi, (ROWS, LANE))
    n = np.stack([np.sin(theta) * np.cos(phi), np.cos(theta), np.sin(theta) * np.sin(phi)], -1)
    surf = np.array([0, 1, 0]) + n
    u1, u2 = r.uniform(size=(2, ROWS, LANE))
    rr = np.sqrt(u1); ang = 2 * np.pi * u2
    tang = np.cross(n, [0.13, 0.87, 0.48]); tang /= np.linalg.norm(tang, axis=-1, keepdims=True)
    bitan = np.cross(n, tang)
    bd = (tang * (rr * np.cos(ang))[..., None] + bitan * (rr * np.sin(ang))[..., None]
          + n * np.sqrt(1 - u1)[..., None])
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True)
    o_b = V3(*(jnp.asarray((surf + 1e-3 * n)[..., c].astype(np.float32)) for c in range(3)))
    d_b = V3(*(jnp.asarray(bd[..., c].astype(np.float32)) for c in range(3)))

    w0, b0 = B.GATHER_WINDOW, B.N_BUCKETS
    try:
        for w, nb in CONFIGS:
            B.GATHER_WINDOW = w
            B.N_BUCKETS = nb
            jax.clear_caches()
            jc = jax.jit(closest_rounds)
            vc = int(jc(o_c, d_c))
            vb = int(jc(o_b, d_b))
            print(
                f"window={w or 'full':>4} buckets={nb}: camera {vc / ROWS:6.2f} "
                f"rounds/row, bounce {vb / ROWS:6.2f}",
                flush=True,
            )
    finally:
        B.GATHER_WINDOW, B.N_BUCKETS = w0, b0
    return 0


if __name__ == "__main__":
    sys.exit(main())
