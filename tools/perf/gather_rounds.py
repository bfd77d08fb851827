"""Count gather-traversal ROUNDS (while-loop trips) on real content.

Runs the actual `_traverse_gather` / `_occluded_gather` loops (CPU, XLA
lowering of the same traced code the kernel runs) on the 10k-triangle
bench scene's ray populations and reports rounds per 128-lane row —
the quantity the per-lane gather walk pays ~1-2 us for per round.

Usage: python tools/perf/gather_rounds.py
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

ROWS = 32


def main() -> int:
    from bvh_bench import uv_sphere
    from path_trace_golang_tpu.soa import pack_scene
    from path_trace_golang_tpu.scene import model as M

    verts, faces = uv_sphere(80, 64)
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
    print(f"pages: {paged.n_pages}, buckets: {B.N_BUCKETS}")

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
            o, d, pack, jnp.float32(1e-3), state, exclude_obj=None, t_max=None, lite=False
        )
        return visits

    jc = jax.jit(closest_rounds)

    r = np.random.RandomState(3)
    pos = np.array([0, 1.5, 4.5])

    def report(name, o, d, fn=jc):
        v = int(fn(o, d))
        print(f"{name:14s}: {v:5d} rounds / {ROWS} rows = {v / ROWS:5.2f} rounds/row")

    # camera packet crossing the blob
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
    o = V3(*(jnp.full((ROWS, LANE), p, jnp.float32) for p in pos))
    d = V3(*(jnp.asarray(dirs[..., c].astype(np.float32)) for c in range(3)))
    report("camera", o, d)

    # bounce rays off the sphere
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
    ob = V3(*(jnp.asarray((surf + 1e-3 * n)[..., c].astype(np.float32)) for c in range(3)))
    db = V3(*(jnp.asarray(bd[..., c].astype(np.float32)) for c in range(3)))
    report("bounce-cosine", ob, db)

    # shadow rays: surface -> lamp, any-hit loop
    lamp = np.array([3.0, 5.0, 2.0])
    sd = lamp[None, None] - surf
    dist = np.linalg.norm(sd, axis=-1, keepdims=True)
    sd = sd / dist
    ds = V3(*(jnp.asarray(sd[..., c].astype(np.float32)) for c in range(3)))
    t_max = jnp.asarray((dist[..., 0] - 2e-3).astype(np.float32))

    # rounds inside _occluded_gather are not returned; recreate its loop
    # trip count = sum over rows of per-row trips until all lanes block
    def occl_rounds(o, d, t_max):
        blocked0 = jnp.zeros((ROWS, LANE), bool)
        # count = popped pages until every lane blocked or empty
        inv = V3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
        big = o.x * 0 + jnp.float32(B._BIG_T)
        bwords, _ = B._page_prepass_bucketed(
            o, d, inv, pack.paged, jnp.float32(1e-3), big, t_max=t_max, skip=blocked0
        )
        total = jnp.zeros((), jnp.int32)
        blk = B._occluded_gather(o, d, pack, jnp.float32(1e-3), t_max, blocked0)
        # trips: emulate by per-lane wanted count but capped by block-out;
        # report wanted-page stats and the blocked fraction instead
        nwant = None
        for wb in bwords:
            for w in wb:
                c = B.lax.population_count(w.astype(jnp.uint32)).astype(jnp.int32)
                nwant = c if nwant is None else nwant + c
        return jnp.max(nwant, axis=1).sum(), blk.mean()

    jo = jax.jit(occl_rounds)
    v, frac = jo(ob, ds, t_max)
    print(f"{'shadow(worst)':14s}: {int(v):5d} rounds / {ROWS} rows = {int(v) / ROWS:5.2f} "
          f"rounds/row (upper bound; blocked frac {float(frac):.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
