"""Measure page-want statistics on real render content (CPU, XLA path).

For the 10k-triangle bench scene: camera rays -> first mesh hit ->
cosine bounce rays and shadow rays toward the lamp.  For each ray
population, reports the per-lane wanted-page count k (the work a
per-lane gathered traversal would do: rounds = max k per 128-lane row)
vs the row/block page unions (the work the dense sweep does).

Usage: JAX_PLATFORMS=cpu python tools/perf/union_stats.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np

from path_trace_golang_tpu.ops import bvh as B
from path_trace_golang_tpu.ops.vec import LANE, V3

ROWS = 32  # kernel block rows


def main():
    from bvh_bench import uv_sphere

    verts, faces = uv_sphere(80, 64)
    v = np.asarray(verts, np.float64)
    f = np.asarray(faces, np.int64)
    v0 = v[f[:, 0]]
    e1 = v[f[:, 1]] - v0
    e2 = v[f[:, 2]] - v0
    t = len(f)
    paged, tiles, _ = B.build_paged_bvh(
        v0, e1, e2, np.zeros(t, np.int64), np.arange(t), np.zeros(t, bool), None
    )
    print(f"pages: {paged.n_pages}")

    # camera rays at 512x512 (bench config), one 4096-lane block worth
    # of consecutive pixels per sample row region
    w = h = 512
    r = np.random.RandomState(3)

    def words_for(o, d):
        inv = V3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
        big = jnp.full(o.x.shape, 3e38)
        ws = B._page_prepass(o, d, inv, paged, jnp.float32(1e-3), big)
        return np.stack([np.asarray(w) for w in ws])  # [W, rows, lanes]

    def stats(name, o, d):
        ws = words_for(o, d)
        pop = sum(
            np.bitwise_count(ws[j].astype(np.uint32)) for j in range(ws.shape[0])
        )
        # per-row union (128 lanes), per-block union (32 rows)
        n_rows = ws.shape[1]
        row_union = np.zeros(n_rows, np.int64)
        for s in range(n_rows):
            u = 0
            for j in range(ws.shape[0]):
                u += np.bitwise_count(
                    np.bitwise_or.reduce(ws[j, s].astype(np.uint32))
                )
            row_union[s] = u
        blk_union = []
        for b in range(n_rows // ROWS):
            u = 0
            for j in range(ws.shape[0]):
                u += np.bitwise_count(
                    np.bitwise_or.reduce(
                        ws[j, b * ROWS : (b + 1) * ROWS].astype(np.uint32).ravel()
                    )
                )
            blk_union.append(u)
        k_row_max = np.array([
            max(
                sum(
                    int(np.bitwise_count(np.uint32(ws[j, s, l])))
                    for j in range(ws.shape[0])
                )
                for l in range(ws.shape[2])
            )
            for s in range(n_rows)
        ])
        print(
            f"{name:14s}: k/lane mean {pop.mean():5.2f} p95 "
            f"{np.percentile(pop, 95):4.0f} max {pop.max():3d} | "
            f"row k_max mean {k_row_max.mean():5.1f} | "
            f"row union mean {row_union.mean():5.1f} max {row_union.max():3d} | "
            f"block union mean {np.mean(blk_union):5.1f}"
        )

    # ---- camera packet: 64 rows = 8192 consecutive pixels ----
    n_rows = 64
    idx = np.arange(n_rows * LANE)
    px = (idx % w).reshape(n_rows, LANE)
    py = (idx // w + 180).reshape(n_rows, LANE)  # rows crossing the blob
    u = px / (w - 1)
    vv = ((h - 1) - py) / (h - 1)
    # simple pinhole matching the bench camera
    pos = np.array([0, 1.5, 4.5])
    tgt = np.array([0, 1, 0])
    fwd = (tgt - pos) / np.linalg.norm(tgt - pos)
    right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    half = np.tan(np.radians(50) / 2)
    dirs = (
        fwd[None, None]
        + right[None, None] * ((u * 2 - 1) * half)[..., None]
        + up[None, None] * ((vv * 2 - 1) * half)[..., None]
    )
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = V3(*(jnp.full((n_rows, LANE), p) for p in pos))
    d = V3(*(jnp.asarray(dirs[..., c].astype(np.float32)) for c in range(3)))
    stats("camera", o, d)

    # ---- bounce rays: start on the sphere surface, cosine around normal
    theta = r.uniform(0, np.pi, (n_rows, LANE))
    phi = r.uniform(0, 2 * np.pi, (n_rows, LANE))
    n = np.stack(
        [np.sin(theta) * np.cos(phi), np.cos(theta), np.sin(theta) * np.sin(phi)], -1
    )
    surf = np.array([0, 1, 0]) + n  # unit sphere at (0,1,0)
    # cosine-weighted around n
    u1, u2 = r.uniform(size=(2, n_rows, LANE))
    rr = np.sqrt(u1); ang = 2 * np.pi * u2
    tang = np.cross(n, [0.13, 0.87, 0.48]); tang /= np.linalg.norm(tang, axis=-1, keepdims=True)
    bitan = np.cross(n, tang)
    bd = (
        tang * (rr * np.cos(ang))[..., None]
        + bitan * (rr * np.sin(ang))[..., None]
        + n * np.sqrt(1 - u1)[..., None]
    )
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True)
    o = V3(*(jnp.asarray((surf + 1e-3 * n)[..., c].astype(np.float32)) for c in range(3)))
    d = V3(*(jnp.asarray(bd[..., c].astype(np.float32)) for c in range(3)))
    stats("bounce-cosine", o, d)

    # ---- shadow rays: surface -> lamp at (3,5,2) ----
    lamp = np.array([3.0, 5.0, 2.0])
    sd = lamp[None, None] - surf
    sd /= np.linalg.norm(sd, axis=-1, keepdims=True)
    d = V3(*(jnp.asarray(sd[..., c].astype(np.float32)) for c in range(3)))
    stats("shadow", o, d)

    # ---- fully random (the synthetic worst case) ----
    o = V3(*(jnp.asarray(r.uniform(-3, 3, (n_rows, LANE)).astype(np.float32)) for _ in range(3)))
    d = V3(*(jnp.asarray(r.uniform(-1, 1, (n_rows, LANE)).astype(np.float32)) for _ in range(3))).normalize()
    stats("random", o, d)
    return 0


if __name__ == "__main__":
    sys.exit(main())
