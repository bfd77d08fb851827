"""Evaluate the coherence-split traversal idea on real page-want data.

For each ray population of the 10k-triangle bench scene (camera, bounce,
shadow, regen-style mixed), compute per 128-lane row:

* rounds0   = max over lanes of wanted-page count — what the per-lane
  gather walk pays today (1 round per max-wanted page);
* residual_k = the same after removing the row's top-k most-popular
  pages (those would be swept densely ONCE for the whole row at
  ~0.5 us each, no MXU gather, no pop) — VERDICT round-3 suggestion
  (a): "sweep the row-popular pages densely once and gather only the
  residue per lane".

A candidate k pays off when
    k * dense_cost + residual_k * round_cost  <  rounds0 * round_cost
with round_cost ~1.5 us and dense_cost ~0.5-0.75 us per row.

Usage: JAX_PLATFORMS=cpu python tools/perf/popular_probe.py [n_lat n_lon]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import jax.numpy as jnp
import numpy as np

from path_trace_golang_tpu.ops import bvh as B
from path_trace_golang_tpu.ops.vec import LANE, V3

KS = (1, 2, 4, 8)


def _bits(ws):
    """[W, rows, lanes] mask words -> bool [rows, lanes, pages]."""
    n_w, rows, lanes = ws.shape
    out = np.zeros((rows, lanes, n_w * B.MASK_BITS), bool)
    for j in range(n_w):
        for b in range(B.MASK_BITS):
            out[:, :, j * B.MASK_BITS + b] = (ws[j] >> b) & 1
    return out


def analyze(name, o, d, paged, t_max=None):
    inv = V3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
    big = jnp.full(o.x.shape, 3e38)
    ws = B._page_prepass(o, d, inv, paged, jnp.float32(1e-3), big, t_max=t_max)
    bits = _bits(np.stack([np.asarray(w) for w in ws]))  # [rows, lanes, P]
    rows = bits.shape[0]
    r0, res = [], {k: [] for k in KS}
    for s in range(rows):
        m = bits[s]  # (lanes, P)
        r0.append(m.sum(1).max())
        counts = m.sum(0)  # per-page popularity in this row
        order = np.argsort(-counts, kind="stable")
        for k in KS:
            mm = m.copy()
            mm[:, order[:k]] = False
            res[k].append(mm.sum(1).max())
    r0 = np.array(r0)
    line = f"{name:12s}: rounds0 mean {r0.mean():5.2f} p95 {np.percentile(r0, 95):4.1f}"
    for k in KS:
        rk = np.array(res[k])
        line += f" | top{k}-> {rk.mean():5.2f}"
    print(line)
    return r0


def main():
    from bvh_bench import uv_sphere

    args = sys.argv[1:]
    n_lat = int(args[0]) if args else 80
    n_lon = int(args[1]) if len(args) > 1 else 64
    verts, faces = uv_sphere(n_lat, n_lon)
    v = np.asarray(verts, np.float64)
    f = np.asarray(faces, np.int64)
    v0 = v[f[:, 0]]
    e1 = v[f[:, 1]] - v0
    e2 = v[f[:, 2]] - v0
    t = len(f)
    paged, _tiles, _ = B.build_paged_bvh(
        v0, e1, e2, np.zeros(t, np.int64), np.arange(t), np.zeros(t, bool), None
    )
    print(f"pages: {paged.n_pages} (triangles: {t})")

    w = h = 512
    r = np.random.RandomState(3)
    n_rows = 64

    # camera rays crossing the blob (same construction as union_stats)
    idx = np.arange(n_rows * LANE)
    px = (idx % w).reshape(n_rows, LANE)
    py = (idx // w + 180).reshape(n_rows, LANE)
    u = px / (w - 1)
    vv = ((h - 1) - py) / (h - 1)
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
    cam_o = np.broadcast_to(pos, dirs.shape).astype(np.float32)
    cam_d = dirs.astype(np.float32)

    # bounce rays from the sphere surface, cosine around the normal
    theta = r.uniform(0, np.pi, (n_rows, LANE))
    phi = r.uniform(0, 2 * np.pi, (n_rows, LANE))
    n = np.stack(
        [np.sin(theta) * np.cos(phi), np.cos(theta), np.sin(theta) * np.sin(phi)], -1
    )
    surf = np.array([0, 1, 0]) + n
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
    bo = (surf + 1e-3 * n).astype(np.float32)
    bd = bd.astype(np.float32)

    # shadow rays: surface -> lamp
    lamp = np.array([3.0, 5.0, 2.0])
    sd = lamp[None, None] - surf
    sdist = np.linalg.norm(sd, axis=-1, keepdims=True)
    sd = (sd / sdist).astype(np.float32)

    def vj(a):
        return V3(*(jnp.asarray(a[..., c]) for c in range(3)))

    analyze("camera", vj(cam_o), vj(cam_d), paged)
    analyze("bounce", vj(bo), vj(bd), paged)
    analyze(
        "shadow", vj(bo), vj(sd), paged,
        t_max=jnp.asarray(sdist[..., 0].astype(np.float32)),
    )

    # regen-style mixed rows: each lane randomly one of the three
    pick = r.randint(0, 3, (n_rows, LANE))
    mo = np.where(pick[..., None] == 0, cam_o, np.where(pick[..., None] == 1, bo, bo))
    md = np.where(pick[..., None] == 0, cam_d, np.where(pick[..., None] == 1, bd, sd))
    analyze("mixed-regen", vj(mo), vj(md), paged)
    return 0


if __name__ == "__main__":
    sys.exit(main())
