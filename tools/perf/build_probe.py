"""A/B page-partitioning strategies by their wanted-page statistics.

The gather walk's cost is rounds (= per-row max wanted pages) times a
per-round cost that scales with the table (matmul ~ p_pad, pop ~ mask
words).  This probe builds the SAME 10k-triangle mesh with different
page assignments and reports, per ray population, the per-lane wanted
mean and the per-row max — plus a per-row cost model in us:

    cost ~ rounds * (matmul(p_pad) + test + pop(words) + stop)

with the PERF.md round-3 measured anchors at 80 pages / 3 words:
matmul 0.6, test 0.5, pop 0.25, stop 0.15 (matmul scaled by p_pad/128,
pop by words/3).

Strategies:
  aligned-median   the shipping build (capacity-aligned median split)
  median           exact median split, pages 50-100% full (tight boxes,
                   more pages)
  morton           Morton-order chunking into full pages
  sah-aligned      median-split tree, but the cut position among
                   128-aligned candidates minimizes the SAH (child box
                   area x triangle count), keeping pages full

Usage: JAX_PLATFORMS=cpu python tools/perf/build_probe.py [n_lat n_lon]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import jax.numpy as jnp
import numpy as np

from path_trace_golang_tpu.ops import bvh as B
from path_trace_golang_tpu.ops.vec import LANE, V3

P = B.PAGE_TRIS


def _bounds(lo, hi, pages):
    out = []
    for m in pages:
        blo, bhi = lo[m].min(axis=0), hi[m].max(axis=0)
        out.append(tuple(float(x) for x in blo) + tuple(float(x) for x in bhi))
    return out


def _paged(lo, hi, pages):
    pcent = np.array([(lo[m].min(0) + hi[m].max(0)) * 0.5 for m in pages])
    ax = int(np.argmax(pcent.max(0) - pcent.min(0))) if len(pages) > 1 else 0
    pages = [pages[i] for i in np.argsort(pcent[:, ax], kind="stable")]
    margin = 0.0
    for m in pages:
        blo, bhi = lo[m].min(0), hi[m].max(0)
        c = (blo[ax] + bhi[ax]) * 0.5
        margin = max(margin, c - blo[ax], bhi[ax] - c)
    return B.PagedBvh(
        n_pages=len(pages),
        any_smooth=False,
        page_bounds=tuple(_bounds(lo, hi, pages)),
        sort_axis=ax,
        sort_margin=float(np.float32(margin * (1 + 1e-6))),
    )


def build_aligned_median(cent, lo, hi):
    def split(idxs):
        c = cent[idxs]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        order = np.argsort(c[:, axis], kind="stable")
        n = len(idxs)
        half = round(n / 2 / P) * P
        half = max(P, min(half, n - 1))
        if n - half < P and n > 2 * P:
            half = n - P
        return [idxs[i] for i in order[:half]], [idxs[i] for i in order[half:]]

    pages = []

    def emit(idxs):
        if len(idxs) <= P:
            pages.append(list(idxs))
            return
        a, b = split(idxs)
        emit(a)
        emit(b)

    emit(list(range(len(cent))))
    return pages


def build_median(cent, lo, hi):
    pages = []

    def emit(idxs):
        if len(idxs) <= P:
            pages.append(list(idxs))
            return
        c = cent[idxs]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        order = np.argsort(c[:, axis], kind="stable")
        half = len(idxs) // 2
        emit([idxs[i] for i in order[:half]])
        emit([idxs[i] for i in order[half:]])

    emit(list(range(len(cent))))
    return pages


def build_morton(cent, lo, hi):
    q = ((cent - cent.min(0)) / (np.ptp(cent, 0) + 1e-30) * 1023).astype(np.uint32)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    order = np.argsort(code, kind="stable")
    return [list(order[i : i + P]) for i in range(0, len(order), P)]


def build_sah_aligned(cent, lo, hi):
    def area(blo, bhi):
        d = np.maximum(bhi - blo, 0)
        return 2 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    pages = []

    def emit(idxs):
        n = len(idxs)
        if n <= P:
            pages.append(list(idxs))
            return
        best = None
        for axis in range(3):
            order = np.argsort(cent[idxs][:, axis], kind="stable")
            srt = [idxs[i] for i in order]
            slo = np.minimum.accumulate(lo[srt], 0)
            shi = np.maximum.accumulate(hi[srt], 0)
            rlo = np.minimum.accumulate(lo[srt][::-1], 0)[::-1]
            rhi = np.maximum.accumulate(hi[srt][::-1], 0)[::-1]
            for cut in range(P, n, P):
                if n - cut < 1:
                    continue
                sah = area(slo[cut - 1], shi[cut - 1]) * cut + area(
                    rlo[cut], rhi[cut]
                ) * (n - cut)
                if best is None or sah < best[0]:
                    best = (sah, srt[:cut], srt[cut:])
        emit(best[1])
        emit(best[2])

    emit(list(range(len(cent))))
    return pages


def populations(r, n_rows):
    w = h = 512
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
    cam_o = np.broadcast_to(pos, dirs.shape).astype(np.float32).copy()
    cam_d = dirs.astype(np.float32)

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

    lamp = np.array([3.0, 5.0, 2.0])
    sd = lamp[None, None] - surf
    sdist = np.linalg.norm(sd, axis=-1, keepdims=True)
    sd = (sd / sdist).astype(np.float32)
    return (
        ("camera", cam_o, cam_d, None),
        ("bounce", bo, bd.astype(np.float32), None),
        ("shadow", bo, sd, sdist[..., 0].astype(np.float32)),
    )


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
    lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    cent = (lo + hi) * 0.5

    r = np.random.RandomState(3)
    pops = populations(r, 64)

    def vj(a):
        return V3(*(jnp.asarray(a[..., c]) for c in range(3)))

    for name, build in (
        ("aligned-median", build_aligned_median),
        ("median", build_median),
        ("morton", build_morton),
        ("sah-aligned", build_sah_aligned),
    ):
        pages = build(cent, lo, hi)
        paged = _paged(lo, hi, pages)
        np_pages = paged.n_pages
        p_pad = -(-np_pages // 128) * 128
        words = paged.mask_words
        fill = np.mean([len(m) for m in pages]) / P
        line = f"{name:15s} P={np_pages:4d} fill={fill:4.2f}"
        total_cost = 0.0
        for pname, o, d, t_max in pops:
            ov = vj(o); dv = vj(d)
            inv = V3(1.0 / dv.x, 1.0 / dv.y, 1.0 / dv.z)
            big = jnp.full(ov.x.shape, 3e38)
            tm = None if t_max is None else jnp.asarray(t_max)
            ws = B._page_prepass(ov, dv, inv, paged, jnp.float32(1e-3), big, t_max=tm)
            wsn = np.stack([np.asarray(x).astype(np.uint32) for x in ws])
            k = sum(np.bitwise_count(wsn[j]) for j in range(wsn.shape[0]))
            rounds = k.max(axis=1).astype(np.float64)  # per-row max
            cost = rounds.mean() * (
                0.6 * p_pad / 128 + 0.5 + 0.25 * words / 3 + 0.15
            )
            total_cost += cost
            line += f" | {pname} k {k.mean():4.2f} rmax {rounds.mean():4.1f} ~{cost:4.1f}us"
        print(line + f" | sum ~{total_cost:4.1f}us/row")
    return 0


if __name__ == "__main__":
    sys.exit(main())
