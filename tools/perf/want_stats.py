"""Host-side (pure NumPy) wanted-page statistics for the 10k bench.

The gather walk's cost model is rounds/row x per-round cost, where
rounds/row = max over the row's 128 lanes of the number of pages the
lane actually pops.  This probe bounds what build/stop improvements can
buy WITHOUT touching the kernel:

* k_all     — pages wanted per lane with best_t = inf (prepass marks,
              no early stop): what the walk does on miss lanes;
* k_perfect — pages whose sub-box entry t0 <= the lane's TRUE first-hit
              t (+eps): the floor ANY near-to-far + exact-stop order
              can reach with these boxes;
* rounds/row for both (max per consecutive-128-lane scanline block),
  the quantity the while-loop actually pays.

Swept over PATHTRACER_BVH_SUBBOX (page sub-box count) by rebuilding the
paged BVH per setting.  Camera model: pinhole look-at matching the
bench scene's camera (position (0,1.5,4.5), target (0,1,0), fov 50,
512x512); exact basis quirks don't matter for statistics.

Usage: python tools/perf/want_stats.py [n_rows_sampled]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import numpy as np


def uv_sphere(n_lat, n_lon, center=(0.0, 1.0, 0.0), radius=1.0):
    cx, cy, cz = center
    verts, faces = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            verts.append(
                [
                    cx + radius * np.sin(th) * np.cos(ph),
                    cy + radius * np.cos(th),
                    cz + radius * np.sin(th) * np.sin(ph),
                ]
            )
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)


def camera_rays(w, h, rows_idx):
    """Pinhole rays for the sampled scanline rows (row-major lanes)."""
    pos = np.array([0.0, 1.5, 4.5])
    tgt = np.array([0.0, 1.0, 0.0])
    up = np.array([0.0, 1.0, 0.0])
    fov = 50.0
    fwd = tgt - pos
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    vup = np.cross(right, fwd)
    half_h = np.tan(np.radians(fov) / 2)
    half_w = half_h * (w / h)
    os_, ds = [], []
    for r in rows_idx:
        py, px0 = divmod(r * 128, w)
        px = px0 + np.arange(128)
        u = (px + 0.5) / w * 2 - 1
        v = np.full(128, 1 - (py + 0.5) / h * 2)
        d = (
            fwd[None, :]
            + right[None, :] * (u * half_w)[:, None]
            + vup[None, :] * (v * half_h)[:, None]
        )
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        ds.append(d)
        os_.append(np.broadcast_to(pos, (128, 3)).copy())
    return np.concatenate(os_), np.concatenate(ds)


def tri_hit_t(o, d, v0, e1, e2, t_min=1e-3):
    """True first-hit t per ray (Moller-Trumbore, chunked)."""
    n = o.shape[0]
    best = np.full(n, np.inf)
    chunk = 512
    for lo in range(0, n, chunk):
        oc, dc = o[lo : lo + chunk], d[lo : lo + chunk]
        p = np.cross(dc[:, None, :], e2[None, :, :])  # (c,T,3)
        det = np.einsum("tk,ctk->ct", e1, p)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        s = oc[:, None, :] - v0[None, :, :]
        u = np.einsum("ctk,ctk->ct", s, p) * inv
        q = np.cross(s, e1[None, :, :])
        v = np.einsum("ck,ctk->ct", dc, q) * inv
        t = np.einsum("tk,ctk->ct", e2, q) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min)
        t = np.where(hit, t, np.inf)
        best[lo : lo + chunk] = t.min(axis=1)
    return best


def slab_t0(o, d, boxes):
    """Min entered-box slab entry per (ray, page); +inf when missed.
    boxes: (P, K, 6).  Returns (N, P) t0 and (N, P) want."""
    inv = 1.0 / np.where(d == 0, 1e-30, d)
    t0m = np.full((o.shape[0], boxes.shape[0]), np.inf)
    want = np.zeros((o.shape[0], boxes.shape[0]), bool)
    for k in range(boxes.shape[1]):
        blo = boxes[:, k, 0:3]
        bhi = boxes[:, k, 3:6]
        t1 = (blo[None, :, :] - o[:, None, :]) * inv[:, None, :]
        t2 = (bhi[None, :, :] - o[:, None, :]) * inv[:, None, :]
        tn = np.minimum(t1, t2).max(axis=2)
        tf = np.maximum(t1, t2).min(axis=2)
        w = (tf >= tn) & (tf >= 1e-3)
        t0m = np.where(w, np.minimum(t0m, tn), t0m)
        want |= w
    return t0m, want


def stats_for(paged, o, d, t_hit):
    from path_trace_golang_tpu.ops import bvh as B

    P = paged.n_pages
    if paged.sub_bounds:
        k = len(paged.sub_bounds[0]) // 6
        boxes = np.array(
            [np.reshape(paged.sub_bounds[p], (k, 6)) for p in range(P)]
        )
    else:
        boxes = np.array([[paged.page_bounds[p]] for p in range(P)])
    t0, want = slab_t0(o, d, boxes)
    k_all = want.sum(axis=1)
    # perfect stop: pages whose entry precedes the true hit
    eps = 1e-4
    k_perf = (want & (t0 <= t_hit[:, None] * (1 + eps))).sum(axis=1)
    rows = o.shape[0] // 128

    def rr(k):
        return k.reshape(rows, 128).max(axis=1)

    return dict(
        pages=P,
        k_all_mean=float(k_all.mean()),
        k_all_p99=float(np.percentile(k_all, 99)),
        rounds_row_all=float(rr(k_all).mean()),
        k_perf_mean=float(k_perf.mean()),
        rounds_row_perfect=float(rr(k_perf).mean()),
    )


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from path_trace_golang_tpu.ops import bvh as B

    verts, faces = uv_sphere(80, 64)
    v0 = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - v0
    e2 = verts[faces[:, 2]] - v0
    t = len(faces)

    w = h = 512
    rng = np.random.default_rng(7)
    rows_idx = np.sort(rng.choice(w * h // 128, size=n_rows, replace=False))
    o, d = camera_rays(w, h, rows_idx)
    print(f"{o.shape[0]} camera rays ({n_rows} scanline rows); true-hit t ...")
    t_hit = tri_hit_t(o, d, v0, e1, e2)
    print(f"hit rate {np.isfinite(t_hit).mean():.3f}")

    # secondary populations: rays FROM the first hit point — the bulk of
    # a depth-8 render's traversals.  Hit normal ~ radial (unit sphere
    # at (0,1,0)); metal sphere -> reflected bounce; shadow rays aim at
    # the lamp (3,5,2).
    hit = np.isfinite(t_hit)
    hp = o[hit] + d[hit] * (t_hit[hit][:, None] * 0.999)
    nrm = hp - np.array([0.0, 1.0, 0.0])
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    refl = d[hit] - 2 * np.einsum("ij,ij->i", d[hit], nrm)[:, None] * nrm
    lamp = np.array([3.0, 5.0, 2.0]) - hp
    lamp /= np.linalg.norm(lamp, axis=1, keepdims=True)
    pad = (-len(hp)) % 128
    if pad:
        hp = np.concatenate([hp, hp[:pad]])
        refl = np.concatenate([refl, refl[:pad]])
        lamp = np.concatenate([lamp, lamp[:pad]])
    t_refl = tri_hit_t(hp, refl, v0, e1, e2)
    t_lamp = tri_hit_t(hp, lamp, v0, e1, e2)
    print(f"bounce hit rate {np.isfinite(t_refl).mean():.3f}, "
          f"shadow self-block rate {np.isfinite(t_lamp).mean():.3f}")

    for sub in (1, 2, 4, 8):
        os.environ["PATHTRACER_BVH_SUBBOX"] = str(sub)
        paged, _, _ = B.build_paged_bvh(
            v0, e1, e2, np.zeros(t, np.int64), np.arange(t),
            np.zeros(t, bool), None,
        )
        print(f"SUBBOX={sub}:")
        for name, oo, dd, tt in (
            ("camera", o, d, t_hit),
            ("bounce", hp, refl, t_refl),
            ("shadow", hp, lamp, t_lamp),
        ):
            s = stats_for(paged, oo, dd, tt)
            print(f"  {name}: {s}")

    # page-size what-if: would 64- or 32-triangle pages pay?  Per-visit
    # gather+test cost scales with page capacity; total cost model =
    # rounds_row x (capacity/128 x 1.1us + 0.4us pop/stop overhead).
    print("page-size what-if (SUBBOX=2):")
    os.environ["PATHTRACER_BVH_SUBBOX"] = "2"
    import path_trace_golang_tpu.ops.bvh as BB

    orig = BB.PAGE_TRIS
    try:
        for cap in (128, 64, 32):
            BB.PAGE_TRIS = cap
            paged, _, _ = B.build_paged_bvh(
                v0, e1, e2, np.zeros(t, np.int64), np.arange(t),
                np.zeros(t, bool), None,
            )
            tot = 0.0
            line = f"  cap={cap} pages={paged.n_pages}:"
            for name, oo, dd, tt in (
                ("camera", o, d, t_hit),
                ("bounce", hp, refl, t_refl),
                ("shadow", hp, lamp, t_lamp),
            ):
                s = stats_for(paged, oo, dd, tt)
                cost = s["rounds_row_all"] * (cap / 128 * 1.1 + 0.4)
                tot += cost
                line += f" {name} rr={s['rounds_row_all']:.2f} cost={cost:.2f}us"
            print(line + f" TOTAL={tot:.2f}us")
    finally:
        BB.PAGE_TRIS = orig
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
