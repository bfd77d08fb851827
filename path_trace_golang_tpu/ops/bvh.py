"""Triangle meshes + BVH: the framework's north-star extension.

The reference supports only sphere / plane / box primitives (SURVEY.md
top-fact 4); BASELINE.json's north star asks for triangle meshes behind a
BVH.  Design for SPMD lanes — two traversals over the same DFS+escape
layout, chosen by mesh size:

* **Host build** — a median-split BVH over triangle centroids (NumPy),
  flattened in DFS order with *escape links*.  A DFS layout gives the
  invariant ``miss[i] == i + subtree_size(i)`` — the node after a missed
  subtree — which both traversals rely on.
* **Static unrolled walk** (``traverse_triangles``, small meshes) —
  topology is compile-time Python metadata; every node's bbox test and
  every leaf's Möller–Trumbore unroll into straight-line VPU code with
  traced-scalar vertices: zero gathers, maximal fusion, but instruction
  count grows with node count (the round-1 128-triangle Pallas cliff).
* **Paged page-sweep traversal** (``traverse_triangles_paged``, large
  meshes) — the tree is cut into pages of <= PAGE_TRIS triangles; a
  packet-lockstep top walk marks each lane's wanted pages in a bitmask,
  and wanted pages are swept with vectorized Möller–Trumbore over
  scalar-broadcast triangle rows (one dynamic-sublane row fetch per
  triangle — the only dynamic-memory-access pattern Mosaic makes fast).
  Divergent packets cost the union of PAGES, not NODES; see the banner
  at the paged section below and PERF.md round 4.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from jax import lax

from .vec import V3

__all__ = [
    "BvhTopology",
    "PagedBvh",
    "build_bvh",
    "build_paged_bvh",
    "traverse_triangles",
    "traverse_triangles_paged",
    "occluded_triangles_paged",
    "use_dynamic_walk",
    "OBJ_TRIANGLE",
    "LEAF_SIZE",
    "STATIC_TRI_MAX",
]

OBJ_TRIANGLE = 3  # extends the reference's OBJ_* codes (gpu.go:435-437)
LEAF_SIZE = 4

# Above this triangle count the unrolled walk's instruction budget (and
# Pallas compile time) stops paying for itself; the paged per-lane walk
# takes over.  PATHTRACER_BVH_DYNAMIC=1 forces the paged walk (tests).
STATIC_TRI_MAX = 128
_F = jnp.float32


def use_dynamic_walk(n_triangles: int) -> bool:
    if os.environ.get("PATHTRACER_BVH_DYNAMIC", "") in ("1", "true", "on"):
        return True
    return n_triangles > STATIC_TRI_MAX


def _lane_zero_i32(ref):
    """Concrete-layout i32 zeros derived from a lane grid (the Mosaic
    splat-carry workaround — see integrator.pass_regen_gpu)."""
    return (ref * _F(0.0)).astype(jnp.int32)


def _row_reader(table, idx):
    """Column accessor for row ``idx`` at a traced scalar index.

    Pallas refs fetch the row once with a dynamic slice; XLA arrays use
    lax.dynamic_slice.  Either way the row's columns are then free."""
    aval = getattr(table, "aval", None)
    if aval is not None and "Ref" in type(aval).__name__:
        row = table[idx]
    else:
        row = lax.dynamic_slice(
            table, (idx, jnp.int32(0)), (1, table.shape[1])
        )[0]
    return lambda c: row[c]


@dataclasses.dataclass(frozen=True)
class BvhTopology:
    """Static (hashable) tree structure: per node (miss, first, count).

    ``count == 0`` marks an internal node; leaves own ``tris[first:first+count]``
    in BVH order.  ``miss`` is the DFS escape index (B = past-the-end).
    """

    miss: Tuple[int, ...]
    first: Tuple[int, ...]
    count: Tuple[int, ...]
    order: Tuple[int, ...]  # BVH-order -> original triangle index

    @property
    def n_nodes(self) -> int:
        return len(self.miss)


def build_bvh(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray):
    """Median-split BVH build (host NumPy).

    v0/e1/e2: f64[T,3] triangle origin and edge vectors.
    Returns (topology: BvhTopology, bounds: f32[B, 6]).
    """
    t = v0.shape[0]
    lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    centroid = (lo + hi) * 0.5

    nodes = []  # (lo3, hi3, first, count) with count=0 for internal

    def emit(idxs):
        node_lo = lo[idxs].min(axis=0)
        node_hi = hi[idxs].max(axis=0)
        my = len(nodes)
        nodes.append([node_lo, node_hi, 0, 0])
        if len(idxs) <= LEAF_SIZE:
            nodes[my][2] = -1  # fill after ordering
            nodes[my][3] = len(idxs)
            leaf_members.append((my, list(idxs)))
            return my
        c = centroid[idxs]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = np.argsort(c[:, axis], kind="stable")
        half = len(idxs) // 2
        left = [idxs[i] for i in order[:half]]
        right = [idxs[i] for i in order[half:]]
        emit(left)
        emit(right)
        return my

    leaf_members: list = []
    emit(list(range(t)))

    # assign BVH triangle order from leaves (DFS leaf order)
    order = []
    for node_i, members in leaf_members:
        nodes[node_i][2] = len(order)
        order.extend(members)

    # escape links: DFS array layout -> a node's subtree occupies
    # [i, i + size); a missed subtree resumes at i + size
    b = len(nodes)
    size = [0] * b

    def compute_size(i):
        if nodes[i][3] > 0:  # leaf
            size[i] = 1
            return 1
        left = i + 1
        ls = compute_size(left)
        rs = compute_size(left + ls)
        size[i] = 1 + ls + rs
        return size[i]

    compute_size(0)

    miss = [0] * b

    def fill(i, escape):
        miss[i] = escape
        if nodes[i][3] > 0:
            return
        left = i + 1
        right = left + size[left]
        fill(left, right)  # left subtree escapes into the right sibling
        fill(right, escape)

    fill(0, b)

    bounds = np.zeros((b, 6), np.float32)
    for i, (nlo, nhi, _f, _c) in enumerate(nodes):
        bounds[i, 0:3] = nlo
        bounds[i, 3:6] = nhi
    topo = BvhTopology(
        miss=tuple(miss),
        first=tuple(n[2] for n in nodes),
        count=tuple(n[3] for n in nodes),
        order=tuple(order),
    )
    return topo, bounds


def traverse_triangles(o: V3, d: V3, pack, t_min, best_t, update_fn, exclude_obj=None):
    """Lockstep BVH traversal over the pack's triangle set.

    ``update_fn(tri_global_obj_idx, tri_bvh_idx, t, ok, normal_scalars)``
    is invoked once per (unrolled) leaf triangle with its candidate hit;
    the caller owns the winner chain.  ``best_t`` (a lane grid) prunes
    bbox visits; pass the running best from the object sweep.
    Returns nothing (updates flow through update_fn's closure).
    """
    topo: BvhTopology = pack.bvh
    if topo is None or topo.n_nodes == 0:
        return
    bounds = pack.bvh_bounds
    tri = pack.tri

    inv_dx = _F(1.0) / d.x
    inv_dy = _F(1.0) / d.y
    inv_dz = _F(1.0) / d.z

    shape = o.x.shape
    skip = jnp.zeros(shape, jnp.int32)

    for n in range(topo.n_nodes):
        active = skip <= n
        # slab test against this node's (traced scalar) bounds
        t1x = (bounds[n, 0] - o.x) * inv_dx
        t2x = (bounds[n, 3] - o.x) * inv_dx
        t1y = (bounds[n, 1] - o.y) * inv_dy
        t2y = (bounds[n, 4] - o.y) * inv_dy
        t1z = (bounds[n, 2] - o.z) * inv_dz
        t2z = (bounds[n, 5] - o.z) * inv_dz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        box_hit = active & (t1 >= t0) & (t1 >= t_min) & (t0 < best_t())

        if topo.count[n] > 0:  # leaf: masked Möller–Trumbore per triangle
            for k in range(topo.count[n]):
                bvh_i = topo.first[n] + k
                v0x, v0y, v0z = tri[bvh_i, 0], tri[bvh_i, 1], tri[bvh_i, 2]
                e1x, e1y, e1z = tri[bvh_i, 3], tri[bvh_i, 4], tri[bvh_i, 5]
                e2x, e2y, e2z = tri[bvh_i, 6], tri[bvh_i, 7], tri[bvh_i, 8]

                # p = d x e2 (e2 scalar)
                px = d.y * e2z - d.z * e2y
                py = d.z * e2x - d.x * e2z
                pz = d.x * e2y - d.y * e2x
                det = e1x * px + e1y * py + e1z * pz
                ok = jnp.abs(det) > _F(1e-9)
                inv_det = _F(1.0) / jnp.where(ok, det, _F(1.0))
                tvx, tvy, tvz = o.x - v0x, o.y - v0y, o.z - v0z
                u = (tvx * px + tvy * py + tvz * pz) * inv_det
                # q = tvec x e1
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                v = (d.x * qx + d.y * qy + d.z * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = (
                    ok
                    & box_hit
                    & (u >= 0)
                    & (u <= 1)
                    & (v >= 0)
                    & (u + v <= 1)
                    & (t >= t_min)
                )
                orig_tri = topo.order[bvh_i]
                if pack.tri_smooth and pack.tri_smooth[orig_tri]:
                    # smooth shading: interpolate the (static scalar)
                    # vertex normals by the hit barycentrics
                    w0 = _F(1.0) - u - v
                    nx = w0 * tri[bvh_i, 12] + u * tri[bvh_i, 15] + v * tri[bvh_i, 18]
                    ny = w0 * tri[bvh_i, 13] + u * tri[bvh_i, 16] + v * tri[bvh_i, 19]
                    nz = w0 * tri[bvh_i, 14] + u * tri[bvh_i, 17] + v * tri[bvh_i, 20]
                    nlen = jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, _F(1e-30)))
                    nx, ny, nz = nx / nlen, ny / nlen, nz / nlen
                else:
                    # geometric normal = normalize(e1 x e2) (traced scalars)
                    gnx = e1y * e2z - e1z * e2y
                    gny = e1z * e2x - e1x * e2z
                    gnz = e1x * e2y - e1y * e2x
                    glen = jnp.sqrt(
                        jnp.maximum(gnx * gnx + gny * gny + gnz * gnz, _F(1e-30))
                    )
                    nx, ny, nz = gnx / glen, gny / glen, gnz / glen

                tri_obj_idx = pack.n_objects + orig_tri
                if exclude_obj is not None:
                    ok = ok & (exclude_obj != tri_obj_idx)
                update_fn(tri_obj_idx, orig_tri, t, ok, (nx, ny, nz))
        else:
            # internal node: lanes missing the bbox skip the whole subtree
            skip = jnp.where(active & ~box_hit, jnp.int32(topo.miss[n]), skip)




# ---------------------------------------------------------------------------
# Paged page-sweep traversal (large meshes) — the round-3 redesign
# ---------------------------------------------------------------------------
#
# The round-2 "hybrid packet walk" processed ONE node per step for the
# whole packet, so a divergent packet (e.g. cosine/GGX bounce rays off a
# mesh) degenerated to a full-tree sweep with LEAF_SIZE masked
# Möller–Trumbore tests at every visit — measured 0.2-0.9 Mrays/s at 10k
# triangles vs 250-307 on the reference scenes (VERDICT r2).
#
# Round-3 re-design, after measuring the candidate primitives on v5e
# (PERF.md round 4): per-lane gathers (`jnp.take_along_axis` along
# lanes) DO compile in Mosaic but cost ~100-400 ns per lane-grid — far
# too slow to fetch 10+ node attributes per per-lane walk step.  What
# IS cheap is (a) scalar/row fetches at traced indices and (b) straight
# vectorized arithmetic with scalar-broadcast operands — exactly the
# static unrolled walk's diet.  So the paged design keeps the per-lane
# part where it is free and the vector part where it is dense:
#
#   phase 1  top walk: packet-lockstep escape-link walk over the
#            <= 2*n_pages-1 supernodes (scalar cursor, strictly
#            advancing global min => at most n_top iterations) marks a
#            per-lane BITMASK of wanted pages — per-lane culling at
#            page granularity costs a few bit ops per top leaf;
#   phase 2  pages are visited in ascending order via a min-cursor over
#            the packet's next wanted page; a visited page is swept:
#            every triangle slot gets one vectorized Möller–Trumbore
#            test with scalar triangle data (fori over slots — the same
#            op diet as the static walk, zero gathers).  Smooth vertex
#            normals interpolate inline at the winning test (vn rides
#            the same page row).
#
# Divergence costs the packet-level union of PAGES (~n_pages) instead
# of the union of NODES (~2T); the worst case is the brute-force sweep
# of every page, which is exactly the arithmetic floor of a SIMD
# machine with no cheap per-lane memory access.  Coherent packets sweep
# only the few pages their rays traverse.

PAGE_TRIS = 128          # triangle slots per page
MASK_BITS = 30           # usable bits per i32 mask word (sign bit avoided)
# page_tris is triangle-major — f32[P * PAGE_TRIS, N_TRI_ATTRS] — because
# Mosaic supports dynamic-SUBLANE row fetches from VMEM but not scalar
# loads at dynamic LANE offsets ("cannot statically prove that index ...
# is a multiple of 128"); one row fetch per triangle is the round-2
# leaf-fetch pattern that measured fast.  Row layout:
#   0-2 v0 | 3-5 e1 | 6-8 e2 | 9 mat | 10 obj | 11 smooth | 12-20 vn0/1/2
N_TRI_ATTRS = 24  # 21 used + pad for tidy strides


def _link_escapes(nodes, root_escape):
    """Fill DFS escape links in-place for a [lo, hi, miss, leaf] node list.

    Two passes: subtree sizes, then ``miss[i] = index after i's subtree``
    (the same invariant the round-1 build used: a missed subtree resumes
    at ``i + size(i)``)."""
    n = len(nodes)
    size = [1] * n

    def compute_size(i):
        if nodes[i][3] >= 0:  # leaf
            return 1
        ls = compute_size(i + 1)
        rs = compute_size(i + 1 + ls)
        size[i] = 1 + ls + rs
        return size[i]

    if n:
        compute_size(0)
    for i in range(n):
        nodes[i][2] = i + size[i] if i + size[i] < n else root_escape


@dataclasses.dataclass(frozen=True)
class PagedBvh:
    """Static (hashable) metadata of the paged layout."""

    n_pages: int
    n_top: int           # top-tree node count (escape-linked DFS)
    any_smooth: bool     # any triangle interpolates vertex normals

    @property
    def mask_words(self) -> int:
        return -(-self.n_pages // MASK_BITS)


def build_paged_bvh(
    v0: np.ndarray,
    e1: np.ndarray,
    e2: np.ndarray,
    tri_mat,
    tri_obj,
    tri_smooth,
    tri_vn,
):
    """Median-split paged BVH build (host NumPy).

    v0/e1/e2: f64[T,3]; tri_mat/tri_obj: per-triangle material index and
    global object id; tri_smooth: per-triangle bool; tri_vn: per-triangle
    (n0,n1,n2) vertex normals or None.

    Returns (paged: PagedBvh,
             top_tab    f32[n_top, 8]                  [lo3, hi3, miss, page|-1],
             page_tris  f32[P * PAGE_TRIS, N_TRI_ATTRS] see layout above,
             page_bbox  f32[P, 8]                      [lo3, hi3, count, pad])
    """
    t = v0.shape[0]
    lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    centroid = (lo + hi) * 0.5

    def split(idxs):
        c = centroid[idxs]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = np.argsort(c[:, axis], kind="stable")
        # split near the median but ALIGNED to the page capacity, so the
        # leaves of the cut are (almost all) full pages — the sweep runs
        # a fixed PAGE_TRIS trip count, so half-empty pages would waste
        # real arithmetic on padded degenerate slots
        n = len(idxs)
        half = round(n / 2 / PAGE_TRIS) * PAGE_TRIS
        half = max(PAGE_TRIS, min(half, n - 1))
        if n - half < PAGE_TRIS and n > 2 * PAGE_TRIS:
            half = n - PAGE_TRIS
        return [idxs[i] for i in order[:half]], [idxs[i] for i in order[half:]]

    # ---- top tree: nodes above page cuts, DFS with escape links ----
    top_nodes = []   # [lo3, hi3, miss, page]
    pages = []       # list of triangle-index lists

    def emit_top(idxs):
        my = len(top_nodes)
        top_nodes.append([lo[idxs].min(axis=0), hi[idxs].max(axis=0), 0, -1])
        if len(idxs) <= PAGE_TRIS:
            top_nodes[my][3] = len(pages)
            pages.append(list(idxs))
            return 1
        left, right = split(idxs)
        ls = emit_top(left)
        rs = emit_top(right)
        return 1 + ls + rs

    emit_top(list(range(t)))
    n_top = len(top_nodes)
    _link_escapes(top_nodes, n_top)

    n_pages = len(pages)
    top_arr = np.zeros((n_top, 8), np.float32)
    for i, (nlo, nhi, miss, page) in enumerate(top_nodes):
        top_arr[i, 0:3] = nlo
        top_arr[i, 3:6] = nhi
        top_arr[i, 6] = miss
        top_arr[i, 7] = page

    page_tris = np.zeros((n_pages * PAGE_TRIS, N_TRI_ATTRS), np.float32)
    page_bbox = np.zeros((n_pages, 8), np.float32)
    any_smooth = False
    for p, members in enumerate(pages):
        page_bbox[p, 0:3] = lo[members].min(axis=0)
        page_bbox[p, 3:6] = hi[members].max(axis=0)
        page_bbox[p, 6] = len(members)
        for s, orig in enumerate(members):
            row = p * PAGE_TRIS + s
            page_tris[row, 0:3] = v0[orig]
            page_tris[row, 3:6] = e1[orig]
            page_tris[row, 6:9] = e2[orig]
            page_tris[row, 9] = float(tri_mat[orig])
            page_tris[row, 10] = float(tri_obj[orig])
            if tri_smooth[orig]:
                any_smooth = True
                page_tris[row, 11] = 1.0
                n0, n1, n2 = tri_vn[orig]
                page_tris[row, 12:15] = n0
                page_tris[row, 15:18] = n1
                page_tris[row, 18:21] = n2

    paged = PagedBvh(n_pages=n_pages, n_top=n_top, any_smooth=any_smooth)
    return paged, top_arr, page_tris, page_bbox


# ---------------------------------------------------------------------------
# Paged traversal kernels
# ---------------------------------------------------------------------------



def _slab_scalars(o, inv, lo_x, lo_y, lo_z, hi_x, hi_y, hi_z):
    """Slab test against scalar-broadcast bounds; returns (t0, t1)."""
    t1x = (lo_x - o.x) * inv.x
    t2x = (hi_x - o.x) * inv.x
    t1y = (lo_y - o.y) * inv.y
    t2y = (hi_y - o.y) * inv.y
    t1z = (lo_z - o.z) * inv.z
    t2z = (hi_z - o.z) * inv.z
    t0 = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    t1 = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    return t0, t1


def _next_wanted(words, sentinel):
    """Per-lane smallest set-bit page index across mask words (else
    ``sentinel``).  Bit index via the float-exponent trick: the lowest
    set bit ``w & -w`` is a power of two whose f32 exponent IS its index
    (exact: words use MASK_BITS <= 30 bits)."""
    best = None
    for j, w in enumerate(words):
        low = w & (-w)
        bits = lax.bitcast_convert_type(low.astype(jnp.float32), jnp.int32)
        idx = (bits >> 23) - 127 + MASK_BITS * j
        cand = jnp.where(w > 0, idx, sentinel)
        best = cand if best is None else jnp.minimum(best, cand)
    return best


def _scalar_word_bit(p, j):
    """Scalar (traced) i32 with bit ``p - j*MASK_BITS`` set when page p
    lives in word j, else 0."""
    rel = p - MASK_BITS * j
    in_word = (rel >= 0) & (rel < MASK_BITS)
    return jnp.where(
        in_word, lax.shift_left(jnp.int32(1), jnp.clip(rel, 0, MASK_BITS - 1)), jnp.int32(0)
    )


def _top_walk(o, d, inv, pack, t_min, best_t, t_max=None, skip=None):
    """Packet-lockstep walk of the top (page-level) tree: returns
    (mask word lane grids, visit count scalar).  Strictly-advancing
    global min cursor => at most n_top iterations, no gate needed.
    ``skip`` masks lanes that want no pages at all."""
    paged: PagedBvh = pack.paged
    top = pack.top_tab
    zero_i = _lane_zero_i32(o.x)
    n_top = paged.n_top

    done = jnp.int32(n_top)
    c0 = zero_i if skip is None else jnp.where(skip, done, zero_i)
    carry0 = (jnp.min(c0), jnp.zeros((), jnp.int32), c0) + tuple(
        zero_i for _ in range(paged.mask_words)
    )

    def cond(carry):
        return carry[0] < n_top

    def body(carry):
        g, visits, c = carry[0], carry[1], carry[2]
        words = list(carry[3:])
        row = _row_reader(top, g)
        t0, t1 = _slab_scalars(o, inv, row(0), row(1), row(2), row(3), row(4), row(5))
        active = c == g
        box_hit = active & (t1 >= t0) & (t1 >= t_min) & (t0 < best_t)
        if t_max is not None:
            box_hit = box_hit & (t0 <= t_max)
        miss = row(6).astype(jnp.int32)
        page = row(7).astype(jnp.int32)
        is_leaf = page >= 0  # traced scalar
        for j in range(len(words)):
            bit = _scalar_word_bit(page, j)
            words[j] = words[j] | jnp.where(box_hit & is_leaf, bit, 0)
        c = jnp.where(active, jnp.where(box_hit & ~is_leaf, g + 1, miss), c)
        return (jnp.min(c), visits + 1, c) + tuple(words)

    out = lax.while_loop(cond, body, carry0)
    return list(out[3:]), out[1]


def traverse_triangles_paged(
    o: V3, d: V3, pack, t_min, state, exclude_obj=None, t_max=None, lite: bool = False
):
    """Closest-hit paged traversal; same contract as the round-2 dynamic
    walk (updates the intersect_world winner-chain dict; returns
    (state, visits)).  See the section banner for the design."""
    paged: PagedBvh = pack.paged
    if paged is None or paged.n_pages == 0:
        return state, jnp.zeros((), jnp.int32)
    inv = V3(_F(1.0) / d.x, _F(1.0) / d.y, _F(1.0) / d.z)
    zero_f = o.x * _F(0.0)
    zero_i = _lane_zero_i32(o.x)
    n_pages = paged.n_pages
    sent = jnp.int32(n_pages)
    smooth = paged.any_smooth

    words, top_visits = _top_walk(o, d, inv, pack, t_min, state["best_t"], t_max=t_max)

    best0 = (
        state["best_t"] + zero_f,  # desplat (Mosaic replicated-layout bug)
        zero_i,                    # best_mat
        zero_i,                    # best_m (global object id)
        zero_f, zero_f, zero_f,    # shading normal
    )
    p0 = jnp.min(_next_wanted(words, sent))
    carry0 = (p0, top_visits) + tuple(words) + best0
    w_n = paged.mask_words

    def outer_cond(carry):
        return carry[0] < n_pages

    def outer_body(carry):
        p, visits = carry[0], carry[1]
        words = list(carry[2:2 + w_n])
        best = list(carry[2 + w_n:])

        part = zero_i
        for j in range(w_n):
            part = part | (words[j] & _scalar_word_bit(p, j))
        participate = part != 0

        bb = _row_reader(pack.page_bbox, p)
        pt0, pt1 = _slab_scalars(o, inv, bb(0), bb(1), bb(2), bb(3), bb(4), bb(5))
        viable = participate & (pt1 >= pt0) & (pt1 >= t_min) & (pt0 < best[0])
        if t_max is not None:
            viable = viable & (pt0 <= t_max)
        count = bb(6).astype(jnp.int32)
        base = p * PAGE_TRIS

        def tri_body(k, c2):
            best_t, best_mat, best_m, nx, ny, nz = c2
            col2 = _row_reader(pack.page_tris, base + k)
            col = lambda a, _k: col2(a)  # noqa: E731
            v0x, v0y, v0z = col(0, k), col(1, k), col(2, k)
            e1x, e1y, e1z = col(3, k), col(4, k), col(5, k)
            e2x, e2y, e2z = col(6, k), col(7, k), col(8, k)

            # Möller–Trumbore with scalar triangle data (vector in o,d)
            px = d.y * e2z - d.z * e2y
            py = d.z * e2x - d.x * e2z
            pz = d.x * e2y - d.y * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) > _F(1e-9)
            inv_det = _F(1.0) / jnp.where(ok, det, _F(1.0))
            tvx, tvy, tvz = o.x - v0x, o.y - v0y, o.z - v0z
            u = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            v = (d.x * qx + d.y * qy + d.z * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = (
                ok
                & viable
                & (u >= 0)
                & (u <= 1)
                & (v >= 0)
                & (u + v <= 1)
                & (t >= t_min)
                & (t < best_t)
            )
            if t_max is not None:
                ok = ok & (t <= t_max)
            if exclude_obj is not None:
                ok = ok & (exclude_obj != col(10, k).astype(jnp.int32))

            # geometric normal from scalar cross product (scalar math)
            gnx = e1y * e2z - e1z * e2y
            gny = e1z * e2x - e1x * e2z
            gnz = e1x * e2y - e1y * e2x
            glen = jnp.sqrt(jnp.maximum(gnx * gnx + gny * gny + gnz * gnz, _F(1e-30)))
            cnx, cny, cnz = gnx / glen, gny / glen, gnz / glen
            if smooth:
                # vertex-normal interpolation by the hit barycentrics
                smf = col(11, k) > _F(0.5)  # traced scalar
                w0 = _F(1.0) - u - v
                sx = w0 * col(12, k) + u * col(15, k) + v * col(18, k)
                sy = w0 * col(13, k) + u * col(16, k) + v * col(19, k)
                sz = w0 * col(14, k) + u * col(17, k) + v * col(20, k)
                slen = jnp.sqrt(jnp.maximum(sx * sx + sy * sy + sz * sz, _F(1e-30)))
                nxc = jnp.where(smf, sx / slen, cnx)
                nyc = jnp.where(smf, sy / slen, cny)
                nzc = jnp.where(smf, sz / slen, cnz)
            else:
                nxc, nyc, nzc = cnx, cny, cnz

            sel = lambda a, b: jnp.where(ok, a, b)  # noqa: E731
            return (
                sel(t, best_t),
                sel(col(9, k).astype(jnp.int32), best_mat),
                sel(col(10, k).astype(jnp.int32), best_m),
                sel(nxc, nx),
                sel(nyc, ny),
                sel(nzc, nz),
            )

        # static trip count: padded slots are degenerate (det == 0) and
        # reject themselves; dynamic trip counts compile to data-dependent
        # whiles, which both XLA:TPU and Mosaic handle far worse
        best = list(lax.fori_loop(0, PAGE_TRIS, tri_body, tuple(best)))
        visits = visits + count

        for j in range(w_n):
            words[j] = words[j] & ~_scalar_word_bit(p, j)
        p_next = jnp.min(_next_wanted(words, sent))
        return (p_next, visits) + tuple(words) + tuple(best)

    out = lax.while_loop(outer_cond, outer_body, carry0)
    visits = out[1]
    best_t, best_mat, best_m, nx, ny, nz = out[2 + w_n:]

    # ---- merge into the winner chain + static material unroll ----
    improved = best_t < state["best_t"]
    st = dict(state)
    st["best_t"] = jnp.where(improved, best_t, state["best_t"])
    st["best_type"] = jnp.where(improved, OBJ_TRIANGLE, state["best_type"])
    st["nx"] = jnp.where(improved, nx, state["nx"])
    st["ny"] = jnp.where(improved, ny, state["ny"])
    st["nz"] = jnp.where(improved, nz, state["nz"])
    if not lite:
        st["best_m"] = jnp.where(improved, best_m, state["best_m"])
        st["best_mat"] = jnp.where(improved, best_mat, state["best_mat"])

    mat = pack.mat
    for mi in range(pack.n_materials):
        m_mask = improved & (best_mat == mi)
        msel = lambda a, b: jnp.where(m_mask, a, b)  # noqa: E731
        st["best_mtyp"] = msel(pack.mat_types[mi], st["best_mtyp"])
        st["b_emit"] = V3(
            msel(mat[mi, 8], st["b_emit"].x),
            msel(mat[mi, 9], st["b_emit"].y),
            msel(mat[mi, 10], st["b_emit"].z),
        )
        if not lite:
            st["b_rough"] = msel(mat[mi, 1], st["b_rough"])
            st["b_ior"] = msel(mat[mi, 2], st["b_ior"])
            st["b_smooth"] = msel(mat[mi, 3], st["b_smooth"])
            st["b_refl"] = msel(mat[mi, 7], st["b_refl"])
            st["b_abss"] = msel(mat[mi, 15], st["b_abss"])
            st["b_albedo"] = V3(
                msel(mat[mi, 4], st["b_albedo"].x),
                msel(mat[mi, 5], st["b_albedo"].y),
                msel(mat[mi, 6], st["b_albedo"].z),
            )
            st["b_absorb"] = V3(
                msel(mat[mi, 12], st["b_absorb"].x),
                msel(mat[mi, 13], st["b_absorb"].y),
                msel(mat[mi, 14], st["b_absorb"].z),
            )
            st["b_tint"] = V3(
                msel(mat[mi, 16], st["b_tint"].x),
                msel(mat[mi, 17], st["b_tint"].y),
                msel(mat[mi, 18], st["b_tint"].z),
            )
    return st, visits


def occluded_triangles_paged(o: V3, d: V3, pack, t_min, t_max, blocked):
    """Any-hit paged traversal for shadow rays: same phases, boolean
    result.  Already-blocked lanes skip the top walk entirely; a lane
    that finds any hit drops its remaining pages."""
    paged: PagedBvh = pack.paged
    if paged is None or paged.n_pages == 0:
        return blocked
    inv = V3(_F(1.0) / d.x, _F(1.0) / d.y, _F(1.0) / d.z)
    zero_i = _lane_zero_i32(o.x)
    n_pages = paged.n_pages
    sent = jnp.int32(n_pages)
    big = jnp.full(o.x.shape, _F(3e38))

    words, _tv = _top_walk(o, d, inv, pack, t_min, big, t_max=t_max, skip=blocked)

    w_n = paged.mask_words
    blk0 = blocked.astype(jnp.int32) + zero_i
    p0 = jnp.min(_next_wanted(words, sent))
    carry0 = (p0,) + tuple(words) + (blk0,)

    def outer_cond(carry):
        return carry[0] < n_pages

    def outer_body(carry):
        p = carry[0]
        words = list(carry[1:1 + w_n])
        blk = carry[1 + w_n]

        part = zero_i
        for j in range(w_n):
            part = part | (words[j] & _scalar_word_bit(p, j))
        bb = _row_reader(pack.page_bbox, p)
        pt0, pt1 = _slab_scalars(o, inv, bb(0), bb(1), bb(2), bb(3), bb(4), bb(5))
        viable = (
            (part != 0)
            & (blk == 0)
            & (pt1 >= pt0)
            & (pt1 >= t_min)
            & (pt0 <= t_max)
        )
        count = bb(6).astype(jnp.int32)
        base = p * PAGE_TRIS

        def tri_body(k, blk):
            col2 = _row_reader(pack.page_tris, base + k)
            col = lambda a, _k: col2(a)  # noqa: E731
            v0x, v0y, v0z = col(0, k), col(1, k), col(2, k)
            e1x, e1y, e1z = col(3, k), col(4, k), col(5, k)
            e2x, e2y, e2z = col(6, k), col(7, k), col(8, k)
            px = d.y * e2z - d.z * e2y
            py = d.z * e2x - d.x * e2z
            pz = d.x * e2y - d.y * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) > _F(1e-9)
            inv_det = _F(1.0) / jnp.where(ok, det, _F(1.0))
            tvx, tvy, tvz = o.x - v0x, o.y - v0y, o.z - v0z
            u = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            v = (d.x * qx + d.y * qy + d.z * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            hit = (
                ok
                & viable
                & (u >= 0)
                & (u <= 1)
                & (v >= 0)
                & (u + v <= 1)
                & (t >= t_min)
                & (t <= t_max)
            )
            return blk | hit.astype(jnp.int32)

        blk = lax.fori_loop(0, PAGE_TRIS, tri_body, blk)

        for j in range(w_n):
            words[j] = words[j] & ~_scalar_word_bit(p, j)
            words[j] = jnp.where(blk != 0, 0, words[j])  # blocked: drop out
        p_next = jnp.min(_next_wanted(words, sent))
        return (p_next,) + tuple(words) + (blk,)

    out = lax.while_loop(outer_cond, outer_body, carry0)
    return out[1 + w_n] != 0
