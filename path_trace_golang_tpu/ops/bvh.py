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
* **Dense paged sweep** (``traverse_triangles_paged``, large meshes) —
  the tree is cut into pages of <= PAGE_TRIS triangles; a STATIC unroll
  of page-bbox slab tests (bounds as compile-time immediates) marks each
  lane's wanted pages in bitmask words, and each wanted page is swept as
  a dense (triangle, ray) cross tile: triangles on sublanes, rays on
  lanes, precomputed plane/barycentric-dual constants, one dynamic tile
  fetch per page and zero loop-carried row fetches.  Divergent packets
  cost the packet union of PAGES, not NODES; see the banner at the
  paged section below and PERF.md round 5.
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
# Dense paged sweep (large meshes) — the round-3 redesign, v2
# ---------------------------------------------------------------------------
#
# History of this section (PERF.md has the measurements):
#   round 2  "hybrid packet walk" — one node per lockstep step, LEAF_SIZE
#            masked Möller–Trumbore tests per visit.  Divergent bounce
#            packets degenerated to a full-tree sweep: 0.2-0.9 Mrays/s at
#            10k triangles.
#   round 3a "paged page-sweep" — a packet-lockstep top walk marked
#            wanted <=128-triangle pages in per-lane bitmasks; wanted
#            pages were swept one triangle ROW at a time (fori over 128
#            dynamic-sublane row fetches).  Correct, but both phases were
#            sequential fine-grained loops at ~1 us/iteration: still
#            ~0.5 Mrays/s end-to-end.
#   round 3b (this design) — remove BOTH sequential loops:
#
#   * page marking is a STATIC UNROLL of slab tests against every page's
#     bbox, whose bounds are compile-time scalar immediates
#     (PagedBvh.page_bounds).  A page bbox is contained in all its
#     ancestors' boxes, so testing pages directly is exactly as
#     selective as walking the tree above them — the top tree is gone.
#     Cost: ~22 VPU ops per page on the lane grid, zero iterations.
#   * a wanted page is swept DENSELY: its 128 triangles ride the
#     SUBLANE axis, 128 rays ride the LANE axis, and one (128,128)
#     vector op per arithmetic step tests every (triangle, ray) pair of
#     the tile.  Triangle data arrives as (128,1) attribute columns cut
#     from one (PAGE_TRIS, 32) page tile fetched per visit — one
#     dynamic fetch per PAGE instead of one per triangle.  The
#     intersection uses precomputed plane + barycentric-dual constants
#     (see build_paged_bvh): ~31 ops per pair vs ~43 for classic
#     Möller–Trumbore from raw v0/e1/e2.
#   * the page loop carries only a per-ray WINNER KEY: the hit t's f32
#     bits with the low 7 bits replaced by the triangle's page slot
#     (monotone in t for t > 0 — the float-ordering trick; ties within
#     2^-16 relative resolve by slot order, which also makes shared-edge
#     double hits unambiguous).  Attribute extraction happens ONCE per
#     sweep in a post-resolve pass over WINNING pages only, not per
#     visited page.
#
# Divergence cost is the packet-level union of wanted PAGES — the
# arithmetic floor for a SIMD machine with no cheap per-lane memory
# access — and every term is dense vector work with no loop-carried
# fetch latency.  Replaces the linear object scan the reference uses
# for every primitive (gpu.go:708-740) at mesh scale.

# Triangle slots per page.  128 matches the lane width; 256 halves the
# page count — per-round pop/stop overhead amortizes over 2x the
# triangles and P_pad (the gather matmul's contraction dim, the
# measured ~1/P_pad scaling wall) halves at 40k+ triangles.  Read once
# at import; must be a power of two >= 128 (the winner-key slot field
# is its mask, and sub-128 pages would starve the MXU gather).
PAGE_TRIS = int(os.environ.get("PATHTRACER_PAGE_TRIS", "128"))
if PAGE_TRIS < 128 or (PAGE_TRIS & (PAGE_TRIS - 1)) != 0:
    raise ValueError(f"PATHTRACER_PAGE_TRIS must be a power of two >= 128, got {PAGE_TRIS}")
MASK_BITS = 30           # usable bits per i32 mask word (sign bit avoided)
N_PAGE_ATTRS = 32        # page tile columns:
# 0-2 unit geometric normal n | 3 d_plane = n.v0 | 4-6 m1 | 7 c1 |
# 8-10 m2 | 11 c2 | 12 mat | 13 obj | 14 smooth | 15 valid |
# 16-18 vn0 | 19-21 vn1 | 22-24 vn2 | 25-31 pad
# where m1 = e2 x n_raw / |n_raw|^2 and m2 = n_raw x e1 / |n_raw|^2 are
# the barycentric duals (u = m1.h + c1, v = m2.h + c2 at plane point h),
# c1 = -m1.v0, c2 = -m2.v0.

# low bits of the winner key carry the page slot (7 bits at the default
# 128-slot pages); the t-ordering trick still holds — ties within the
# quantization window resolve by slot order on BOTH the dense and
# gather paths, so bit-identity between them is preserved at any size
_KEY_SLOT_MASK = PAGE_TRIS - 1


@dataclasses.dataclass(frozen=True)
class PagedBvh:
    """Static (hashable) metadata of the paged layout.

    ``page_bounds`` bakes every page bbox into the traced code as scalar
    immediates (tuple of (lox,loy,loz,hix,hiy,hiz) per page)."""

    n_pages: int
    any_smooth: bool     # any triangle interpolates vertex normals
    page_bounds: Tuple[Tuple[float, float, float, float, float, float], ...]
    # pages are sorted by bbox center along this axis; margin bounds
    # |center - bbox_edge| over all pages.  The gather traversal pops
    # pages direction-aware along this order and early-stops exactly:
    # every remaining page's slab entry is >= (center - o)/d - margin/|d|
    sort_axis: int = 0
    sort_margin: float = 0.0
    # Optional per-page SUB-boxes (PATHTRACER_BVH_SUBBOX sub-AABBs per
    # page, flattened to one 6*k float tuple per page).  A page of 128
    # triangles is a long curved surface shell whose single AABB is
    # loose; the prepass marks a page wanted only if the ray enters ANY
    # sub-box.  Every triangle lives inside one sub-box, so skipped
    # pages cannot contain a hit — wants shrink, results are
    # bit-identical.  Empty tuple = single-box prepass.
    sub_bounds: Tuple[Tuple[float, ...], ...] = ()
    # Piecewise-linear fit of the (sorted, monotone) page centers:
    # ((p_hi, a, b, dev), ...) with center(p) ~= a*p + b and
    # |center(p) - fit| <= dev on each segment.  The gather walk's
    # early-stop evaluates the fit (a handful of selects + one fma)
    # instead of an n_pages-long select chain, and folds ``dev`` into
    # the margin — the kill rule stays exactly conservative.
    center_fit: Tuple[Tuple[int, float, float, float], ...] = ()

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
    """Median-split paged BVH build (host NumPy, float64 precompute).

    v0/e1/e2: f64[T,3]; tri_mat/tri_obj: per-triangle material index and
    global object id; tri_smooth: per-triangle bool; tri_vn: per-triangle
    (n0,n1,n2) vertex normals or None.

    Returns (paged: PagedBvh,
             page_tiles f32[P, PAGE_TRIS, N_PAGE_ATTRS],
             page_bbox  f32[P, 8]   [lo3, hi3, count, pad])
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
        # cut's leaves come out (almost all) full pages — the dense sweep
        # pays for every slot, so half-empty pages waste real arithmetic
        n = len(idxs)
        half = round(n / 2 / PAGE_TRIS) * PAGE_TRIS
        half = max(PAGE_TRIS, min(half, n - 1))
        if n - half < PAGE_TRIS and n > 2 * PAGE_TRIS:
            half = n - PAGE_TRIS
        return [idxs[i] for i in order[:half]], [idxs[i] for i in order[half:]]

    pages = []  # list of triangle-index lists

    def emit(idxs):
        if len(idxs) <= PAGE_TRIS:
            pages.append(list(idxs))
            return
        left, right = split(idxs)
        emit(left)
        emit(right)

    emit(list(range(t)))
    n_pages = len(pages)

    # sort pages along the axis of maximum page-center spread, so page
    # INDEX order is a near-to-far order for rays travelling along that
    # axis (the gather traversal pops direction-aware; see PagedBvh)
    pcent = np.array(
        [(lo[m].min(axis=0) + hi[m].max(axis=0)) * 0.5 for m in pages]
    )
    sort_axis = int(np.argmax(pcent.max(axis=0) - pcent.min(axis=0))) if n_pages > 1 else 0
    pages = [pages[i] for i in np.argsort(pcent[:, sort_axis], kind="stable")]
    sort_margin = 0.0
    for m in pages:
        blo, bhi = lo[m].min(axis=0), hi[m].max(axis=0)
        c = (blo[sort_axis] + bhi[sort_axis]) * 0.5
        sort_margin = max(sort_margin, c - blo[sort_axis], bhi[sort_axis] - c)

    # per-page sub-boxes: split each page's members into k runs along the
    # page's longest centroid axis; the prepass tests these tighter boxes
    # instead of the single loose shell AABB (see PagedBvh.sub_bounds)
    n_sub = max(1, min(8, int(os.environ.get("PATHTRACER_BVH_SUBBOX", "2"))))
    sub_bounds = ()
    if n_sub > 1:
        sub_list = []
        for m in pages:
            c = centroid[m]
            axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
            order = np.argsort(c[:, axis], kind="stable")
            runs = np.array_split(np.asarray(m)[order], min(n_sub, len(m)))
            flat = []
            for run in runs:
                if len(run) == 0:
                    run = runs[0][:1]  # degenerate tiny page: repeat
                blo, bhi = lo[run].min(axis=0), hi[run].max(axis=0)
                flat += [float(x) for x in blo] + [float(x) for x in bhi]
            while len(flat) < 6 * n_sub:  # pad tiny pages to k boxes
                flat += flat[-6:]
            sub_list.append(tuple(flat))
        sub_bounds = tuple(sub_list)

    # piecewise-linear center fit (chord per equal-count segment, with
    # the max residual recorded so the early stop can stay conservative)
    pcent_sorted = np.array(
        [
            np.float32(
                (lo[m].min(axis=0)[sort_axis] + hi[m].max(axis=0)[sort_axis]) * 0.5
            )
            for m in pages
        ],
        np.float64,
    )
    n_seg = min(4, n_pages)
    fit = []
    edges = np.linspace(0, n_pages, n_seg + 1).astype(int)
    for s in range(n_seg):
        lo_i, hi_i = int(edges[s]), int(edges[s + 1]) - 1
        if hi_i <= lo_i:
            a_s, b_s = 0.0, float(pcent_sorted[lo_i])
        else:
            a_s = float(
                (pcent_sorted[hi_i] - pcent_sorted[lo_i]) / (hi_i - lo_i)
            )
            b_s = float(pcent_sorted[lo_i] - a_s * lo_i)
        idx = np.arange(lo_i, hi_i + 1)
        dev = float(np.abs(pcent_sorted[lo_i : hi_i + 1] - (a_s * idx + b_s)).max())
        fit.append(
            (
                hi_i,
                float(np.float32(a_s)),
                float(np.float32(b_s)),
                float(np.float32(dev * (1 + 1e-5) + 1e-7)),
            )
        )
    center_fit = tuple(fit)

    # vectorized per-triangle plane-form precompute (float64): the
    # per-row np.cross loop this replaces cost ~0.8 s at 10k triangles
    # and dominated interactive re-packs (walk_attrib measurement)
    tri_mat = np.asarray(tri_mat, np.float64)
    tri_obj = np.asarray(tri_obj, np.float64)
    tri_smooth = np.asarray(tri_smooth, bool)
    n_raw = np.cross(e1, e2)
    nn = np.einsum("ij,ij->i", n_raw, n_raw)
    ok = nn > 1e-30
    safe = np.where(ok, nn, 1.0)
    n_hat = n_raw / np.sqrt(safe)[:, None]
    m1 = np.cross(e2, n_raw) / safe[:, None]
    m2 = np.cross(n_raw, e1) / safe[:, None]
    rows = np.zeros((t, N_PAGE_ATTRS), np.float64)
    rows[:, 0:3] = n_hat
    rows[:, 3] = np.einsum("ij,ij->i", n_hat, v0)
    rows[:, 4:7] = m1
    rows[:, 7] = -np.einsum("ij,ij->i", m1, v0)
    rows[:, 8:11] = m2
    rows[:, 11] = -np.einsum("ij,ij->i", m2, v0)
    rows[:, 12] = tri_mat
    rows[:, 13] = tri_obj
    rows[:, 14] = tri_smooth.astype(np.float64)
    rows[:, 15] = 1.0
    # degenerate rows are zeroed: only non-degenerate smooth triangles
    # should widen the gather table / compile the interpolation path
    any_smooth = bool((tri_smooth & ok).any())
    if any_smooth and tri_vn is not None:
        vn = np.asarray(tri_vn, np.float64)  # (T, 3 verts, 3)
        rows[:, 16:25] = np.where(
            tri_smooth[:, None], vn.reshape(t, 9), 0.0
        )
    rows[~ok] = 0.0  # degenerate: all-zero row, valid stays 0

    tiles = np.zeros((n_pages, PAGE_TRIS, N_PAGE_ATTRS), np.float64)
    page_bbox = np.zeros((n_pages, 8), np.float32)
    bounds = []
    for p, members in enumerate(pages):
        blo = lo[members].min(axis=0)
        bhi = hi[members].max(axis=0)
        page_bbox[p, 0:3] = blo
        page_bbox[p, 3:6] = bhi
        page_bbox[p, 6] = len(members)
        bounds.append(tuple(float(x) for x in blo) + tuple(float(x) for x in bhi))
        tiles[p, : len(members)] = rows[members]

    paged = PagedBvh(
        n_pages=n_pages,
        any_smooth=any_smooth,
        page_bounds=tuple(bounds),
        sort_axis=sort_axis,
        sort_margin=float(np.float32(sort_margin * (1 + 1e-6))),
        sub_bounds=sub_bounds,
        center_fit=center_fit,
    )
    return paged, tiles.astype(np.float32), page_bbox


# ---------------------------------------------------------------------------
# Gather-table layout (the in-kernel per-lane traversal, see below)
# ---------------------------------------------------------------------------
# f32[3*A, P_pad, PAGE_TRIS]: entry [l*A + a, p, j] is bf16 limb l of
# attribute column ``_gather_cols()[a]``, page p, triangle slot j.  Per
# (limb, attr), ``dot(table[l*A+a, base:base+W, :], onehot[W, lanes])``
# fetches each lane's OWN page as a (PAGE_TRIS, LANE) attribute grid —
# an MXU gather contracting over the page axis.  Three constraints
# shaped this layout (round 5, tools/repro/window_slice_probe.py):
#   * limbs are STORED AS f32 — every dynamic slice of a bf16 ref fails
#     to compile under Mosaic, while f32 works; and a default-precision
#     f32 MXU dot truncates operands to bf16, which for operands that
#     ARE bf16-exact (limbs, 0/1 one-hots) is the identity — the gather
#     stays bit-exact at one MXU pass per limb, same as the old bf16
#     table, at 2x the VMEM.
#   * pages ride the MIDDLE (second-minor) dim: Mosaic accepts a
#     dynamic slice there at a static leading index, but rejects
#     dynamic slices of any 2D table wider than 128 lanes — and the
#     dynamic page WINDOW is the round-5 fix for the ~1/P_pad
#     contraction wall (tri_scaling.json).
#   * attribute planes are separate leading-dim indices, so the test
#     and resolve sets SHARE columns instead of duplicating them.

# Sweep-test attribute set.  Col 15 (valid) is NOT gathered: a slot is
# invalid iff its tile row is all-zero (build_paged_bvh only skips
# degenerate triangles, leaving the row zeroed), so n = 0 and the
# |denom| > 1e-12 guard in _mt_key already rejects it — the gather-side
# accessor substitutes a constant 1.0 and stays bit-identical to the
# dense path, which reads the real column.  The obj column (13) is
# LAST so walks without an object exclusion statically drop it.
_G_TEST_COLS = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13)
_A_TEST = len(_G_TEST_COLS)


def _gather_cols(any_smooth: bool):
    """Deduplicated gather-table column set: the test set first (in
    _G_TEST_COLS order), then the resolve-only extras."""
    cols = list(_G_TEST_COLS)
    for c in _RES_COLS[: len(_RES_COLS) if any_smooth else 6]:
        if c not in cols:
            cols.append(c)
    return tuple(cols)


def build_gather_table(tiles: np.ndarray, paged: "PagedBvh") -> np.ndarray:
    """(P, PAGE_TRIS, N_PAGE_ATTRS) page tiles -> f32[3*A, P_pad, PAGE_TRIS].

    The exact 3-limb bf16 split (hi+mid+lo == value exactly: 8+8+8
    mantissa bits cover f32's 24; each residual subtraction is exact in
    f32), stored as f32 planes in the layout described in the section
    banner.  The page's early-stop axis center is NOT a table plane: it
    is one static scalar per page, so the walk selects it from
    compile-time immediates (PagedBvh.center_fit)."""
    import ml_dtypes  # jax hard dependency; numpy-native bf16 casts

    p, tris, _ = tiles.shape
    cols = _gather_cols(paged.any_smooth)
    a_n = len(cols)
    p_pad = -(-p // 128) * 128
    g = np.zeros((a_n, p_pad, tris), np.float32)
    for ai, c in enumerate(cols):
        g[ai, :p, :] = tiles[:, :, c]
    bf16 = ml_dtypes.bfloat16
    hi = g.astype(bf16).astype(np.float32)
    r1 = g - hi
    mid = r1.astype(bf16).astype(np.float32)
    lo = (r1 - mid).astype(bf16).astype(np.float32)
    return np.concatenate([hi, mid, lo], axis=0)


def _page_centers(paged: "PagedBvh") -> tuple:
    """Static per-page sort-axis bbox centers, f32-rounded exactly as
    the (removed) gather-table center block was."""
    ax = paged.sort_axis
    return tuple(
        float(np.float32((b[ax] + b[3 + ax]) * 0.5)) for b in paged.page_bounds
    )


# ---------------------------------------------------------------------------
# Dense traversal kernels
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


def _is_ref(table) -> bool:
    aval = getattr(table, "aval", None)
    return aval is not None and "Ref" in type(aval).__name__


def _page_tile(table, p):
    """Fetch page ``p``'s (PAGE_TRIS, N_PAGE_ATTRS) tile at a traced
    scalar index — ONE dynamic fetch per page visit."""
    if _is_ref(table):
        return table[p]
    return lax.dynamic_slice(
        table, (p, jnp.int32(0), jnp.int32(0)), (1,) + table.shape[1:]
    )[0]


def _page_boxes(paged: PagedBvh, p: int):
    """Static prepass boxes for page ``p``: the sub-AABBs when built
    (deduplicated — tiny pages pad by repetition), else the page bbox."""
    if paged.sub_bounds:
        flat = paged.sub_bounds[p]
        boxes = [flat[i : i + 6] for i in range(0, len(flat), 6)]
        out = []
        for b in boxes:
            if b not in out:
                out.append(b)
        return out
    return [paged.page_bounds[p]]


def _page_want(o, inv, paged: PagedBvh, p: int, t_min, best_t, t_max, need_t0):
    """Entry test of page ``p`` against its (sub-)boxes: returns
    (want, t0) where t0 is the min entered-box slab entry (only when
    ``need_t0``; conservative lower bound on any hit t in the page)."""
    want, t0m = None, None
    for b in _page_boxes(paged, p):
        t0, t1 = _slab_scalars(
            o, inv, _F(b[0]), _F(b[1]), _F(b[2]), _F(b[3]), _F(b[4]), _F(b[5])
        )
        w = (t1 >= t0) & (t1 >= t_min) & (t0 < best_t)
        if t_max is not None:
            w = w & (t0 <= t_max)
        want = w if want is None else (want | w)
        if need_t0:
            te = jnp.where(w, t0, _F(_BIG_T))
            t0m = te if t0m is None else jnp.minimum(t0m, te)
    return want, t0m


def _page_prepass(o, d, inv, paged: PagedBvh, t_min, best_t, t_max=None, skip=None):
    """Mark every page whose bbox a lane's ray enters: per-lane bitmask
    words (list of i32 lane grids).  STATIC unroll over pages with the
    bounds as compile-time scalar immediates; a page's bbox is contained
    in all its ancestors', so this is exactly as selective as walking a
    tree above the pages — with zero loop-carried iterations."""
    zero_i = _lane_zero_i32(o.x)
    words = [zero_i for _ in range(paged.mask_words)]
    for p in range(paged.n_pages):
        want, _ = _page_want(o, inv, paged, p, t_min, best_t, t_max, False)
        if skip is not None:
            want = want & ~skip
        j, rel = divmod(p, MASK_BITS)
        words[j] = words[j] | jnp.where(want, jnp.int32(1 << rel), 0)
    return words


# t-buckets for the per-lane gather traversal: pages are classified by
# their per-lane slab ENTRY t into N_BUCKETS ranges of [root-entry,
# root-exit], and the walk drains buckets in order — an approximate
# per-lane front-to-back order that lets closest-hit lanes stop after
# the first occupied range and shadow lanes block on near geometry.
# Miscassification is impossible by construction (same t0 and splits
# decide membership and the kill rule); wrong SPLITS (NaN/inf corner
# cases) only push pages toward bucket 0, which is always conservative.
N_BUCKETS = max(1, min(8, int(os.environ.get("PATHTRACER_BVH_BUCKETS", "4"))))


def _page_prepass_bucketed(
    o, d, inv, paged: PagedBvh, t_min, best_t, t_max=None, skip=None, fwd=None
):
    """Bucketed prepass: returns (bwords, splits).

    ``bwords``: N_BUCKETS lists of mask words — bucket b marks pages
    whose slab entry t0 falls in [splits[b-1], splits[b]) per lane.
    ``splits``: N_BUCKETS-1 lane grids; bucket b (b>=1) may be dropped
    entirely once splits[b-1] exceeds the lane's best t.

    ``fwd`` (bool lane grid: ray advances along the sort axis) enables
    DIRECTION FOLDING: backward lanes store page p at bit position
    ``n_pages-1-p``, so the per-round pop is a single lowest-set-bit
    scan for every lane (near-to-far either way) instead of the old
    dual low/high-bit scan — the per-page select moves into this
    one-time prepass, off the per-round critical path."""
    nb = N_BUCKETS
    zero_i = _lane_zero_i32(o.x)
    n_pages = paged.n_pages
    bwords = [[zero_i for _ in range(paged.mask_words)] for _ in range(nb)]

    # static root bbox = union of page bounds
    pb = paged.page_bounds
    rlo = [min(b[i] for b in pb) for i in range(3)]
    rhi = [max(b[3 + i] for b in pb) for i in range(3)]
    r0, r1 = _slab_scalars(
        o, inv, _F(rlo[0]), _F(rhi[0]), _F(rlo[1]), _F(rhi[1]), _F(rlo[2]), _F(rhi[2])
    )
    lo = jnp.clip(r0, t_min, _F(_BIG_T))
    hi = jnp.minimum(r1, best_t)
    if t_max is not None:
        hi = jnp.minimum(hi, t_max)
    hi = jnp.clip(hi, t_min, _F(_BIG_T))
    step = jnp.maximum(hi - lo, _F(0.0)) * _F(1.0 / nb)
    splits = [lo + step * _F(float(b)) for b in range(1, nb)]

    for p in range(n_pages):
        want, t0 = _page_want(o, inv, paged, p, t_min, best_t, t_max, True)
        if skip is not None:
            want = want & ~skip
        ge = [t0 >= s for s in splits]
        jf, rf = divmod(p, MASK_BITS)
        jb, rb = divmod(n_pages - 1 - p, MASK_BITS)
        bit_f, bit_b = jnp.int32(1 << rf), jnp.int32(1 << rb)
        if fwd is not None and jf == jb:
            bit_sel = jnp.where(fwd, bit_f, bit_b)
        for bi in range(nb):
            in_b = want
            if bi >= 1:
                in_b = in_b & ge[bi - 1]
            if bi < nb - 1:
                in_b = in_b & ~ge[bi]
            if fwd is None:
                bwords[bi][jf] = bwords[bi][jf] | jnp.where(in_b, bit_f, 0)
            elif jf == jb:
                bwords[bi][jf] = bwords[bi][jf] | jnp.where(in_b, bit_sel, 0)
            else:
                bwords[bi][jf] = bwords[bi][jf] | jnp.where(in_b & fwd, bit_f, 0)
                bwords[bi][jb] = bwords[bi][jb] | jnp.where(in_b & ~fwd, bit_b, 0)
    return bwords, splits


def _attr_getter(tile, ray_ndim):
    """Returns (col2, coln) attr accessors for a (PAGE_TRIS, ncols) tile.

    ``col2`` (kernel path): (PAGE_TRIS, 1) columns — triangles on
    SUBLANES, broadcast against (1, LANE) ray rows.  ``coln`` (XLA
    path): (PAGE_TRIS, 1...) columns broadcast against ray grids of any
    rank with a leading triangle axis added."""
    def col2(c):
        return tile[:, c : c + 1]

    tail = (1,) * ray_ndim

    def coln(c):
        return tile[:, c].reshape((PAGE_TRIS,) + tail)

    return col2, coln


def _mt_key(attr, ox, oy, oz, dx, dy, dz, t_min, t_upper, t_max, excl, k_iota, big_key):
    """Dense plane-form Möller–Trumbore over one page tile.

    ``attr(c)`` yields (T,1[,1]) triangle columns; ray operands are
    (1,LANE[,..]) rows; every intermediate is the (T, LANE)-shaped cross.
    Returns the per-pair winner key (f32 t bits | slot, else big_key)."""
    nx, ny, nz = attr(0), attr(1), attr(2)
    denom = nx * dx + ny * dy + nz * dz
    t_num = attr(3) - (nx * ox + ny * oy + nz * oz)
    ok = (attr(15) > _F(0.5)) & (jnp.abs(denom) > _F(1e-12))
    rcp = _F(1.0) / jnp.where(ok, denom, _F(1.0))
    tt = t_num * rcp
    hx = ox + tt * dx
    hy = oy + tt * dy
    hz = oz + tt * dz
    u = attr(4) * hx + attr(5) * hy + attr(6) * hz + attr(7)
    v = attr(8) * hx + attr(9) * hy + attr(10) * hz + attr(11)
    ok = (
        ok
        & (u >= 0)
        & (v >= 0)
        & (u + v <= _F(1.0))
        & (tt >= t_min)
        & (tt < t_upper)
    )
    if t_max is not None:
        ok = ok & (tt <= t_max)
    if excl is not None:
        ok = ok & (attr(13) != excl)
    key = (lax.bitcast_convert_type(tt, jnp.int32) & ~jnp.int32(_KEY_SLOT_MASK)) | k_iota
    return jnp.where(ok, key, big_key)


_BIG_T = 3e38


def _lane_arg(a, s):
    """Slice lane grids to one sublane row; pass scalars through."""
    if a is None or getattr(a, "ndim", 0) != 2:
        return a
    return a[s : s + 1, :]


# sublane rows fused per gather round (see _traverse_gather).  FIXED at
# 1: the in-kernel (rows, 128) -> (rows/G, G*128) relayout the grouped
# variant needs is broken in Mosaic — the minimal reproducer
# (tools/repro/mosaic_reshape_repro.py) fails to COMPILE on every stage,
# including a bare reshape round-trip ("Invalid input layout" on
# vector.broadcast (1,128)->(G,128)), and the framework kernel that did
# compile rendered the 10k-tri bench image wrong (mean 167 vs 254,
# tools/perf/gather_sweep.json).  The former PATHTRACER_BVH_GROUP_ROWS
# env gate is removed: a wrong-image knob with a compiler-level defect
# is a trap, not a tuning surface.  Row amortization is still available
# the safe way — WIDE LANE ROWS reshaped OUTSIDE the kernel (render
# driver; measured -13% in round 3, PERF.md).
GROUP_ROWS = 1

# page pops (independent gather matmuls) per while-loop iteration.  2
# halves the serial trip count and lets the two gathers overlap in the
# MXU pipeline at the cost of slightly weaker pruning (the first pop's
# early-stop cannot cancel the second pop of the same iteration — only
# future iterations); a page gathered past its stop bound can never win
# (its slab entry exceeds the winner's t), so results are unchanged.
ROUND_POPS = max(1, int(os.environ.get("PATHTRACER_BVH_ROUND_POPS", "1")))

# bf16 limbs per TEST gather (selection only — the winner resolve always
# uses all 3 for exact attributes).  3 = exact f32 (bit-identical to the
# dense sweep, the default and the tested contract).  2 = 16 mantissa
# bits on the gathered plane constants: the t-key/u/v SELECTION may
# differ from dense in ~2^-16-relative near-ties (shared-edge pixels),
# while the final t/normal stay exact via the 3-limb resolve.  Perf
# knob for A/Bs; NOT the default because it breaks the gather==dense
# bit-identity contract.
TEST_LIMBS = min(3, max(1, int(os.environ.get("PATHTRACER_BVH_TEST_LIMBS", "3"))))


def _unflatten_row(x, gstep):
    """(1, gstep*128) -> (gstep, 128), inverse of _flatten_rows.

    The lanes->sublanes direction is NOT a supported Mosaic shape cast
    (it reaches layout inference as a rank-1 vector), so rebuild rows as
    masked broadcasts: every op here is elementwise or a plain
    broadcast, which carries no layout-offset constraints."""
    if gstep == 1:
        return x
    lane = x.shape[1] // gstep
    riota = lax.broadcasted_iota(jnp.int32, (gstep, 1), 0)
    out = None
    for i in range(gstep):
        piece = jnp.broadcast_to(x[:, i * lane : (i + 1) * lane], (gstep, lane))
        out = piece if out is None else jnp.where(riota == i, piece, out)
    return out


def _lead_arg(a):
    """Add a leading triangle axis to lane grids; pass scalars through."""
    if a is None or getattr(a, "ndim", 0) != 2:
        return a
    return a[None]


def _big_key() -> int:
    import struct

    return (struct.unpack("<i", struct.pack("<f", _BIG_T))[0]) | _KEY_SLOT_MASK


def _key_upper_t(key):
    """f32 >= the true winner t for a packed key (fills the slot bits)."""
    return lax.bitcast_convert_type(key | jnp.int32(_KEY_SLOT_MASK), jnp.float32)


def _sweep_page_keys(tile, o, d, t_min, best_key, t_max, exclude_obj, in_kernel):
    """Sweep one page tile densely; returns the improved per-ray best_key.

    Kernel path: loops ray sublane-rows statically, each step a
    (PAGE_TRIS, LANE) cross tile.  XLA path: one (PAGE_TRIS, R, LANE)
    3D broadcast, min-reduced over the triangle axis."""
    bigk = jnp.int32(_big_key())
    shape = o.x.shape
    if in_kernel:
        col2, _ = _attr_getter(tile, shape and len(shape))
        k_iota = lax.broadcasted_iota(jnp.int32, (PAGE_TRIS, 1), 0)
        rows = []
        for s in range(shape[0]):
            sl = lambda a: a[s : s + 1, :]  # noqa: E731
            excl = None if exclude_obj is None else _lane_arg(exclude_obj, s).astype(jnp.float32)
            keys = _mt_key(
                col2,
                sl(o.x), sl(o.y), sl(o.z),
                sl(d.x), sl(d.y), sl(d.z),
                t_min,
                _key_upper_t(sl(best_key)),
                _lane_arg(t_max, s),
                excl,
                k_iota,
                bigk,
            )
            rows.append(jnp.min(keys, axis=0, keepdims=True))
        page_key = jnp.concatenate(rows, axis=0)
    else:
        _, col3 = _attr_getter(tile, len(shape))
        k_iota = lax.broadcasted_iota(
            jnp.int32, (PAGE_TRIS,) + (1,) * len(shape), 0
        )
        excl = None if exclude_obj is None else _lead_arg(exclude_obj).astype(jnp.float32)
        keys = _mt_key(
            col3,
            o.x[None], o.y[None], o.z[None],
            d.x[None], d.y[None], d.z[None],
            t_min,
            _key_upper_t(best_key)[None],
            _lead_arg(t_max),
            excl,
            k_iota,
            bigk,
        )
        page_key = jnp.min(keys, axis=0)
    return jnp.minimum(best_key, page_key)


def traverse_triangles_paged(
    o: V3, d: V3, pack, t_min, state, exclude_obj=None, t_max=None,
    lite: bool = False, skip=None,
):
    """Closest-hit dense paged traversal (see the section banner).

    Same contract as the prior designs: merges the mesh winner into the
    intersect_world winner-chain dict; returns (state, pages_visited).
    ``skip`` lanes (bool grid, caller discards their result) mark zero
    pages — rounds per row are max-driven, so masked/dead lanes stop
    inflating the walk."""
    paged: PagedBvh = pack.paged
    if paged is None or paged.n_pages == 0:
        return state, jnp.zeros((), jnp.int32)
    if _use_gather(pack):
        return _traverse_gather(
            o, d, pack, t_min, state, exclude_obj=exclude_obj, t_max=t_max,
            lite=lite, skip=skip,
        )
    t_min = _F(t_min)
    inv = V3(_F(1.0) / d.x, _F(1.0) / d.y, _F(1.0) / d.z)
    zero_i = _lane_zero_i32(o.x)
    n_pages = paged.n_pages
    sent = jnp.int32(n_pages)
    in_kernel = _is_ref(pack.page_tiles)
    tiles = pack.page_tiles

    words = _page_prepass(
        o, d, inv, paged, t_min, state["best_t"], t_max=t_max, skip=skip
    )

    # winner carry: key = f32 bits of best t with slot bits filled (so a
    # triangle wins only by beating the object sweep's t), page = -1
    best_key0 = (
        lax.bitcast_convert_type(state["best_t"] + o.x * _F(0.0), jnp.int32)
        | jnp.int32(_KEY_SLOT_MASK)
    )
    best_page0 = zero_i - 1
    p0 = jnp.min(_next_wanted(words, sent))
    w_n = paged.mask_words
    carry0 = (p0, jnp.zeros((), jnp.int32)) + tuple(words) + (best_key0, best_page0)

    def cond(carry):
        return carry[0] < n_pages

    def body(carry):
        p, visits = carry[0], carry[1]
        words = list(carry[2 : 2 + w_n])
        best_key, best_page = carry[2 + w_n], carry[3 + w_n]

        tile = _page_tile(tiles, p)
        new_key = _sweep_page_keys(
            tile, o, d, t_min, best_key, t_max, exclude_obj, in_kernel
        )
        best_page = jnp.where(new_key < best_key, p, best_page)

        for j in range(w_n):
            words[j] = words[j] & ~_scalar_word_bit(p, j)
        p_next = jnp.min(_next_wanted(words, sent))
        return (p_next, visits + 1) + tuple(words) + (new_key, best_page)

    out = lax.while_loop(cond, body, carry0)
    visits = out[1]
    best_key, best_page = out[2 + w_n], out[3 + w_n]
    hit = best_page >= 0

    # ---- post-sweep winner resolve: one pass over WINNING pages ------
    res = _resolve_winners(
        tiles, paged, o, d, best_key, best_page, hit, in_kernel, zero_i
    )
    st = _merge_winner_state(pack, state, res, hit, lite)
    return st, visits


def _merge_winner_state(pack, state, res, hit, lite):
    """Merge a resolved mesh winner into the intersect_world winner-chain
    dict (shared by the dense and gather traversals)."""
    t_exact, nx, ny, nz, mat_f, obj_f = res

    improved = hit & (t_exact < state["best_t"])
    best_mat = jnp.where(improved, mat_f.astype(jnp.int32), 0)
    st = dict(state)
    st["best_t"] = jnp.where(improved, t_exact, state["best_t"])
    st["best_type"] = jnp.where(improved, OBJ_TRIANGLE, state["best_type"])
    st["nx"] = jnp.where(improved, nx, state["nx"])
    st["ny"] = jnp.where(improved, ny, state["ny"])
    st["nz"] = jnp.where(improved, nz, state["nz"])
    if not lite:
        st["best_m"] = jnp.where(improved, obj_f.astype(jnp.int32), state["best_m"])
        st["best_mat"] = jnp.where(improved, best_mat, state["best_mat"])

    mat = pack.mat
    # uniform material columns already hold the broadcast constant in
    # the incoming state (geometry.intersect_world) — skip their selects
    uni = pack.mat_uniform or (None,) * 20
    for mi in range(pack.n_materials):
        m_mask = improved & (best_mat == mi)
        sel = lambda a, b: jnp.where(m_mask, a, b)  # noqa: E731
        msel = lambda c, b: b if uni[c] is not None else sel(mat[mi, c], b)  # noqa: E731
        st["best_mtyp"] = sel(pack.mat_types[mi], st["best_mtyp"])
        st["b_emit"] = V3(
            msel(8, st["b_emit"].x),
            msel(9, st["b_emit"].y),
            msel(10, st["b_emit"].z),
        )
        if not lite:
            st["b_rough"] = msel(1, st["b_rough"])
            st["b_ior"] = msel(2, st["b_ior"])
            st["b_smooth"] = msel(3, st["b_smooth"])
            st["b_refl"] = msel(7, st["b_refl"])
            st["b_abss"] = msel(15, st["b_abss"])
            st["b_albedo"] = V3(
                msel(4, st["b_albedo"].x),
                msel(5, st["b_albedo"].y),
                msel(6, st["b_albedo"].z),
            )
            st["b_absorb"] = V3(
                msel(12, st["b_absorb"].x),
                msel(13, st["b_absorb"].y),
                msel(14, st["b_absorb"].z),
            )
            st["b_tint"] = V3(
                msel(16, st["b_tint"].x),
                msel(17, st["b_tint"].y),
                msel(18, st["b_tint"].z),
            )
    return st


# attribute columns the resolve pass extracts, in order: geometric
# normal (3), d_plane, mat, obj; smooth meshes add the barycentric
# duals (m1,c1,m2,c2), the smooth flag and the three vertex normals
_RES_COLS = (0, 1, 2, 3, 12, 13) + (4, 5, 6, 7, 8, 9, 10, 11, 14) + tuple(
    range(16, 25)
)


def _resolve_winners(tiles, paged, o, d, best_key, best_page, hit, in_kernel, zero_i):
    """Extract the winning triangle's attributes once per sweep.

    A second cursor loop over pages that WON at least one lane; per page
    a one-hot over the winner's slot recovers attributes as masked
    triangle-axis sums (the slot key makes the one-hot unique, so
    shared-edge ties cannot double-count).  The exact hit t is
    recomputed from the winner's plane constants — the packed key's t
    has its low 7 mantissa bits replaced by the slot."""
    n_pages = paged.n_pages
    sent = jnp.int32(n_pages)
    smooth = paged.any_smooth
    slot = best_key & jnp.int32(_KEY_SLOT_MASK)
    zero_f = zero_i.astype(jnp.float32)
    n_attr = len(_RES_COLS) if smooth else 6

    # winner-page bitmask words (static unroll, ~2 ops per page)
    wwords = [zero_i for _ in range(paged.mask_words)]
    for p in range(n_pages):
        j, rel = divmod(p, MASK_BITS)
        wwords[j] = wwords[j] | jnp.where(
            hit & (best_page == p), jnp.int32(1 << rel), 0
        )

    def extract(tile, p):
        """Per-page one-hot attribute sums; returns list of lane grids."""
        if in_kernel:
            col = lambda c: tile[:, c : c + 1]  # noqa: E731
            k_iota = lax.broadcasted_iota(jnp.int32, (PAGE_TRIS, 1), 0)
            per_row = []
            for s in range(slot.shape[0]):
                onehot = (
                    (k_iota == slot[s : s + 1, :])
                    & (best_page[s : s + 1, :] == p)
                ).astype(jnp.float32)
                per_row.append(
                    [
                        jnp.sum(onehot * col(c), axis=0, keepdims=True)
                        for c in _RES_COLS[:n_attr]
                    ]
                )
            return [
                jnp.concatenate([r[i] for r in per_row], axis=0)
                for i in range(n_attr)
            ]
        tail = (1,) * slot.ndim
        col = lambda c: tile[:, c].reshape((PAGE_TRIS,) + tail)  # noqa: E731
        k_iota = lax.broadcasted_iota(jnp.int32, (PAGE_TRIS,) + tail, 0)
        onehot = ((k_iota == slot[None]) & (best_page[None] == p)).astype(
            jnp.float32
        )
        return [jnp.sum(onehot * col(c), axis=0) for c in _RES_COLS[:n_attr]]

    p0 = jnp.min(_next_wanted(wwords, sent))
    carry0 = (p0,) + tuple(wwords) + tuple([zero_f] * n_attr)
    w_n = paged.mask_words

    def cond(carry):
        return carry[0] < n_pages

    def body(carry):
        p = carry[0]
        words = list(carry[1 : 1 + w_n])
        acc = list(carry[1 + w_n :])
        tile = _page_tile(tiles, p)
        vals = extract(tile, p)
        mine = hit & (best_page == p)
        acc = [jnp.where(mine, v, a) for v, a in zip(vals, acc)]
        for j in range(w_n):
            words[j] = words[j] & ~_scalar_word_bit(p, j)
        p_next = jnp.min(_next_wanted(words, sent))
        return (p_next,) + tuple(words) + tuple(acc)

    out = lax.while_loop(cond, body, carry0)
    acc = list(out[1 + w_n :])
    return _winner_math(o, d, hit, acc, smooth)


def _winner_math(o: V3, d: V3, hit, acc, smooth: bool):
    """Exact hit t + shading normal from winner attributes.

    ``acc`` is a list of lane grids in ``_RES_COLS`` order (first 6
    always; the smooth extras only when ``smooth``).  The exact t is
    recomputed from the winner's geometric plane — the packed key's t
    has its low 7 mantissa bits replaced by the slot."""
    gnx, gny, gnz, d_plane, mat_f, obj_f = acc[:6]

    # exact t from the winner's geometric plane: t = (d_plane - n.o)/(n.d)
    denom = gnx * d.x + gny * d.y + gnz * d.z
    safe = jnp.abs(denom) > _F(1e-12)
    t_exact = (d_plane - (gnx * o.x + gny * o.y + gnz * o.z)) / jnp.where(
        safe, denom, _F(1.0)
    )
    t_exact = jnp.where(hit & safe, t_exact, _F(_BIG_T))

    nx, ny, nz = gnx, gny, gnz
    if smooth:
        m1x, m1y, m1z, c1, m2x, m2y, m2z, c2, smf = acc[6:15]
        v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z = acc[15:24]
        hx = o.x + t_exact * d.x
        hy = o.y + t_exact * d.y
        hz = o.z + t_exact * d.z
        u = m1x * hx + m1y * hy + m1z * hz + c1
        v = m2x * hx + m2y * hy + m2z * hz + c2
        w0 = _F(1.0) - u - v
        sx = w0 * v0x + u * v1x + v * v2x
        sy = w0 * v0y + u * v1y + v * v2y
        sz = w0 * v0z + u * v1z + v * v2z
        slen = jnp.sqrt(jnp.maximum(sx * sx + sy * sy + sz * sz, _F(1e-30)))
        use = smf > _F(0.5)
        nx = jnp.where(use, sx / slen, gnx)
        ny = jnp.where(use, sy / slen, gny)
        nz = jnp.where(use, sz / slen, gnz)
    return t_exact, nx, ny, nz, mat_f, obj_f


def occluded_triangles_paged(o: V3, d: V3, pack, t_min, t_max, blocked):
    """Any-hit paged traversal for shadow rays: boolean result.
    Already-blocked lanes mark no pages; a lane that finds any hit drops
    its remaining pages.  Kernel path uses the per-lane gather loop."""
    paged: PagedBvh = pack.paged
    if paged is None or paged.n_pages == 0:
        return blocked
    if _use_gather(pack):
        return _occluded_gather(o, d, pack, t_min, t_max, blocked)
    t_min = _F(t_min)
    inv = V3(_F(1.0) / d.x, _F(1.0) / d.y, _F(1.0) / d.z)
    zero_i = _lane_zero_i32(o.x)
    n_pages = paged.n_pages
    sent = jnp.int32(n_pages)
    in_kernel = _is_ref(pack.page_tiles)
    tiles = pack.page_tiles
    big_t = o.x * _F(0.0) + _F(_BIG_T)  # desplat (Mosaic layout bug)

    words = _page_prepass(
        o, d, inv, paged, t_min, big_t, t_max=t_max, skip=blocked
    )

    blk0 = blocked.astype(jnp.int32) + zero_i
    p0 = jnp.min(_next_wanted(words, sent))
    w_n = paged.mask_words
    carry0 = (p0,) + tuple(words) + (blk0,)

    def cond(carry):
        return carry[0] < n_pages

    def body(carry):
        p = carry[0]
        words = list(carry[1 : 1 + w_n])
        blk = carry[1 + w_n]
        tile = _page_tile(tiles, p)
        # any-hit: a page hit is any pair key below the sentinel
        key0 = lax.bitcast_convert_type(big_t, jnp.int32) | jnp.int32(
            _KEY_SLOT_MASK
        )
        new_key = _sweep_page_keys(tile, o, d, t_min, key0, t_max, None, in_kernel)
        blk = blk | (new_key < key0).astype(jnp.int32)
        for j in range(w_n):
            words[j] = words[j] & ~_scalar_word_bit(p, j)
            words[j] = jnp.where(blk != 0, 0, words[j])  # blocked: drop out
        p_next = jnp.min(_next_wanted(words, sent))
        return (p_next,) + tuple(words) + (blk,)

    out = lax.while_loop(cond, body, carry0)
    return out[1 + w_n] != 0


# ---------------------------------------------------------------------------
# Per-lane gather traversal (kernel path) — the round-3 redesign, v3
# ---------------------------------------------------------------------------
#
# The dense sweep's cost on divergent content is the PACKET UNION of
# wanted pages, but measured per-LANE wanted counts are tiny
# (tools/perf/union_stats.py on the 10k-tri bench scene: bounce rays
# want 1.4 pages/lane on average, max ~3 per 128-lane row — while the
# row union is 71 of 80 pages).  This traversal does per-lane work:
#
#   round i: each lane pops ITS OWN next wanted page (lowest set bit of
#   its mask words — pure vector bit ops, no cross-lane reduction); a
#   one-hot (pages, lanes) matrix against the per-attr transposed table
#   (build_gather_table) turns ONE MXU matmul into a 128-wide gather:
#   G = dot(table[(attr,tri), page], onehot[page, lane]) yields each
#   lane's own page as (PAGE_TRIS, LANE) attribute grids, and the same
#   dense plane-form test as the page sweep scores every (tri, lane)
#   pair.  Rounds per row = the MAX wanted count over its 128 lanes
#   (~3-7 on real content) instead of the 70+ page union.
#
# The one-hot matmul must be an EXACT f32 selection: the f32 attribute
# splits into three bf16-exact limbs (8+8+8 mantissa bits >= f32's 24,
# stored as f32 — see the table-layout banner) and each limb multiplies
# an exactly-representable 0.0/1.0 under the MXU's default bf16
# truncation (identity on bf16-exact operands), accumulating in f32 —
# bit-exact, so the kernel stays bit-comparable with the XLA dense path.
#
# Winner resolve: one more gather round per row against the lane's
# winning page; a slot one-hot recovers the attributes, and the shared
# _winner_math recomputes the exact t.


def gather_enabled() -> bool:
    """Env kill-switch for the per-lane gather walk (diagnostics)."""
    return os.environ.get("PATHTRACER_BVH_GATHER", "") not in (
        "0", "false", "off",
    )


def _use_gather(pack) -> bool:
    return gather_enabled() and _is_ref(pack.page_gather)


# Page window for the per-round gather (round 5).  The full-width
# one-hot matmul contracts over ALL p_pad pages — O(P) MACs per lane
# per round, the measured scaling wall (tools/perf/tri_scaling.json:
# 9.5 → 3.6 → 1.5 Mrays/s at 10k/40k/100k triangles).  The windowed
# form contracts over min(P_pad, GATHER_WINDOW) pages anchored at the
# round's minimum live page (128-aligned): lanes whose page falls past
# the window DEFER — their mask bit is restored and they retry next
# round.  The base lane always progresses, so the walk terminates, and
# deferral only REORDERS page visits (every page is still swept exactly
# once per wanting lane; the winner is a min over the same key set), so
# results stay bit-identical to the full-width and dense paths.
# 0 disables windowing.  (The round-4 BANKED alternative — lax.cond per
# 128-page bank — is deleted: Mosaic predicates conds, so skipped banks
# still paid 74% of the matmul; PERF.md round 4.)
GATHER_WINDOW = (
    max(0, int(os.environ.get("PATHTRACER_BVH_GATHER_WINDOW", "256") or 0))
    // 128
    * 128
)


def _window_for(p_pad: int):
    """Static window width for a table of ``p_pad`` pages (None = no
    windowing: full-width static slices compile leaner)."""
    if GATHER_WINDOW <= 0 or p_pad <= GATHER_WINDOW:
        return None
    return GATHER_WINDOW


def _g_slice(gt, plane: int, base, w: int):
    """(w, PAGE_TRIS) f32 page window of one (limb, attr) table plane.

    Ref path: Mosaic supports the dynamic middle-dim slice at a static
    leading index (tools/repro/window_slice_probe.py — the ONLY dynamic
    slice shape it accepts for this table); array path (XLA/CPU tests):
    lax.dynamic_slice."""
    if isinstance(base, int):
        return gt[plane, base : base + w, :]
    if _is_ref(gt):
        from jax.experimental import pallas as pl

        return gt[plane, pl.dslice(base, w), :]
    return lax.dynamic_slice(
        gt, (jnp.int32(plane), base, jnp.int32(0)), (1, w, gt.shape[2])
    )[0]


def _gather_sel(gt, attrs, limbs_n, n_pages, p_l, guard=False, base=0, w=None):
    """Exact one-hot MXU gather of each lane's page.

    ``gt``: f32[3*A, P_pad, PAGE_TRIS] limb-planed table (ref or
    array); ``attrs``: static attr-plane indices to gather; ``limbs_n``
    limbs to accumulate (TEST_LIMBS for selection, 3 for the exact
    resolve); ``p_l`` (1, LANE) i32 per-lane page (sentinel/−1 lanes —
    and lanes outside the window — gather exact zeros: padding pages
    are zero columns and out-of-window one-hots are all-false).
    ``[base, base+w)``: the page window (defaults to the whole table).
    ``guard`` wraps the gather in an any-lane-live cond (the winner
    RESOLVE: an all-miss row skips its loads+matmuls — exact, measured
    neutral-positive; the per-round TEST gather leaves it off since the
    while cond already guarantees a live lane).

    Returns a LIST of (PAGE_TRIS, LANE) f32 grids in ``attrs`` order.
    Exactness: each dot is f32-stored bf16-exact limbs x a 0/1 one-hot
    under DEFAULT precision — the MXU's bf16 truncation is the identity
    on both operands, and each output element sums at most one nonzero
    product, so hi+mid+lo reconstructs the f32 attribute bit-exactly
    (same contract the old bf16-limb table had)."""
    a_n = gt.shape[0] // 3
    p_pad = gt.shape[1]
    tris = gt.shape[2]
    lane = p_l.shape[1]
    if w is None:
        w = p_pad
    iota_w = lax.broadcasted_iota(jnp.int32, (w, 1), 0)

    def take_all():
        oh = ((iota_w + base) == p_l).astype(jnp.float32)
        outs = []
        for a in attrs:
            acc = None
            for l in range(limbs_n):
                t = lax.dot_general(
                    _g_slice(gt, l * a_n + a, base, w),
                    oh,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.DEFAULT,
                )
                acc = t if acc is None else acc + t
            outs.append(acc)
        return outs

    if guard:
        live = (p_l >= 0) & (p_l < n_pages)
        return lax.cond(
            jnp.any(live),
            take_all,
            lambda: [jnp.zeros((tris, lane), jnp.float32) for _ in attrs],
        )
    return take_all()


def _center_fit_of(paged: "PagedBvh"):
    """The build's piecewise-linear center fit, or a one-segment
    conservative fallback for hand-built PagedBvh instances."""
    if paged.center_fit:
        return paged.center_fit
    cs = _page_centers(paged)
    lo, hi = min(cs), max(cs)
    mid, dev = (lo + hi) * 0.5, (hi - lo) * 0.5
    return ((paged.n_pages - 1, 0.0, float(mid), float(np.float32(dev * (1 + 1e-5)))),)


# ---------------------------------------------------------------------------
# Stacked word machinery (round 5).  The per-row while loops used to
# carry every mask word as its own (1, LANE) i32 grid: at 100k
# triangles that is N_BUCKETS x ceil(896/30) = 120 carried arrays, and
# every pop / clear / early-stop kill / cond touched each word with a
# separate op on a 1-sublane grid — which Mosaic pads to a full
# (8, 128) VPU tile, so the word machinery paid ~8x its useful lanes
# and scaled linearly with page count (the post-window 100k wall;
# window_sweep.json shows window width and matmul limbs are NOT the
# remaining cost).  Now one row's words stack bucket-major into a
# single (nw, LANE) grid: the pop is a lexicographic (bucket, page)
# min-encode reduced across sublanes, and clear / defer / kill are
# single broadcast grid ops — O(nw/8) tiles instead of O(nw) padded
# tiles per round.  Semantics are IDENTICAL to the per-word pop
# (first non-empty bucket, smallest folded page, same window deferral
# and kill rules), so gather==dense bit-identity is preserved.

def _stack_words(bwords, s):
    """Row ``s`` of the prepass's full-grid mask words, stacked
    bucket-major: (N_BUCKETS * mask_words, LANE) i32."""
    return jnp.concatenate([w[s : s + 1, :] for wb in bwords for w in wb], axis=0)


def _pop_stacked(ws, sent, fwd, n_pages: int, w_n: int, nb: int):
    """Pop each lane's next page from a stacked (nw, LANE) word grid.

    The winner is the smallest folded page index within the lane's
    FIRST non-empty bucket (words are direction-folded at prepass time:
    backward lanes store page p at bit n_pages-1-p, so one lowest-set-
    bit scan is near-to-far for every lane).  Encoding:
    enc = bucket * K + folded_page with K = w_n * MASK_BITS (>= any
    folded page + 1), min-reduced over sublanes — lexicographic
    (bucket, page).  Returns (p_l true page, new ws, sel) with sel[b]
    the lanes that popped from bucket b."""
    nw = nb * w_n
    k_enc = w_n * MASK_BITS
    sent_enc = jnp.int32(nb * k_enc)
    riota = lax.broadcasted_iota(jnp.int32, (nw, 1), 0)
    # static per-sublane offset: bucket(r)*K + word_in_bucket(r)*MASK_BITS
    off = (riota // w_n) * k_enc + (riota % w_n) * MASK_BITS
    low = ws & (-ws)
    bit = (lax.bitcast_convert_type(low.astype(jnp.float32), jnp.int32) >> 23) - 127
    enc = jnp.where(ws > 0, off + bit, sent_enc)
    enc_min = jnp.min(enc, axis=0, keepdims=True)  # (1, LANE)
    popped = enc_min < sent_enc
    bkt = enc_min // k_enc
    p_f = jnp.where(popped, enc_min - bkt * k_enc, sent)
    # clear the popped bit: one broadcast compare selects the (word row,
    # bit) per lane; non-popped lanes clear nothing (row compare fails:
    # bkt = nb -> row index >= nw)
    row = bkt * w_n + jnp.clip(p_f, 0, k_enc - 1) // MASK_BITS
    bitm = lax.shift_left(
        jnp.ones((), jnp.int32) + (p_f & 0), jnp.clip(p_f % MASK_BITS, 0, MASK_BITS - 1)
    )
    ws_new = ws & ~jnp.where(riota == row, bitm, 0)
    sel = [popped & (bkt == b) for b in range(nb)]
    p_l = jnp.where(p_f < sent, jnp.where(fwd, p_f, n_pages - 1 - p_f), p_f)
    return p_l, ws_new, sel


def _window_pop_stacked(p_l, ws_old, ws_new, selb, sent, p_pad: int, w_win):
    """Clamp one pop to the round's page window (see GATHER_WINDOW).

    Without windowing (``w_win`` None): accept the pop as-is (base 0).
    With windowing: base anchors at the round's minimum live page
    (128-aligned, clamped inside the table); lanes whose page falls
    outside [base, base+w) DEFER — pre-pop words restored (one
    broadcast where), page to sentinel (gathers exact zeros), sel flags
    cleared (postponing kills is conservative).  The minimum-page lane
    is always inside the window, so every round makes progress."""
    if w_win is None:
        return p_l, ws_new, selb, 0
    live = p_l < sent
    base = jnp.min(jnp.where(live, p_l, jnp.int32(p_pad)))
    base = jnp.maximum(
        jnp.minimum((base // 128) * 128, jnp.int32(p_pad - w_win)), 0
    )
    in_win = live & (p_l < base + w_win)
    p_l = jnp.where(in_win, p_l, sent)
    ws = jnp.where(in_win, ws_new, ws_old)
    selb = [s & in_win for s in selb]
    return p_l, ws, selb, base


def _kill_stacked(ws, kills, w_n: int, nb: int):
    """Zero bucket b's word rows for lanes where kills[b] — one
    broadcast select per bucket over the stacked grid."""
    riota = lax.broadcasted_iota(jnp.int32, (ws.shape[0], 1), 0)
    b_of = riota // w_n
    dead = None
    for b, k_b in enumerate(kills):
        d = (b_of == b) & k_b
        dead = d if dead is None else (dead | d)
    return jnp.where(dead, 0, ws)


def _gather_round(
    gather_args, p_l, o_r, d_r, t_min, best_key_r, t_max_r, excl_r,
    center_fit=None, base=0, w=None,
):
    """One gather round for one sublane row: returns the per-pair winner
    key min-reduced to (1, LANE) plus the popped page's approximate axis
    center and its fit deviation.

    ``center_fit`` (static piecewise-linear segments, see
    PagedBvh.center_fit) evaluates the early-stop center as a handful
    of compile-time-immediate selects plus one fma — the deviation
    rides back so the caller folds it into the kill margin, keeping the
    stop exactly conservative.  Returns (None, None) in their place
    when not provided (the any-hit walk never stops on centers).  The
    valid column (15) is substituted with a constant: invalid slots are
    all-zero rows, already rejected by the |denom| guard in _mt_key
    (see _G_TEST_COLS).  ``gather_args`` = (gt, attrs, cols, limbs_n,
    n_pages) — attr-plane indices plus their column ids (_gather_sel);
    ``[base, base+w)`` the page window for this round."""
    gt, attrs, cols, limbs_n, n_pages = gather_args
    g = _gather_sel(gt, attrs, limbs_n, n_pages, p_l, base=base, w=w)
    pos = {c: i for i, c in enumerate(cols)}

    blk = lambda c: _F(1.0) if c == 15 else g[pos[c]]  # noqa: E731
    k_iota = lax.broadcasted_iota(jnp.int32, (PAGE_TRIS, 1), 0)
    keys = _mt_key(
        blk,
        o_r.x, o_r.y, o_r.z,
        d_r.x, d_r.y, d_r.z,
        t_min,
        _key_upper_t(best_key_r),
        t_max_r,
        excl_r,
        k_iota,
        jnp.int32(_big_key()),
    )
    c_ax, dev = None, None
    if center_fit is not None:
        pf = p_l.astype(jnp.float32)
        last = center_fit[-1]
        a_l = pf * _F(0.0) + _F(last[1])
        b_l = pf * _F(0.0) + _F(last[2])
        dev = pf * _F(0.0) + _F(last[3])
        for p_hi, a_s, b_s, dv_s in reversed(center_fit[:-1]):
            m = p_l <= p_hi
            a_l = jnp.where(m, _F(a_s), a_l)
            b_l = jnp.where(m, _F(b_s), b_l)
            dev = jnp.where(m, _F(dv_s), dev)
        # sentinel lanes (p_l == n_pages) extrapolate the last segment —
        # harmless: their sel flags are False, so the kill never reads it
        c_ax = a_l * pf + b_l
    return jnp.min(keys, axis=0, keepdims=True), c_ax, dev


def _traverse_gather(
    o: V3, d: V3, pack, t_min, state, exclude_obj, t_max, lite, skip=None
):
    """Closest-hit per-lane gather traversal (kernel path)."""
    paged: PagedBvh = pack.paged
    t_min = _F(t_min)
    n_pages = paged.n_pages
    sent = jnp.int32(n_pages)
    smooth = paged.any_smooth

    gt = pack.page_gather  # f32[3*A, P_pad, PAGE_TRIS] limb planes, ref or array
    p_pad = gt.shape[1]
    w_win = _window_for(p_pad)
    cols = _gather_cols(smooth)
    cidx = {c: i for i, c in enumerate(cols)}
    # the obj column (13) is the LAST test block and is only read by the
    # exclude-object compare: without an exclusion the per-round gather
    # statically drops it (13 -> 12 blocks of MXU work per round)
    test_cols = _G_TEST_COLS if exclude_obj is not None else _G_TEST_COLS[:-1]
    test_args = (
        gt,
        tuple(cidx[c] for c in test_cols),
        test_cols,
        TEST_LIMBS,
        n_pages,
    )
    n_res = len(_RES_COLS) if smooth else 6
    res_attrs = tuple(cidx[c] for c in _RES_COLS[:n_res])
    ax = paged.sort_axis
    margin = _F(paged.sort_margin)
    center_fit = _center_fit_of(paged)

    # GROUP_ROWS sublane rows share each gather round: the whole grid
    # flattens ONCE to (rows/G, G*128) — float/int reshapes only; bool
    # results never cross a reshape (Mosaic rejects i1 shape casts) —
    # the one-hot widens to (P, G*128), and the while-loop / pop /
    # matmul overhead amortizes G-fold.  Rounds per group = the max
    # wanted count over G*128 lanes, barely above the per-row max on
    # real content.
    rows = o.x.shape[0]
    gstep = GROUP_ROWS if rows % GROUP_ROWS == 0 else 1
    gl = gstep * o.x.shape[1]
    grows = rows // gstep
    gf = lambda a: a.reshape(grows, gl)  # noqa: E731
    of = V3(gf(o.x), gf(o.y), gf(o.z))
    df = V3(gf(d.x), gf(d.y), gf(d.z))
    inv = V3(_F(1.0) / df.x, _F(1.0) / df.y, _F(1.0) / df.z)
    t_max_f = gf(t_max) if getattr(t_max, "ndim", 0) == 2 else t_max
    excl_f = (
        None
        if exclude_obj is None
        else (
            gf(exclude_obj).astype(jnp.float32)
            if getattr(exclude_obj, "ndim", 0) == 2
            else exclude_obj.astype(jnp.float32)
        )
    )
    best_t_f = gf(state["best_t"])
    o_ax, d_ax = (of.x, of.y, of.z)[ax], (df.x, df.y, df.z)[ax]
    # bool grids cannot cross a Mosaic reshape: flatten skip as i32
    skip_f = None if skip is None else (gf(skip.astype(jnp.int32)) != 0)

    fwd_g = d_ax >= 0  # whole-grid: prepass folds backward lanes' bits
    bwords, splits = _page_prepass_bucketed(
        of, df, inv, paged, t_min, best_t_f, t_max=t_max_f, skip=skip_f,
        fwd=fwd_g,
    )
    best_key0 = (
        lax.bitcast_convert_type(best_t_f + of.x * _F(0.0), jnp.int32)
        | jnp.int32(_KEY_SLOT_MASK)
    )

    w_n = paged.mask_words
    nb = len(bwords)
    key_rows, page_rows, res_rows = [], [], []
    visits = jnp.zeros((), jnp.int32)

    for s in range(grows):
        sl = lambda a: a[s : s + 1, :]  # noqa: E731
        o_r = V3(sl(of.x), sl(of.y), sl(of.z))
        d_r = V3(sl(df.x), sl(df.y), sl(df.z))
        t_max_r = _lane_arg(t_max_f, s)
        excl_r = _lane_arg(excl_f, s)
        fwd_r = sl(d_ax) >= 0
        inv_ax_r = _F(1.0) / sl(d_ax)
        o_ax_r = sl(o_ax)
        splits_r = [sl(sp) for sp in splits]
        ws0 = _stack_words(bwords, s)
        carry0 = (ws0, sl(best_key0), sl(best_key0) * 0 - 1, visits)

        def cond(carry):
            return jnp.max(carry[0]) > 0

        def body(carry):
            ws, bk, bp, vis = carry
            # pop ROUND_POPS pages up front, then gather them with
            # INDEPENDENT matmuls (stale bk as t_upper for all: a stale
            # bound only fails to reject, and the min-merge below fixes
            # the winner) so the MXU can pipeline them
            pops = []
            for _ in range(ROUND_POPS):
                p_l, ws_new, selb = _pop_stacked(ws, sent, fwd_r, n_pages, w_n, nb)
                p_l, ws, selb, base = _window_pop_stacked(
                    p_l, ws, ws_new, selb, sent, p_pad, w_win
                )
                pops.append((p_l, selb, base))
            rounds = []
            for p_l, selb, base in pops:
                page_key, c_ax, dev = _gather_round(
                    test_args, p_l, o_r, d_r, t_min, bk, t_max_r,
                    excl_r, center_fit=center_fit, base=base, w=w_win,
                )
                rounds.append((p_l, selb, page_key, c_ax, dev))
            new_key = bk
            for p_l, _selb, page_key, _c_ax, _dev in rounds:
                prev = new_key
                new_key = jnp.minimum(prev, page_key)
                bp = jnp.where(new_key < prev, p_l, bp)
            ut = _key_upper_t(new_key)
            # exact near-to-far early stop within the popped bucket:
            # every page remaining there (axis-sorted, direction-aware
            # pop) has slab entry >= (c_fit - o)/d - (margin+dev)/|d|
            # (|c_true - c_fit| <= dev by the build's fit residual)
            # exact bucket kill: bucket b's pages all have entry t >=
            # splits[b-1] (by prepass construction)
            kills = []
            for b in range(nb):
                kill = None
                for _p_l, selb, _pk, c_ax, dev in rounds:
                    t_entry = (c_ax - o_ax_r) * inv_ax_r - (
                        margin + dev
                    ) * jnp.abs(inv_ax_r)
                    k_i = (t_entry > ut) & selb[b]
                    kill = k_i if kill is None else (kill | k_i)
                if b >= 1:
                    kill = kill | (splits_r[b - 1] > ut)
                kills.append(kill)
            ws = _kill_stacked(ws, kills, w_n, nb)
            return (ws, new_key, bp, vis + ROUND_POPS)

        out = lax.while_loop(cond, body, carry0)
        bk_r, bp_r, visits = out[1], out[2], out[3]
        key_rows.append(_unflatten_row(bk_r, gstep))
        page_rows.append(_unflatten_row(bp_r, gstep))

        # ---- winner resolve: one gather against the winning page over
        # the resolve attr planes, then a slot one-hot extraction
        # (no-hit lanes have bp_r == -1 and gather exact zeros; all-miss
        # rows skip the resolve loads+matmuls entirely via guard).
        # Full-width (no window): it runs ONCE per row, so its O(P_pad)
        # contraction is off the per-round critical path.
        g_win = _gather_sel(gt, res_attrs, 3, n_pages, bp_r, guard=True)
        slot_r = bk_r & jnp.int32(_KEY_SLOT_MASK)
        k_iota = lax.broadcasted_iota(jnp.int32, (PAGE_TRIS, 1), 0)
        s_onehot = (k_iota == slot_r).astype(jnp.float32)
        res_rows.append(
            [
                _unflatten_row(
                    jnp.sum(s_onehot * g_win[ai], axis=0, keepdims=True),
                    gstep,
                )
                for ai in range(n_res)
            ]
        )

    best_page = jnp.concatenate(page_rows, axis=0)
    hit = best_page >= 0
    acc = [
        jnp.concatenate([r[i] for r in res_rows], axis=0) for i in range(n_res)
    ]
    res = _winner_math(o, d, hit, acc, smooth)
    return _merge_winner_state(pack, state, res, hit, lite), visits


def _occluded_gather(o: V3, d: V3, pack, t_min, t_max, blocked):
    """Any-hit per-lane gather traversal for shadow rays (kernel path)."""
    paged: PagedBvh = pack.paged
    t_min = _F(t_min)
    sent = jnp.int32(paged.n_pages)
    w_n = paged.mask_words

    gt = pack.page_gather  # f32[3*A, P_pad, PAGE_TRIS] limb planes, ref or array
    p_pad = gt.shape[1]
    w_win = _window_for(p_pad)
    cols = _gather_cols(paged.any_smooth)
    cidx = {c: i for i, c in enumerate(cols)}
    # shadow rays never exclude an object: drop the obj test block
    test_cols = _G_TEST_COLS[:-1]
    test_args = (
        gt,
        tuple(cidx[c] for c in test_cols),
        test_cols,
        TEST_LIMBS,
        paged.n_pages,
    )

    # whole-grid flatten to (rows/G, G*128) — see _traverse_gather; the
    # bool ``blocked`` converts to i32 BEFORE the reshape (i1 shape
    # casts are unsupported in Mosaic)
    rows = o.x.shape[0]
    gstep = GROUP_ROWS if rows % GROUP_ROWS == 0 else 1
    gl = gstep * o.x.shape[1]
    grows = rows // gstep
    gf = lambda a: a.reshape(grows, gl)  # noqa: E731
    of = V3(gf(o.x), gf(o.y), gf(o.z))
    df = V3(gf(d.x), gf(d.y), gf(d.z))
    inv = V3(_F(1.0) / df.x, _F(1.0) / df.y, _F(1.0) / df.z)
    t_max_f = gf(t_max) if getattr(t_max, "ndim", 0) == 2 else t_max
    blocked_f = gf(blocked.astype(jnp.int32))

    big_t = of.x * _F(0.0) + _F(_BIG_T)  # desplat (Mosaic layout bug)
    ax = paged.sort_axis
    d_ax = (df.x, df.y, df.z)[ax]
    # bucketed near-to-far popping: a shadow ray usually blocks on the
    # page nearest its origin, so draining near buckets first lets most
    # lanes drop out after one round
    bwords, _splits = _page_prepass_bucketed(
        of, df, inv, paged, t_min, big_t, t_max=t_max_f,
        skip=(blocked_f != 0), fwd=d_ax >= 0,
    )
    key0 = lax.bitcast_convert_type(big_t, jnp.int32) | jnp.int32(_KEY_SLOT_MASK)
    nb = len(bwords)

    blk_rows = []
    for s in range(grows):
        sl = lambda a: a[s : s + 1, :]  # noqa: E731
        o_r = V3(sl(of.x), sl(of.y), sl(of.z))
        d_r = V3(sl(df.x), sl(df.y), sl(df.z))
        t_max_r = _lane_arg(t_max_f, s)
        key0_r = sl(key0)
        fwd_r = sl(d_ax) >= 0
        ws0 = _stack_words(bwords, s)
        blk0 = sl(blocked_f)
        carry0 = (ws0, blk0)

        def cond(carry):
            return jnp.max(carry[0]) > 0

        def body(carry):
            ws, blk = carry
            for _ in range(ROUND_POPS):
                p_l, ws_new, selb = _pop_stacked(
                    ws, sent, fwd_r, paged.n_pages, w_n, nb
                )
                p_l, ws, _selb, base = _window_pop_stacked(
                    p_l, ws, ws_new, selb, sent, p_pad, w_win
                )
                page_key, _c_ax, _dev = _gather_round(
                    test_args, p_l, o_r, d_r, t_min, key0_r,
                    t_max_r, None, base=base, w=w_win,
                )
                blk = blk | (page_key < key0_r).astype(jnp.int32)
            dead = blk != 0
            ws = jnp.where(dead, 0, ws)
            return (ws, blk)

        out = lax.while_loop(cond, body, carry0)
        blk_rows.append(_unflatten_row(out[1], gstep))
    return jnp.concatenate(blk_rows, axis=0) != 0
