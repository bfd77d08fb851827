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
* **Hybrid dynamic packet walk** (``traverse_triangles_dynamic``, large
  meshes) — topology lives in tables (VMEM refs inside Pallas kernels);
  a ``lax.while_loop`` drives a **global scalar cursor with per-lane
  next-node cursors**: each step processes the minimum wanted node over
  the packet, lanes that miss a subtree jump their cursor past it, and
  the global cursor jumps to ``min(per-lane cursors)`` — whole subtrees
  that no lane wants are never visited, making node visits sublinear for
  coherent packets (camera/shadow rays) instead of the unrolled walk's
  O(nodes).  All per-node reads are scalar (node index is the scalar
  cursor), so there are still ZERO per-lane gathers.  Divergent packets
  whose jump rate falls behind a lockstep frontier switch to a fori tail
  that sweeps the remaining DFS range with no scalar syncs — bounding
  the worst case (the jump sync is the dominant per-visit cost, PERF.md).
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
    "build_bvh",
    "traverse_triangles",
    "traverse_triangles_dynamic",
    "occluded_triangles_dynamic",
    "use_dynamic_walk",
    "OBJ_TRIANGLE",
    "LEAF_SIZE",
    "STATIC_TRI_MAX",
]

OBJ_TRIANGLE = 3  # extends the reference's OBJ_* codes (gpu.go:435-437)
LEAF_SIZE = 4
# Hybrid-walk jump-phase exit rule.  A global-jump iteration pays a
# vector->scalar sync for the min-over-lanes cursor (~24us on the XLA
# path, ~1us inside a Pallas kernel where Mosaic loops are cheap) vs a
# far cheaper lockstep node step, so jumping pays only while it skips
# enough nodes per visit.  The jump phase continues while the cursor
# stays ahead of a min-rate-nodes-per-visit frontier (after a grace
# period covering the initial root descent); packets that fall behind
# are divergent, and a lockstep fori tail sweeps their remaining DFS
# range with no scalar syncs, bounding the worst case (PERF.md round 3).
# Coherent packets (measured ~45 nodes skipped per visit on the 8k-node
# benchmark tree) never hit the XLA gate and keep sublinear visits.
JUMP_MIN_RATE = 32
JUMP_GRACE = 64
JUMP_MIN_RATE_KERNEL = 4
JUMP_GRACE_KERNEL = 512

# Above this triangle count the unrolled walk's instruction budget (and
# Pallas compile time) stops paying for itself; the dynamic packet walk
# takes over.  PATHTRACER_BVH_DYNAMIC=1 forces the dynamic walk (tests).
STATIC_TRI_MAX = 128
_F = jnp.float32


def _jump_gate(table):
    """(min_rate, grace) for the hybrid walk, by execution context."""
    aval = getattr(table, "aval", None)
    if aval is not None and "Ref" in type(aval).__name__:
        return JUMP_MIN_RATE_KERNEL, JUMP_GRACE_KERNEL
    return JUMP_MIN_RATE, JUMP_GRACE


def use_dynamic_walk(n_triangles: int) -> bool:
    if os.environ.get("PATHTRACER_BVH_DYNAMIC", "") in ("1", "true", "on"):
        return True
    return n_triangles > STATIC_TRI_MAX


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
# Dynamic packet traversal (large meshes; Pallas-eligible via SMEM tables)
# ---------------------------------------------------------------------------

def _lane_zero_i32(ref):
    """Concrete-layout i32 zeros derived from a lane grid (the Mosaic
    splat-carry workaround — see integrator.pass_regen_gpu)."""
    return (ref * _F(0.0)).astype(jnp.int32)


def _is_smem_ref(table):
    """True when ``table`` is a Pallas SMEM ref (scalar loads only)."""
    aval = getattr(table, "aval", None)
    if aval is None or "Ref" not in type(aval).__name__:
        return False
    return "smem" in str(getattr(aval, "memory_space", "")).lower()


def _row_reader(table, idx):
    """Column accessor for row ``idx`` at a traced scalar index.

    SMEM refs only support scalar loads, so each column is its own fetch
    (cheap there); XLA arrays and VMEM refs fetch the row once (scalar
    fetches are ~us-latency on those paths) and index it for free."""
    if _is_smem_ref(table):
        return lambda c: table[idx, c]
    aval = getattr(table, "aval", None)
    if aval is not None and "Ref" in type(aval).__name__:
        row = table[idx]
    else:
        row = lax.dynamic_slice(
            table, (idx, jnp.int32(0)), (1, table.shape[1])
        )[0]
    return lambda c: row[c]


def _leaf_readers(tri, first):
    """LEAF_SIZE row accessors for the leaf starting at ``first``.

    The tri table is padded by LEAF_SIZE rows, so reads stay in bounds
    for the last leaf.  Non-SMEM paths fetch the whole 4-row block with
    ONE dynamic slice (the fetch latency dominates those walks)."""
    if _is_smem_ref(tri):
        return [_row_reader(tri, first + k) for k in range(LEAF_SIZE)]
    from_ref = getattr(tri, "aval", None) is not None and "Ref" in type(tri.aval).__name__
    if from_ref:
        from jax.experimental import pallas as pl

        blk = tri[pl.ds(first, LEAF_SIZE)]
    else:
        blk = lax.dynamic_slice(
            tri, (first, jnp.int32(0)), (LEAF_SIZE, tri.shape[1])
        )
    return [(lambda c, k=k: blk[k, c]) for k in range(LEAF_SIZE)]


def traverse_triangles_dynamic(
    o: V3, d: V3, pack, t_min, state, exclude_obj=None, t_max=None, lite: bool = False
):
    """Packet BVH walk over topology TABLES (pack.bvh_nodes / tri),
    updating the intersect_world winner chain dict in-place-style
    (returns the new dict plus the node-visit count).

    Hybrid traversal (PERF.md round 3).  Jump phase: per step, one
    scalar node fetch, one slab test for the packet, LEAF_SIZE masked
    Möller–Trumbore tests when the node is a leaf, and a global jump to
    the packet's minimum next-node cursor — visits are sublinear in
    nodes whenever the packet's rays agree on missing subtrees, but each
    step pays a ~24us vector->scalar sync for the jump.  Packets still
    walking after MAX_JUMP_VISITS steps are divergent; a lockstep fori
    tail then sweeps the remaining DFS range with the induction variable
    as the node index (no scalar syncs, ~0.5us/node), bounding the worst
    case.

    The while carry holds only the SLIM winner record — (best_t,
    best_type, best_mat, best_m, geometric normal), 8 lane grids — not
    the 30-grid full material chain (compile time scales with the carry),
    and the material constants are recoverable after the
    walk by one static unrolled select over the material table (same
    zero-gather trick as the object sweep; the walk's winner material
    INDEX rides the carry).  Returns (state, visits_i32_scalar).
    """
    nodes = pack.bvh_nodes
    bounds = pack.bvh_bounds
    tri = pack.tri
    mat = pack.mat
    n_nodes = pack.bvh.n_nodes if pack.bvh is not None else 0
    if n_nodes == 0:
        return state, jnp.zeros((), jnp.int32)

    inv_dx = _F(1.0) / d.x
    inv_dy = _F(1.0) / d.y
    inv_dz = _F(1.0) / d.z

    zero_f = o.x * _F(0.0)
    zero_i = _lane_zero_i32(o.x)
    slim0 = (
        state["best_t"] + zero_f,  # desplat (Mosaic replicated-layout bug)
        state["best_type"] + zero_i,
        zero_i,  # best_mat (triangle winners only; resolved post-walk)
        zero_i,  # best_m (global object index of the winning triangle)
        zero_f,  # nx
        zero_f,  # ny
        zero_f,  # nz
    )
    carry0 = (
        jnp.zeros((), jnp.int32),  # global cursor
        jnp.zeros((), jnp.int32),  # visit count
        zero_i,  # per-lane next-node cursor
    ) + slim0

    jump_rate, jump_grace = _jump_gate(tri)

    def cond(carry):
        n, visits = carry[0], carry[1]
        ahead = (visits < jump_grace) | (n >= visits * jump_rate)
        return (n < n_nodes) & ahead

    def _walk_step(n, c, slim):
        best_t, best_type, best_mat, best_m, nx, ny, nz = slim
        node = _row_reader(nodes, n)
        miss_n = node(0)
        first = node(1)
        count = node(2)
        bb = _row_reader(bounds, n)

        active = c == n
        t1x = (bb(0) - o.x) * inv_dx
        t2x = (bb(3) - o.x) * inv_dx
        t1y = (bb(1) - o.y) * inv_dy
        t2y = (bb(4) - o.y) * inv_dy
        t1z = (bb(2) - o.z) * inv_dz
        t2z = (bb(5) - o.z) * inv_dz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        box_hit = active & (t1 >= t0) & (t1 >= t_min) & (t0 < best_t)

        # leaf: LEAF_SIZE masked Möller–Trumbore tests (count <= LEAF_SIZE);
        # ONE dynamic slice fetches the whole leaf block (geometry +
        # material/object indices ride the padded 12-float rows)
        is_leaf = count > 0
        readers = _leaf_readers(tri, jnp.where(is_leaf, first, 0))
        for k in range(LEAF_SIZE):
            in_leaf = is_leaf & (k < count)
            trow = readers[k]
            v0x, v0y, v0z = trow(0), trow(1), trow(2)
            e1x, e1y, e1z = trow(3), trow(4), trow(5)
            e2x, e2y, e2z = trow(6), trow(7), trow(8)

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
                & box_hit
                & in_leaf
                & (u >= 0)
                & (u <= 1)
                & (v >= 0)
                & (u + v <= 1)
                & (t >= t_min)
            )
            if t_max is not None:
                ok = ok & (t <= t_max)
            obj_idx = trow(10).astype(jnp.int32)
            if exclude_obj is not None:
                ok = ok & (exclude_obj != obj_idx)
            better = ok & (t < best_t)

            # geometric normal = normalize(e1 x e2) (traced scalars)
            gnx = e1y * e2z - e1z * e2y
            gny = e1z * e2x - e1x * e2z
            gnz = e1x * e2y - e1y * e2x
            glen = jnp.sqrt(jnp.maximum(gnx * gnx + gny * gny + gnz * gnz, _F(1e-30)))
            cnx, cny, cnz = gnx / glen, gny / glen, gnz / glen
            # smooth shading (row flag col 11): interpolate vertex normals
            # (cols 12-20) by the hit barycentrics
            smooth = trow(11) > _F(0.5)
            w0 = _F(1.0) - u - v
            sx = w0 * trow(12) + u * trow(15) + v * trow(18)
            sy = w0 * trow(13) + u * trow(16) + v * trow(19)
            sz = w0 * trow(14) + u * trow(17) + v * trow(20)
            slen = jnp.sqrt(jnp.maximum(sx * sx + sy * sy + sz * sz, _F(1e-30)))
            cnx = jnp.where(smooth, sx / slen, cnx)
            cny = jnp.where(smooth, sy / slen, cny)
            cnz = jnp.where(smooth, sz / slen, cnz)

            sel = lambda a, b: jnp.where(better, a, b)  # noqa: E731
            best_t = sel(t, best_t)
            best_type = sel(OBJ_TRIANGLE, best_type)
            best_mat = sel(trow(9).astype(jnp.int32), best_mat)
            best_m = sel(obj_idx, best_m)
            nx = sel(cnx, nx)
            ny = sel(cny, ny)
            nz = sel(cnz, nz)

        # cursor update: hit internal -> descend (n+1); anything else ->
        # escape (miss_n; for a leaf miss_n == n+1 by the DFS invariant)
        c = jnp.where(active, jnp.where(box_hit & ~is_leaf, n + 1, miss_n), c)
        return c, (best_t, best_type, best_mat, best_m, nx, ny, nz)

    def body(carry):
        n, visits, c = carry[0], carry[1], carry[2]
        c, slim = _walk_step(n, c, carry[3:])
        # global jump: the packet's next wanted node (done lanes sit at B)
        return (jnp.min(c), visits + 1, c) + tuple(slim)

    out = lax.while_loop(cond, body, carry0)

    # Divergent packets exhaust the jump budget; the lockstep tail sweeps
    # the remaining DFS range with the SAME step body, the induction
    # variable as the node index, and zero vector->scalar syncs.
    def tail_body(i, carry):
        c, slim = carry[0], carry[1:]
        c, slim = _walk_step(i, c, slim)
        return (c,) + tuple(slim)

    n_start = out[0]
    tail = lax.fori_loop(n_start, n_nodes, tail_body, (out[2],) + tuple(out[3:]))
    visits = out[1] + jnp.maximum(n_nodes - n_start, 0)
    best_t, best_type, best_mat, best_m, nx, ny, nz = tail[1:]

    # --- post-walk material resolution (zero gathers) ---------------------
    # Lanes the walk improved carry a triangle winner whose material
    # constants are selected here by one static unroll over the material
    # table; all other winner-chain fields pass through untouched.
    improved = best_type == OBJ_TRIANGLE
    st = dict(state)
    st["best_t"] = jnp.where(improved, best_t, state["best_t"])
    st["best_type"] = jnp.where(improved, best_type, state["best_type"])
    st["nx"] = jnp.where(improved, nx, state["nx"])
    st["ny"] = jnp.where(improved, ny, state["ny"])
    st["nz"] = jnp.where(improved, nz, state["nz"])
    if not lite:
        st["best_m"] = jnp.where(improved, best_m, state["best_m"])
        st["best_mat"] = jnp.where(improved, best_mat, state["best_mat"])

    n_mats = pack.n_materials
    for mi in range(n_mats):
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


def occluded_triangles_dynamic(o: V3, d: V3, pack, t_min, t_max, blocked):
    """Any-hit packet walk for shadow rays: same cursor scheme, boolean
    result only; lanes already blocked want no more nodes."""
    nodes = pack.bvh_nodes
    bounds = pack.bvh_bounds
    tri = pack.tri
    n_nodes = pack.bvh.n_nodes if pack.bvh is not None else 0
    if n_nodes == 0:
        return blocked

    inv_dx = _F(1.0) / d.x
    inv_dy = _F(1.0) / d.y
    inv_dz = _F(1.0) / d.z

    cursor0 = _lane_zero_i32(o.x)
    # blocked rides the carry as i32: Mosaic cannot legalize i1 vectors in
    # scf.while carries; the +cursor0 keeps the init un-splat
    carry0 = (
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),  # jump-phase visit count
        cursor0,
        blocked.astype(jnp.int32) + cursor0,
    )

    jump_rate, jump_grace = _jump_gate(tri)

    def cond(carry):
        n, visits = carry[0], carry[1]
        ahead = (visits < jump_grace) | (n >= visits * jump_rate)
        return (n < n_nodes) & ahead

    def body(carry):
        n, visits, c, blocked_i = carry
        c, blocked = _walk_step(n, c, blocked_i > 0)
        return (jnp.min(c), visits + 1, c, blocked.astype(jnp.int32))

    def _walk_step(n, c, blocked):
        node = _row_reader(nodes, n)
        miss_n = node(0)
        first = node(1)
        count = node(2)
        bb = _row_reader(bounds, n)

        active = (c == n) & ~blocked
        t1x = (bb(0) - o.x) * inv_dx
        t2x = (bb(3) - o.x) * inv_dx
        t1y = (bb(1) - o.y) * inv_dy
        t2y = (bb(4) - o.y) * inv_dy
        t1z = (bb(2) - o.z) * inv_dz
        t2z = (bb(5) - o.z) * inv_dz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        box_hit = active & (t1 >= t0) & (t1 >= t_min) & (t0 <= t_max)

        is_leaf = count > 0
        readers = _leaf_readers(tri, jnp.where(is_leaf, first, 0))
        for k in range(LEAF_SIZE):
            in_leaf = is_leaf & (k < count)
            trow = readers[k]
            v0x, v0y, v0z = trow(0), trow(1), trow(2)
            e1x, e1y, e1z = trow(3), trow(4), trow(5)
            e2x, e2y, e2z = trow(6), trow(7), trow(8)
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
                & box_hit
                & in_leaf
                & (u >= 0)
                & (u <= 1)
                & (v >= 0)
                & (u + v <= 1)
                & (t >= t_min)
                & (t <= t_max)
            )
            blocked = blocked | hit

        c = jnp.where(active, jnp.where(box_hit & ~is_leaf, n + 1, miss_n), c)
        c = jnp.where(blocked, jnp.int32(n_nodes), c)  # blocked lanes are done
        return c, blocked

    out = lax.while_loop(cond, body, carry0)

    # lockstep tail for divergent packets (see traverse_triangles_dynamic)
    def tail_body(i, carry):
        c, blocked_i = carry
        c, blocked = _walk_step(i, c, blocked_i > 0)
        return (c, blocked.astype(jnp.int32))

    tail = lax.fori_loop(out[0], n_nodes, tail_body, (out[2], out[3]))
    return tail[1] > 0
