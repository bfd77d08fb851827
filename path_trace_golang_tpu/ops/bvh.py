"""Triangle meshes + BVH: the framework's north-star extension.

The reference supports only sphere / plane / box primitives (SURVEY.md
top-fact 4); BASELINE.json's north star asks for triangle meshes behind a
BVH.  Design for SPMD lanes:

* **Host build** — a median-split BVH over triangle centroids (NumPy),
  flattened in DFS order with *escape links*: topology (leaf ranges, miss
  indices) is static Python metadata, node bounds are a traced f32[B,6]
  table.
* **Lockstep traversal** — lanes cannot take divergent tree paths without
  per-step gathers (slow on TPU), so traversal walks the DFS order with a
  per-lane monotone ``skip`` cursor: a lane that misses an internal
  node's bbox jumps its cursor to the node's escape index and ignores the
  whole subtree; leaf triangle tests (Möller–Trumbore on traced scalar
  vertices) run masked.  Every step is fused element-wise VPU math with
  zero gathers — the BVH prunes the expensive triangle tests while bbox
  tests stay O(nodes), the right trade at TPU lane widths for meshes up
  to a few thousand triangles.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .vec import V3

__all__ = ["BvhTopology", "build_bvh", "traverse_triangles", "OBJ_TRIANGLE", "LEAF_SIZE"]

OBJ_TRIANGLE = 3  # extends the reference's OBJ_* codes (gpu.go:435-437)
LEAF_SIZE = 4
_F = jnp.float32


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
                # geometric normal = normalize(e1 x e2) (traced scalars)
                gnx = e1y * e2z - e1z * e2y
                gny = e1z * e2x - e1x * e2z
                gnz = e1x * e2y - e1y * e2x
                glen = jnp.sqrt(jnp.maximum(gnx * gnx + gny * gny + gnz * gnz, _F(1e-30)))
                nx, ny, nz = gnx / glen, gny / glen, gnz / glen

                orig_tri = topo.order[bvh_i]
                tri_obj_idx = pack.n_objects + orig_tri
                if exclude_obj is not None:
                    ok = ok & (exclude_obj != tri_obj_idx)
                update_fn(tri_obj_idx, orig_tri, t, ok, (nx, ny, nz))
        else:
            # internal node: lanes missing the bbox skip the whole subtree
            skip = jnp.where(active & ~box_hit, jnp.int32(topo.miss[n]), skip)
