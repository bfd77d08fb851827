"""Vectorized ray-primitive intersection.

The reference intersects with a *linear scan over all objects* keeping the
closest hit (shader ``hitWorld`` gpu.go:708-740, CPU renderer.go:293-302).
On TPU the scan is unrolled over the (compile-time static) object list:
each object contributes a handful of fused element-wise VPU ops on ``[N]``
lane vectors and a running-min select.  This emits only the primitive test
each object actually needs (types are static scene topology), materializes
no ``[N, M]`` intermediates, and requires zero runtime gathers — the
winning object's position/size/type/material ride along as select chains.
With reference-scale scenes (<= 44 objects) the whole sweep is one fused
VPU kernel.  A Pallas tiled variant and a BVH are the designated scale-out
path for much larger scenes (SURVEY.md §7 steps 7/8).

Epsilon set follows the GPU shader (SURVEY.md §7 hard-part 3):
sphere disc reject 1e-8 (gpu.go:529), plane denom 1e-6 (gpu.go:546),
box-face epsilon 1e-4 (gpu.go:630), t_min 0.001.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..soa import OBJ_BOX, OBJ_PLANE, OBJ_SPHERE, ScenePack

__all__ = [
    "Hit",
    "intersect_world",
    "occluded",
    "box_exit_t",
    "sphere_exit_t",
    "BIG_T",
]

BIG_T = jnp.float32(1e20)
_F = jnp.float32


class Hit(NamedTuple):
    """Closest-hit record for a batch of lanes (shader Hit struct gpu.go:465-472).

    Carries the winning object's geometry so shading never gathers from the
    object table.
    """

    hit: jnp.ndarray  # bool[N]
    t: jnp.ndarray  # f32[N] (BIG_T when miss)
    p: jnp.ndarray  # f32[N,3]
    normal: jnp.ndarray  # f32[N,3] (flipped toward the ray origin side)
    front_face: jnp.ndarray  # bool[N]
    obj_idx: jnp.ndarray  # i32[N]
    mat_idx: jnp.ndarray  # i32[N]
    obj_type: jnp.ndarray  # i32[N]
    obj_pos: jnp.ndarray  # f32[N,3]
    obj_size: jnp.ndarray  # f32[N,3]


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _object_candidates(orig, dirv, pack: ScenePack, t_min):
    """Yield per-object candidate hit distances as a generator of
    (m, typ, center_scalars, size_scalars, t[N], ok[N]).

    Shared by the closest-hit and any-hit sweeps.  Per-object constants are
    traced scalars sliced from the object table; all lane math is on [N]
    component vectors.
    """
    ox, oy, oz = orig[:, 0], orig[:, 1], orig[:, 2]
    dx, dy, dz = dirv[:, 0], dirv[:, 1], dirv[:, 2]
    a = dx * dx + dy * dy + dz * dz
    inv_a = _F(1.0) / a
    inv_dx = _F(1.0) / dx  # IEEE inf on zero components, like GLSL
    inv_dy = _F(1.0) / dy
    inv_dz = _F(1.0) / dz

    for m in range(pack.n_objects):
        typ = pack.obj_types[m]
        cx, cy, cz = pack.obj[m, 4], pack.obj[m, 5], pack.obj[m, 6]
        sx, sy, sz = pack.obj[m, 8], pack.obj[m, 9], pack.obj[m, 10]

        if typ == OBJ_SPHERE:
            # quadratic, near root preferred (gpu.go:522-542)
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            half_b = ocx * dx + ocy * dy + ocz * dz
            c = ocx * ocx + ocy * ocy + ocz * ocz - sx * sx
            disc = half_b * half_b - a * c
            ok = disc >= _F(1e-8)  # disc < 1e-8 rejected (gpu.go:529)
            sqrt_d = jnp.sqrt(jnp.maximum(disc, _F(0)))
            root_near = (-half_b - sqrt_d) * inv_a
            root_far = (-half_b + sqrt_d) * inv_a
            t = jnp.where(root_near >= t_min, root_near, root_far)
            ok = ok & (t >= t_min)
        elif typ == OBJ_PLANE:
            # fixed +Y normal (gpu.go:544-553, objects.go:252)
            ok = jnp.abs(dy) >= _F(1e-6)
            t = (cy - oy) * inv_dy
            ok = ok & (t >= t_min)
        else:  # OBJ_BOX: slab test, entry t0 (gpu.go:587-647)
            hx, hy, hz = sx * _F(0.5), sy * _F(0.5), sz * _F(0.5)
            n1x = (cx - hx - ox) * inv_dx
            n2x = (cx + hx - ox) * inv_dx
            n1y = (cy - hy - oy) * inv_dy
            n2y = (cy + hy - oy) * inv_dy
            n1z = (cz - hz - oz) * inv_dz
            n2z = (cz + hz - oz) * inv_dz
            t0 = jnp.maximum(
                jnp.maximum(jnp.minimum(n1x, n2x), jnp.minimum(n1y, n2y)),
                jnp.maximum(jnp.minimum(n1z, n2z), t_min),
            )
            t1 = jnp.minimum(
                jnp.minimum(jnp.maximum(n1x, n2x), jnp.maximum(n1y, n2y)),
                jnp.maximum(n1z, n2z),
            )
            ok = t1 > t0
            t = t0
        yield m, typ, (cx, cy, cz), (sx, sy, sz), t, ok


def intersect_world(
    orig,
    dirv,
    pack: ScenePack,
    t_min=_F(0.001),
    t_max=None,
    exclude_obj: Optional[jnp.ndarray] = None,
) -> Hit:
    """Closest hit over all objects (shader hitWorld / bounce-loop scan).

    ``exclude_obj``: i32[N] per-lane object index to skip (-1 = none) —
    the bounce loop's current-glass-object exclusion (gpu.go:1353-1357).
    """
    n = orig.shape[0]
    t_min = _F(t_min)
    zeros = jnp.zeros((n,), jnp.float32)
    best_t = jnp.full((n,), BIG_T)
    best_m = jnp.zeros((n,), jnp.int32)
    best_type = jnp.zeros((n,), jnp.int32)
    best_mat = jnp.zeros((n,), jnp.int32)
    b_cx = zeros
    b_cy = zeros
    b_cz = zeros
    b_sx = zeros
    b_sy = zeros
    b_sz = zeros

    for m, typ, (cx, cy, cz), (sx, sy, sz), t, ok in _object_candidates(
        orig, dirv, pack, t_min
    ):
        if exclude_obj is not None:
            ok = ok & (exclude_obj != m)
        if t_max is not None:
            ok = ok & (t <= t_max)
        better = ok & (t < best_t)
        best_t = jnp.where(better, t, best_t)
        best_m = jnp.where(better, m, best_m)
        best_type = jnp.where(better, typ, best_type)
        best_mat = jnp.where(better, pack.obj_mats[m], best_mat)
        b_cx = jnp.where(better, cx, b_cx)
        b_cy = jnp.where(better, cy, b_cy)
        b_cz = jnp.where(better, cz, b_cz)
        b_sx = jnp.where(better, sx, b_sx)
        b_sy = jnp.where(better, sy, b_sy)
        b_sz = jnp.where(better, sz, b_sz)

    hit = best_t < BIG_T
    t_safe = jnp.where(hit, best_t, _F(0))
    p = orig + dirv * t_safe[:, None]
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]

    is_sphere = best_type == OBJ_SPHERE
    is_plane = best_type == OBJ_PLANE

    # outward normal per primitive type, component-wise
    inv_r = _F(1.0) / jnp.where(b_sx != 0, b_sx, _F(1.0))
    nsx = (px - b_cx) * inv_r
    nsy = (py - b_cy) * inv_r
    nsz = (pz - b_cz) * inv_r

    # box: nearest-face chain with eps 1e-4, order x -> y -> z (gpu.go:629-638)
    hx, hy, hz = b_sx * _F(0.5), b_sy * _F(0.5), b_sz * _F(0.5)
    lx, ly, lz = px - b_cx, py - b_cy, pz - b_cz
    eps = _F(1e-4)
    on_x = jnp.abs(jnp.abs(lx) - hx) < eps
    on_y = jnp.abs(jnp.abs(ly) - hy) < eps
    zero = jnp.zeros_like(lx)
    nbx = jnp.where(on_x, jnp.sign(lx), zero)
    nby = jnp.where(~on_x & on_y, jnp.sign(ly), zero)
    nbz = jnp.where(~on_x & ~on_y, jnp.sign(lz), zero)

    nx = jnp.where(is_sphere, nsx, jnp.where(is_plane, zero, nbx))
    ny = jnp.where(is_sphere, nsy, jnp.where(is_plane, jnp.ones_like(lx), nby))
    nz = jnp.where(is_sphere, nsz, jnp.where(is_plane, zero, nbz))

    # setFaceNormal (gpu.go:484-487)
    front_face = (dirv[:, 0] * nx + dirv[:, 1] * ny + dirv[:, 2] * nz) < 0
    sgn = jnp.where(front_face, _F(1.0), _F(-1.0))
    normal = jnp.stack([nx * sgn, ny * sgn, nz * sgn], axis=-1)

    zero_i = jnp.zeros_like(best_m)
    return Hit(
        hit=hit,
        t=jnp.where(hit, best_t, BIG_T),
        p=p,
        normal=normal,
        front_face=front_face,
        obj_idx=jnp.where(hit, best_m, zero_i),
        mat_idx=jnp.where(hit, best_mat, zero_i),
        obj_type=jnp.where(hit, best_type, zero_i),
        obj_pos=jnp.stack([b_cx, b_cy, b_cz], axis=-1),
        obj_size=jnp.stack([b_sx, b_sy, b_sz], axis=-1),
    )


def occluded(orig, dirv, pack: ScenePack, t_min, t_max):
    """Any-hit test for shadow rays (hitWorld with tMax = dist - 0.002).

    t_max: f32[N].  Returns bool[N].
    """
    blocked = jnp.zeros(orig.shape[:1], dtype=bool)
    for _m, _typ, _c, _s, t, ok in _object_candidates(orig, dirv, pack, _F(t_min)):
        blocked = blocked | (ok & (t <= t_max))
    return blocked


def box_exit_t(orig, dirv, bmin, bmax, t_min=_F(0.001)):
    """Slab-test exit distance t1 (hitBox with findExit=true, gpu.go:1559-1564).

    All args f32[N,3] (bmin/bmax per-lane).  Returns (valid bool[N], t1 f32[N]).
    """
    inv_d = _F(1.0) / dirv
    t_near = (bmin - orig) * inv_d
    t_far = (bmax - orig) * inv_d
    t_lo = jnp.minimum(t_near, t_far)
    t_hi = jnp.maximum(t_near, t_far)
    t0 = jnp.maximum(jnp.max(t_lo, axis=-1), _F(t_min))
    t1 = jnp.min(t_hi, axis=-1)
    valid = (t1 > t0) & (t1 >= _F(t_min))
    return valid, t1


def sphere_exit_t(orig, dirv, center, radius, t_min=_F(0.001)):
    """Far-root distance out of a sphere (gpu.go:1566-1591).

    ``dirv`` must be unit length (the shader assumes a == 1).
    Returns (valid bool[N], exit_t f32[N]).
    """
    oc = orig - center
    half_b = _dot(oc, dirv)
    c = _dot(oc, oc) - radius * radius
    disc = half_b * half_b - c
    ok = disc > 0
    sqrt_d = jnp.sqrt(jnp.maximum(disc, _F(0)))
    exit_t = -half_b + sqrt_d  # max of the two roots
    valid = ok & (exit_t > _F(t_min))
    return valid, exit_t
