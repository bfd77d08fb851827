"""Vectorized ray-primitive intersection.

The reference intersects with a *linear scan over all objects* keeping the
closest hit (shader ``hitWorld`` gpu.go:708-740, CPU renderer.go:293-302).
On TPU the scan becomes a broadcast over an object axis and a masked
min-reduce: every lane tests every object as [N, M] element-wise VPU math
and takes an argmin.  With reference-scale scenes (<= 44 objects) this is
bandwidth-friendly and fully fuses under XLA; a Pallas tiled variant and a
BVH are the designated scale-out path (SURVEY.md §7 step 7/8).

Epsilon set follows the GPU shader (SURVEY.md §7 hard-part 3):
sphere disc reject 1e-8 (gpu.go:529), plane denom 1e-6 (gpu.go:546),
box-face epsilon 1e-4 (gpu.go:630), t_min 0.001.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..soa import OBJ_BOX, OBJ_PLANE, OBJ_SPHERE, ScenePack

__all__ = ["Hit", "intersect_world", "occluded", "box_exit_t", "sphere_exit_t", "BIG_T"]

BIG_T = jnp.float32(1e20)
_F = jnp.float32


class Hit(NamedTuple):
    """Closest-hit record for a batch of lanes (shader Hit struct gpu.go:465-472)."""

    hit: jnp.ndarray  # bool[N]    — anything hit
    t: jnp.ndarray  # f32[N]     — distance (BIG_T when miss)
    p: jnp.ndarray  # f32[N,3]   — hit point
    normal: jnp.ndarray  # f32[N,3]   — faceted normal (flipped toward the ray origin side)
    front_face: jnp.ndarray  # bool[N]
    obj_idx: jnp.ndarray  # i32[N]     — object index (0 when miss)
    mat_idx: jnp.ndarray  # i32[N]     — material index (0 when miss)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _candidate_t(orig, dirv, pack: ScenePack, t_min):
    """Per-(lane, object) candidate hit distance; BIG_T where invalid.

    orig/dirv: f32[N,3].  Returns f32[N,M].
    """
    pos = pack.obj_pos  # [M,3]
    size = pack.obj_size  # [M,3]
    otype = pack.obj_type  # [M]

    oc = orig[:, None, :] - pos[None, :, :]  # [N,M,3]
    d = dirv[:, None, :]  # [N,1,3]

    # --- sphere (gpu.go:522-542): quadratic, near root preferred ---
    radius = size[None, :, 0]  # [1,M]
    a = _dot(dirv, dirv)[:, None]  # [N,1]
    half_b = jnp.sum(oc * d, axis=-1)  # [N,M]
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = half_b * half_b - a * c
    sphere_ok = disc >= _F(1e-8)  # disc < 1e-8 rejected (gpu.go:529)
    sqrt_d = jnp.sqrt(jnp.maximum(disc, _F(0)))
    inv_a = _F(1.0) / a
    root_near = (-half_b - sqrt_d) * inv_a
    root_far = (-half_b + sqrt_d) * inv_a
    near_ok = root_near >= t_min
    t_sphere = jnp.where(near_ok, root_near, root_far)
    t_sphere_ok = sphere_ok & (t_sphere >= t_min)

    # --- plane (gpu.go:544-553): fixed +Y normal (objects.go:252) ---
    denom = d[:, :, 1]  # dot((0,1,0), dir), broadcast [N,1] -> [N,M]
    plane_ok = jnp.abs(denom) >= _F(1e-6)
    t_plane = (pos[None, :, 1] - orig[:, None, 1]) / jnp.where(plane_ok, denom, _F(1))
    t_plane_ok = plane_ok & (t_plane >= t_min)

    # --- box (gpu.go:587-647): slab test, entry t0 ---
    half = size[None, :, :] * _F(0.5)
    bmin = pos[None, :, :] - half
    bmax = pos[None, :, :] + half
    inv_d = _F(1.0) / d  # IEEE inf on zero components, like GLSL
    t_near = (bmin - orig[:, None, :]) * inv_d
    t_far = (bmax - orig[:, None, :]) * inv_d
    t_lo = jnp.minimum(t_near, t_far)
    t_hi = jnp.maximum(t_near, t_far)
    t0 = jnp.maximum(jnp.max(t_lo, axis=-1), t_min)  # slab entry, clamped at tMin
    t1 = jnp.min(t_hi, axis=-1)
    box_ok = t1 > t0
    # shader: h.t = t0 then rejects t0 outside [tMin, tMax]; t0 is already
    # >= tMin by construction (t0 starts at tMin, gpu.go:588), so only the
    # t1 > t0 test matters for entry hits.
    t_box = t0
    t_box_ok = box_ok

    is_sphere = (otype == OBJ_SPHERE)[None, :]
    is_plane = (otype == OBJ_PLANE)[None, :]
    is_box = (otype == OBJ_BOX)[None, :]

    t = jnp.where(
        is_sphere & t_sphere_ok,
        t_sphere,
        jnp.where(is_plane & t_plane_ok, t_plane, jnp.where(is_box & t_box_ok, t_box, BIG_T)),
    )
    return t


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
    m = pack.obj.shape[0]
    t_min = _F(t_min)
    t = _candidate_t(orig, dirv, pack, t_min)  # [N,M]

    if exclude_obj is not None:
        obj_ids = jnp.arange(m, dtype=jnp.int32)[None, :]
        t = jnp.where(obj_ids == exclude_obj[:, None], BIG_T, t)
    if t_max is not None:
        t = jnp.where(t <= t_max[:, None] if jnp.ndim(t_max) == 1 else t <= t_max, t, BIG_T)

    idx = jnp.argmin(t, axis=-1).astype(jnp.int32)  # [N]
    t_hit = jnp.take_along_axis(t, idx[:, None], axis=-1)[:, 0]
    hit = t_hit < BIG_T

    # Gather the winning object's data and rebuild the hit record.
    pos = pack.obj_pos[idx]  # [N,3]
    size = pack.obj_size[idx]
    otype = pack.obj_type[idx]
    mat_idx = pack.obj_mat[idx]

    t_safe = jnp.where(hit, t_hit, _F(0))
    p = orig + dirv * t_safe[:, None]

    # outward normal per primitive type
    radius = size[:, 0]
    n_sphere = (p - pos) / jnp.where(radius[:, None] != 0, radius[:, None], _F(1))
    n_plane = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], dtype=jnp.float32), (n, 3))
    # box: nearest-face chain with eps 1e-4, order x -> y -> z (gpu.go:629-638)
    half = size * _F(0.5)
    local = p - pos
    abs_local = jnp.abs(local)
    eps = _F(1e-4)
    on_x = jnp.abs(abs_local[:, 0] - half[:, 0]) < eps
    on_y = jnp.abs(abs_local[:, 1] - half[:, 1]) < eps
    sx = jnp.sign(local[:, 0])
    sy = jnp.sign(local[:, 1])
    sz = jnp.sign(local[:, 2])
    zeros = jnp.zeros_like(sx)
    n_box = jnp.where(
        on_x[:, None],
        jnp.stack([sx, zeros, zeros], axis=-1),
        jnp.where(
            on_y[:, None],
            jnp.stack([zeros, sy, zeros], axis=-1),
            jnp.stack([zeros, zeros, sz], axis=-1),
        ),
    )

    outward = jnp.where(
        (otype == OBJ_SPHERE)[:, None],
        n_sphere,
        jnp.where((otype == OBJ_PLANE)[:, None], n_plane, n_box),
    )

    # setFaceNormal (gpu.go:484-487)
    front_face = _dot(dirv, outward) < 0
    normal = jnp.where(front_face[:, None], outward, -outward)

    zero_i = jnp.zeros_like(idx)
    return Hit(
        hit=hit,
        t=jnp.where(hit, t_hit, BIG_T),
        p=p,
        normal=normal,
        front_face=front_face,
        obj_idx=jnp.where(hit, idx, zero_i),
        mat_idx=jnp.where(hit, mat_idx, zero_i),
    )


def occluded(orig, dirv, pack: ScenePack, t_min, t_max):
    """Any-hit test for shadow rays (hitWorld with tMax = dist - 0.002).

    t_max: f32[N].  Returns bool[N].
    """
    t = _candidate_t(orig, dirv, pack, _F(t_min))  # [N,M]
    return jnp.any(t <= t_max[:, None], axis=-1)


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
