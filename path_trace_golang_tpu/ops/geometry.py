"""Ray-primitive intersection on component-wise lane grids.

The reference intersects with a *linear scan over all objects* keeping the
closest hit (shader ``hitWorld`` gpu.go:708-740, CPU renderer.go:293-302).
On TPU the scan is unrolled over the (compile-time static) object list:
each object contributes a handful of fused element-wise VPU ops on
``[rows, 128]`` lane grids plus a running-min select chain.  Only the
primitive test each object actually needs is emitted (types are static
scene topology), no ``[N, M]`` intermediates exist, and the winning
object's geometry AND material constants ride along as selects of traced
scalars — shading therefore performs **zero** runtime gathers.  With
reference-scale scenes (<= 44 objects) the whole sweep fuses into one VPU
kernel.  A Pallas tiled variant and a BVH are the designated scale-out
path for much larger scenes (SURVEY.md §7 steps 7/8).

Epsilon set follows the GPU shader (SURVEY.md §7 hard-part 3):
sphere disc reject 1e-8 (gpu.go:529), plane denom 1e-6 (gpu.go:546),
box-face epsilon 1e-4 (gpu.go:630), t_min 0.001.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..soa import MAT_EMISSIVE, OBJ_PLANE, OBJ_SPHERE, ScenePack
from .vec import V3

__all__ = [
    "Hit",
    "intersect_world",
    "occluded",
    "box_exit_t",
    "sphere_exit_t",
    "BIG_T",
]

BIG_T = 1e20  # python float: stays a literal under pallas kernel tracing
_F = jnp.float32


class Hit(NamedTuple):
    """Closest-hit record (shader Hit struct gpu.go:465-472) plus the
    winning object's material constants, all as lane grids."""

    hit: jnp.ndarray  # bool
    t: jnp.ndarray  # f32 (BIG_T when miss)
    p: V3
    normal: V3  # flipped toward the ray origin side
    front_face: jnp.ndarray  # bool
    obj_idx: jnp.ndarray  # i32
    obj_type: jnp.ndarray  # i32
    obj_pos: V3
    obj_size: V3
    # material of the winner (mat stride layout, soa.py)
    mat_idx: jnp.ndarray  # i32
    mtyp: jnp.ndarray  # i32
    rough: jnp.ndarray
    ior: jnp.ndarray
    smoothness: jnp.ndarray
    reflectivity: jnp.ndarray
    abs_scale: jnp.ndarray
    albedo: V3
    emit: V3
    absorption: V3
    tint: V3


def _object_candidates(o: V3, d: V3, pack: ScenePack, t_min):
    """Per-object candidate distances: yields
    (m, typ, (cx,cy,cz), (sx,sy,sz), t, ok) with t/ok as lane grids and the
    centers/sizes as traced scalars."""
    a = d.dot(d)
    inv_a = _F(1.0) / a
    inv_dx = _F(1.0) / d.x  # IEEE inf on zero components, like GLSL
    inv_dy = _F(1.0) / d.y
    inv_dz = _F(1.0) / d.z

    for m in range(pack.n_objects):
        typ = pack.obj_types[m]
        cx, cy, cz = pack.obj[m, 4], pack.obj[m, 5], pack.obj[m, 6]
        sx, sy, sz = pack.obj[m, 8], pack.obj[m, 9], pack.obj[m, 10]

        if typ == OBJ_SPHERE:
            # quadratic, near root preferred (gpu.go:522-542)
            ocx, ocy, ocz = o.x - cx, o.y - cy, o.z - cz
            half_b = ocx * d.x + ocy * d.y + ocz * d.z
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
            ok = jnp.abs(d.y) >= _F(1e-6)
            t = (cy - o.y) * inv_dy
            ok = ok & (t >= t_min)
        else:  # OBJ_BOX: slab test, entry t0 (gpu.go:587-647)
            hx, hy, hz = sx * _F(0.5), sy * _F(0.5), sz * _F(0.5)
            n1x = (cx - hx - o.x) * inv_dx
            n2x = (cx + hx - o.x) * inv_dx
            n1y = (cy - hy - o.y) * inv_dy
            n2y = (cy + hy - o.y) * inv_dy
            n1z = (cz - hz - o.z) * inv_dz
            n2z = (cz + hz - o.z) * inv_dz
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
    o: V3,
    d: V3,
    pack: ScenePack,
    t_min=0.001,
    t_max=None,
    exclude_obj: Optional[jnp.ndarray] = None,
    lite: bool = False,
    skip: Optional[jnp.ndarray] = None,
) -> Hit:
    """Closest hit over all objects (shader hitWorld / bounce-loop scan).

    ``exclude_obj``: i32 lane grid of object index to skip (-1 = none) —
    the bounce loop's current-glass-object exclusion (gpu.go:1353-1357).
    ``lite=True`` skips the winner select-chains not needed by secondary
    queries (only hit/t/normal/mtyp/emit are tracked) — used by the
    rough-metal specular-NEE ray (gpu.go:1474-1496).
    ``skip``: optional bool lane grid; True marks lanes whose result the
    CALLER discards (dead/masked lanes).  Skipped lanes mark zero pages
    in the dynamic BVH walk — rounds per 128-lane row are max-driven, so
    pruning dead lanes directly shrinks the walk — and may come back
    with an object-only hit record; callers must mask.  The cheap
    unrolled object sweep still runs for every lane.
    """
    shape = o.x.shape
    t_min = _F(t_min)
    fz = jnp.zeros(shape, jnp.float32)
    iz = jnp.zeros(shape, jnp.int32)

    best_t = jnp.full(shape, BIG_T)
    best_m = iz
    best_type = iz
    best_mat = iz
    best_mtyp = iz
    b_c = V3(fz, fz, fz)
    b_s = V3(fz, fz, fz)

    # Per-scene-uniform material columns skip the whole select chain:
    # the field is a broadcast constant (soa.ScenePack.mat_uniform), and
    # every consumer masks by the hit anyway.
    uni = pack.mat_uniform or (None,) * 20

    def _minit(c):
        return fz if uni[c] is None else jnp.full(shape, uni[c], jnp.float32)

    b_rough = _minit(1)
    b_ior = _minit(2)
    b_smooth = _minit(3)
    b_refl = _minit(7)
    b_abss = _minit(15)
    b_albedo = V3(_minit(4), _minit(5), _minit(6))
    b_emit = V3(_minit(8), _minit(9), _minit(10))
    b_absorb = V3(_minit(12), _minit(13), _minit(14))
    b_tint = V3(_minit(16), _minit(17), _minit(18))

    mat = pack.mat
    for m, typ, (cx, cy, cz), (sx, sy, sz), t, ok in _object_candidates(
        o, d, pack, t_min
    ):
        if exclude_obj is not None:
            ok = ok & (exclude_obj != m)
        if t_max is not None:
            ok = ok & (t <= t_max)
        better = ok & (t < best_t)

        mi = pack.obj_mats[m]
        best_t = jnp.where(better, t, best_t)
        best_type = jnp.where(better, typ, best_type)
        best_mtyp = jnp.where(better, pack.mat_types[mi] if mi < len(pack.mat_types) else 0, best_mtyp)
        sel = lambda a, b: jnp.where(better, a, b)  # noqa: E731
        msel = lambda c, b: b if uni[c] is not None else sel(mat[mi, c], b)  # noqa: E731
        b_c = V3(sel(cx, b_c.x), sel(cy, b_c.y), sel(cz, b_c.z))
        b_s = V3(sel(sx, b_s.x), sel(sy, b_s.y), sel(sz, b_s.z))
        b_emit = V3(msel(8, b_emit.x), msel(9, b_emit.y), msel(10, b_emit.z))
        if not lite:
            best_m = jnp.where(better, m, best_m)
            best_mat = jnp.where(better, mi, best_mat)
            b_rough = msel(1, b_rough)
            b_ior = msel(2, b_ior)
            b_smooth = msel(3, b_smooth)
            b_refl = msel(7, b_refl)
            b_abss = msel(15, b_abss)
            b_albedo = V3(msel(4, b_albedo.x), msel(5, b_albedo.y), msel(6, b_albedo.z))
            b_absorb = V3(msel(12, b_absorb.x), msel(13, b_absorb.y), msel(14, b_absorb.z))
            b_tint = V3(msel(16, b_tint.x), msel(17, b_tint.y), msel(18, b_tint.z))

    # --- triangle BVH sweep (mesh extension; ops/bvh.py) ---
    tri_nx = fz
    tri_ny = fz
    tri_nz = fz
    import os as _os

    if pack.n_triangles and not _os.environ.get("PATHTRACER_PROF_NO_MESH_HIT"):
        from . import bvh as bvh_mod

        state = dict(
            best_t=best_t, best_m=best_m, best_type=best_type, best_mat=best_mat,
            best_mtyp=best_mtyp, b_rough=b_rough, b_ior=b_ior, b_smooth=b_smooth,
            b_refl=b_refl, b_abss=b_abss, b_albedo=b_albedo, b_emit=b_emit,
            b_absorb=b_absorb, b_tint=b_tint, nx=tri_nx, ny=tri_ny, nz=tri_nz,
        )

        if bvh_mod.use_dynamic_walk(pack.n_triangles):
            if lite and _os.environ.get("PATHTRACER_PROF_NO_MESH_LITE"):
                return _finish_hit(o, d, pack, state, lite, b_c=b_c, b_s=b_s)
            if lite and not pack.tri_any_emissive:
                # Lanes whose object-sweep winner is NOT emissive can
                # skip the mesh walk entirely: their specular-NEE
                # contribution is zero with or without a mesh occluder.
                skip_l = state["best_mtyp"] != MAT_EMISSIVE
                if skip is not None:
                    skip_l = skip_l | skip
                # A lite consumer (the rough-metal specular-NEE ray,
                # gpu.go:1474-1496) only acts on EMISSIVE winners.  With
                # no emissive triangles the mesh can only OCCLUDE the
                # object sweep's winner, so an any-hit walk bounded by
                # that winner's t replaces the full closest-hit walk
                # (no winner resolve, early exit on first hit).  Equal
                # to the full walk for every consumed field — a blocked
                # lane's mtyp/emit zero out exactly the lanes the full
                # walk would have handed a non-emissive mesh winner —
                # except exact f32 t-ties, which resolve to the mesh
                # here (both outcomes are non-emissive unless the tie is
                # mesh-vs-light, a measure-zero event).
                blocked = bvh_mod.occluded_triangles_paged(
                    o, d, pack, t_min, state["best_t"], skip_l
                )
                state["best_mtyp"] = jnp.where(blocked, 0, state["best_mtyp"])
                zero3 = V3(fz, fz, fz)
                state["b_emit"] = V3.where(blocked, zero3, state["b_emit"])
                return _finish_hit(o, d, pack, state, lite, b_c=b_c, b_s=b_s)
            state, _visits = bvh_mod.traverse_triangles_paged(
                o, d, pack, t_min, state, exclude_obj=exclude_obj, t_max=t_max,
                lite=lite, skip=skip,
            )
            return _finish_hit(o, d, pack, state, lite, b_c=b_c, b_s=b_s)

        def update(tri_obj_idx, orig_tri, t, ok, nrm):
            if t_max is not None:
                ok = ok & (t <= t_max)
            better = ok & (t < state["best_t"])
            mi = pack.tri_mats[orig_tri]
            sel = lambda a, b: jnp.where(better, a, b)  # noqa: E731
            state["best_t"] = sel(t, state["best_t"])
            state["best_type"] = sel(bvh_mod.OBJ_TRIANGLE, state["best_type"])
            state["best_mtyp"] = sel(pack.mat_types[mi] if mi < len(pack.mat_types) else 0, state["best_mtyp"])
            state["b_emit"] = V3(sel(mat[mi, 8], state["b_emit"].x), sel(mat[mi, 9], state["b_emit"].y), sel(mat[mi, 10], state["b_emit"].z))
            state["nx"] = sel(nrm[0], state["nx"])
            state["ny"] = sel(nrm[1], state["ny"])
            state["nz"] = sel(nrm[2], state["nz"])
            if not lite:
                state["best_m"] = sel(tri_obj_idx, state["best_m"])
                state["best_mat"] = sel(mi, state["best_mat"])
                state["b_rough"] = sel(mat[mi, 1], state["b_rough"])
                state["b_ior"] = sel(mat[mi, 2], state["b_ior"])
                state["b_smooth"] = sel(mat[mi, 3], state["b_smooth"])
                state["b_refl"] = sel(mat[mi, 7], state["b_refl"])
                state["b_abss"] = sel(mat[mi, 15], state["b_abss"])
                state["b_albedo"] = V3(sel(mat[mi, 4], state["b_albedo"].x), sel(mat[mi, 5], state["b_albedo"].y), sel(mat[mi, 6], state["b_albedo"].z))
                state["b_absorb"] = V3(sel(mat[mi, 12], state["b_absorb"].x), sel(mat[mi, 13], state["b_absorb"].y), sel(mat[mi, 14], state["b_absorb"].z))
                state["b_tint"] = V3(sel(mat[mi, 16], state["b_tint"].x), sel(mat[mi, 17], state["b_tint"].y), sel(mat[mi, 18], state["b_tint"].z))

        bvh_mod.traverse_triangles(
            o, d, pack, t_min, lambda: state["best_t"], update, exclude_obj
        )
        return _finish_hit(o, d, pack, state, lite, b_c=b_c, b_s=b_s)

    state = dict(
        best_t=best_t, best_m=best_m, best_type=best_type, best_mat=best_mat,
        best_mtyp=best_mtyp, b_rough=b_rough, b_ior=b_ior, b_smooth=b_smooth,
        b_refl=b_refl, b_abss=b_abss, b_albedo=b_albedo, b_emit=b_emit,
        b_absorb=b_absorb, b_tint=b_tint, nx=tri_nx, ny=tri_ny, nz=tri_nz,
    )
    return _finish_hit(o, d, pack, state, lite, b_c=b_c, b_s=b_s)


def _finish_hit(o: V3, d: V3, pack: ScenePack, state, lite, b_c=None, b_s=None) -> Hit:
    """Assemble the Hit record from the winner chain: per-type outward
    normal, setFaceNormal flip (gpu.go:484-487)."""
    shape = o.x.shape
    fz = jnp.zeros(shape, jnp.float32)
    iz = jnp.zeros(shape, jnp.int32)
    best_t = state["best_t"]
    best_type = state["best_type"]
    if b_c is None:
        b_c = state["b_c"]
    if b_s is None:
        b_s = state["b_s"]

    hit = best_t < BIG_T
    t_safe = jnp.where(hit, best_t, _F(0))
    p = o + d * t_safe

    is_sphere = best_type == OBJ_SPHERE
    is_plane = best_type == OBJ_PLANE

    # outward normal per primitive type
    inv_r = _F(1.0) / jnp.where(b_s.x != 0, b_s.x, _F(1.0))
    ns = (p - b_c) * inv_r

    # box: nearest-face chain with eps 1e-4, order x -> y -> z (gpu.go:629-638)
    l = p - b_c
    eps = _F(1e-4)
    on_x = jnp.abs(jnp.abs(l.x) - b_s.x * _F(0.5)) < eps
    on_y = jnp.abs(jnp.abs(l.y) - b_s.y * _F(0.5)) < eps
    nbx = jnp.where(on_x, jnp.sign(l.x), _F(0.0))
    nby = jnp.where(~on_x & on_y, jnp.sign(l.y), _F(0.0))
    nbz = jnp.where(~on_x & ~on_y, jnp.sign(l.z), _F(0.0))

    ones = jnp.ones(shape, jnp.float32)
    nx = jnp.where(is_sphere, ns.x, jnp.where(is_plane, _F(0.0), nbx))
    ny = jnp.where(is_sphere, ns.y, jnp.where(is_plane, ones, nby))
    nz = jnp.where(is_sphere, ns.z, jnp.where(is_plane, _F(0.0), nbz))
    if pack.n_triangles:
        from .bvh import OBJ_TRIANGLE

        is_tri = best_type == OBJ_TRIANGLE
        nx = jnp.where(is_tri, state["nx"], nx)
        ny = jnp.where(is_tri, state["ny"], ny)
        nz = jnp.where(is_tri, state["nz"], nz)

    # setFaceNormal (gpu.go:484-487)
    front_face = (d.x * nx + d.y * ny + d.z * nz) < 0
    sgn = jnp.where(front_face, _F(1.0), _F(-1.0))
    normal = V3(nx * sgn, ny * sgn, nz * sgn)

    return Hit(
        hit=hit,
        t=jnp.where(hit, best_t, BIG_T),
        p=p,
        normal=normal,
        front_face=front_face,
        obj_idx=jnp.where(hit, state["best_m"], iz),
        obj_type=jnp.where(hit, best_type, iz),
        obj_pos=b_c,
        obj_size=b_s,
        mat_idx=jnp.where(hit, state["best_mat"], iz),
        mtyp=jnp.where(hit, state["best_mtyp"], iz),
        rough=state["b_rough"],
        ior=state["b_ior"],
        smoothness=state["b_smooth"],
        reflectivity=state["b_refl"],
        abs_scale=state["b_abss"],
        albedo=state["b_albedo"],
        emit=state["b_emit"],
        absorption=state["b_absorb"],
        tint=state["b_tint"],
    )


def occluded(o: V3, d: V3, pack: ScenePack, t_min, t_max, skip=None):
    """Any-hit test for shadow rays (hitWorld with tMax = dist - 0.002).

    ``skip``: bool lane grid of lanes whose result the caller discards
    (shadow rays already invalid by the cosine/distance terms); they mark
    no pages in the dynamic mesh walk and may return blocked=True."""
    blocked = jnp.zeros(o.x.shape, dtype=bool)
    for _m, _typ, _c, _s, t, ok in _object_candidates(o, d, pack, _F(t_min)):
        blocked = blocked | (ok & (t <= t_max))
    import os as _os

    if pack.n_triangles and not _os.environ.get("PATHTRACER_PROF_NO_MESH_OCCL"):
        from . import bvh as bvh_mod

        if bvh_mod.use_dynamic_walk(pack.n_triangles):
            return bvh_mod.occluded_triangles_paged(
                o, d, pack, _F(t_min), t_max,
                blocked if skip is None else (blocked | skip),
            )

        state = dict(blocked=blocked)

        def update(_oi, _orig, t, ok, _nrm):
            state["blocked"] = state["blocked"] | (ok & (t <= t_max))

        # prune bbox visits once a lane is already occluded
        big = jnp.full(o.x.shape, BIG_T)

        def best_fn():
            return jnp.where(state["blocked"], _F(t_min), big)

        bvh_mod.traverse_triangles(o, d, pack, _F(t_min), best_fn, update)
        blocked = state["blocked"]
    return blocked


def box_exit_t(o: V3, d: V3, bmin: V3, bmax: V3, t_min=0.001):
    """Slab-test exit distance t1 (hitBox with findExit=true, gpu.go:1559-1564)."""
    inv = V3(_F(1.0) / d.x, _F(1.0) / d.y, _F(1.0) / d.z)
    t_near = (bmin - o) * inv
    t_far = (bmax - o) * inv
    t0 = jnp.maximum(
        jnp.maximum(
            jnp.minimum(t_near.x, t_far.x), jnp.minimum(t_near.y, t_far.y)
        ),
        jnp.maximum(jnp.minimum(t_near.z, t_far.z), _F(t_min)),
    )
    t1 = jnp.minimum(
        jnp.minimum(jnp.maximum(t_near.x, t_far.x), jnp.maximum(t_near.y, t_far.y)),
        jnp.maximum(t_near.z, t_far.z),
    )
    valid = (t1 > t0) & (t1 >= _F(t_min))
    return valid, t1


def sphere_exit_t(o: V3, d: V3, center: V3, radius, t_min=0.001):
    """Far-root distance out of a sphere (gpu.go:1566-1591).

    ``d`` must be unit length (the shader assumes a == 1)."""
    oc = o - center
    half_b = oc.dot(d)
    c = oc.dot(oc) - radius * radius
    disc = half_b * half_b - c
    ok = disc > 0
    sqrt_d = jnp.sqrt(jnp.maximum(disc, _F(0)))
    exit_t = -half_b + sqrt_d  # max of the two roots
    valid = ok & (exit_t > _F(t_min))
    return valid, exit_t
