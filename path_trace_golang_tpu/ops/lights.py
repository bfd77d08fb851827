"""Next-event estimation over the precomputed emissive-light list.

Re-design of the shader's light sampling stack (gpu.go:875-1070):
``sampleLightGeometry`` (uniform sphere-area sampling, spheres only),
``estimateDirectLightSingle`` (shadow ray + geometry term + 500-luminance
firefly clamp) and ``estimateDirectLight`` (sample all lights when <= 8,
else a random contiguous subset of 8 with scale compensation).

Light indices are static scene topology, so with <= 8 lights every
light's center/radius/emit are traced scalars and the stack unrolls
with zero runtime gathers.  The >8-light case keeps the reference's
cost model — exactly 8 shadow sweeps per shading point — by GATHERING
each window slot's light constants per lane (a select-chain over the
static light list: O(count) cheap exact VPU selects, Pallas-eligible),
then paying one fused any-hit sweep per WINDOW slot (documented
deviation D11, PHYSICS.md; the earlier one-sweep-per-light membership
mask measured a 12.7x cliff at 64 lights, PERF.md round 4).
All lane math is component-wise on [rows, 128] grids.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..soa import OBJ_SPHERE, ScenePack
from . import geometry, sampling
from .rng import LaneRng
from .vec import V3

__all__ = ["estimate_direct_light", "MAX_LIGHTS_TO_SAMPLE", "PI", "luminance_clamp"]

_F = jnp.float32
PI = 3.14159265359
INV_PI = 1.0 / 3.14159265359
MAX_LIGHTS_TO_SAMPLE = 8  # gpu.go:1019


def luminance_clamp(contrib: V3, max_lum=500.0) -> V3:
    """Soft firefly clamp at luminance 500 (gpu.go:986-996)."""
    lum = contrib.x * _F(0.2126) + contrib.y * _F(0.7152) + contrib.z * _F(0.0722)
    scale = jnp.where(lum > max_lum, max_lum / jnp.maximum(lum, _F(1e-6)), _F(1.0))
    return contrib * scale


def _direct_single_static(
    light_obj: int, p: V3, n: V3, albedo: V3, pack: ScenePack, rng: LaneRng,
    skip=None,
) -> V3:
    """estimateDirectLightSingle (gpu.go:923-999) for one *static* light.

    All light constants are traced scalars — no gathers.  Returns zeros
    for non-sphere lights, which the reference cannot area-sample.
    ``skip``: bool lane grid of lanes whose contribution the caller
    zeroes anyway (dead lanes, out-of-window slots); combined with the
    cosine/distance validity it lets the mesh any-hit walk mark zero
    pages for lanes whose shadow ray cannot contribute."""
    shape = p.x.shape
    if pack.obj_types[light_obj] != OBJ_SPHERE:
        # draws still advance to keep the schedule fixed per slot
        rng.next()
        rng.next()
        return V3.zeros(shape)

    cx, cy, cz = pack.obj[light_obj, 4], pack.obj[light_obj, 5], pack.obj[light_obj, 6]
    radius = pack.obj[light_obj, 8]
    mi = pack.obj_mats[light_obj]
    ex, ey, ez = pack.mat[mi, 8], pack.mat[mi, 9], pack.mat[mi, 10]

    light_n = sampling.sphere_surface(rng.next(), rng.next())
    light_pos = V3(cx + radius * light_n.x, cy + radius * light_n.y, cz + radius * light_n.z)
    area = _F(4.0) * PI * radius * radius
    inv_pdf = jnp.maximum(area, _F(1e-20))  # 1/pdf_area = area (clamped below)

    to_light = light_pos - p
    dist_sq = to_light.dot(to_light)
    valid = dist_sq > _F(1e-6)
    dist = jnp.sqrt(jnp.maximum(dist_sq, _F(1e-20)))
    wi = to_light * (_F(1.0) / dist)

    # cosine terms BEFORE the shadow walk: a lane failing them cannot
    # contribute, so the mesh walk skips it (same AND either way)
    cos_surf = jnp.maximum(_F(0), n.dot(wi))
    cos_light = jnp.maximum(_F(0), -(light_n.dot(wi)))
    valid = valid & (cos_surf > _F(0)) & (cos_light > _F(0))
    no_need = ~valid if skip is None else (~valid | skip)

    # shadow ray: origin offset along the surface normal (gpu.go:949-956)
    shadow_orig = p + n * _F(0.001)
    blocked = geometry.occluded(
        shadow_orig, wi, pack, _F(0.001), dist - _F(0.002), skip=no_need
    )
    valid = valid & ~blocked

    # f = albedo/pi (gpu.go:870-872); geometry term; pdf-area division with
    # the reference's 1e-6 clamps (gpu.go:979-984)
    inv_dist_sq = _F(1.0) / jnp.maximum(_F(1e-6), dist_sq)
    w = cos_surf * cos_light * inv_dist_sq * jnp.minimum(inv_pdf, _F(1e6))
    contrib = albedo * V3.broadcast_scalars(shape, ex, ey, ez) * (w * INV_PI)
    contrib = luminance_clamp(contrib)
    zero = V3.zeros(shape)
    return V3.where(valid, contrib, zero)


def _direct_single_gathered(
    idx_l, p: V3, n: V3, albedo: V3, pack: ScenePack, rng: LaneRng,
    skip=None,
) -> V3:
    """One window slot of the >8-light estimator, light constants
    GATHERED per lane.

    ``idx_l``: i32 lane grid of per-lane light indices.  The constants
    come from a select-chain over the static light list — O(count)
    cheap VPU selects, exact, Pallas-eligible — so the slot pays ONE
    any-hit occlusion sweep regardless of scene light count.  This is
    what keeps >8-light scenes at the reference's O(8) sweep cost
    (gpu.go:1028-1047 iterates only the 8 sampled lights): the original
    membership-mask form (one sweep per LIGHT) measured a 12.7x
    slowdown at 64 lights (PERF.md round 4).  Math and clamp order are
    kept identical to ``_direct_single_static`` so the two forms differ
    only by which light a lane sees."""
    shape = p.x.shape
    f0 = jnp.zeros(shape, jnp.float32)
    cx = cy = cz = radius = ex = ey = ez = f0
    is_sphere = None
    for i, lo in enumerate(pack.light_objs):
        if pack.obj_types[lo] != OBJ_SPHERE:
            continue  # params stay zero; slot contributes nothing
        m = idx_l == jnp.int32(i)
        mi = pack.obj_mats[lo]
        cx = jnp.where(m, pack.obj[lo, 4], cx)
        cy = jnp.where(m, pack.obj[lo, 5], cy)
        cz = jnp.where(m, pack.obj[lo, 6], cz)
        radius = jnp.where(m, pack.obj[lo, 8], radius)
        ex = jnp.where(m, pack.mat[mi, 8], ex)
        ey = jnp.where(m, pack.mat[mi, 9], ey)
        ez = jnp.where(m, pack.mat[mi, 10], ez)
        is_sphere = m if is_sphere is None else (is_sphere | m)

    light_n = sampling.sphere_surface(rng.next(), rng.next())
    if is_sphere is None:  # no area-sampleable light at all
        return V3.zeros(shape)
    light_pos = V3(
        cx + radius * light_n.x, cy + radius * light_n.y, cz + radius * light_n.z
    )
    area = _F(4.0) * PI * (radius * radius)
    inv_pdf = jnp.maximum(area, _F(1e-20))

    to_light = light_pos - p
    dist_sq = to_light.dot(to_light)
    valid = (dist_sq > _F(1e-6)) & is_sphere
    dist = jnp.sqrt(jnp.maximum(dist_sq, _F(1e-20)))
    wi = to_light * (_F(1.0) / dist)

    cos_surf = jnp.maximum(_F(0), n.dot(wi))
    cos_light = jnp.maximum(_F(0), -(light_n.dot(wi)))
    valid = valid & (cos_surf > _F(0)) & (cos_light > _F(0))
    no_need = ~valid if skip is None else (~valid | skip)

    shadow_orig = p + n * _F(0.001)
    blocked = geometry.occluded(
        shadow_orig, wi, pack, _F(0.001), dist - _F(0.002), skip=no_need
    )
    valid = valid & ~blocked

    inv_dist_sq = _F(1.0) / jnp.maximum(_F(1e-6), dist_sq)
    w = cos_surf * cos_light * inv_dist_sq * jnp.minimum(inv_pdf, _F(1e6))
    contrib = albedo * V3(ex, ey, ez) * (w * INV_PI)
    contrib = luminance_clamp(contrib)
    zero = V3.zeros(shape)
    return V3.where(valid, contrib, zero)


def estimate_direct_light(
    p: V3, n: V3, albedo: V3, pack: ScenePack, rng: LaneRng, skip=None
) -> V3:
    """estimateDirectLight (gpu.go:1004-1070): NEE over all lights.

    Samples every light when there are <= 8 (static unroll), otherwise a
    per-lane random contiguous window of 8 (scaled by count/8); the sum is
    finally multiplied by 1/light_count, matching the reference estimator.

    The >8 window is realized as a MEMBERSHIP MASK over the same static
    unroll: every light slot computes for all lanes with traced-scalar
    light constants (zero gathers, Pallas-eligible at any light count),
    and a lane keeps slot ``i`` iff ``(i - start) mod count < 8`` — the
    identical contiguous-window estimator, SPMD-style (PHYSICS.md D11).

    ``skip``: bool lane grid of lanes whose result the caller discards
    (dead/masked lanes) — shadow-walk work pruning only, no physics.
    Out-of-window slots join it automatically in the >8-light case.
    """
    count = pack.n_lights
    if count == 0:
        return V3.zeros(p.x.shape)

    total = V3.zeros(p.x.shape)
    if count > MAX_LIGHTS_TO_SAMPLE:
        # random contiguous subset (gpu.go:1028-1047): 8 GATHERED window
        # slots — each slot selects its per-lane light's constants and
        # pays one occlusion sweep, so the sweep count is the
        # reference's O(8), not O(count).  (The earlier membership-mask
        # form swept once per LIGHT: exact same estimator but a
        # measured 12.7x cliff at 64 lights — PERF.md round 4.  Its rng
        # schedule drew per light slot; this one draws per WINDOW slot,
        # like the reference shader.)
        start = (rng.next() * _F(count)).astype(jnp.int32) % count
        for j in range(MAX_LIGHTS_TO_SAMPLE):
            idx_l = (start + jnp.int32(j)) % jnp.int32(count)
            total = total + _direct_single_gathered(
                idx_l, p, n, albedo, pack, rng, skip=skip
            )
        total = total * _F(count / MAX_LIGHTS_TO_SAMPLE)
    else:
        for i in range(count):
            total = total + _direct_single_static(
                pack.light_objs[i], p, n, albedo, pack, rng, skip=skip
            )

    return total * _F(1.0 / count)
