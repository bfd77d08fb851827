"""Next-event estimation over the precomputed emissive-light list.

Re-design of the shader's light sampling stack (gpu.go:875-1070):
``sampleLightGeometry`` (uniform sphere-area sampling, spheres only),
``estimateDirectLightSingle`` (shadow ray + geometry term + 500-luminance
firefly clamp) and ``estimateDirectLight`` (sample all lights when <= 8,
else a random contiguous subset of 8 with scale compensation).

Light indices are static scene topology, so every light's center/radius/
emit are traced scalars and the whole stack unrolls with **zero runtime
gathers** — including the >8-light case: the reference's per-pixel random
contiguous window of 8 becomes a per-lane membership MASK over the static
unroll (each light slot computes for all lanes, lanes outside the window
contribute zero), which is the SPMD-native form of the same estimator and
keeps the code Pallas-eligible at any light count.  Cost is one fused
any-hit sweep per *light* rather than per *sampled* light; the window
only bounds variance, not work (documented deviation D11, PHYSICS.md).
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
        # random contiguous subset (gpu.go:1028-1047) as a per-lane mask
        start = (rng.next() * _F(count)).astype(jnp.int32) % count
        zero3 = V3.zeros(p.x.shape)
        for i in range(count):
            member = ((jnp.int32(i) - start) % count) < MAX_LIGHTS_TO_SAMPLE
            slot_skip = ~member if skip is None else (~member | skip)
            contrib = _direct_single_static(
                pack.light_objs[i], p, n, albedo, pack, rng, skip=slot_skip
            )
            total = total + V3.where(member, contrib, zero3)
        total = total * _F(count / MAX_LIGHTS_TO_SAMPLE)
    else:
        for i in range(count):
            total = total + _direct_single_static(
                pack.light_objs[i], p, n, albedo, pack, rng, skip=skip
            )

    return total * _F(1.0 / count)
