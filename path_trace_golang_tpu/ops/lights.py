"""Next-event estimation over the precomputed emissive-light list.

Re-design of the shader's light sampling stack (gpu.go:875-1070):
``sampleLightGeometry`` (uniform sphere-area sampling, spheres only),
``estimateDirectLightSingle`` (shadow ray + geometry term + 500-luminance
firefly clamp) and ``estimateDirectLight`` (sample all lights when <= 8,
else a random contiguous subset of 8 with scale compensation).

Light indices are static scene topology, so the <=8-light fast path
unrolls with each light's center/radius/emit as traced scalars — zero
runtime gathers; each slot costs one fused any-hit sweep.  The >8 subset
path keeps dynamic indices (per-lane random window) and pays one gather
per slot.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..soa import OBJ_SPHERE, ScenePack
from . import geometry, sampling
from .rng import LaneRng

__all__ = ["sample_light_geometry", "estimate_direct_light", "MAX_LIGHTS_TO_SAMPLE", "PI"]

_F = jnp.float32
PI = _F(3.14159265359)
MAX_LIGHTS_TO_SAMPLE = 8  # gpu.go:1019


def _luminance_clamp(contrib, max_lum=_F(500.0)):
    """Soft firefly clamp at luminance 500 (gpu.go:986-996)."""
    weights = jnp.array([0.2126, 0.7152, 0.0722], dtype=jnp.float32)
    lum = jnp.sum(contrib * weights, axis=-1)
    scale = jnp.where(lum > max_lum, max_lum / jnp.maximum(lum, _F(1e-6)), _F(1.0))
    return contrib * scale[:, None]


def sample_light_geometry(obj_idx, pack: ScenePack, rng: LaneRng):
    """Uniform point on a (sphere) light, dynamic-index variant
    (gpu.go:889-919).  obj_idx: i32[N] per-lane object index.
    Non-sphere lights yield valid=False (the reference skips area sampling
    for planes/boxes, gpu.go:917-918)."""
    otype = pack.obj[obj_idx, 0].astype(jnp.int32)
    pos = pack.obj[obj_idx, 4:7]
    radius = pack.obj[obj_idx, 8]

    u1 = rng.next()
    u2 = rng.next()
    normal = sampling.sphere_surface(u1, u2)
    light_pos = pos + radius[:, None] * normal
    area = _F(4.0) * PI * radius * radius
    pdf_area = _F(1.0) / jnp.maximum(area, _F(1e-20))
    valid = otype == OBJ_SPHERE
    return valid, light_pos, normal, pdf_area


def _direct_single_static(light_obj: int, p, n, albedo, pack: ScenePack, rng: LaneRng):
    """estimateDirectLightSingle (gpu.go:923-999) for one *static* light.

    All light constants are traced scalars — no gathers.  Returns f32[N,3]
    (zeros for non-sphere lights, which the reference cannot area-sample).
    """
    if pack.obj_types[light_obj] != OBJ_SPHERE:
        # draws still advance to keep the schedule fixed per slot
        rng.next()
        rng.next()
        return jnp.zeros_like(p)

    center = pack.obj[light_obj, 4:7]
    radius = pack.obj[light_obj, 8]
    emit = pack.mat[pack.obj_mats[light_obj], 8:11]

    u1 = rng.next()
    u2 = rng.next()
    light_n = sampling.sphere_surface(u1, u2)
    light_pos = center[None, :] + radius * light_n
    area = _F(4.0) * PI * radius * radius
    pdf_area = _F(1.0) / jnp.maximum(area, _F(1e-20))

    to_light = light_pos - p
    dist_sq = jnp.sum(to_light * to_light, axis=-1)
    valid = dist_sq > _F(1e-6)
    dist = jnp.sqrt(jnp.maximum(dist_sq, _F(1e-20)))
    wi = to_light / dist[:, None]

    # shadow ray: origin offset along the surface normal (gpu.go:949-956)
    shadow_orig = p + n * _F(0.001)
    blocked = geometry.occluded(shadow_orig, wi, pack, _F(0.001), dist - _F(0.002))
    valid = valid & ~blocked

    cos_surf = jnp.maximum(_F(0), jnp.sum(n * wi, axis=-1))
    cos_light = jnp.maximum(_F(0), jnp.sum(light_n * -wi, axis=-1))
    valid = valid & (cos_surf > _F(0)) & (cos_light > _F(0))

    f = albedo / PI  # brdfLambert (gpu.go:870-872)
    inv_dist_sq = _F(1.0) / jnp.maximum(_F(1e-6), dist_sq)
    geometry_term = cos_surf * cos_light * inv_dist_sq
    contrib = f * emit[None, :] * (geometry_term * pdf_area_inv(pdf_area))[:, None]
    contrib = _luminance_clamp(contrib)
    return jnp.where(valid[:, None], contrib, _F(0.0))


def pdf_area_inv(pdf_area):
    return _F(1.0) / jnp.maximum(_F(1e-6), pdf_area)


def _direct_single_dynamic(light_obj, p, n, albedo, pack: ScenePack, rng: LaneRng):
    """Dynamic-index slot for the >8-light subset path."""
    valid, light_pos, light_n, pdf_area = sample_light_geometry(light_obj, pack, rng)
    valid = valid & (pdf_area > _F(0))

    to_light = light_pos - p
    dist_sq = jnp.sum(to_light * to_light, axis=-1)
    valid = valid & (dist_sq > _F(1e-6))
    dist = jnp.sqrt(jnp.maximum(dist_sq, _F(1e-20)))
    wi = to_light / dist[:, None]

    shadow_orig = p + n * _F(0.001)
    blocked = geometry.occluded(shadow_orig, wi, pack, _F(0.001), dist - _F(0.002))
    valid = valid & ~blocked

    emit = pack.mat[pack.obj[light_obj, 1].astype(jnp.int32), 8:11]

    cos_surf = jnp.maximum(_F(0), jnp.sum(n * wi, axis=-1))
    cos_light = jnp.maximum(_F(0), jnp.sum(light_n * -wi, axis=-1))
    valid = valid & (cos_surf > _F(0)) & (cos_light > _F(0))

    f = albedo / PI
    inv_dist_sq = _F(1.0) / jnp.maximum(_F(1e-6), dist_sq)
    contrib = f * emit * (cos_surf * cos_light * inv_dist_sq * pdf_area_inv(pdf_area))[:, None]
    contrib = _luminance_clamp(contrib)
    return jnp.where(valid[:, None], contrib, _F(0.0))


def estimate_direct_light(p, n, albedo, pack: ScenePack, rng: LaneRng):
    """estimateDirectLight (gpu.go:1004-1070): NEE over all lights.

    Samples every light when there are <= 8 (static unroll), otherwise a
    per-lane random contiguous window of 8 (scaled by count/8); the sum is
    finally multiplied by 1/light_count, matching the reference.
    """
    count = pack.n_lights
    if count == 0:
        return jnp.zeros_like(p)

    total = jnp.zeros_like(p)
    if count > MAX_LIGHTS_TO_SAMPLE:
        # random contiguous subset (gpu.go:1028-1047)
        start = (rng.next() * _F(count)).astype(jnp.int32) % count
        for j in range(MAX_LIGHTS_TO_SAMPLE):
            i = (start + j) % count
            light_obj = pack.light_idx[i]
            total = total + _direct_single_dynamic(light_obj, p, n, albedo, pack, rng)
        total = total * _F(count / MAX_LIGHTS_TO_SAMPLE)
    else:
        for i in range(count):
            total = total + _direct_single_static(
                pack.light_objs[i], p, n, albedo, pack, rng
            )

    return total * _F(1.0 / count)
