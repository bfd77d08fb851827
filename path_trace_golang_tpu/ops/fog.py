"""Volumetric fog: Henyey–Greenstein phase, hash noise, single scattering.

Re-design of the shader fog stack (gpu.go:1125-1341): legacy exponential
sky fog (``applyFog``), heterogeneous medium coefficients (``mediumCoeffs``
with fractal hash noise) and per-light single-scatter estimation
(``estimateVolumeLight``).  The fixed 24-step march itself lives in the
integrator (it needs the primary-hit distance).  Component-wise on
[rows, 128] lane grids.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..soa import ScenePack
from . import geometry, sampling
from .rng import LaneRng
from .vec import V3

__all__ = [
    "phase_hg",
    "hash31",
    "volume_noise",
    "medium_coeffs",
    "apply_legacy_fog",
    "estimate_volume_light",
    "FOG_MARCH_STEPS",
    "FOG_MARCH_TMAX",
]

_F = jnp.float32
PI = 3.14159265359
FOG_MARCH_STEPS = 24  # gpu.go:1319
FOG_MARCH_TMAX = 40.0  # gpu.go:1314


def phase_hg(cos_theta, g):
    """Henyey–Greenstein phase function (gpu.go:1139-1143)."""
    gg = g * g
    denom = _F(1.0) + gg - _F(2.0) * g * cos_theta
    return (_F(1.0) - gg) / (
        _F(4.0) * PI * denom * jnp.sqrt(jnp.maximum(denom, _F(1e-6)))
    )


def hash31(p: V3):
    """3D hash noise (gpu.go:1146-1153): fract(sin(sum of dots)*43758.5453)."""
    qx = p.x * _F(127.1) + p.y * _F(311.7) + p.z * _F(74.7)
    qy = p.x * _F(269.5) + p.y * _F(183.3) + p.z * _F(246.1)
    qz = p.x * _F(113.5) + p.y * _F(271.9) + p.z * _F(124.6)
    s = jnp.sin(qx + qy + qz) * _F(43758.5453)
    return s - jnp.floor(s)


def volume_noise(p: V3, fog_block):
    """Fractal hash noise, 1-5 octaves (gpu.go:1156-1171).

    The octave count comes from the (traced) fog block, so the loop is
    unrolled to 5 with per-octave masking — static control flow under jit.
    """
    noise_scale = fog_block[12]
    octaves = jnp.clip(fog_block[13], _F(1.0), _F(5.0))
    amp = _F(1.0)
    freq = noise_scale
    total = jnp.zeros(p.x.shape, dtype=jnp.float32)
    norm = jnp.zeros((), dtype=jnp.float32)
    for i in range(5):
        active = _F(i) < octaves
        total = total + jnp.where(active, hash31(p * freq) * amp, _F(0.0))
        norm = norm + jnp.where(active, amp, _F(0.0))
        amp = amp * _F(0.5)
        freq = freq * _F(2.0)
    return jnp.where(norm > 0, total / jnp.maximum(norm, _F(1e-20)), _F(1.0))


def medium_coeffs(pos: V3, fog_block):
    """Local (sigma_s, sigma_a, sigma_t) with hetero noise (gpu.go:1174-1203)."""
    base_s = jnp.maximum(fog_block[8], _F(0.0))
    base_a = jnp.maximum(fog_block[9], _F(0.0))
    density = fog_block[0]
    scatter = jnp.clip(fog_block[1], _F(0.0), _F(1.0))

    # fallback from legacy density/scatter (gpu.go:1178-1185)
    use_fallback = (base_s <= 0) & (base_a <= 0) & (density > 0)
    fb_s = density * scatter
    fb_a = jnp.maximum(density - fb_s, _F(0.0))
    sigma_s = jnp.where(use_fallback, fb_s, base_s)
    sigma_a = jnp.where(use_fallback, fb_a, base_a)

    sigma_t = sigma_s + sigma_a
    off = sigma_t <= 0
    sigma_s = jnp.where(off, _F(0.0), sigma_s)
    sigma_a = jnp.where(off, _F(0.0), sigma_a)

    hetero = fog_block[11]
    k = jnp.clip(hetero, _F(0.0), _F(1.0))
    n = volume_noise(pos, fog_block)
    scale = jnp.where(
        hetero > 0, (_F(1.0) - k) * (_F(1.0) - n) + (_F(1.0) + k) * n, _F(1.0)
    )
    sigma_s = jnp.broadcast_to(sigma_s * scale, pos.x.shape)
    sigma_a = jnp.broadcast_to(sigma_a * scale, pos.x.shape)
    return sigma_s, sigma_a, sigma_s + sigma_a


def apply_legacy_fog(radiance: V3, distance, fog_block) -> V3:
    """Exponential fog blend toward fog color (applyFog, gpu.go:1125-1133).

    Applied to sky misses with fixed distance 50 when density > 0 and
    affect_sky (gpu.go:1389-1394)."""
    density = fog_block[0]
    att = jnp.exp(-density * _F(distance))
    one_m = _F(1.0) - att
    blended = V3(
        radiance.x * att + fog_block[4] * one_m,
        radiance.y * att + fog_block[5] * one_m,
        radiance.z * att + fog_block[6] * one_m,
    )
    enabled = (density > 0) & (_F(distance) > 0)
    return V3.where(enabled, blended, radiance)


def estimate_volume_light(pos: V3, view_dir: V3, pack: ScenePack, rng: LaneRng) -> V3:
    """Single-scatter in-fog lighting at ``pos`` (gpu.go:1208-1297).

    Unrolls the (static) emissive-light list, samples each sphere light's
    surface, casts an un-offset shadow ray, weights by the HG phase for
    the camera direction, sums, doubles (deliberate x2 boost, gpu.go:1283)
    and luminance-clamps at 500.  Light constants are traced scalars — no
    gathers.
    """
    from ..soa import OBJ_SPHERE
    from .lights import luminance_clamp

    fog_block = pack.fog
    g = fog_block[10]
    shape = pos.x.shape
    out = V3.zeros(shape)
    for i in range(pack.n_lights):
        lo = pack.light_objs[i]
        u1 = rng.next()
        u2 = rng.next()
        if pack.obj_types[lo] != OBJ_SPHERE:
            continue  # reference skips non-sphere area sampling (gpu.go:917-918)
        cx, cy, cz = pack.obj[lo, 4], pack.obj[lo, 5], pack.obj[lo, 6]
        radius = pack.obj[lo, 8]
        mi = pack.obj_mats[lo]
        ex, ey, ez = pack.mat[mi, 8], pack.mat[mi, 9], pack.mat[mi, 10]

        light_n = sampling.sphere_surface(u1, u2)
        light_pos = V3(
            cx + radius * light_n.x, cy + radius * light_n.y, cz + radius * light_n.z
        )
        area = _F(4.0) * PI * radius * radius
        inv_pdf = jnp.minimum(jnp.maximum(area, _F(1e-20)), _F(1e6))

        to_light = light_pos - pos
        dist_sq = to_light.dot(to_light)
        valid = dist_sq > _F(1e-6)
        dist = jnp.sqrt(jnp.maximum(dist_sq, _F(1e-20)))
        wi = to_light * (_F(1.0) / dist)

        blocked = geometry.occluded(pos, wi, pack, _F(0.001), dist - _F(0.002))
        valid = valid & ~blocked

        cos_light = jnp.maximum(_F(0), -(light_n.dot(wi)))
        valid = valid & (cos_light > _F(0))

        cos_theta = -(wi.dot(view_dir))
        phase = phase_hg(cos_theta, g)

        geom = cos_light / jnp.maximum(_F(1e-6), dist_sq)
        w = geom * phase * inv_pdf
        contrib = V3.broadcast_scalars(shape, ex, ey, ez) * w
        out = out + V3.where(valid, contrib, V3.zeros(shape))

    out = luminance_clamp(out * _F(2.0))
    # fogScatter <= 0 disables volume lighting entirely (gpu.go:1209-1211)
    zero = V3.zeros(shape)
    return V3.where(fog_block[1] > 0, out, zero)
