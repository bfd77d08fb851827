"""Direction sampling (closed-form, rejection-free), component-wise.

TPU lanes are SIMD; the reference's bounded rejection loops
(``randomInUnitSphere``, gpu.go:743-750 / math.go:66-85) would force every
lane to pay the worst case, so they are replaced by closed-form inverse-CDF
samplers with *identical target distributions* (SURVEY.md §7 hard-part 2).
All samplers consume a fixed number of uniforms per call and operate on
``[rows, 128]`` lane grids via :class:`~path_trace_golang_tpu.ops.vec.V3`.
"""

from __future__ import annotations

import jax.numpy as jnp

from .vec import V3

__all__ = [
    "unit_ball",
    "cosine_direction",
    "cosine_direction_onb",
    "sphere_surface",
    "sample_ggx",
]

_F = jnp.float32
TWO_PI = 6.28318530718


def unit_ball(u1, u2, u3) -> V3:
    """Uniform point in the unit ball, closed form.

    Same distribution as the shader's rejection loop (gpu.go:743-750):
    uniform direction (z = 1-2u, phi = 2*pi*u) scaled by r = u^(1/3).
    Used for thin-lens defocus, which (faithfully to camera.go:62 and
    gpu.go:1113) samples a unit *ball*, not a disk.
    """
    z = _F(1.0) - _F(2.0) * u1
    r = jnp.sqrt(jnp.maximum(_F(0), _F(1.0) - z * z))
    phi = TWO_PI * u2
    # cbrt via exp/log (TPU Mosaic has no cbrt primitive); u3=0 maps to a
    # ~1e-10 radius instead of 0 — inconsequential for the lens offset
    rad = jnp.exp(jnp.log(jnp.maximum(u3, _F(1e-30))) * _F(1.0 / 3.0))
    return V3(r * jnp.cos(phi) * rad, r * jnp.sin(phi) * rad, z * rad)


def cosine_direction(normal: V3, u1, u2) -> V3:
    """Cosine-weighted hemisphere direction around ``normal``.

    Bit-faithful to the shader's randomCosineDirection (gpu.go:752-774)
    *including its quirk*: the frame is (u = world axis, v = n x u, w = n)
    where u is NOT re-orthogonalized against n, so the frame is skewed and
    the result is re-normalized — a slight, deliberate bias match.
    """
    phi = TWO_PI * u1
    cos_theta = jnp.sqrt(u2)
    sin_theta = jnp.sqrt(jnp.maximum(_F(0), _F(1.0) - u2))

    use_y = jnp.abs(normal.x) > _F(0.9)
    zero = jnp.zeros_like(normal.x)
    one = jnp.ones_like(normal.x)
    axis = V3(jnp.where(use_y, zero, one), jnp.where(use_y, one, zero), zero)
    v = normal.cross(axis).normalize()
    # w = normal (assumed unit)

    lx = sin_theta * jnp.cos(phi)
    ly = sin_theta * jnp.sin(phi)
    d = axis * lx + v * ly + normal * cos_theta
    return d.normalize()


def cosine_direction_onb(normal: V3, u1, u2) -> V3:
    """Cosine-weighted hemisphere with a *proper* orthonormal basis.

    The CPU core's randomCosineDirection (math.go:94-131) orthonormalizes
    its frame (v = w x axis normalized, u = v x w), unlike the GPU
    shader's skewed frame (Q3) — the cpu contract uses this variant.
    """
    phi = TWO_PI * u1
    cos_theta = jnp.sqrt(u2)
    sin_theta = jnp.sqrt(jnp.maximum(_F(0), _F(1.0) - u2))

    use_y = jnp.abs(normal.x) > _F(0.9)
    zero = jnp.zeros_like(normal.x)
    one = jnp.ones_like(normal.x)
    axis = V3(jnp.where(use_y, zero, one), jnp.where(use_y, one, zero), zero)
    w = normal
    v = w.cross(axis).normalize()
    u = v.cross(w)

    return u * (sin_theta * jnp.cos(phi)) + v * (sin_theta * jnp.sin(phi)) + w * cos_theta


def sphere_surface(u1, u2) -> V3:
    """Uniform direction on the unit sphere (sampleLightGeometry, gpu.go:900-911)."""
    z = _F(1.0) - _F(2.0) * u1
    r = jnp.sqrt(jnp.maximum(_F(0), _F(1.0) - z * z))
    phi = TWO_PI * u2
    return V3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def sample_ggx(incident: V3, normal: V3, roughness, u1, u2) -> V3:
    """GGX/Trowbridge-Reitz importance-sampled reflection direction.

    Follows sampleGGX (gpu.go:778-821): sample a half-vector from the GGX
    NDF in an orthonormal frame around ``normal``, reflect the incident ray
    about it, falling back to the mirror direction when the result leaves
    the upper hemisphere.

    Documented deviation (PHYSICS.md D3): the reference computes
    ``reflect(-viewDir, halfVec)`` which is the *negated* reflection and
    always points below the surface; we use the correct
    ``reflect(incident, halfVec) = d - 2(d.h)h``.
    """
    alpha = roughness * roughness
    alpha2 = alpha * alpha

    cos_theta = jnp.sqrt(
        jnp.maximum(_F(0), (_F(1.0) - u2) / (_F(1.0) + (alpha2 - _F(1.0)) * u2))
    )
    sin_theta = jnp.sqrt(jnp.maximum(_F(0), _F(1.0) - cos_theta * cos_theta))
    phi = TWO_PI * u1

    # orthonormal frame (gpu.go:791-795): up = |n.z|<0.999 ? z-axis : x-axis
    use_x = jnp.abs(normal.z) >= _F(0.999)
    zero = jnp.zeros_like(normal.x)
    one = jnp.ones_like(normal.x)
    up = V3(jnp.where(use_x, one, zero), zero, jnp.where(use_x, zero, one))
    tangent = up.cross(normal).normalize()
    bitangent = normal.cross(tangent)

    h = (
        tangent * (sin_theta * jnp.cos(phi))
        + bitangent * (sin_theta * jnp.sin(phi))
        + normal * cos_theta
    ).normalize()

    refl = incident - h * (_F(2.0) * incident.dot(h))
    below = refl.dot(normal) <= _F(0)
    mirror = incident - normal * (_F(2.0) * incident.dot(normal))
    return V3.where(below, mirror, refl).normalize()
