"""Direction sampling (closed-form, rejection-free).

TPU lanes are SIMD; the reference's bounded rejection loops
(``randomInUnitSphere``, gpu.go:743-750 / math.go:66-85) would force every
lane to pay the worst case, so they are replaced by closed-form inverse-CDF
samplers with *identical target distributions* (SURVEY.md §7 hard-part 2).
All samplers consume a fixed number of uniforms per call.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "unit_ball",
    "cosine_direction",
    "sphere_surface",
    "sample_ggx",
]

_F = jnp.float32
TWO_PI = _F(6.28318530718)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def unit_ball(u1, u2, u3):
    """Uniform point in the unit ball, closed form.

    Same distribution as the shader's rejection loop (gpu.go:743-750):
    uniform direction (z = 1-2u, phi = 2*pi*u) scaled by r = u^(1/3).
    Used for thin-lens defocus, which (faithfully to camera.go:62 and
    gpu.go:1113) samples a unit *ball*, not a disk.
    Returns f32[..., 3].
    """
    z = _F(1.0) - _F(2.0) * u1
    r = jnp.sqrt(jnp.maximum(_F(0), _F(1.0) - z * z))
    phi = TWO_PI * u2
    d = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    rad = jnp.cbrt(u3)
    return d * rad[..., None]


def cosine_direction(normal, u1, u2):
    """Cosine-weighted hemisphere direction around ``normal``.

    Bit-faithful to the shader's randomCosineDirection (gpu.go:752-774)
    *including its quirk*: the frame is (u = world axis, v = n x u, w = n)
    where u is NOT re-orthogonalized against n, so the frame is skewed and
    the result is re-normalized — a slight, deliberate bias match.
    normal: f32[N,3]; u1,u2: f32[N].
    """
    phi = TWO_PI * u1
    cos_theta = jnp.sqrt(u2)
    sin_theta = jnp.sqrt(jnp.maximum(_F(0), _F(1.0) - u2))

    use_y = jnp.abs(normal[:, 0]) > _F(0.9)
    axis = jnp.where(
        use_y[:, None],
        jnp.array([0.0, 1.0, 0.0], dtype=jnp.float32),
        jnp.array([1.0, 0.0, 0.0], dtype=jnp.float32),
    )
    v = jnp.cross(normal, axis)
    v = v / jnp.sqrt(jnp.maximum(_dot(v, v), _F(1e-20)))
    w = normal

    local_x = (sin_theta * jnp.cos(phi))[:, None]
    local_y = (sin_theta * jnp.sin(phi))[:, None]
    local_z = cos_theta[:, None]
    d = local_x * axis + local_y * v + local_z * w
    return d / jnp.sqrt(jnp.maximum(_dot(d, d), _F(1e-20)))


def sphere_surface(u1, u2):
    """Uniform direction on the unit sphere (sampleLightGeometry, gpu.go:900-911)."""
    z = _F(1.0) - _F(2.0) * u1
    r = jnp.sqrt(jnp.maximum(_F(0), _F(1.0) - z * z))
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_ggx(incident, normal, roughness, u1, u2):
    """GGX/Trowbridge-Reitz importance-sampled reflection direction.

    Follows sampleGGX (gpu.go:778-821): sample a half-vector from the GGX
    NDF in an orthonormal frame around ``normal``, reflect the incident ray
    about it, falling back to the mirror direction when the result leaves
    the upper hemisphere.

    Documented deviation (PHYSICS.md D3): the reference computes
    ``reflect(-viewDir, halfVec)`` which is the *negated* reflection and
    always points below the surface; we use the correct
    ``reflect(incident, halfVec) = d - 2(d.h)h``.

    incident: f32[N,3] unit ray direction (pointing at the surface).
    """
    alpha = roughness * roughness
    alpha2 = alpha * alpha

    cos_theta = jnp.sqrt(
        jnp.maximum(_F(0), (_F(1.0) - u2) / (_F(1.0) + (alpha2 - _F(1.0)) * u2))
    )
    sin_theta = jnp.sqrt(jnp.maximum(_F(0), _F(1.0) - cos_theta * cos_theta))
    phi = TWO_PI * u1

    # orthonormal frame (gpu.go:791-795): up = |n.z|<0.999 ? z-axis : x-axis
    use_x = jnp.abs(normal[:, 2]) >= _F(0.999)
    up = jnp.where(
        use_x[:, None],
        jnp.array([1.0, 0.0, 0.0], dtype=jnp.float32),
        jnp.array([0.0, 0.0, 1.0], dtype=jnp.float32),
    )
    tangent = jnp.cross(up, normal)
    tangent = tangent / jnp.sqrt(jnp.maximum(_dot(tangent, tangent), _F(1e-20)))
    bitangent = jnp.cross(normal, tangent)

    h = (
        (sin_theta * jnp.cos(phi))[:, None] * tangent
        + (sin_theta * jnp.sin(phi))[:, None] * bitangent
        + cos_theta[:, None] * normal
    )
    h = h / jnp.sqrt(jnp.maximum(_dot(h, h), _F(1e-20)))

    refl = incident - _F(2.0) * _dot(incident, h) * h
    below = jnp.sum(refl * normal, axis=-1) <= _F(0)
    mirror = incident - _F(2.0) * _dot(incident, normal) * normal
    out = jnp.where(below[:, None], mirror, refl)
    return out / jnp.sqrt(jnp.maximum(_dot(out, out), _F(1e-20)))
