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
    "sincos_2pi",
    "unit_ball",
    "unit_disk",
    "cosine_direction",
    "cosine_direction_onb",
    "sphere_surface",
    "sample_ggx",
]

_F = jnp.float32
TWO_PI = 6.28318530718

# Quarter-wave minimax coefficients (Cephes sinf/cosf on [-pi/4, pi/4]).
_S1, _S2, _S3 = -1.6666654611e-1, 8.3321608736e-3, -1.9515295891e-4
_C1, _C2, _C3 = 4.166664568298827e-2, -1.388731625493765e-3, 2.443315711809948e-5


def sincos_2pi(u):
    """(sin 2*pi*u, cos 2*pi*u) via quarter-wave minimax polynomials.

    The VPU executes library sin/cos as long multi-range polynomials
    (measured ~35 fma-slots EACH on v5e, tools/perf/microbench.py); every
    sampler here needs the pair, and the argument is always a uniform
    times 2*pi.  Folding the circle into octant quadrants and evaluating
    degree-7/8 minimax polynomials yields both values in ~22 slots with
    <= 1.2e-7 absolute error — indistinguishable from the library inside
    a Monte-Carlo estimator (PHYSICS.md D13).
    """
    t = u * _F(4.0)
    kf = jnp.round(t)
    r = (t - kf) * _F(1.5707963267948966)  # remainder angle in [-pi/4, pi/4]
    r2 = r * r
    sin_r = r + r * r2 * (_F(_S1) + r2 * (_F(_S2) + r2 * _F(_S3)))
    cos_r = _F(1.0) - _F(0.5) * r2 + r2 * r2 * (
        _F(_C1) + r2 * (_F(_C2) + r2 * _F(_C3))
    )
    k = kf.astype(jnp.int32)
    swap = (k & 1) != 0
    s = jnp.where(swap, cos_r, sin_r)
    c = jnp.where(swap, sin_r, cos_r)
    # quadrant signs: sin flips on k mod 4 in {2,3}, cos on {1,2}
    k2 = (k & 2) != 0
    sin_neg = k2
    cos_neg = k2 ^ swap
    s = jnp.where(sin_neg, -s, s)
    c = jnp.where(cos_neg, -c, c)
    return s, c


def unit_ball(u1, u2, u3) -> V3:
    """Uniform point in the unit ball, closed form.

    Same distribution as the shader's rejection loop (gpu.go:743-750):
    uniform direction (z = 1-2u, phi = 2*pi*u) scaled by r = u^(1/3).
    Used for thin-lens defocus, which (faithfully to camera.go:62 and
    gpu.go:1113) samples a unit *ball*, not a disk.
    """
    z = _F(1.0) - _F(2.0) * u1
    r = jnp.sqrt(jnp.maximum(_F(0), _F(1.0) - z * z))
    sin_phi, cos_phi = sincos_2pi(u2)
    # cbrt via exp/log (TPU Mosaic has no cbrt primitive); u3=0 maps to a
    # ~1e-10 radius instead of 0 — inconsequential for the lens offset
    rad = jnp.exp(jnp.log(jnp.maximum(u3, _F(1e-30))) * _F(1.0 / 3.0))
    return V3(r * cos_phi * rad, r * sin_phi * rad, z * rad)


def unit_disk(u1, u2) -> V3:
    """Uniform point on the unit disk (z = 0), closed form.

    The thin-lens alternative to the reference's unit-*ball* defocus
    (scene camera ``lens: "disk"``, PHYSICS.md Q4): r = sqrt(u), the
    textbook area-uniform disk sample.
    """
    r = jnp.sqrt(u1)
    sin_phi, cos_phi = sincos_2pi(u2)
    return V3(r * cos_phi, r * sin_phi, jnp.zeros_like(u1))


def cosine_direction(normal: V3, u1, u2) -> V3:
    """Cosine-weighted hemisphere direction around ``normal``.

    Bit-faithful to the shader's randomCosineDirection (gpu.go:752-774)
    *including its quirk*: the frame is (u = world axis, v = n x u, w = n)
    where u is NOT re-orthogonalized against n, so the frame is skewed and
    the result is re-normalized — a slight, deliberate bias match.
    """
    sin_phi, cos_phi = sincos_2pi(u1)
    cos_theta = jnp.sqrt(u2)
    sin_theta = jnp.sqrt(jnp.maximum(_F(0), _F(1.0) - u2))

    use_y = jnp.abs(normal.x) > _F(0.9)
    zero = jnp.zeros_like(normal.x)
    one = jnp.ones_like(normal.x)
    axis = V3(jnp.where(use_y, zero, one), jnp.where(use_y, one, zero), zero)
    v = normal.cross(axis).normalize()
    # w = normal (assumed unit)

    lx = sin_theta * cos_phi
    ly = sin_theta * sin_phi
    d = axis * lx + v * ly + normal * cos_theta
    return d.normalize()


def cosine_direction_onb(normal: V3, u1, u2) -> V3:
    """Cosine-weighted hemisphere with a *proper* orthonormal basis.

    The CPU core's randomCosineDirection (math.go:94-131) orthonormalizes
    its frame (v = w x axis normalized, u = v x w), unlike the GPU
    shader's skewed frame (Q3) — the cpu contract uses this variant.
    """
    sin_phi, cos_phi = sincos_2pi(u1)
    cos_theta = jnp.sqrt(u2)
    sin_theta = jnp.sqrt(jnp.maximum(_F(0), _F(1.0) - u2))

    use_y = jnp.abs(normal.x) > _F(0.9)
    zero = jnp.zeros_like(normal.x)
    one = jnp.ones_like(normal.x)
    axis = V3(jnp.where(use_y, zero, one), jnp.where(use_y, one, zero), zero)
    w = normal
    v = w.cross(axis).normalize()
    u = v.cross(w)

    return u * (sin_theta * cos_phi) + v * (sin_theta * sin_phi) + w * cos_theta


def sphere_surface(u1, u2) -> V3:
    """Uniform direction on the unit sphere (sampleLightGeometry, gpu.go:900-911)."""
    z = _F(1.0) - _F(2.0) * u1
    r = jnp.sqrt(jnp.maximum(_F(0), _F(1.0) - z * z))
    sin_phi, cos_phi = sincos_2pi(u2)
    return V3(r * cos_phi, r * sin_phi, z)


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
    sin_phi, cos_phi = sincos_2pi(u1)

    # orthonormal frame (gpu.go:791-795): up = |n.z|<0.999 ? z-axis : x-axis
    use_x = jnp.abs(normal.z) >= _F(0.999)
    zero = jnp.zeros_like(normal.x)
    one = jnp.ones_like(normal.x)
    up = V3(jnp.where(use_x, one, zero), zero, jnp.where(use_x, zero, one))
    tangent = up.cross(normal).normalize()
    bitangent = normal.cross(tangent)

    h = (
        tangent * (sin_theta * cos_phi)
        + bitangent * (sin_theta * sin_phi)
        + normal * cos_theta
    ).normalize()

    refl = incident - h * (_F(2.0) * incident.dot(h))
    below = refl.dot(normal) <= _F(0)
    mirror = incident - normal * (_F(2.0) * incident.dot(normal))
    return V3.where(below, mirror, refl).normalize()
