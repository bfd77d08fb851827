"""Reflection / refraction / Fresnel (shader gpu.go:823-867), component-wise."""

from __future__ import annotations

import jax.numpy as jnp

from .vec import V3

__all__ = ["reflect", "refract", "schlick"]

_F = jnp.float32


def reflect(v: V3, n: V3) -> V3:
    """v - 2(v.n)n  (reflectVec, gpu.go:824-828)."""
    return v - n * (_F(2.0) * v.dot(n))


def refract(v: V3, n: V3, eta) -> V3:
    """Snell refraction with built-in TIR fallback (refractVec, gpu.go:832-852).

    v: unit incident; n: surface normal (toward incident side); eta: n1/n2
    ratio (lane grid).  Where eta^2 sin^2 > 1 the reflected direction is
    returned instead, exactly like the reference.
    """
    cos_theta = jnp.minimum((-v).dot(n), _F(1.0))
    sin2 = _F(1.0) - cos_theta * cos_theta
    tir = (eta * eta * sin2) > _F(1.0)

    r_perp = (v + n * cos_theta) * eta
    r_perp_len2 = r_perp.dot(r_perp)
    par_len = jnp.sqrt(jnp.maximum(_F(0), _F(1.0) - jnp.minimum(r_perp_len2, _F(1.0))))
    refracted = r_perp - n * par_len
    return V3.where(tir, reflect(v, n), refracted)


def schlick(cosine, rel_ior):
    """Schlick reflectance approximation (reflectance, gpu.go:855-867).

    rel_ior = n2/n1 (destination over source medium).
    """
    r0 = (rel_ior - _F(1.0)) / (rel_ior + _F(1.0))
    r0 = r0 * r0
    x = _F(1.0) - cosine
    x5 = x * x * x * x * x
    return r0 + (_F(1.0) - r0) * x5
