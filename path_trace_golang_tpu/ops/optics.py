"""Reflection / refraction / Fresnel (shader gpu.go:823-867)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["reflect", "refract", "schlick"]

_F = jnp.float32


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def reflect(v, n):
    """v - 2(v.n)n  (reflectVec, gpu.go:824-828)."""
    return v - _F(2.0) * _dot(v, n) * n


def refract(v, n, eta):
    """Snell refraction with built-in TIR fallback (refractVec, gpu.go:832-852).

    v: unit incident f32[N,3]; n: surface normal (toward incident side);
    eta: n1/n2 ratio, f32[N].  Where eta^2 sin^2 > 1 the reflected
    direction is returned instead, exactly like the reference.
    """
    eta = eta[..., None] if jnp.ndim(eta) == 1 else eta
    cos_theta = jnp.minimum(_dot(-v, n), _F(1.0))
    sin2 = _F(1.0) - cos_theta * cos_theta
    tir = (eta * eta * sin2) > _F(1.0)

    r_perp = eta * (v + cos_theta * n)
    r_perp_len2 = _dot(r_perp, r_perp)
    r_par = -jnp.sqrt(jnp.maximum(_F(0), _F(1.0) - jnp.minimum(r_perp_len2, _F(1.0)))) * n
    refracted = r_perp + r_par
    return jnp.where(tir, reflect(v, n), refracted)


def schlick(cosine, rel_ior):
    """Schlick reflectance approximation (reflectance, gpu.go:855-867).

    rel_ior = n2/n1 (destination over source medium).
    """
    r0 = (rel_ior - _F(1.0)) / (rel_ior + _F(1.0))
    r0 = r0 * r0
    x = _F(1.0) - cosine
    x5 = x * x * x * x * x
    return r0 + (_F(1.0) - r0) * x5
