"""Thin-lens look-at camera ray generation.

Mirrors the shader's ``buildCamera`` (gpu.go:1091-1123), which itself
mirrors the CPU ``newCamera``/``getRay`` (camera.go:19-74): viewport from
vertical FOV, focus distance defaulting to |origin-target|, and — kept
faithfully — defocus sampled from a unit *ball* (not a disk), using only
the x/y components for the lens offset (camera.go:62, gpu.go:1113-1114).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import sampling
from .rng import LaneRng

__all__ = ["camera_rays"]

_F = jnp.float32


def _normalize(v):
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), _F(1e-20)))


def camera_rays(u, v, cam_block, width, height, rng: LaneRng, has_aperture: bool):
    """Generate primary rays for viewport coords u, v in [0,1].

    u/v: f32[N]; cam_block: the 16-float camera block (soa.py).
    ``has_aperture`` is static (scene-level) so apertureless scenes skip
    the lens-sample draws entirely, like the shader's lensRadius branch.
    Returns (orig f32[N,3], dir f32[N,3] unit).
    """
    aspect = jnp.where(
        cam_block[15] != 0, cam_block[15], _F(width) / _F(height)
    )
    theta = cam_block[12] * _F(3.14159265359 / 180.0)
    h = jnp.tan(theta * _F(0.5))
    viewport_h = _F(2.0) * h
    viewport_w = aspect * viewport_h

    origin = cam_block[0:3]
    target = cam_block[4:7]
    up = cam_block[8:11]

    w = _normalize(origin - target)
    uvec = _normalize(jnp.cross(up, w))
    vvec = jnp.cross(w, uvec)

    focus = jnp.where(
        cam_block[14] != 0,
        cam_block[14],
        jnp.sqrt(jnp.maximum(jnp.sum((origin - target) ** 2), _F(1e-20))),
    )
    horizontal = (viewport_w * focus) * uvec
    vertical = (viewport_h * focus) * vvec
    lower_left = origin - _F(0.5) * horizontal - _F(0.5) * vertical - w * focus

    n = u.shape[0]
    pix_dir = (
        lower_left[None, :]
        + u[:, None] * horizontal[None, :]
        + v[:, None] * vertical[None, :]
        - origin[None, :]
    )

    if has_aperture:
        lens_radius = cam_block[13] * _F(0.5)
        rd = sampling.unit_ball(*rng.next3()) * lens_radius
        offset = rd[:, 0:1] * uvec[None, :] + rd[:, 1:2] * vvec[None, :]
        orig = jnp.broadcast_to(origin[None, :], (n, 3)) + offset
        dirv = _normalize(pix_dir - offset)
    else:
        orig = jnp.broadcast_to(origin[None, :], (n, 3))
        dirv = _normalize(pix_dir)
    return orig, dirv
