"""Thin-lens look-at camera ray generation, component-wise.

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
from .vec import V3

__all__ = ["camera_rays"]

_F = jnp.float32


def camera_rays(
    u, v, cam_block, width, height, rng: LaneRng, has_aperture: bool, lens_disk: bool = False
):
    """Generate primary rays for viewport coords u, v in [0,1] (lane grids).

    ``has_aperture`` is static (scene-level) so apertureless scenes skip
    the lens-sample draws entirely, like the shader's lensRadius branch.
    ``lens_disk`` (static, scene camera ``lens: "disk"``) swaps the
    reference's faithful unit-*ball* defocus (PHYSICS.md Q4) for a proper
    thin-lens concentric disk; the draw schedule is identical in both
    modes (three uniforms, the disk ignores the third) so A/B renders of
    the two bokeh models differ only in the lens offset itself.
    Returns (orig V3, dir V3 unit).
    """
    aspect = jnp.where(cam_block[15] != 0, cam_block[15], _F(width) / _F(height))
    theta = cam_block[12] * _F(3.14159265359 / 180.0)
    h = jnp.tan(theta * _F(0.5))
    viewport_h = _F(2.0) * h
    viewport_w = aspect * viewport_h

    # scalar camera basis (traced scalars; broadcast into lane math below)
    ox, oy, oz = cam_block[0], cam_block[1], cam_block[2]
    tx, ty, tz = cam_block[4], cam_block[5], cam_block[6]
    ux, uy, uz = cam_block[8], cam_block[9], cam_block[10]

    wx, wy, wz = ox - tx, oy - ty, oz - tz
    wlen = jnp.sqrt(jnp.maximum(wx * wx + wy * wy + wz * wz, _F(1e-20)))
    wx, wy, wz = wx / wlen, wy / wlen, wz / wlen
    # u = normalize(cross(up, w))
    cux, cuy, cuz = uy * wz - uz * wy, uz * wx - ux * wz, ux * wy - uy * wx
    culen = jnp.sqrt(jnp.maximum(cux * cux + cuy * cuy + cuz * cuz, _F(1e-20)))
    cux, cuy, cuz = cux / culen, cuy / culen, cuz / culen
    # v = cross(w, u)
    cvx, cvy, cvz = wy * cuz - wz * cuy, wz * cux - wx * cuz, wx * cuy - wy * cux

    focus = jnp.where(cam_block[14] != 0, cam_block[14], wlen)
    hw = viewport_w * focus  # horizontal = hw * u
    hv = viewport_h * focus  # vertical   = hv * v
    # lower-left corner components
    llx = ox - _F(0.5) * hw * cux - _F(0.5) * hv * cvx - wx * focus
    lly = oy - _F(0.5) * hw * cuy - _F(0.5) * hv * cvy - wy * focus
    llz = oz - _F(0.5) * hw * cuz - _F(0.5) * hv * cvz - wz * focus

    # pixel direction = ll + u*horizontal + v*vertical - origin
    dx = llx + u * (hw * cux) + v * (hv * cvx) - ox
    dy = lly + u * (hw * cuy) + v * (hv * cvy) - oy
    dz = llz + u * (hw * cuz) + v * (hv * cvz) - oz
    shape = u.shape

    if has_aperture:
        lens_radius = cam_block[13] * _F(0.5)
        if lens_disk:
            u1, u2, _u3 = rng.next3()
            rd = sampling.unit_disk(u1, u2) * lens_radius
        else:
            rd = sampling.unit_ball(*rng.next3()) * lens_radius
        offx = rd.x * cux + rd.y * cvx
        offy = rd.x * cuy + rd.y * cvy
        offz = rd.x * cuz + rd.y * cvz
        orig = V3(
            jnp.broadcast_to(ox, shape) + offx,
            jnp.broadcast_to(oy, shape) + offy,
            jnp.broadcast_to(oz, shape) + offz,
        )
        dirv = V3(dx - offx, dy - offy, dz - offz).normalize()
    else:
        orig = V3.broadcast_scalars(shape, ox, oy, oz)
        dirv = V3(dx, dy, dz).normalize()
    return orig, dirv
