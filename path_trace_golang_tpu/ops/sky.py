"""Sky / background evaluation (shader backgroundColor, gpu.go:1073-1088)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["background_color"]

_F = jnp.float32


def background_color(unit_dir, sky_block):
    """Evaluate the sky for unit directions f32[N,3].

    sky_block layout (soa.py): [0]=type (0 legacy background / 1 solid /
    2 gradient), [4:7]=color, [8:11]=horizon, [12:15]=zenith.
    Gradient mixes horizon->zenith on (dir.y+1)/2 clamped (gpu.go:1076-1080).
    """
    st = jnp.round(sky_block[0]).astype(jnp.int32)
    t = jnp.clip((unit_dir[:, 1] + _F(1.0)) * _F(0.5), _F(0.0), _F(1.0))[:, None]
    gradient = sky_block[8:11][None, :] * (_F(1.0) - t) + sky_block[12:15][None, :] * t
    flat = jnp.broadcast_to(sky_block[4:7][None, :], unit_dir.shape)
    return jnp.where(st == 2, gradient, flat)
