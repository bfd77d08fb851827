"""Component-wise 3-vectors over TPU-friendly lane grids.

The hot path keeps every lane quantity as a 2-D ``[rows, 128]`` f32 array
(lane dim minor, matching the VPU's 8x128 register tiles) and every 3-D
vector as a :class:`V3` of three such arrays.  This keeps ALL vector math
purely element-wise — no axis reductions, no [N,3] minor-dim-3 layouts
(which waste 125/128 lanes), no transposes.  Measured on v5e, the same
sweep runs 4-6x faster on [R,128] lanes than on flat [N] and ~20x faster
than [N,3]-with-reductions layouts.

V3 is a NamedTuple, hence a pytree: it threads through jit/while_loop
carries unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["V3", "LANE"]

LANE = 128  # minor lane width; lane grids are [rows, LANE]
_F = jnp.float32


class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # --- arithmetic (elementwise; scalar or V3 operands) ---
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    def dot(self, o: "V3"):
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o: "V3") -> "V3":
        return V3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def length_sq(self):
        return self.dot(self)

    def length(self):
        return jnp.sqrt(jnp.maximum(self.length_sq(), _F(0)))

    def normalize(self, eps=1e-20) -> "V3":
        inv = _F(1.0) / jnp.sqrt(jnp.maximum(self.length_sq(), eps))
        return V3(self.x * inv, self.y * inv, self.z * inv)

    def max_comp(self):
        return jnp.maximum(self.x, jnp.maximum(self.y, self.z))

    def exp(self) -> "V3":
        return V3(jnp.exp(self.x), jnp.exp(self.y), jnp.exp(self.z))

    def any_positive(self):
        return (self.x > 0) | (self.y > 0) | (self.z > 0)

    # --- selection / construction ---
    @staticmethod
    def where(mask, a: "V3", b: "V3") -> "V3":
        return V3(
            jnp.where(mask, a.x, b.x),
            jnp.where(mask, a.y, b.y),
            jnp.where(mask, a.z, b.z),
        )

    @classmethod
    def full(cls, shape, vx, vy=None, vz=None, dtype=jnp.float32) -> "V3":
        if vy is None:
            vy = vx
        if vz is None:
            vz = vx
        return cls(
            jnp.full(shape, vx, dtype),
            jnp.full(shape, vy, dtype),
            jnp.full(shape, vz, dtype),
        )

    @classmethod
    def zeros(cls, shape, dtype=jnp.float32) -> "V3":
        z = jnp.zeros(shape, dtype)
        return cls(z, z, z)

    @classmethod
    def broadcast_scalars(cls, shape, sx, sy, sz) -> "V3":
        """Lift three traced scalars to a lane grid."""
        return cls(
            jnp.broadcast_to(sx, shape),
            jnp.broadcast_to(sy, shape),
            jnp.broadcast_to(sz, shape),
        )

    @classmethod
    def from_rows(cls, arr) -> "V3":
        """[N,3] -> V3 of [N] (caller reshapes lane grids)."""
        return cls(arr[..., 0], arr[..., 1], arr[..., 2])

    def to_rows(self):
        """V3 of [...] -> [..., 3]."""
        return jnp.stack([self.x, self.y, self.z], axis=-1)
