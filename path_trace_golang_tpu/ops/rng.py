"""Counter-seeded per-lane RNG.

The reference shader uses a xorshift-multiply hash PRNG with one uint32
state per pixel (``hash_u``/``rng``, gpu.go:444-458), seeded from
``pix.x*1973 ^ pix.y*9277 ^ uFrameSeed`` (gpu.go:1679).  We keep the exact
same generator — it is cheap (7 VPU uint ops per draw), branch-free and
vectorizes perfectly — but replace the reference's *time-based* frame seed
(gpu.go:2218) with a deterministic ``base_seed + pass_index`` counter so
renders are reproducible (SURVEY.md §7 hard-part 4).

All functions operate element-wise on uint32 arrays of any shape ("lanes").
Unlike the SIMT shader, the vectorized integrator draws unconditionally for
every lane in every (masked) branch; the draw *schedule* is therefore fixed
per bounce, which keeps lanes decorrelated and deterministic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["hash_u", "seed_lanes", "uniform", "LaneRng"]

_U = jnp.uint32


def hash_u(x):
    """lowbias-style avalanche hash, bit-exact with gpu.go:444-453."""
    x = jnp.asarray(x, dtype=_U)
    x = x ^ (x >> 17)
    x = x * _U(0xED5AD4BB)
    x = x ^ (x >> 11)
    x = x * _U(0xAC4C1B51)
    x = x ^ (x >> 15)
    x = x * _U(0x31848BAB)
    x = x ^ (x >> 14)
    return x


def seed_lanes(px, py, frame_seed):
    """Initial per-lane state (gpu.go:1679): hash(px*1973 ^ py*9277 ^ seed)."""
    px = jnp.asarray(px, dtype=_U)
    py = jnp.asarray(py, dtype=_U)
    frame_seed = jnp.asarray(frame_seed, dtype=_U)
    return hash_u(px * _U(1973) ^ py * _U(9277) ^ frame_seed)


def uniform(state):
    """Advance state, return (new_state, u ~ [0,1)) (gpu.go:455-458).

    The reference maps ``float(state) / 2**32``.  TPU Mosaic has no
    uint32 -> f32 convert, so we bit-reinterpret to int32 and shift:
    ``u = i32(state) * 2**-32 + 0.5`` — exactly the reference's value
    rotated by 0.5 (mod 1), i.e. the identical uniform distribution with
    the same 2**-32 granularity, computable on both the XLA and Pallas
    paths with bit-identical results.
    """
    state = hash_u(state)
    i = jax.lax.bitcast_convert_type(state, jnp.int32)
    u = i.astype(jnp.float32) * jnp.float32(2.0**-32) + jnp.float32(0.5)
    return state, u


class LaneRng:
    """Thin mutable wrapper so integrator code reads like the shader.

    The state array itself is carried functionally through lax loops
    (``rng.state`` in / out); inside one traced step, ``rng.next()``
    mimics the shader's ``rng(state)`` call sites.
    """

    __slots__ = ("state",)

    def __init__(self, state):
        self.state = jnp.asarray(state, dtype=_U)

    def next(self):
        self.state, u = uniform(self.state)
        return u

    def next3(self):
        return self.next(), self.next(), self.next()
