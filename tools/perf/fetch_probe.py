"""Microbench: dynamic page-tile fetch cost by table layout.

The paged sweep fetches one page tile per visited page at a traced
scalar index.  paged_probe.py measured ~20 us per fetch with the
(P, 128, 32) triangle-major layout — lane-misaligned (minor dim 32).
Candidates:

* a  (P, 128, 32)  tris on sublanes, attrs on minor (shipping layout)
* b  (P, 32, 128)  attrs on sublanes, tris on lanes (tile-aligned)
* c  (P*32, 128)   2D, pl.ds 32-row slice (attr-major rows)
* d  (P*8, 128)    2D, pl.ds 8-row slice (fewer attrs fetched)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 80
ROWS = 32
N_BLOCKS = 16
LANE = 128


def make_fn(layout):
    if layout == "a":
        table = jnp.asarray(np.random.rand(P, 128, 32).astype(np.float32))
    elif layout == "b":
        table = jnp.asarray(np.random.rand(P, 32, 128).astype(np.float32))
    elif layout == "c":
        table = jnp.asarray(np.random.rand(P * 32, 128).astype(np.float32))
    else:
        table = jnp.asarray(np.random.rand(P * 8, 128).astype(np.float32))

    def kernel(t_ref, x_ref, o_ref):
        def body(p, acc):
            if layout == "a":
                tile = t_ref[p]
                v = tile[0, 0] + tile[127, 31]
            elif layout == "b":
                tile = t_ref[p]
                v = tile[0, 0] + tile[31, 127]
            elif layout == "c":
                tile = t_ref[pl.ds(p * 32, 32), :]
                v = tile[0, 0] + tile[31, 127]
            else:
                tile = t_ref[pl.ds(p * 8, 8), :]
                v = tile[0, 0] + tile[7, 127]
            return acc + v

        acc = lax.fori_loop(0, P, body, jnp.float32(0.0))
        o_ref[:] = x_ref[:] + acc

    lane = lambda: pl.BlockSpec(  # noqa: E731
        (ROWS, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(N_BLOCKS,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), lane()],
            out_specs=lane(),
            out_shape=jax.ShapeDtypeStruct((ROWS * N_BLOCKS, LANE), jnp.float32),
        )(table, x)

    return run


def main():
    x = jnp.zeros((ROWS * N_BLOCKS, LANE), jnp.float32)
    for layout in ("a", "b", "c", "d"):
        fn = make_fn(layout)
        jax.block_until_ready(fn(x))
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out = jax.block_until_ready(fn(x))
        dt = (time.perf_counter() - t0) / n
        per_fetch_us = dt / N_BLOCKS / P * 1e6
        print(f"layout {layout}: {dt * 1e3:6.2f} ms/launch, {per_fetch_us:6.2f} us/fetch")
    return 0


if __name__ == "__main__":
    sys.exit(main())
