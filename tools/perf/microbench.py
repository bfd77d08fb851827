"""Empirical VPU op-throughput roofline for the current chip.

Measures sustained per-lane throughput of the op classes the bounce loop
is made of (FMA, sqrt, rsqrt, divide, exp, sin, u32 hash draw, select)
with VMEM-resident Pallas kernels: a long op chain inside a fori_loop, so
neither XLA nor Mosaic can fold the work away.

Methodology note: a single host fetch through the axon tunnel costs
~26 ms, which swamps per-call timing.  Each measurement therefore chains
CHAIN dependent kernel invocations device-side and fetches one scalar at
the end; the fetch cost is amortized to noise.  The resulting ops/s are
the denominators for PERF.md's utilization estimates of the whole-pass
path-trace kernel.

Usage: python tools/perf/microbench.py  (meant for the real TPU).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANE = 256, 128  # one VMEM-resident block
INNER = 64  # unrolled ops per loop iteration (hides loop overhead)
ITERS = 2000
CHAIN = 20  # dependent kernel invocations per timed fetch


def _bench(name, kernel_body, ops_per_elem, reps=3):
    def kernel(x_ref, o_ref):
        def body(i, x):
            return kernel_body(x, i)

        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    x = jnp.full((ROWS, LANE), 0.73, jnp.float32)
    f = jax.jit(
        lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    )
    r = f(x)
    float(jnp.asarray(r)[0, 0])  # compile + tunnel warmup
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        r = x
        for _ in range(CHAIN):
            r = f(r)
        float(jnp.asarray(r)[0, 0])
        best = min(best, time.perf_counter() - t0)
    total = ROWS * LANE * ITERS * ops_per_elem * CHAIN
    rate = total / best
    print(f"{name:18s} {rate / 1e9:10.1f} Gop/s   ({best * 1e3:.2f} ms / {CHAIN} calls)")
    return rate


def main():
    print(f"devices: {jax.devices()}")

    def fma(x, i):
        for _ in range(INNER):
            x = x * jnp.float32(1.000001) + jnp.float32(1e-7)
        return x

    peak = _bench(f"fma (x{INNER})", fma, INNER)

    rates = {}

    def sqrt_chain(x, i):
        for _ in range(INNER):
            x = jnp.sqrt(x + jnp.float32(0.31))
        return x

    rates["sqrt"] = _bench(f"sqrt (x{INNER})", sqrt_chain, INNER)

    def rsqrt_chain(x, i):
        for _ in range(INNER):
            x = jax.lax.rsqrt(x + jnp.float32(0.77))
        return x

    rates["rsqrt"] = _bench(f"rsqrt (x{INNER})", rsqrt_chain, INNER)

    def div_chain(x, i):
        for _ in range(INNER):
            x = jnp.float32(1.37) / (x + jnp.float32(1.11))
        return x

    rates["divide"] = _bench(f"divide (x{INNER})", div_chain, INNER)

    def exp_chain(x, i):
        for _ in range(INNER):
            x = jnp.exp(-x) + jnp.float32(0.1)
        return x

    rates["exp"] = _bench(f"exp (x{INNER})", exp_chain, INNER)

    def sin_chain(x, i):
        for _ in range(INNER):
            x = jnp.sin(x) + jnp.float32(0.7)
        return x

    rates["sin"] = _bench(f"sin (x{INNER})", sin_chain, INNER)

    N_HASH = 16

    def hash_chain(x, i):
        # the renderer's RNG draw: 4 u32 mults + 4 shifts + 4 xors + convert
        s = jax.lax.bitcast_convert_type(x, jnp.uint32)
        for _ in range(N_HASH):
            s = s ^ (s >> 17)
            s = s * jnp.uint32(0xED5AD4BB)
            s = s ^ (s >> 11)
            s = s * jnp.uint32(0xAC4C1B51)
            s = s ^ (s >> 15)
            s = s * jnp.uint32(0x31848BAB)
            s = s ^ (s >> 14)
        i32 = jax.lax.bitcast_convert_type(s, jnp.int32)
        return i32.astype(jnp.float32) * jnp.float32(2.0**-32) + jnp.float32(0.5)

    rates["rng draw"] = _bench(f"rng draw (x{N_HASH})", hash_chain, N_HASH)

    def select_chain(x, i):
        for _ in range(INNER):
            x = jnp.where(x > jnp.float32(0.5), x * jnp.float32(0.731), x + jnp.float32(0.31))
        return x

    rates["cmp+select"] = _bench(f"cmp+select (x{INNER})", select_chain, INNER)

    print("\nfma-slot equivalents (cost of one op in units of one fma):")
    for k, v in rates.items():
        print(f"  {k:12s} {peak / v:6.2f}")


if __name__ == "__main__":
    main()
