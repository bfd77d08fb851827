"""Fetch-cost attribution: dynamic index vs scalar extract vs vector use."""
import sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, ROWS, N_BLOCKS, LANE = 80, 32, 16, 128
table = jnp.asarray(np.random.rand(P * 32, 128).astype(np.float32))

def make_fn(variant):
    def kernel(t_ref, x_ref, o_ref):
        if variant == "dyn_vec":
            # dynamic 32-row slice, vector accumulate (no scalar reads)
            def body(p, acc):
                tile = t_ref[pl.ds(p * 32, 32), :]
                return acc + tile
            acc = lax.fori_loop(0, P, body, jnp.zeros((32, 128), jnp.float32))
            o_ref[:] = x_ref[:] + jnp.sum(acc, axis=0, keepdims=True)
        elif variant == "dyn_row":
            # dynamic single-row slice, vector accumulate
            def body(p, acc):
                return acc + t_ref[pl.ds(p * 32, 1), :]
            acc = lax.fori_loop(0, P, body, jnp.zeros((1, 128), jnp.float32))
            o_ref[:] = x_ref[:] + acc
        elif variant == "static_vec":
            acc = jnp.zeros((32, 128), jnp.float32)
            for p in range(P):
                acc = acc + t_ref[p * 32 : (p + 1) * 32, :]
            o_ref[:] = x_ref[:] + jnp.sum(acc, axis=0, keepdims=True)
        elif variant == "dyn_scalar":
            def body(p, acc):
                tile = t_ref[pl.ds(p * 32, 32), :]
                return acc + tile[0, 0]
            acc = lax.fori_loop(0, P, body, jnp.float32(0.0))
            o_ref[:] = x_ref[:] + acc
        elif variant == "loop_only":
            def body(p, acc):
                return acc + p.astype(jnp.float32)
            acc = lax.fori_loop(0, P, body, jnp.float32(0.0))
            o_ref[:] = x_ref[:] + acc
    lane = lambda: pl.BlockSpec((ROWS, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    @jax.jit
    def run(x):
        return pl.pallas_call(kernel, grid=(N_BLOCKS,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), lane()],
            out_specs=lane(),
            out_shape=jax.ShapeDtypeStruct((ROWS * N_BLOCKS, LANE), jnp.float32))(table, x)
    return run

x = jnp.zeros((ROWS * N_BLOCKS, LANE), jnp.float32)
for v in ("loop_only", "dyn_row", "dyn_vec", "static_vec", "dyn_scalar"):
    fn = make_fn(v)
    jax.block_until_ready(fn(x))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn(x))
    dt = (time.perf_counter() - t0) / n
    print(f"{v:11s}: {dt*1e3:6.2f} ms/launch, {dt/N_BLOCKS/P*1e6:6.2f} us/page")
