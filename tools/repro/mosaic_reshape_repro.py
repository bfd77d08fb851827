"""Minimal reproducer: in-kernel (rows,128)->(rows/G, G*128) relayout.

Round-4 context (PERF.md "Row-group rounds"): the row-grouped BVH gather
walk is bit-identical to the dense sweep under XLA:CPU, but on real TPU
the same kernel renders the 10k-triangle bench image WRONG (mean 167 vs
254) with PATHTRACER_BVH_GROUP_ROWS=4.  The suspected culprit is the
whole-grid in-kernel reshape (rows, 128) -> (rows/G, G*128) feeding a
lax.while_loop whose carries are (1, G*128) rows.

This script isolates that shape pattern in escalating stages, each a
tiny standalone Pallas kernel whose output is compared against the same
math traced WITHOUT the reshape.  Run on real TPU; every stage passes
under JAX_PLATFORMS=cpu (interpret-equivalent), so any TPU failure here
is a Mosaic lowering/relayout defect, not framework code.

  stage 1  reshape round-trip identity (masked-broadcast unflatten)
  stage 2  reshape -> elementwise math -> unflatten
  stage 3  reshape -> per-row slice loop with f32 carries
  stage 4  stage 3 + the walk's bit-ops (iota compare, shifts, where)
  stage 5  stage 4 + a one-hot bf16-limb matmul per iteration
           (the full shape skeleton of ops/bvh._traverse_gather)

Usage: python tools/repro/mosaic_reshape_repro.py [G]
Exit 0 when all stages match; 1 with the first failing stage otherwise.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANE = 8, 128


def _unflatten_row(x, gstep):
    """(1, gstep*128) -> (gstep, 128) via masked broadcasts (the
    framework's Mosaic-safe inverse; ops/bvh._unflatten_row)."""
    if gstep == 1:
        return x
    lane = x.shape[1] // gstep
    riota = lax.broadcasted_iota(jnp.int32, (gstep, 1), 0)
    out = None
    for i in range(gstep):
        piece = jnp.broadcast_to(x[:, i * lane : (i + 1) * lane], (gstep, lane))
        out = piece if out is None else jnp.where(riota == i, piece, out)
    return out


def _body(stage: int, g: int, x, w):
    """The staged computation, shared verbatim by the kernel and the
    XLA reference trace.  x: (ROWS, LANE) f32; w: (LANE, LANE) f32."""
    grows = ROWS // g
    gl = g * LANE
    xf = x.reshape(grows, gl)  # <- the suspect in-kernel relayout
    if stage == 1:
        rows = [_unflatten_row(xf[s : s + 1, :], g) for s in range(grows)]
        return jnp.concatenate(rows, axis=0)
    if stage == 2:
        y = xf * jnp.float32(2.0) + jnp.float32(1.0)
        rows = [_unflatten_row(y[s : s + 1, :], g) for s in range(grows)]
        return jnp.concatenate(rows, axis=0)

    out_rows = []
    for s in range(grows):
        row = xf[s : s + 1, :]  # (1, g*128) carried row, as in the walk
        if stage == 3:

            def body3(carry):
                acc, i = carry
                return (acc * jnp.float32(0.5) + row, i + 1)

            acc, _ = lax.while_loop(
                lambda c: c[1] < 3, body3, (row * jnp.float32(0.0), jnp.int32(0))
            )
        else:
            # stage 4/5: integer mask words + pop-style bit ops, the
            # walk's actual carry mix
            words0 = (row * jnp.float32(0.0)).astype(jnp.int32) | jnp.int32(
                0b10110
            )

            def pop(w_):
                low = w_ & (-w_)
                bits = lax.bitcast_convert_type(
                    low.astype(jnp.float32), jnp.int32
                )
                idx = (bits >> 23) - 127
                return jnp.where(w_ > 0, idx, jnp.int32(LANE)), w_ & ~low

            def body45(carry):
                acc, words, i = carry
                p_l, words = pop(words)
                if stage == 5:
                    iota_p = lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)
                    onehot = (iota_p == p_l).astype(jnp.bfloat16)
                    gth = lax.dot_general(
                        w.astype(jnp.bfloat16),
                        onehot,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    contrib = jnp.min(gth, axis=0, keepdims=True)
                else:
                    contrib = p_l.astype(jnp.float32)
                return (acc + contrib * row, words, i + 1)

            acc, _w, _i = lax.while_loop(
                lambda c: c[2] < 3,
                body45,
                (row * jnp.float32(0.0), words0, jnp.int32(0)),
            )
        out_rows.append(_unflatten_row(acc, g))
    return jnp.concatenate(out_rows, axis=0)


def run_stage(stage: int, g: int, x, w):
    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = _body(stage, g, x_ref[:], w_ref[:])

    got = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, w)
    want = jax.jit(lambda a, b: _body(stage, g, a, b))(x, w)
    return np.asarray(got), np.asarray(want)


def main() -> int:
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    r = np.random.RandomState(7)
    x = jnp.asarray(r.uniform(0.5, 2.0, (ROWS, LANE)).astype(np.float32))
    w = jnp.asarray(r.uniform(-1.0, 1.0, (LANE, LANE)).astype(np.float32))

    print(f"backend={jax.default_backend()}  G={g}", flush=True)
    fail = None
    for stage in (1, 2, 3, 4, 5):
        try:
            got, want = run_stage(stage, g, x, w)
        except Exception as e:  # compile failure is also a finding
            print(f"stage {stage}: COMPILE/RUN ERROR: {type(e).__name__}: {e}")
            fail = fail or stage
            continue
        ok = np.array_equal(got, want)
        diff = float(np.abs(got - want).max()) if not ok else 0.0
        print(f"stage {stage}: {'ok' if ok else f'MISMATCH (max abs diff {diff:g})'}")
        if not ok and fail is None:
            fail = stage
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
