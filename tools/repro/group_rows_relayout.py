"""Minimal repro: in-kernel (rows,128) -> (rows/G, G*128) reshape on TPU.

Context (PERF.md round 4, ops/bvh.py GROUP_ROWS): the row-grouped BVH
gather walk flattens lane grids (rows, 128) -> (rows/G, G*128) INSIDE a
Pallas kernel so one while-loop round serves G sublane rows.  Under
XLA:CPU the grouped walk is bit-identical to the ungrouped one
(tests/test_fuzz.py), but on real TPU hardware G=4 renders the
10k-triangle bench image WRONG (mean 167 vs 254) — a silent Mosaic
miscompile, not an error.

This script isolates the suspect pattern to a ~20-line kernel:

  1. reshape (32, 128) -> (8, 512) inside the kernel   [the flatten]
  2. run a reduction/broadcast over the widened row     [any use]
  3. rebuild (32, 128) via masked broadcasts            [_unflatten_row]

and compares compiled-TPU output against the interpreter and against
the pure-XLA reference.  Any mismatch printed below is the bug.

Usage:  python tools/repro/group_rows_relayout.py [G]
        (defaults G=4; exit code 1 on mismatch — i.e. repro'd)
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

ROWS, LANE = 32, 128


def _unflatten_row(x, g):
    """(1, g*128) -> (g, 128) via masked broadcasts (the lanes->sublanes
    direction is not a supported Mosaic shape cast; see ops/bvh.py)."""
    if g == 1:
        return x
    lane = x.shape[1] // g
    riota = lax.broadcasted_iota(jnp.int32, (g, 1), 0)
    out = None
    for i in range(g):
        piece = jnp.broadcast_to(x[:, i * lane : (i + 1) * lane], (g, lane))
        out = piece if out is None else jnp.where(riota == i, piece, out)
    return out


def body(x, g):
    """The suspect pattern, shared by kernel and XLA reference.

    Flatten G sublane rows into one wide row, then per wide row run a
    small while loop whose carry mixes the wide grid with a cross-lane
    reduction (the gather walk's pop/min-key shape), then unflatten."""
    grows = ROWS // g
    xf = x.reshape(grows, g * LANE)
    rows = []
    for s in range(grows):
        row = xf[s : s + 1, :]  # (1, g*128)

        def cond(c):
            i, _acc = c
            return i < 3

        def bstep(c):
            i, acc = c
            # cross-lane min like the walk's sentinel pop, then fold it
            # back in elementwise — exercises relayouts both ways
            m = jnp.min(acc)
            return i + 1, acc + jnp.where(acc > m, 1.0, 0.0)

        _i, acc = lax.while_loop(cond, bstep, (jnp.int32(0), row * 2.0))
        rows.append(_unflatten_row(acc, g))
    return jnp.concatenate(rows, axis=0)


def main() -> int:
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    rng = np.random.RandomState(7)
    x_np = rng.uniform(-4, 4, (ROWS, LANE)).astype(np.float32)
    x = jnp.asarray(x_np)

    def kernel(x_ref, o_ref):
        o_ref[:] = body(x_ref[:], g)

    def run(interpret):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x)

    ref = np.asarray(jax.jit(lambda a: body(a, g))(x))
    interp = np.asarray(run(True))
    print(f"G={g}  backend={jax.default_backend()}")
    print(f"  xla-vs-interpret  maxdiff: {np.abs(ref - interp).max():.6g}")
    try:
        hw = np.asarray(jax.jit(lambda: run(False))())
    except Exception as e:  # compile failure is also a finding
        print(f"  compiled kernel FAILED: {type(e).__name__}: {str(e)[:300]}")
        return 1
    d = np.abs(ref - hw).max()
    print(f"  xla-vs-compiled   maxdiff: {d:.6g}  "
          f"(mean ref {ref.mean():.4f} vs hw {hw.mean():.4f})")
    if d > 1e-5:
        print("  MISCOMPILE reproduced: compiled kernel disagrees with "
              "both the interpreter and the XLA lowering of the same code")
        return 1
    print("  no mismatch at this G on this backend/toolchain")
    return 0


if __name__ == "__main__":
    sys.exit(main())
