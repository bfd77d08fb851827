"""Probe: dynamic LANE-dim slice of a VMEM ref inside a Pallas TPU kernel.

The windowed gather (round 5) wants, per round, the limb-table columns
[base, base+W) at a traced scalar ``base`` (128-aligned), so the one-hot
matmul contracts over W pages instead of all P_pad — the fix for the
measured ~1/P_pad scaling wall (tools/perf/tri_scaling.json).  This
probe checks the two candidate formulations compile AND return correct
values on the real backend:

  A. lane-dim dynamic slice:   ref[row_lo:row_hi, pl.ds(base, W)]
  B. transposed sublane slice: refT[pl.ds(base, W), :]  (fallback)

Run:  python tools/repro/window_slice_probe.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, P, W, LANE = 96, 512, 256, 128


def _kernel_a(gt_ref, pl_ref, out_ref):
    p_l = pl_ref[:]
    live = p_l >= 0
    big = jnp.where(live, p_l, jnp.int32(P))
    base = jnp.min(big)
    base = jnp.minimum((base // 128) * 128, jnp.int32(P - W))
    base = jnp.maximum(base, 0)
    sl = gt_ref[:, pl.dslice(base, W)]  # (R, W) bf16
    iota_w = lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    onehot = ((iota_w + base) == p_l).astype(jnp.bfloat16)
    out_ref[:] = lax.dot_general(
        sl, onehot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _kernel_b(gtt_ref, pl_ref, out_ref):
    p_l = pl_ref[:]
    live = p_l >= 0
    big = jnp.where(live, p_l, jnp.int32(P))
    base = jnp.min(big)
    base = jnp.minimum((base // 128) * 128, jnp.int32(P - W))
    base = jnp.maximum(base, 0)
    sl = gtt_ref[pl.dslice(base, W), :]  # (W, R) bf16
    iota_w = lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    onehot = ((iota_w + base) == p_l).astype(jnp.bfloat16)
    out_ref[:] = lax.dot_general(
        sl, onehot, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def main():
    rng = np.random.default_rng(0)
    gt = rng.standard_normal((R, P)).astype(jnp.bfloat16)
    p_l = rng.integers(100, 220, size=(1, LANE)).astype(np.int32)
    p_l[0, 7] = -1  # a dead lane
    want = np.zeros((R, LANE), np.float32)
    for i in range(LANE):
        if p_l[0, i] >= 0:
            want[:, i] = np.asarray(gt[:, p_l[0, i]], np.float32)

    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    for name, kern, table in (
        ("A lane-dim dslice", _kernel_a, jnp.asarray(gt)),
        ("B transposed sublane dslice", _kernel_b, jnp.asarray(gt).T),
    ):
        try:
            out = pl.pallas_call(
                kern,
                in_specs=[vm(), vm()],
                out_specs=vm(),
                out_shape=jax.ShapeDtypeStruct((R, LANE), jnp.float32),
            )(table, jnp.asarray(p_l))
            out = np.asarray(out)
            ok = np.array_equal(out, want)
            print(f"{name}: compiled, correct={ok}", flush=True)
            if not ok:
                bad = np.argwhere(out != want)
                print(f"  first mismatch {bad[0]}: {out[tuple(bad[0])]} vs {want[tuple(bad[0])]}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
