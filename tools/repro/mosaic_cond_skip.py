"""Does a scalar ``lax.cond`` inside a Pallas TPU kernel SKIP work, or
does Mosaic predicate/execute both branches?

Several round-4 designs (banked gather, plane-first split test) hinge on
conds eliding MXU matmuls at runtime.  This micro-kernel runs a
``fori_loop`` of N rounds whose body guards a serially-dependent matmul
with ``lax.cond(flag, ...)``; the flag rides in as data so the SAME
compiled kernel runs both ways.  A third, cond-free CONTROL kernel
(always-matmul) anchors the true cost of the chain, and output
checksums prove the loop actually executed (an earlier version of this
probe was silently folded away and timed pure dispatch overhead).

Usage: python tools/repro/mosaic_cond_skip.py [rounds]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

N = 128


def _mk_a():
    # a non-trivial, norm-preserving-ish matrix: permutation + damping.
    # a^k b differs for every k, so nothing can constant-fold the chain.
    i = np.arange(N)
    a = np.zeros((N, N), np.float32)
    a[i, (i + 1) % N] = 0.9
    a[i, (i * 7 + 3) % N] += 0.1
    return jnp.asarray(a)


INNER = 32  # serial dots inside the guarded branch: the branch must
# dominate the per-iteration loop overhead or skip vs predicate is
# indistinguishable (bare 1-dot branches time identically to identity
# bodies — loop overhead ~1.5 us/iter drowns a ~0.15 us matmul)


def _expensive(a, c):
    def inner(_, x):
        return jnp.dot(a, x, preferred_element_type=jnp.float32)

    return lax.fori_loop(0, INNER, inner, c)


def cond_kernel(rounds):
    def kernel(flag_ref, a_ref, b_ref, out_ref):
        a = a_ref[...]
        flag = flag_ref[0] > 0

        def body(_, c):
            return lax.cond(flag, lambda: _expensive(a, c), lambda: c)

        out_ref[...] = lax.fori_loop(0, rounds, body, b_ref[...])

    return kernel


def ctrl_kernel(rounds):
    def kernel(flag_ref, a_ref, b_ref, out_ref):
        a = a_ref[...]

        def body(_, c):
            return _expensive(a, c)

        out_ref[...] = lax.fori_loop(0, rounds, body, b_ref[...])

    return kernel


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    shape = jax.ShapeDtypeStruct((N, N), jnp.float32)
    f_cond = pl.pallas_call(cond_kernel(rounds), out_shape=shape)
    f_ctrl = pl.pallas_call(ctrl_kernel(rounds), out_shape=shape)
    a = _mk_a()
    b = jnp.ones((N, N), jnp.float32)

    def run(f, flag):
        fl = jnp.full((1,), flag, jnp.int32)
        t0 = time.perf_counter()
        r = f(fl, a, b)
        jax.block_until_ready(r)
        dt = time.perf_counter() - t0
        return dt, float(jnp.sum(jnp.abs(r)))

    run(f_cond, 1), run(f_ctrl, 1)  # compile both
    ts = {"ctrl": [], "true": [], "false": []}
    sums = {}
    for _ in range(4):  # ABAB interleave (tunnel-variance hygiene)
        for name, f, flag in (
            ("ctrl", f_ctrl, 1),
            ("true", f_cond, 1),
            ("false", f_cond, 0),
        ):
            dt, s = run(f, flag)
            ts[name].append(dt)
            sums[name] = s

    for name in ("ctrl", "true", "false"):
        print(
            f"{name:5s}: {min(ts[name]) * 1e3:8.2f} ms  sum={sums[name]:.4e}"
            f"  {[f'{t * 1e3:.2f}' for t in ts[name]]}"
        )
    t_ctrl, t_true, t_false = (min(ts[k]) for k in ("ctrl", "true", "false"))
    if sums["true"] == sums["false"]:
        print("WARNING: cond-true and cond-false agree -> loop folded, probe invalid")
    if t_ctrl < 3 * t_false or t_true < 3 * t_false:
        # matmul chain not clearly above dispatch noise at this size
        print(f"note: raise rounds (ctrl {t_ctrl * 1e3:.2f} ms barely above skip)")
    ratio = t_true / max(t_false, 1e-9)
    print(
        f"true/false {ratio:.2f}x -> "
        + (
            "cond BRANCHES (skip is real)"
            if ratio > 1.5
            else "cond PREDICATES or chain too small"
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
