"""Attribute the mesh bench's FIXED per-render cost (PERF.md round 4).

The spp probe fit ``t = F + c*spp`` with F ~= 0.32 s pre-device-cache —
~36% of the 1-pass bench wall.  This probe decomposes F in one process:

* spp fit      — render the 10k-tri bench scene at spp 1 and spp 4
                 (reps each, interleaved) and fit intercept/slope;
* finalize     — time ``np.asarray(current_image(accum, p))`` alone
                 (device finalize jit + 3 MB readback over the tunnel);
* nonfinite    — time ``metrics.nonfinite_count(accum)`` alone
                 (device reduce + scalar readback RTT);
* null dispatch— time a dispatch-shaped no-op (tiny jit add + scalar
                 readback) for the bare RPC round-trip cost.

Usage: python tools/perf/fixed_cost.py [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import numpy as np


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import jax
    import jax.numpy as jnp

    import path_trace_golang_tpu as pt
    from path_trace_golang_tpu import render as render_mod
    from path_trace_golang_tpu.scene import builtin
    from path_trace_golang_tpu.utils import metrics as metrics_mod

    sc = builtin.bench_mesh()
    w = h = 512
    renderer = pt.Renderer(contract="gpu", seed=3)

    def run(spp: int) -> float:
        t0 = time.perf_counter()
        renderer.render(sc, pt.RenderConfig(w, h, spp, 8))
        return time.perf_counter() - t0

    # warm both program shapes
    print("warming spp=1 and spp=4 ...")
    run(1)
    run(4)

    t1s, t4s = [], []
    for _ in range(reps):  # ABAB interleave
        t1s.append(run(1))
        t4s.append(run(4))
    t1, t4 = min(t1s), min(t4s)
    slope = (t4 - t1) / 3.0
    fixed = t1 - slope
    print(f"spp=1: {t1:.3f}s {t1s}")
    print(f"spp=4: {t4:.3f}s {t4s}")
    print(f"fit: t = {fixed:.3f} + {slope:.3f}*spp")

    # component timings on a live accum buffer
    accum = jnp.zeros((h, w, 3), jnp.float32) + 0.5
    jax.block_until_ready(accum)

    def t_of(fn, n=5):
        fn()  # warm
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_fin = t_of(
        lambda: np.asarray(
            render_mod.finalize_gpu_contract(accum, jnp.asarray(1))
        )
    )
    t_nf = t_of(lambda: int(metrics_mod.nonfinite_count(accum)))
    one = jnp.float32(1.0)
    tiny = jax.jit(lambda x: x + 1.0)
    t_rpc = t_of(lambda: float(tiny(one)))
    t_up = t_of(lambda: jax.block_until_ready(jax.device_put(np.zeros(1 << 20, np.float32))))
    print(f"finalize+3MB readback: {t_fin * 1e3:.1f} ms")
    print(f"nonfinite reduce+readback: {t_nf * 1e3:.1f} ms")
    print(f"null dispatch RTT: {t_rpc * 1e3:.1f} ms")
    print(f"4MB host->device upload: {t_up * 1e3:.1f} ms")
    print(
        f"accounted: {(t_fin + t_nf) * 1e3:.1f} ms of {fixed * 1e3:.1f} ms fixed"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
