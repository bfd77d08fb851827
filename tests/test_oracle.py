"""Cross-validation against the independent NumPy oracle (SURVEY.md §4).

The oracle (tests/oracle.py) implements the same physics contract with a
different code structure and its own RNG stream; agreement of the Monte
Carlo means within sampling error validates the framework's physics
end-to-end (camera, intersection, NEE, GGX, mirrors, glass-state
dielectrics, RR, stratified passes, 16x accumulation).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import path_trace_golang_tpu as pt
from path_trace_golang_tpu.integrator import trace_config_for_scene
from path_trace_golang_tpu.render import trace_pass_lanes
from path_trace_golang_tpu.soa import pack_scene

from helpers import full_feature_scene
from oracle import Oracle

W, H, DEPTH, PASSES = 24, 16, 5, 12


def _framework_linear(sc, passes, seed=3):
    """Accumulated linear mean via the pass kernel (pre-tonemap)."""
    pack = pack_scene(sc, W, H)
    tcfg = trace_config_for_scene(pack, sc, DEPTH, "gpu")
    idx = jnp.arange(W * H, dtype=jnp.int32)
    accum = np.zeros((W * H, 3), np.float64)
    for p in range(passes):
        col, _segs = trace_pass_lanes(
            pack,
            jnp.uint32(seed + p),
            idx,
            tcfg=tcfg,
            width=W,
            height=H,
            n_strata=4,
            samples=16,
            has_aperture=sc.camera.aperture > 0,
            normalize_pass=False,
        )
        accum += np.asarray(col, np.float64)
    return (accum / passes).reshape(H, W, 3)


@pytest.fixture(scope="module")
def scene():
    sc = full_feature_scene()
    sc.fog = None  # fog covered by dedicated analytic tests
    return sc


def test_oracle_agreement(scene):
    ours = _framework_linear(scene, PASSES)
    oracle = Oracle(scene, W, H, DEPTH, rng=np.random.default_rng(42))
    # both sides accumulate the Q1-style 16x per-pass sums
    theirs = oracle.render(passes=PASSES)

    # global means agree within MC error
    for ch in range(3):
        a, b = ours[..., ch].mean(), theirs[..., ch].mean()
        assert a == pytest.approx(b, rel=0.05), (ch, a, b)

    # regional structure agrees: 8x8 pixel block means
    ab = ours.reshape(H // 8, 8, W // 8, 8, 3).mean(axis=(1, 3))
    bb = theirs.reshape(H // 8, 8, W // 8, 8, 3).mean(axis=(1, 3))
    rel = np.abs(ab - bb) / np.maximum(np.abs(bb), 0.15 * np.abs(bb).mean())
    assert np.median(rel) < 0.08, float(np.median(rel))
    assert (rel < 0.25).mean() > 0.85, float((rel < 0.25).mean())


def test_oracle_agreement_cpu_contract(scene):
    """CPU contract vs the independent CPU-contract oracle."""
    from oracle import OracleCPU

    pack = pack_scene(scene, W, H)
    tcfg = trace_config_for_scene(pack, scene, DEPTH, "cpu")
    idx = jnp.arange(W * H, dtype=jnp.int32)
    accum = np.zeros((W * H, 3), np.float64)
    passes = 16
    for p in range(passes):
        col, _ = trace_pass_lanes(
            pack,
            jnp.uint32(11 + p),
            idx,
            tcfg=tcfg,
            width=W,
            height=H,
            n_strata=1,
            samples=1,
            has_aperture=scene.camera.aperture > 0,
            normalize_pass=False,
        )
        accum += np.asarray(col, np.float64)
    ours = (accum / passes).reshape(H, W, 3)

    oracle = OracleCPU(scene, W, H, DEPTH, rng=np.random.default_rng(5))
    theirs = oracle.render(passes=passes)

    # the cpu contract has no NEE, so per-pass estimates are high-variance
    # at this sample count; compare within MC noise
    for ch in range(3):
        a, b = ours[..., ch].mean(), theirs[..., ch].mean()
        assert a == pytest.approx(b, rel=0.15, abs=0.01), (ch, a, b)
