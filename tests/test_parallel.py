"""Multi-device sharding tests on the 8-virtual-CPU-device mesh."""

import jax
import numpy as np
import pytest

import path_trace_golang_tpu as pt
from path_trace_golang_tpu.parallel import MeshRenderer, make_mesh

from helpers import full_feature_scene, lambert_floor_scene


CFG = pt.RenderConfig(width=48, height=32, samples_per_px=2, max_depth=4)


def test_make_mesh_shapes():
    m = make_mesh(4, 2)
    assert m.shape == {"px": 4, "spp": 2}
    with pytest.raises(ValueError):
        make_mesh(8, 2)  # 16 devices needed, only 8


def _assert_statistically_equal(a, b):
    """Same (pixel, pass) seed set but different compiled programs: XLA's
    per-shape fusion/FMA choices can flip chaotic branches, so compare
    statistically, not bitwise (see MeshRenderer docstring)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    assert abs(a.mean() - b.mean()) < 1.5  # global exposure identical
    assert np.abs(a - b).mean() < 3.0  # most pixels identical or 1-2 LSB
    assert (np.abs(a - b) > 40).mean() < 0.02  # isolated path flips only


def test_mesh_matches_single_chip_px_only():
    """Pixel sharding is pure data parallelism over the same sample set."""
    sc = full_feature_scene()
    single = pt.Renderer(contract="gpu", seed=7, normalize_pass=True).render(sc, CFG)
    mesh = MeshRenderer(make_mesh(8, 1), contract="gpu", seed=7, normalize_pass=True)
    multi = mesh.render(sc, CFG)
    _assert_statistically_equal(single, multi)
    assert mesh.stats.passes == 2


def test_mesh_spp_sharding_matches():
    """spp sharding runs passes concurrently with a psum merge; the set of
    (pixel, pass) seeds is identical to single-chip."""
    sc = full_feature_scene()
    single = pt.Renderer(contract="gpu", seed=7, normalize_pass=True).render(sc, CFG)
    mesh = MeshRenderer(make_mesh(4, 2), contract="gpu", seed=7, normalize_pass=True)
    multi = mesh.render(sc, CFG)
    _assert_statistically_equal(single, multi)


def test_mesh_rerun_is_bit_stable():
    """The same mesh program with the same seed is bit-deterministic."""
    sc = full_feature_scene()
    m1 = MeshRenderer(make_mesh(4, 2), contract="gpu", seed=7, normalize_pass=True)
    m2 = MeshRenderer(make_mesh(4, 2), contract="gpu", seed=7, normalize_pass=True)
    assert np.array_equal(m1.render(sc, CFG), m2.render(sc, CFG))


def test_mesh_progress_and_stats():
    sc = lambert_floor_scene()
    calls = []
    mesh = MeshRenderer(make_mesh(2, 2), contract="cpu", seed=1)
    img = mesh.render(sc, pt.RenderConfig(width=40, height=24, samples_per_px=4, max_depth=3),
                      progress=lambda p, im: calls.append(p))
    assert img.shape == (24, 40, 3)
    assert calls[-1] == 4
    assert mesh.stats.ray_segments > 0


# ---------------------------------------------------------------------------
# Feature-parity matrix: MeshRenderer must support everything Renderer does
# (cancel, checkpoint/resume, chunked shards, preview-vs-final post chain)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("renderer_kind", ["single", "mesh"])
def test_parity_cancel(renderer_kind):
    sc = lambert_floor_scene()
    cfg = pt.RenderConfig(width=40, height=24, samples_per_px=8, max_depth=3)
    ticks = []

    def cancel():
        ticks.append(1)
        return len(ticks) >= 2  # stop after the 2nd dispatch

    if renderer_kind == "single":
        r = pt.Renderer(contract="cpu", seed=3)
    else:
        r = MeshRenderer(make_mesh(2, 1), contract="cpu", seed=3)
    img = r.render(sc, cfg, cancel=cancel)
    assert img.shape == (24, 40, 3)
    assert 0 < r.stats.passes < 8  # cancelled early, partial image finalized


@pytest.mark.parametrize("renderer_kind", ["single", "mesh"])
def test_parity_checkpoint_resume(renderer_kind, tmp_path):
    sc = lambert_floor_scene()
    cfg = pt.RenderConfig(width=40, height=24, samples_per_px=4, max_depth=3)
    ck = str(tmp_path / f"ck_{renderer_kind}.npz")

    def make(seed=5):
        if renderer_kind == "single":
            return pt.Renderer(contract="cpu", seed=seed, checkpoint_path=ck)
        return MeshRenderer(make_mesh(2, 1), contract="cpu", seed=seed, checkpoint_path=ck)

    # full uninterrupted render (writes its checkpoint at the end)
    full = make().render(sc, cfg)

    # interrupted render: cancel after the first update, then resume
    ticks = []
    r1 = make()
    r1.render(sc, cfg, cancel=lambda: ticks.append(1) is None and len(ticks) >= 1)
    assert 0 < r1.stats.passes < 4
    r2 = make()
    resumed = r2.render(sc, cfg)
    assert r2.stats.resumed_from == r1.stats.passes
    assert np.array_equal(full, resumed)  # exact resume


@pytest.mark.parametrize("chunk", [0, 256])
def test_mesh_chunked_shards_match(chunk):
    """Chunking within a px shard must not change the image (same lanes,
    same seeds, just bounded in-flight state)."""
    sc = lambert_floor_scene()
    cfg = pt.RenderConfig(width=48, height=32, samples_per_px=2, max_depth=3)
    img = MeshRenderer(make_mesh(4, 2), contract="cpu", seed=9, chunk=chunk).render(sc, cfg)
    ref = MeshRenderer(make_mesh(4, 2), contract="cpu", seed=9).render(sc, cfg)
    a = img.astype(np.float64)
    b = ref.astype(np.float64)
    assert abs(a.mean() - b.mean()) < 1.5
    assert (np.abs(a - b) > 40).mean() < 0.02


def test_mesh_final_applies_smooth_config(monkeypatch):
    """The final mesh image honors the PATHTRACER_GPU_SMOOTH chain like the
    single-chip renderer (render.py current_image)."""
    from path_trace_golang_tpu.utils import config as env_config

    sc = full_feature_scene()
    cfg = pt.RenderConfig(width=48, height=32, samples_per_px=1, max_depth=3)
    plain = MeshRenderer(make_mesh(4, 2), contract="gpu", seed=4).render(sc, cfg)

    monkeypatch.setenv("PATHTRACER_GPU_SMOOTH", "1")
    monkeypatch.setenv("PATHTRACER_GPU_SMOOTH_RADIUS", "2")
    monkeypatch.setenv("PATHTRACER_GPU_SMOOTH_STRENGTH", "1.0")
    env_config.reset_cache()
    try:
        smoothed = MeshRenderer(make_mesh(4, 2), contract="gpu", seed=4).render(sc, cfg)
    finally:
        monkeypatch.delenv("PATHTRACER_GPU_SMOOTH")
        env_config.reset_cache()
    # smoothing reduces local variance
    def local_var(im):
        f = im.astype(np.float64)
        return np.abs(np.diff(f, axis=0)).mean() + np.abs(np.diff(f, axis=1)).mean()

    assert local_var(smoothed) < local_var(plain)
