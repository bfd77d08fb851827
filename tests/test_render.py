"""End-to-end render + CLI tests (small shapes; CI host is 1 core)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import path_trace_golang_tpu as pt
from path_trace_golang_tpu.scene import builtin

from helpers import full_feature_scene, lambert_floor_scene


CFG = pt.RenderConfig(width=48, height=32, samples_per_px=2, max_depth=4)


def test_render_gpu_contract_end_to_end():
    sc = full_feature_scene()
    calls = []
    r = pt.Renderer(contract="gpu")
    img = r.render(sc, CFG, progress=lambda p, im: calls.append((p, im.shape, im.dtype)))
    assert img.shape == (32, 48, 3) and img.dtype == np.uint8
    assert np.isfinite(img.astype(float)).all()
    # progress fired ~every 10% (2 passes -> every pass) with u8 frames
    assert calls and calls[-1][0] == 2 and calls[0][1] == (32, 48, 3)
    assert r.stats.passes == 2
    assert r.stats.samples_per_pixel == 32  # 16 stratified samples per pass
    assert r.stats.ray_segments > 0


def test_render_cpu_contract_end_to_end():
    sc = full_feature_scene()
    r = pt.Renderer(contract="cpu")
    img = r.render(sc, CFG)
    assert img.shape == (32, 48, 3)
    assert r.stats.samples_per_pixel == 2  # 1 sample per pass


def test_render_deterministic_across_renderers():
    # full-feature scene: lights + defocus give real per-seed variance (a
    # flat floor under a solid sky is variance-free and seed-insensitive)
    sc = full_feature_scene()
    a = pt.Renderer(contract="gpu", seed=9, normalize_pass=True).render(sc, CFG)
    b = pt.Renderer(contract="gpu", seed=9, normalize_pass=True).render(sc, CFG)
    c = pt.Renderer(contract="gpu", seed=10, normalize_pass=True).render(sc, CFG)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_render_chunking_invariance():
    """Different lane-chunk sizes must not change the image (pixels are
    seeded by (x, y, pass), not by chunk position)."""
    sc = lambert_floor_scene()
    a = pt.Renderer(contract="gpu", seed=3, chunk=512).render(sc, CFG)
    b = pt.Renderer(contract="gpu", seed=3, chunk=48 * 32).render(sc, CFG)
    assert np.array_equal(a, b)


def test_normalize_pass_dims_image():
    sc = lambert_floor_scene(sky_rgb=(0.5, 0.5, 0.5))
    bright = pt.Renderer(contract="gpu", seed=3).render(sc, CFG)
    normal = pt.Renderer(contract="gpu", seed=3, normalize_pass=True).render(sc, CFG)
    assert bright.mean() > normal.mean()


def test_render_cancel_stops_early():
    sc = lambert_floor_scene()
    cfg = pt.RenderConfig(width=32, height=24, samples_per_px=6, max_depth=3)
    r = pt.Renderer(contract="gpu")
    r.render(sc, cfg, cancel=lambda: True)  # cancel after first pass
    assert r.stats.passes == 1


def test_backend_switch_and_fallback_api():
    pt.set_backend(pt.BACKEND_GPU)
    assert pt.get_backend() == pt.BACKEND_GPU
    pt.set_backend(pt.BACKEND_CPU)
    assert pt.get_backend() == pt.BACKEND_CPU
    with pytest.raises(ValueError):
        pt.set_backend("metal")


def test_save_png_roundtrip(tmp_path):
    img = (np.arange(4 * 6 * 3, dtype=np.uint8)).reshape(4, 6, 3)
    p = tmp_path / "x.png"
    pt.save_png(p, img)
    from PIL import Image

    back = np.asarray(Image.open(p))
    assert np.array_equal(back, img)


def test_png_fallback_encoder(tmp_path):
    from path_trace_golang_tpu.io_png import _write_png_fallback

    img = np.random.default_rng(0).integers(0, 255, (5, 7, 3), np.uint8)
    p = tmp_path / "fb.png"
    _write_png_fallback(str(p), img)
    from PIL import Image

    back = np.asarray(Image.open(p))
    assert np.array_equal(back, img)


def test_builtin_scenes_construct():
    for name in ("demo_cornell", "demo_showcase", "demo_mesh"):
        sc = builtin.builtin_scene(name)
        assert sc is not None
        assert len(sc.objects) > 3 and len(sc.materials) > 3
        pt.pack_scene(sc, 64, 36)


def test_cli_headless(tmp_path):
    out = tmp_path / "cli.png"
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        PATHTRACER_CHUNK="2048",
    )
    ref = builtin.find_scene("example_simple")
    scene_arg = ref if ref else "demo_cornell"
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "path_trace_golang_tpu.cli",
            "-scene",
            scene_arg,
            "-headless",
            "-out",
            str(out),
            "--width",
            "40",
            "--height",
            "24",
            "--spp",
            "1",
            "--depth",
            "3",
            "--json-stats",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=560,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    assert stats["width"] == 40 and stats["passes"] == 1
    assert out.exists() and out.stat().st_size > 100


def test_faithful_fog_mode():
    """faithful_fog=True marches fog per sample inside the trace
    (PHYSICS.md D6 opt-out); both modes produce finite fog light with the
    same expectation."""
    sc = full_feature_scene()
    cfg = pt.RenderConfig(width=32, height=24, samples_per_px=2, max_depth=3)
    fast = pt.Renderer(contract="gpu", seed=4, normalize_pass=True, faithful_fog=False).render(sc, cfg)
    faith = pt.Renderer(contract="gpu", seed=4, normalize_pass=True, faithful_fog=True).render(sc, cfg)
    a, b = fast.astype(float), faith.astype(float)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # same expectation, different fog sample counts -> close but not equal
    assert abs(a.mean() - b.mean()) < 6.0
    assert not np.array_equal(fast, faith)


def test_gpu_to_cpu_contract_fallback(monkeypatch):
    """Renderer.render falls back to the cpu contract when the gpu-contract
    render raises (renderer.go:250-263 analog)."""
    sc = lambert_floor_scene()
    cfg = pt.RenderConfig(width=24, height=16, samples_per_px=1, max_depth=3)
    r = pt.Renderer()
    real = r._render
    calls = []

    def flaky(sc_, cfg_, contract, progress, cancel):
        calls.append(contract)
        if contract == pt.BACKEND_GPU:
            raise RuntimeError("synthetic device failure")
        return real(sc_, cfg_, contract, progress, cancel)

    monkeypatch.setattr(r, "_render", flaky)
    pt.set_backend(pt.BACKEND_GPU)
    try:
        img = r.render(sc, cfg)
    finally:
        pt.set_backend(pt.BACKEND_CPU)
    assert calls == [pt.BACKEND_GPU, pt.BACKEND_CPU]
    assert img.shape == (16, 24, 3)
