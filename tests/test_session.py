"""Interactive session, checkpoint/resume, and metrics tests."""

import math
import os
import time

import numpy as np
import pytest

import path_trace_golang_tpu as pt
from path_trace_golang_tpu.interactive import PITCH_LIMIT, InteractiveSession
from path_trace_golang_tpu.scene.model import RenderSettings
from path_trace_golang_tpu.utils import checkpoint as ck
from path_trace_golang_tpu.utils.metrics import MetricsLog, nonfinite_count

from helpers import full_feature_scene, lambert_floor_scene, obj


def _session(sc=None, **kw):
    sc = sc or lambert_floor_scene()
    sc.settings = RenderSettings(width=32, height=24, samples_per_px=1, max_depth=3)
    s = InteractiveSession(sc, mode="preview", **kw)
    return s


def test_session_settings_merge():
    """Scene settings override the mode preset where nonzero (app.go:61-70)."""
    sc = lambert_floor_scene()
    sc.settings = RenderSettings(width=100, height=0, samples_per_px=5, max_depth=0)
    s = InteractiveSession(sc, mode="preview")
    assert s.settings.width == 100  # from scene
    assert s.settings.height == 225  # preview preset fallback
    assert s.settings.samples_per_px == 5
    assert s.settings.max_depth == 20


def test_session_render_and_final_scaling():
    s = _session()
    img = s.render_now(final=False)
    assert img.shape == (24, 32, 3)
    assert s.fps > 0
    # final = spp x4, depth x2 (app.go:72-75)
    cfg = s._config(final=True)
    assert cfg.samples_per_px == 4 and cfg.max_depth == 6


def test_session_camera_keys():
    s = _session()
    cam = s.scene.camera
    x0, z0 = cam.position.x, cam.position.z
    tz0 = cam.target.z
    assert s.move_key("w")
    assert cam.position.z == z0 - 0.5 and cam.target.z == tz0 - 0.5
    assert s.move_key("d")
    assert cam.position.x == x0 + 0.5
    assert not s.move_key("z")


def test_session_rotation_preserves_distance_and_clamps_pitch():
    s = _session()
    cam = s.scene.camera
    d0 = math.dist(cam.position.as_tuple(), cam.target.as_tuple())
    for _ in range(100):
        s.rotate(d_pitch=0.05)  # pitch up far past the clamp
    d1 = math.dist(cam.position.as_tuple(), cam.target.as_tuple())
    assert d1 == pytest.approx(d0, rel=1e-4)
    dy = cam.target.y - cam.position.y
    dxz = math.hypot(cam.target.x - cam.position.x, cam.target.z - cam.position.z)
    assert math.atan2(dy, dxz) == pytest.approx(PITCH_LIMIT, abs=1e-3)


def test_session_scene_editing():
    s = _session(full_feature_scene())
    assert s.edit_material("red", rough=0.5)
    assert [m for m in s.scene.materials if m.id == "red"][0].rough == 0.5
    assert not s.edit_material("nope", rough=0.5)
    with pytest.raises(AttributeError):
        s.edit_material("red", bogus=1)

    assert s.edit_object("ball", material_id="grey")
    s.add_object(obj("extra", "sphere", (0, 5, 0), (0.5, 0, 0), "grey"))
    assert any(o.id == "extra" for o in s.scene.objects)
    assert s.remove_object("extra")
    assert not s.remove_object("extra")

    s.edit_fog(density=0.5)
    assert s.scene.fog.density == 0.5
    s.edit_settings(samples_per_px=2)
    assert s.settings.samples_per_px == 2


def test_session_save_scene_and_image(tmp_path):
    s = _session()
    p = s.save_scene(str(tmp_path / "edited.json"))
    from path_trace_golang_tpu import scene as S

    assert S.load(p) == s.scene
    out = s.save_image(str(tmp_path / "final.png"))
    from PIL import Image

    assert np.asarray(Image.open(out)).shape == (24, 32, 3)
    assert s.last_final is not None


def test_session_debounce_coalesces():
    s = _session()
    frames = []
    s.on_frame = lambda p, im: frames.append(p)
    for _ in range(5):
        s.request_render(False)  # 5 rapid edits -> one render
    time.sleep(0.1)
    with s._lock:
        gen = s._generation
    assert gen == 5  # every request bumped the generation
    time.sleep(0.5)
    if s._render_thread is not None:
        s._render_thread.join(timeout=300)
    assert s.last_preview is not None


def test_checkpoint_rotation(tmp_path):
    """keep=N shifts prior checkpoints into .1...N before each save; the
    oldest generation falls off the end."""
    import os

    path = str(tmp_path / "r.ckpt")
    for p_i in (1, 2, 3, 4):
        accum = np.full((4, 3), float(p_i), np.float32)
        ck.save_checkpoint(
            path,
            ck.Checkpoint(accum, passes=p_i, seed=7, digest="d", width=2, height=2),
            keep=2,
        )
    assert ck.load_checkpoint(path).passes == 4
    assert ck.load_checkpoint(path + ".1").passes == 3
    assert ck.load_checkpoint(path + ".2").passes == 2
    assert not os.path.exists(path + ".3")

    # keep=0 (default) rotates nothing
    single = str(tmp_path / "s.ckpt")
    for p_i in (1, 2):
        ck.save_checkpoint(
            single,
            ck.Checkpoint(np.zeros((4, 3), np.float32), passes=p_i, seed=1, digest="d", width=2, height=2),
        )
    assert not os.path.exists(single + ".1")


def test_checkpoint_load_falls_back_to_rotation(tmp_path):
    """A missing or corrupt head checkpoint resumes from the newest
    rotation generation instead of silently restarting from scratch."""
    import os

    path = str(tmp_path / "r.ckpt")
    for p_i in (1, 2, 3):
        ck.save_checkpoint(
            path,
            ck.Checkpoint(np.zeros((4, 3), np.float32), passes=p_i, seed=7, digest="d", width=2, height=2),
            keep=2,
        )
    os.remove(path)  # simulate a crash window / lost head
    back = ck.load_checkpoint(path, keep=2)
    assert back is not None and back.passes == 2  # newest surviving generation

    with open(path, "wb") as f:
        f.write(b"corrupt")  # unreadable head -> same fallback
    back = ck.load_checkpoint(path, keep=2)
    assert back is not None and back.passes == 2


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "r.ckpt")
    accum = np.random.default_rng(0).random((64, 3)).astype(np.float32)
    ck.save_checkpoint(path, ck.Checkpoint(accum, passes=3, seed=7, digest="abc", width=8, height=8))
    back = ck.load_checkpoint(path)
    assert back is not None and back.passes == 3 and back.seed == 7 and back.digest == "abc"
    np.testing.assert_array_equal(back.accum, accum)
    assert ck.load_checkpoint(str(tmp_path / "missing.ckpt")) is None


def test_render_resume_matches_uninterrupted(tmp_path):
    """Interrupt at pass 2 of 4, resume: image identical to one 4-pass run."""
    sc = full_feature_scene()
    cfg = pt.RenderConfig(width=32, height=24, samples_per_px=4, max_depth=3)
    full = pt.Renderer(contract="gpu", seed=11, normalize_pass=True).render(sc, cfg)

    path = str(tmp_path / "resume.ckpt")
    r1 = pt.Renderer(contract="gpu", seed=11, normalize_pass=True, checkpoint_path=path)
    counter = {"n": 0}

    def cancel():
        counter["n"] += 1
        return counter["n"] >= 2  # stop after the 2nd pass

    r1.render(sc, cfg, cancel=cancel)
    saved = ck.load_checkpoint(path)
    assert saved is not None and 0 < saved.passes < 4

    r2 = pt.Renderer(contract="gpu", seed=11, normalize_pass=True, checkpoint_path=path)
    resumed = r2.render(sc, cfg)
    assert r2.stats.resumed_from == saved.passes
    assert np.array_equal(full, resumed)


def test_checkpoint_digest_mismatch_ignored(tmp_path):
    """A checkpoint from a different scene/config must not be resumed."""
    sc = full_feature_scene()
    cfg = pt.RenderConfig(width=32, height=24, samples_per_px=2, max_depth=3)
    path = str(tmp_path / "x.ckpt")
    r1 = pt.Renderer(contract="gpu", seed=1, checkpoint_path=path)
    r1.render(sc, cfg)
    # different depth -> different digest -> fresh start
    cfg2 = pt.RenderConfig(width=32, height=24, samples_per_px=2, max_depth=4)
    r2 = pt.Renderer(contract="gpu", seed=1, checkpoint_path=path)
    r2.render(sc, cfg2)
    assert r2.stats.resumed_from == 0


def test_metrics_log_and_nonfinite():
    recs = []
    sc = lambert_floor_scene()
    cfg = pt.RenderConfig(width=32, height=24, samples_per_px=3, max_depth=3)
    r = pt.Renderer(contract="gpu", seed=1, metrics_sink=recs.append)
    r.render(sc, cfg)
    assert recs and recs[-1].pass_index == 3
    assert sum(x.ray_segments for x in recs) == r.stats.ray_segments
    assert r.stats.nonfinite == 0
    # nonfinite detector
    import jax.numpy as jnp

    bad = jnp.array([[1.0, jnp.nan, jnp.inf]])
    assert int(nonfinite_count(bad)) == 2
