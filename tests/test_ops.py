"""Unit tests for the compute ops: intersection vs closed form, optics vs
physics, RNG behavior, sampler distributions (SURVEY.md §4).

The ops API is component-wise (ops/vec.py V3 over lane grids); tests use
flat [N] lane grids via V3.from_rows for readability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from path_trace_golang_tpu import scene as S
from path_trace_golang_tpu.ops import geometry, optics, rng, sampling, sky
from path_trace_golang_tpu.ops.rng import LaneRng
from path_trace_golang_tpu.ops.vec import V3
from path_trace_golang_tpu.soa import pack_scene

from helpers import mat, obj, base_camera, solid_sky


def _pack(objects, materials):
    sc = S.Scene(camera=base_camera(), sky=solid_sky(), objects=objects, materials=materials)
    return pack_scene(sc)


def _rays(origins, dirs):
    o = np.asarray(origins, dtype=np.float32)
    d = np.asarray(dirs, dtype=np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return V3.from_rows(jnp.asarray(o)), V3.from_rows(jnp.asarray(d))


def _v3(rows):
    return V3.from_rows(jnp.asarray(np.asarray(rows, np.float32)))


# ---------------------------------------------------------------------------
# V3
# ---------------------------------------------------------------------------


def test_v3_algebra():
    a = _v3([[1, 2, 3], [0, 1, 0]])
    b = _v3([[4, 5, 6], [0, 0, 1]])
    np.testing.assert_allclose(np.asarray((a + b).to_rows()), [[5, 7, 9], [0, 1, 1]])
    np.testing.assert_allclose(np.asarray(a.dot(b)), [32, 0])
    np.testing.assert_allclose(
        np.asarray(a.cross(b).to_rows()), [[-3, 6, -3], [1, 0, 0]]
    )
    n = a.normalize()
    np.testing.assert_allclose(np.asarray(n.length()), [1, 1], atol=1e-6)


# ---------------------------------------------------------------------------
# RNG
# ---------------------------------------------------------------------------


def test_hash_u_reference_values():
    """Bit-exact against a NumPy uint32 reimplementation of gpu.go:444-453."""

    def ref_hash(x):
        x = np.uint32(x)
        with np.errstate(over="ignore"):
            x ^= x >> np.uint32(17)
            x = np.uint32((int(x) * 0xED5AD4BB) & 0xFFFFFFFF)
            x ^= x >> np.uint32(11)
            x = np.uint32((int(x) * 0xAC4C1B51) & 0xFFFFFFFF)
            x ^= x >> np.uint32(15)
            x = np.uint32((int(x) * 0x31848BAB) & 0xFFFFFFFF)
            x ^= x >> np.uint32(14)
        return int(x)

    xs = np.array([0, 1, 2, 1973, 9277, 0xDEADBEEF, 0xFFFFFFFF], dtype=np.uint32)
    got = np.asarray(rng.hash_u(jnp.asarray(xs)))
    want = np.array([ref_hash(x) for x in xs], dtype=np.uint32)
    assert (got == want).all()


def test_rng_uniformity_and_determinism():
    state = rng.seed_lanes(jnp.arange(4096), jnp.zeros(4096, jnp.uint32), 7)
    r = LaneRng(state)
    draws = jnp.stack([r.next() for _ in range(8)])
    arr = np.asarray(draws).ravel()
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    assert abs(arr.mean() - 0.5) < 0.01
    assert abs(np.var(arr) - 1 / 12) < 0.005
    # same seed reproduces
    r2 = LaneRng(rng.seed_lanes(jnp.arange(4096), jnp.zeros(4096, jnp.uint32), 7))
    assert np.array_equal(np.asarray(r2.next()), np.asarray(draws[0]))


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------


def test_sphere_hit_closed_form():
    pack = _pack(
        [obj("s", "sphere", (0, 0, -5), (2, 0, 0), material_id="m")],
        [mat("m")],
    )
    o, d = _rays([[0, 0, 0], [0, 0, 0], [10, 0, 0]], [[0, 0, -1], [0, 1, 0], [0, 0, -1]])
    h = geometry.intersect_world(o, d, pack)
    assert bool(h.hit[0]) and not bool(h.hit[1]) and not bool(h.hit[2])
    assert float(h.t[0]) == pytest.approx(3.0, abs=1e-5)  # 5 - radius 2
    np.testing.assert_allclose(np.asarray(h.normal.to_rows()[0]), [0, 0, 1], atol=1e-6)
    assert bool(h.front_face[0])


def test_sphere_inside_hit_backface():
    pack = _pack([obj("s", "sphere", (0, 0, 0), (2, 0, 0), material_id="m")], [mat("m")])
    o, d = _rays([[0, 0, 0]], [[0, 0, -1]])
    h = geometry.intersect_world(o, d, pack)
    assert bool(h.hit[0])
    assert float(h.t[0]) == pytest.approx(2.0, abs=1e-5)
    assert not bool(h.front_face[0])
    # normal flipped toward the ray origin side
    np.testing.assert_allclose(np.asarray(h.normal.to_rows()[0]), [0, 0, 1], atol=1e-5)


def test_plane_hit_and_parallel_miss():
    pack = _pack([obj("p", "plane", (0, 1, 0), material_id="m")], [mat("m")])
    o, d = _rays([[0, 5, 0], [0, 5, 0]], [[0, -1, 0], [1, 0, 0]])
    h = geometry.intersect_world(o, d, pack)
    assert bool(h.hit[0]) and not bool(h.hit[1])
    assert float(h.t[0]) == pytest.approx(4.0, abs=1e-5)
    np.testing.assert_allclose(np.asarray(h.normal.to_rows()[0]), [0, 1, 0], atol=1e-6)


def test_box_hit_normal_faces():
    pack = _pack([obj("b", "box", (0, 0, 0), (2, 2, 2), material_id="m")], [mat("m")])
    o, d = _rays(
        [[5, 0, 0], [0, 5, 0.2], [0.2, 0.1, -5]],
        [[-1, 0, 0], [0, -1, 0], [0, 0, 1]],
    )
    h = geometry.intersect_world(o, d, pack)
    assert np.asarray(h.hit).all()
    np.testing.assert_allclose(np.asarray(h.t), [4, 4, 4], atol=1e-5)
    nrm = np.asarray(h.normal.to_rows())
    np.testing.assert_allclose(nrm[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(nrm[1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(nrm[2], [0, 0, -1], atol=1e-6)


def test_closest_hit_materials_and_exclusion():
    pack = _pack(
        [
            obj("near", "sphere", (0, 0, -3), (1, 0, 0), material_id="m1"),
            obj("far", "sphere", (0, 0, -8), (1, 0, 0), material_id="m2"),
        ],
        [mat("m1", albedo=(0.1, 0.2, 0.3)), mat("m2", albedo=(0.9, 0.8, 0.7))],
    )
    o, d = _rays([[0, 0, 0]], [[0, 0, -1]])
    h = geometry.intersect_world(o, d, pack)
    assert int(h.obj_idx[0]) == 0 and float(h.t[0]) == pytest.approx(2.0, abs=1e-5)
    # the hit record carries the winner's material constants (gather-free)
    np.testing.assert_allclose(np.asarray(h.albedo.to_rows()[0]), [0.1, 0.2, 0.3], atol=1e-6)
    # excluding the near sphere exposes the far one (glass-skip semantics)
    h2 = geometry.intersect_world(o, d, pack, exclude_obj=jnp.array([0], jnp.int32))
    assert int(h2.obj_idx[0]) == 1 and float(h2.t[0]) == pytest.approx(7.0, abs=1e-5)
    np.testing.assert_allclose(np.asarray(h2.albedo.to_rows()[0]), [0.9, 0.8, 0.7], atol=1e-6)


def test_occluded_respects_tmax():
    pack = _pack([obj("s", "sphere", (0, 0, -5), (1, 0, 0), material_id="m")], [mat("m")])
    o, d = _rays([[0, 0, 0], [0, 0, 0]], [[0, 0, -1], [0, 0, -1]])
    blocked = geometry.occluded(o, d, pack, 0.001, jnp.array([10.0, 3.0], jnp.float32))
    assert bool(blocked[0]) and not bool(blocked[1])


def test_exit_distances():
    o = _v3([[0, 0, 0]])
    d = _v3([[0, 0, -1]])
    ok, t = geometry.box_exit_t(o, d, _v3([[-1, -1, -4]]), _v3([[1, 1, 4]]))
    assert bool(ok[0]) and float(t[0]) == pytest.approx(4.0, abs=1e-5)
    ok, t = geometry.sphere_exit_t(o, d, _v3([[0, 0, 0]]), jnp.array([3.0], jnp.float32))
    assert bool(ok[0]) and float(t[0]) == pytest.approx(3.0, abs=1e-5)


# ---------------------------------------------------------------------------
# Optics
# ---------------------------------------------------------------------------


def test_reflect_matches_mirror_law():
    v = _v3(np.array([[1, -1, 0]]) / np.sqrt(2))
    n = _v3([[0, 1, 0]])
    r = np.asarray(optics.reflect(v, n).to_rows())
    np.testing.assert_allclose(r, np.array([[1, 1, 0]]) / np.sqrt(2), atol=1e-6)


def test_refract_snell_law():
    """Angle out obeys sin(t2) = eta * sin(t1)."""
    theta1 = 0.5
    v = _v3([[np.sin(theta1), -np.cos(theta1), 0]])
    n = _v3([[0, 1, 0]])
    eta = jnp.array([1.0 / 1.5], jnp.float32)
    out = np.asarray(optics.refract(v, n, eta).to_rows())[0]
    sin_t2 = np.hypot(out[0], out[2])
    assert sin_t2 == pytest.approx(np.sin(theta1) / 1.5, abs=1e-5)
    assert out[1] < 0  # continues into the surface


def test_refract_total_internal_reflection():
    theta1 = 1.2  # beyond critical angle for eta=1.5
    v = _v3([[np.sin(theta1), -np.cos(theta1), 0]])
    n = _v3([[0, 1, 0]])
    out = np.asarray(optics.refract(v, n, jnp.array([1.5], jnp.float32)).to_rows())[0]
    want = np.asarray(optics.reflect(v, n).to_rows())[0]
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_schlick_limits():
    # normal incidence for ior 1.5: r0 = (0.5/2.5)^2 = 0.04
    r = float(optics.schlick(jnp.float32(1.0), jnp.float32(1.5)))
    assert r == pytest.approx(0.04, abs=1e-6)
    # grazing: -> 1
    r = float(optics.schlick(jnp.float32(0.0), jnp.float32(1.5)))
    assert r == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------------------------------
# Sampling distributions
# ---------------------------------------------------------------------------


def _uniforms(n, seed=3):
    r = LaneRng(rng.seed_lanes(jnp.arange(n), jnp.full((n,), 11, jnp.uint32), seed))
    return r


def test_cosine_direction_distribution():
    n = 20000
    r = _uniforms(n)
    one = jnp.ones(n)
    normal = V3(jnp.zeros(n), jnp.zeros(n), one)
    d = np.asarray(sampling.cosine_direction(normal, r.next(), r.next()).to_rows())
    # all in upper hemisphere; E[cos] = 2/3 for cosine-weighted
    assert (d[:, 2] > -1e-6).all()
    assert abs(d[:, 2].mean() - 2 / 3) < 0.02
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)


def test_cosine_direction_onb_distribution():
    n = 20000
    r = _uniforms(n, seed=21)
    normal = V3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n))
    d = np.asarray(sampling.cosine_direction_onb(normal, r.next(), r.next()).to_rows())
    assert (d[:, 2] > -1e-6).all()
    assert abs(d[:, 2].mean() - 2 / 3) < 0.02
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)


def test_unit_ball_distribution():
    n = 20000
    r = _uniforms(n, seed=5)
    p = np.asarray(sampling.unit_ball(r.next(), r.next(), r.next()).to_rows())
    rad = np.linalg.norm(p, axis=1)
    assert rad.max() <= 1.0 + 1e-5
    # E[r] for uniform ball = 3/4
    assert abs(rad.mean() - 0.75) < 0.01


def test_unit_disk_distribution():
    n = 20000
    r = _uniforms(n, seed=6)
    p = np.asarray(sampling.unit_disk(r.next(), r.next()).to_rows())
    assert np.abs(p[:, 2]).max() == 0.0  # planar
    rad = np.linalg.norm(p[:, :2], axis=1)
    assert rad.max() <= 1.0 + 1e-5
    # E[r] for an area-uniform disk = 2/3
    assert abs(rad.mean() - 2 / 3) < 0.01


def test_lens_disk_camera_differs_from_ball():
    """Scene camera lens="disk" swaps the bokeh model (PHYSICS.md Q4):
    same rng stream, different lens offsets, same number of draws."""
    import jax.numpy as jnp

    from path_trace_golang_tpu.ops.camera import camera_rays
    from path_trace_golang_tpu.ops.rng import LaneRng, seed_lanes
    from path_trace_golang_tpu.scene.builtin import demo_cornell
    from path_trace_golang_tpu.soa import pack_scene

    sc = demo_cornell()
    sc.camera.aperture = 0.3
    pack_ball = pack_scene(sc, 32, 24)
    sc.camera.lens = "disk"
    pack_disk = pack_scene(sc, 32, 24)
    assert pack_ball.lens_disk is False and pack_disk.lens_disk is True

    px = jnp.arange(128, dtype=jnp.uint32).reshape(1, 128)
    u = px.astype(jnp.float32) / 127.0
    v = jnp.full((1, 128), 0.5, jnp.float32)

    r1 = LaneRng(seed_lanes(px, px, jnp.uint32(1)))
    o_ball, _ = camera_rays(u, v, pack_ball.cam, 32, 24, r1, True, False)
    r2 = LaneRng(seed_lanes(px, px, jnp.uint32(1)))
    o_disk, _ = camera_rays(u, v, pack_disk.cam, 32, 24, r2, True, True)
    # identical draw schedule, different offsets
    assert (np.asarray(r1.state) == np.asarray(r2.state)).all()
    assert np.abs(np.asarray(o_ball.x) - np.asarray(o_disk.x)).max() > 1e-6


def test_sphere_surface_uniform():
    n = 20000
    r = _uniforms(n, seed=9)
    d = np.asarray(sampling.sphere_surface(r.next(), r.next()).to_rows())
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    assert np.abs(d.mean(axis=0)).max() < 0.02


def test_ggx_stays_above_surface():
    n = 10000
    r = _uniforms(n, seed=13)
    normal = V3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n))
    incident = V3(jnp.full((n,), 0.6), jnp.zeros(n), jnp.full((n,), -0.8))
    for rough in (0.05, 0.3, 0.9):
        d = np.asarray(
            sampling.sample_ggx(incident, normal, jnp.full((n,), rough, jnp.float32), r.next(), r.next()).to_rows()
        )
        assert (d[:, 2] > 0).mean() > 0.999  # upper hemisphere (with mirror fallback)
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
    # low roughness concentrates around the mirror direction [0.6, 0, 0.8]
    d = np.asarray(
        sampling.sample_ggx(incident, normal, jnp.full((n,), 0.05, jnp.float32), r.next(), r.next()).to_rows()
    )
    mean = d.mean(axis=0)
    assert mean[2] > 0.7 and mean[0] > 0.5


# ---------------------------------------------------------------------------
# Sky
# ---------------------------------------------------------------------------


def test_sky_modes():
    from path_trace_golang_tpu.soa import pack_scene as ps

    up = _v3([[0, 1, 0], [0, -1, 0]])

    sc = S.Scene(camera=base_camera(), sky=S.Sky(type="gradient", horizon=S.Color(1, 0, 0), zenith=S.Color(0, 0, 1)))
    p = ps(sc)
    got = np.asarray(sky.background_color(up, p.sky).to_rows())
    np.testing.assert_allclose(got[0], [0, 0, 1], atol=1e-6)  # zenith at y=+1
    np.testing.assert_allclose(got[1], [1, 0, 0], atol=1e-6)  # horizon at y=-1

    sc = S.Scene(camera=base_camera(), sky=S.Sky(type="solid", color=S.Color(0.3, 0.4, 0.5)))
    got = np.asarray(sky.background_color(up, ps(sc).sky).to_rows())
    np.testing.assert_allclose(got, [[0.3, 0.4, 0.5]] * 2, atol=1e-6)

    sc = S.Scene(camera=base_camera(), background=S.Color(0.9, 0.1, 0.2))  # legacy
    got = np.asarray(sky.background_color(up, ps(sc).sky).to_rows())
    np.testing.assert_allclose(got, [[0.9, 0.1, 0.2]] * 2, atol=1e-6)


def test_gathered_window_slot_matches_static_single():
    """_direct_single_gathered with a CONSTANT per-lane index must agree
    with _direct_single_static for that light: the select-chain gathers
    the exact traced scalars and the math/clamp order is kept identical
    (ops/lights.py D11 gathered-window redesign, PERF.md round 4)."""
    from path_trace_golang_tpu.ops import lights

    mats = [mat("floor", "lambert", (0.8, 0.7, 0.6))]
    objs = [obj("p", "plane", (0, 0, 0), material_id="floor")]
    for i in range(10):
        mats.append(mat(f"L{i}", "emissive", emit=(1, 0.9, 0.8), power=2.0 + i))
        objs.append(
            obj(f"l{i}", "sphere_light", (i - 5, 4, -2 - (i % 3)), (0.3, 0, 0),
                material_id=f"L{i}")
        )
    pack = _pack(objs, mats)
    assert pack.n_lights == 10

    n_l = 256
    px = jnp.arange(n_l, dtype=jnp.int32)
    p = V3(
        (px.astype(jnp.float32) % 16 - 8).reshape(2, 128) * 0.3,
        jnp.full((2, 128), 0.0, jnp.float32),
        (px.astype(jnp.float32) // 16 - 8).reshape(2, 128) * 0.3,
    )
    nrm = V3(
        jnp.zeros((2, 128), jnp.float32),
        jnp.ones((2, 128), jnp.float32),
        jnp.zeros((2, 128), jnp.float32),
    )
    alb = V3(
        jnp.full((2, 128), 0.8, jnp.float32),
        jnp.full((2, 128), 0.7, jnp.float32),
        jnp.full((2, 128), 0.6, jnp.float32),
    )

    for i in (0, 3, 9):
        r1 = LaneRng(rng.seed_lanes(px.reshape(2, 128), px.reshape(2, 128) * 0, 7))
        r2 = LaneRng(rng.seed_lanes(px.reshape(2, 128), px.reshape(2, 128) * 0, 7))
        got = lights._direct_single_gathered(
            jnp.full((2, 128), i, jnp.int32), p, nrm, alb, pack, r1
        )
        want = lights._direct_single_static(pack.light_objs[i], p, nrm, alb, pack, r2)
        for a, b in ((got.x, want.x), (got.y, want.y), (got.z, want.z)):
            assert np.array_equal(np.asarray(a), np.asarray(b)), f"light {i}"
        assert np.asarray(got.x).sum() != 0.0 or i > 0  # light 0 illuminates
