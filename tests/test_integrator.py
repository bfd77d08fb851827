"""Integrator physics tests: analytic expectations, determinism, energy
sanity (SURVEY.md §4: golden tests within MC tolerance + determinism)."""

import jax.numpy as jnp
import numpy as np
import pytest

from path_trace_golang_tpu import scene as S
from path_trace_golang_tpu.integrator import trace, trace_config_for_scene
from path_trace_golang_tpu.ops.rng import seed_lanes
from path_trace_golang_tpu.soa import pack_scene

from helpers import base_camera, empty_scene, lambert_floor_scene, mat, obj, solid_sky


def _trace_rays(sc, origins, dirs, max_depth=5, contract="gpu", seed=1):
    pack = pack_scene(sc, 8, 8)
    cfg = trace_config_for_scene(pack, sc, max_depth, contract)
    o = jnp.asarray(origins, jnp.float32)
    d = jnp.asarray(dirs, jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    n = o.shape[0]
    state = seed_lanes(jnp.arange(n), jnp.zeros(n, jnp.uint32), seed)
    rad, _state, segs = trace(o, d, state, pack, cfg)
    return np.asarray(rad), int(segs)


@pytest.mark.parametrize("contract", ["gpu", "cpu"])
def test_empty_scene_returns_sky(contract):
    sc = empty_scene(solid_sky((0.25, 0.5, 0.75)))
    sc.objects = []
    sc.materials = [mat("dummy")]  # packer needs >= 0 materials; zero objects
    rad, segs = _trace_rays(sc, [[0, 0, 0]] * 4, [[0, 0, -1], [1, 0, 0], [0, 1, 0], [0, -1, 0]], contract=contract)
    np.testing.assert_allclose(rad, [[0.25, 0.5, 0.75]] * 4, atol=1e-5)
    assert segs == 4  # one segment per ray


@pytest.mark.parametrize("contract", ["gpu", "cpu"])
def test_emissive_direct_view(contract):
    """Looking straight at an emissive sphere returns emit*power exactly."""
    sc = S.Scene(
        camera=base_camera(),
        sky=solid_sky((0, 0, 0)),
        materials=[mat("lamp", "emissive", emit=(0.5, 0.25, 0.125), power=4.0)],
        objects=[obj("l", "sphere", (0, 0, -5), (1, 0, 0), material_id="lamp")],
    )
    rad, _ = _trace_rays(sc, [[0, 0, 0]], [[0, 0, -1]], contract=contract)
    np.testing.assert_allclose(rad[0], [2.0, 1.0, 0.5], atol=1e-5)


def test_lambert_single_bounce_expectation():
    """Floor under a uniform white sky, no lights: every path bounces once
    then exits to the sky, so E[L] = albedo * sky exactly (the cosine pdf
    cancels the cosine-weighted integrand)."""
    albedo = (0.6, 0.4, 0.2)
    sc = lambert_floor_scene(albedo=albedo, sky_rgb=(1.0, 1.0, 1.0))
    n = 4096
    o = [[0, 3, 0]] * n
    d = [[0, -1, 0]] * n
    # depth 5: bounce happens at remaining=5 > rrThreshold, no RR bias zone
    # reached because the sky is hit at the second segment.
    pack = pack_scene(sc, 8, 8)
    cfg = trace_config_for_scene(pack, sc, 5, "gpu")
    oj = jnp.asarray(o, jnp.float32)
    dj = jnp.asarray(d, jnp.float32)
    state = seed_lanes(jnp.arange(n), jnp.zeros(n, jnp.uint32), 77)
    rad, _s, segs = trace(oj, dj, state, pack, cfg)
    rad = np.asarray(rad)
    np.testing.assert_allclose(rad.mean(axis=0), albedo, atol=0.02)
    assert int(segs) == 2 * n  # exactly two segments per path


def test_mirror_reflects_to_sky_gradient():
    """A perfect mirror floor flips the ray into the zenith color."""
    sc = S.Scene(
        camera=base_camera(),
        sky=S.Sky(type="gradient", horizon=S.Color(1, 0, 0), zenith=S.Color(0, 0, 1)),
        materials=[mat("m", "mirror", (1.0, 1.0, 1.0))],
        objects=[obj("p", "plane", (0, 0, 0), material_id="m")],
    )
    rad, _ = _trace_rays(sc, [[0, 2, 0]], [[0, -1, 0]], max_depth=4)
    # straight down -> reflected straight up -> zenith (0,0,1)
    np.testing.assert_allclose(rad[0], [0, 0, 1], atol=1e-5)


def test_nee_matches_brute_force_lambert():
    """Direct light via NEE equals the analytic point-light-ish estimate for
    a small distant sphere light over a lambert surface.

    Setup: surface point at origin (normal +y), sphere light radius r at
    distance D overhead.  For r << D the direct lighting approaches
    Le * (pi r^2 / D^2) * cos / pi * ... — instead of the closed form we
    compare NEE (gpu contract) against a high-sample solid-angle Monte
    Carlo estimate computed in numpy.
    """
    Le = 5.0
    r_l, D = 0.2, 4.0
    sc = S.Scene(
        camera=base_camera(),
        sky=solid_sky((0, 0, 0)),
        materials=[
            mat("floor", "lambert", (1.0, 1.0, 1.0)),
            mat("lamp", "emissive", emit=(1, 1, 1), power=Le),
        ],
        objects=[
            obj("p", "plane", (0, 0, 0), material_id="floor"),
            obj("l", "sphere_light", (0, D, 0), (r_l, 0, 0), material_id="lamp"),
        ],
    )
    n = 8192
    # max_depth=1: the loop runs once — NEE fires at the plane hit, the
    # bounce ray is never traced, so the result is the pure NEE estimate
    # (avoids the reference's inherent NEE+BSDF-hit double counting).
    rad, _ = _trace_rays(sc, [[0, 1.0, 0]] * n, [[0, -1, 0]] * n, max_depth=1, contract="gpu")
    got = rad.mean(axis=0)[0]
    # Analytic direct irradiance from a sphere light (uniform-area sampling
    # estimator expectation): E = Le * (albedo/pi) * integral == for a
    # small sphere directly overhead at distance d (surface->center),
    # approx Le * (albedo/pi) * pi r^2 / d^2 (visible-disk solid angle) —
    # the reference's estimator uses full-sphere area pdf with cos_light
    # one-sided, which halves... compute the estimator's own expectation:
    # E = (albedo/pi) * Le * (1/A) * int_sphere cos_s cos_l / d^2 dA over
    # visible half, A = 4 pi r^2.  Evaluate numerically:
    rng = np.random.default_rng(0)
    z = 1 - 2 * rng.random(200000)
    phi = 2 * np.pi * rng.random(200000)
    rr = np.sqrt(np.maximum(0, 1 - z * z))
    ln = np.stack([rr * np.cos(phi), rr * np.sin(phi), z], -1)  # light normals
    lp = np.array([0, D, 0]) + r_l * ln  # sample points
    sp = np.array([0, 0.0, 0])  # the plane hit point (rays start at y=1 going down)
    to_l = lp - sp
    d2 = (to_l**2).sum(-1)
    wi = to_l / np.sqrt(d2)[:, None]
    cos_s = np.maximum(0, wi[:, 1])
    cos_l = np.maximum(0, -(ln * wi).sum(-1))
    area = 4 * np.pi * r_l**2
    contrib = (1 / np.pi) * Le * cos_s * cos_l / d2 * area  # f * Le * G / pdf
    want = contrib.mean()
    # the first bounce also adds the (tiny) bounce path; depth=2 with black
    # sky adds only light re-hits, negligible here
    assert got == pytest.approx(want, rel=0.05)


def test_dielectric_beer_lambert_box():
    """Straight shot through an absorbing glass box: attenuation follows the
    reference's 0.1 + 0.9*exp(-a*scale*d) law with tint (gpu contract).

    With IOR at normal incidence, reflectProb = 0.04 so most lanes refract;
    we average many lanes and compare against the analytic mixture.
    """
    a = (2.0, 4.0, 8.0)
    scale = 0.5
    thick = 2.0
    sc = S.Scene(
        camera=base_camera(),
        sky=solid_sky((1.0, 1.0, 1.0)),
        materials=[
            S.Material(
                id="g",
                type="dielectric",
                ior=1.5,
                absorption=S.Color(*a),
                absorption_scale=scale,
            )
        ],
        objects=[obj("b", "box", (0, 0, -5), (2, 2, thick), material_id="g")],
    )
    n = 8192
    rad, _ = _trace_rays(sc, [[0, 0, 0]] * n, [[0, 0, -1]] * n, max_depth=6, contract="gpu")
    got = rad.mean(axis=0)
    # Expected for the refracted branch (prob 0.96): straight through,
    # attenuation (0.1+0.9 exp(-a*scale*thick)) * white tint, then exits
    # the far side *without* a second interface (the glass object is
    # excluded once entered — reference behavior), hits sky (1,1,1).
    # Reflected branch (0.04): bounces back, hits sky too with no
    # attenuation.  RR region: depth 6, first hit at remaining=6 -> no RR.
    expect = []
    f = 0.04  # schlick at normal incidence, ior 1.5
    for ai in a:
        beer = 0.1 + 0.9 * np.exp(-ai * scale * thick)
        expect.append((1 - f) * beer * 1.0 + f * 1.0)
    np.testing.assert_allclose(got, expect, rtol=0.05)


@pytest.mark.parametrize("contract", ["gpu", "cpu"])
def test_trace_deterministic(contract):
    sc = lambert_floor_scene()
    rad1, _ = _trace_rays(sc, [[0, 2, 0]] * 64, [[0.1, -1, 0.05]] * 64, contract=contract, seed=5)
    rad2, _ = _trace_rays(sc, [[0, 2, 0]] * 64, [[0.1, -1, 0.05]] * 64, contract=contract, seed=5)
    assert np.array_equal(rad1, rad2)


def test_radiance_finite_full_feature():
    from helpers import full_feature_scene

    sc = full_feature_scene()
    n = 256
    rng = np.random.default_rng(2)
    dirs = rng.normal(size=(n, 3))
    dirs[:, 2] = -np.abs(dirs[:, 2]) - 0.5
    rad, segs = _trace_rays(sc, [[0, 1.5, 6]] * n, dirs, max_depth=8, contract="gpu")
    assert np.isfinite(rad).all()
    assert (rad >= 0).all()
    assert segs >= n  # at least the primary segments


def test_regen_pass_matches_classic_statistically():
    """The merged sample+bounce regeneration loop (integrator.pass_regen_gpu,
    the deep-depth scheduler) is an identical physical estimator to the
    classic per-sample loop — only the RNG consumption schedule differs —
    so small renders must agree statistically, and the regen path itself
    must be deterministic."""
    import dataclasses

    import path_trace_golang_tpu as pt
    from path_trace_golang_tpu import render as render_mod

    from helpers import full_feature_scene

    sc = full_feature_scene()
    cfg = pt.RenderConfig(width=48, height=32, samples_per_px=2, max_depth=8)

    r_regen = pt.Renderer(contract="gpu", seed=11, chunk=48 * 32)
    img_regen = r_regen.render(sc, cfg)
    assert r_regen.stats.ray_segments > 0

    # determinism of the regen path
    img_regen2 = pt.Renderer(contract="gpu", seed=11, chunk=48 * 32).render(sc, cfg)
    assert np.array_equal(img_regen, img_regen2)

    # classic loop via the TraceConfig.regen switch (part of the jit key)
    orig_fn = render_mod.trace_config_for_scene

    def classic_cfg(*a, **k):
        return dataclasses.replace(orig_fn(*a, **k), regen=False)

    render_mod.trace_config_for_scene = classic_cfg
    try:
        img_classic = pt.Renderer(contract="gpu", seed=11, chunk=48 * 32).render(sc, cfg)
    finally:
        render_mod.trace_config_for_scene = orig_fn

    a = img_regen.astype(np.float64)
    b = img_classic.astype(np.float64)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    for ch in range(3):
        am, bm = a[..., ch].mean(), b[..., ch].mean()
        assert abs(am - bm) <= max(0.02 * bm, 2.0), (am, bm)


def test_regen_pass_window_matches_single_pass_statistically():
    """A windowed dispatch (n_passes > 1 in one kernel launch) reseeds at
    pass boundaries and must agree statistically with pass-at-a-time
    rendering of the same pass count."""
    import os

    import path_trace_golang_tpu as pt

    from helpers import full_feature_scene

    sc = full_feature_scene()
    cfg = pt.RenderConfig(width=48, height=32, samples_per_px=4, max_depth=6)

    old = os.environ.get("PATHTRACER_PASS_WINDOW")
    try:
        os.environ["PATHTRACER_PASS_WINDOW"] = "4"
        img_win = pt.Renderer(contract="gpu", seed=9, chunk=48 * 32).render(sc, cfg)
        os.environ["PATHTRACER_PASS_WINDOW"] = "1"
        img_one = pt.Renderer(contract="gpu", seed=9, chunk=48 * 32).render(sc, cfg)
    finally:
        if old is None:
            os.environ.pop("PATHTRACER_PASS_WINDOW", None)
        else:
            os.environ["PATHTRACER_PASS_WINDOW"] = old

    a = img_win.astype(np.float64)
    b = img_one.astype(np.float64)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    for ch in range(3):
        am, bm = a[..., ch].mean(), b[..., ch].mean()
        assert abs(am - bm) <= max(0.03 * bm, 2.5), (am, bm)
