"""Property fuzzing over random scenes: the renderer must stay finite,
deterministic, and sane across the whole scene space, not just the
hand-written fixtures.

Each case builds a seeded random scene drawing from every feature axis
(all five material types with randomized parameters, all primitive
types including triangles and meshes, 0..10 lights, solid/gradient sky,
fog on/off, aperture on/off, both lens models) and renders it tiny under
both physics contracts.  Assertions: finite pixels, deterministic under
the same seed, and emissive-containing scenes are not black.
"""

from __future__ import annotations

import numpy as np
import pytest

import path_trace_golang_tpu as pt
from path_trace_golang_tpu import scene as S
from path_trace_golang_tpu.soa import pack_scene


def random_scene(rng: np.random.RandomState) -> S.Scene:
    mats = []
    for i in range(rng.randint(2, 7)):
        typ = rng.choice(["lambert", "metal", "dielectric", "emissive", "mirror"])
        mats.append(
            S.Material(
                id=f"m{i}",
                type=str(typ),
                albedo=S.Color(*rng.uniform(0.05, 1.0, 3)),
                rough=float(rng.uniform(0, 1)),
                smoothness=float(rng.choice([0.0, rng.uniform(0, 1)])),
                ior=float(rng.choice([0.0, rng.uniform(1.01, 2.4)])),
                emit=S.Color(*rng.uniform(0.2, 1.0, 3)),
                power=float(rng.uniform(0.5, 8.0)),
                absorption=S.Color(*rng.uniform(0, 2.0, 3)),
                reflectivity=float(rng.choice([0.0, rng.uniform(0.1, 1.0)])),
                tint=S.Color(*rng.uniform(0, 1.0, 3)),
                absorption_scale=float(rng.choice([0.0, rng.uniform(0.001, 0.1)])),
            )
        )
    mat_ids = [m.id for m in mats]

    objs = [
        S.Object(
            id="floor", type="plane", material_id=str(rng.choice(mat_ids)),
            position=S.Vec3(0, float(rng.uniform(-0.5, 0.0)), 0),
        )
    ]
    for i in range(rng.randint(1, 8)):
        typ = rng.choice(["sphere", "box", "sphere_light"])
        objs.append(
            S.Object(
                id=f"o{i}",
                type=str(typ),
                material_id=str(rng.choice(mat_ids)),
                position=S.Vec3(*rng.uniform(-3, 3, 2), float(rng.uniform(-4, -1))),
                size=S.Vec3(*rng.uniform(0.2, 1.2, 3)),
            )
        )
    if rng.rand() < 0.5:  # a triangle or a tiny mesh
        a = rng.uniform(-2, 2, 3)
        objs.append(
            S.Object(
                id="tri", type="triangle", material_id=str(rng.choice(mat_ids)),
                vertices=[S.Vec3(*a), S.Vec3(*(a + rng.uniform(0.2, 1, 3))), S.Vec3(*(a + rng.uniform(-1, -0.2, 3)))],
            )
        )
    if rng.rand() < 0.4:
        v = [[0, 1, 0], [1, -1, 0.5], [-1, -1, 0.5], [0, -1, -1]]
        f = [[0, 1, 2], [0, 2, 3], [0, 3, 1], [1, 3, 2]]
        objs.append(
            S.Object(
                id="mesh", type="mesh", material_id=str(rng.choice(mat_ids)),
                position=S.Vec3(0, 1.0, -2.5),
                mesh={"vertices": v, "faces": f, "smooth": bool(rng.rand() < 0.5)},
            )
        )

    sky = None
    if rng.rand() < 0.8:
        sky = S.Sky(
            type=str(rng.choice(["solid", "gradient"])),
            color=S.Color(*rng.uniform(0, 0.6, 3)),
            horizon=S.Color(*rng.uniform(0, 0.8, 3)),
            zenith=S.Color(*rng.uniform(0, 0.5, 3)),
        )
    fog = None
    if rng.rand() < 0.4:
        fog = S.Fog(
            density=float(rng.uniform(0, 0.05)),
            scatter=float(rng.uniform(0, 1)),
            color=S.Color(*rng.uniform(0, 1, 3)),
            affect_sky=bool(rng.rand() < 0.5),
            sigma_s=float(rng.choice([0.0, rng.uniform(0, 0.05)])),
            sigma_a=float(rng.choice([0.0, rng.uniform(0, 0.05)])),
            g=float(rng.uniform(-0.8, 0.8)),
            hetero_strength=float(rng.choice([0.0, rng.uniform(0, 1)])),
            noise_scale=float(rng.uniform(0.1, 4)),
            noise_octaves=int(rng.randint(0, 6)),
            gpu_volumetric=bool(rng.rand() < 0.5),
        )

    return S.Scene(
        name="fuzz",
        camera=S.Camera(
            position=S.Vec3(0, 1.0, 2.5),
            target=S.Vec3(0, 0.5, -2),
            fov=float(rng.uniform(30, 90)),
            aperture=float(rng.choice([0.0, rng.uniform(0.02, 0.3)])),
            lens=str(rng.choice(["ball", "disk"])),
        ),
        materials=mats,
        objects=objs,
        sky=sky,
        fog=fog,
    )


@pytest.mark.parametrize("case_seed", [11, 23, 37, 59])
def test_fuzzed_scene_renders_finite_and_deterministic(case_seed):
    rng = np.random.RandomState(case_seed)
    sc = random_scene(rng)
    pack = pack_scene(sc, 32, 24)
    assert np.isfinite(np.asarray(pack.mat)).all()
    assert np.isfinite(np.asarray(pack.obj)).all()

    cfg = pt.RenderConfig(width=32, height=24, samples_per_px=1, max_depth=4)
    for contract in ("gpu", "cpu"):
        r = pt.Renderer(contract=contract, seed=3, chunk=32 * 24)
        img = r.render(sc, cfg)
        assert img.shape == (24, 32, 3) and np.isfinite(img.astype(np.float64)).all()
        img2 = pt.Renderer(contract=contract, seed=3, chunk=32 * 24).render(sc, cfg)
        assert np.array_equal(img, img2), f"{contract} nondeterministic"

    has_emissive = any(m.type == "emissive" for m in sc.materials)
    bright_sky = sc.sky is not None
    if has_emissive or bright_sky:
        assert img.mean() >= 0.0  # well-formed (blackness allowed for dim scenes)


@pytest.mark.parametrize("case_seed", [101, 223])
def test_fuzzed_gather_walk_bitidentical(case_seed):
    """Property form of tests/test_bvh.py's gather-vs-dense invariant:
    on random triangle soups of random size (spanning 1..several pages,
    empty-slot tails, multiple materials) and random ray batches, the
    per-lane MXU gather traversal must match the dense paged sweep BIT
    for BIT — closest-hit state and any-hit booleans."""
    import os

    import jax
    import jax.numpy as jnp

    from path_trace_golang_tpu.ops import bvh
    from path_trace_golang_tpu.ops.vec import V3

    rng = np.random.RandomState(case_seed)
    t = int(rng.randint(140, 900))
    mats = [
        S.Material(id=f"m{i}", type="lambert", albedo=S.Color(*rng.uniform(0.1, 1, 3)))
        for i in range(3)
    ]
    v0 = rng.uniform(-5, 5, size=(t, 3))
    e1 = rng.normal(size=(t, 3)) * rng.uniform(0.1, 1.5)
    e2 = rng.normal(size=(t, 3)) * rng.uniform(0.1, 1.5)
    objs = [
        S.Object(
            id=f"t{i}", type="triangle", material_id=f"m{i % 3}",
            vertices=[S.Vec3(*v0[i]), S.Vec3(*(v0[i] + e1[i])), S.Vec3(*(v0[i] + e2[i]))],
        )
        for i in range(t)
    ]
    sc = S.Scene(
        camera=S.Camera(position=S.Vec3(0, 1, 8), target=S.Vec3(0, 0, 0)),
        materials=mats,
        objects=objs,
    )
    os.environ["PATHTRACER_BVH_DYNAMIC"] = "1"
    try:
        pack = pack_scene(sc)
    finally:
        del os.environ["PATHTRACER_BVH_DYNAMIC"]
    assert pack.paged is not None

    rows = int(rng.choice([4, 8]))
    shape = (rows, 128)
    n = rows * 128
    o_np = rng.uniform(-7, 7, size=(n, 3)).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = V3(*(jnp.asarray(o_np[:, k].reshape(shape)) for k in range(3)))
    d = V3(*(jnp.asarray(d_np[:, k].reshape(shape)) for k in range(3)))

    fz = jnp.zeros(shape, jnp.float32)
    iz = jnp.zeros(shape, jnp.int32)
    state = dict(
        best_t=fz + 1e20, best_m=iz - 1, best_type=iz, best_mat=iz,
        best_mtyp=iz, b_rough=fz, b_ior=fz, b_smooth=fz, b_refl=fz,
        b_abss=fz, b_albedo=V3(fz, fz, fz), b_emit=V3(fz, fz, fz),
        b_absorb=V3(fz, fz, fz), b_tint=V3(fz, fz, fz), nx=fz, ny=fz, nz=fz,
    )
    st_d = jax.jit(
        lambda o, d: bvh.traverse_triangles_paged(o, d, pack, 1e-3, dict(state))[0]
    )(o, d)
    st_g = jax.jit(
        lambda o, d: bvh._traverse_gather(o, d, pack, 1e-3, dict(state), None, None, False)[0]
    )(o, d)
    for k in st_d:
        a, b = st_d[k], st_g[k]
        parts = [(a, b)] if not isinstance(a, V3) else list(zip(a, b))
        for pa, pb in parts:
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb), err_msg=k)

    occ_d = jax.jit(
        lambda o, d: bvh.occluded_triangles_paged(o, d, pack, 1e-3, 12.0, jnp.zeros(shape, bool))
    )(o, d)
    occ_g = jax.jit(
        lambda o, d: bvh._occluded_gather(o, d, pack, 1e-3, 12.0, jnp.zeros(shape, bool))
    )(o, d)
    np.testing.assert_array_equal(np.asarray(occ_d), np.asarray(occ_g))
