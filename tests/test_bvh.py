"""Triangle mesh + BVH extension tests (BASELINE.json north star)."""

import jax.numpy as jnp
import numpy as np
import pytest

import path_trace_golang_tpu as pt
from path_trace_golang_tpu import scene as S
from path_trace_golang_tpu.ops import geometry
from path_trace_golang_tpu.ops.bvh import OBJ_TRIANGLE, build_bvh
from path_trace_golang_tpu.ops.vec import V3
from path_trace_golang_tpu.soa import pack_scene

from helpers import base_camera, mat, obj, solid_sky


def _tri_obj(id, a, b, c, material_id):
    return S.Object(
        id=id,
        type="triangle",
        material_id=material_id,
        vertices=[S.Vec3(*a), S.Vec3(*b), S.Vec3(*c)],
    )


def _icosahedron_mesh(material_id, pos=(0, 0, 0), scale=1.0):
    phi = (1 + np.sqrt(5)) / 2
    v = np.array(
        [
            [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
            [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
            [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
        ]
    ) / np.sqrt(1 + phi * phi)
    f = [
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ]
    return S.Object(
        id="ico",
        type="mesh",
        material_id=material_id,
        position=S.Vec3(*pos),
        size=S.Vec3(scale, scale, scale),
        mesh={"vertices": v.tolist(), "faces": f},
    )


def _rays(origins, dirs):
    o = np.asarray(origins, np.float32)
    d = np.asarray(dirs, np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return V3.from_rows(jnp.asarray(o)), V3.from_rows(jnp.asarray(d))


def test_build_bvh_structure():
    rng = np.random.default_rng(0)
    t = 37
    v0 = rng.normal(size=(t, 3)) * 5
    e1 = rng.normal(size=(t, 3))
    e2 = rng.normal(size=(t, 3))
    topo, bounds = build_bvh(v0, e1, e2)
    b = topo.n_nodes
    assert sorted(topo.order) == list(range(t))  # permutation
    covered = []
    for i in range(b):
        assert 0 <= topo.miss[i] <= b  # escape indices in range
        if topo.count[i] > 0:
            covered.extend(range(topo.first[i], topo.first[i] + topo.count[i]))
    assert sorted(covered) == list(range(t))  # leaves partition the tris
    # node bounds enclose their leaf triangles
    corners = np.stack([v0, v0 + e1, v0 + e2], axis=1)
    for i in range(b):
        if topo.count[i] > 0:
            tris = [topo.order[j] for j in range(topo.first[i], topo.first[i] + topo.count[i])]
            pts = corners[tris].reshape(-1, 3)
            assert (pts.min(0) >= bounds[i, 0:3] - 1e-4).all()
            assert (pts.max(0) <= bounds[i, 3:6] + 1e-4).all()


def test_triangle_hit_closed_form():
    sc = S.Scene(
        camera=base_camera(),
        sky=solid_sky(),
        materials=[mat("m", albedo=(0.2, 0.4, 0.6))],
        objects=[_tri_obj("t", (-1, -1, -3), (1, -1, -3), (0, 1, -3), "m")],
    )
    pack = pack_scene(sc)
    assert pack.n_triangles == 1 and pack.n_objects == 0
    o, d = _rays(
        [[0, 0, 0], [0, 0, 0], [5, 5, 0], [0, 0, -5]],
        [[0, 0, -1], [0, 1, 0], [0, 0, -1], [0, 0, 1]],
    )
    h = geometry.intersect_world(o, d, pack)
    assert bool(h.hit[0]) and not bool(h.hit[1]) and not bool(h.hit[2])
    assert float(h.t[0]) == pytest.approx(3.0, abs=1e-5)
    assert int(h.obj_type[0]) == OBJ_TRIANGLE
    np.testing.assert_allclose(np.asarray(h.albedo.to_rows()[0]), [0.2, 0.4, 0.6], atol=1e-6)
    # normal faces the ray origin side
    np.testing.assert_allclose(np.asarray(h.normal.to_rows()[0]), [0, 0, 1], atol=1e-5)
    # backside hit (ray 3) flips the normal
    assert bool(h.hit[3]) and not bool(h.front_face[3]) or bool(h.front_face[3])


def test_bvh_matches_brute_force():
    """BVH-guided closest hit == brute-force Möller–Trumbore over all tris."""
    rng = np.random.default_rng(7)
    t = 60
    v0 = rng.uniform(-4, 4, size=(t, 3))
    e1 = rng.normal(size=(t, 3))
    e2 = rng.normal(size=(t, 3))
    sc = S.Scene(
        camera=base_camera(),
        sky=solid_sky(),
        materials=[mat("m")],
        objects=[
            _tri_obj(f"t{i}", v0[i], v0[i] + e1[i], v0[i] + e2[i], "m") for i in range(t)
        ],
    )
    pack = pack_scene(sc)
    assert pack.n_triangles == t

    n = 256
    o_np = rng.uniform(-6, 6, size=(n, 3)).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o, d = V3.from_rows(jnp.asarray(o_np)), V3.from_rows(jnp.asarray(d_np))
    h = geometry.intersect_world(o, d, pack)

    # brute force reference
    best = np.full(n, 1e20)
    for i in range(t):
        p = np.cross(d_np, e2[i])
        det = (e1[i] * p).sum(-1)
        ok = np.abs(det) > 1e-9
        inv = 1.0 / np.where(ok, det, 1.0)
        tv = o_np - v0[i]
        u = (tv * p).sum(-1) * inv
        q = np.cross(tv, e1[i])
        v = (d_np * q).sum(-1) * inv
        tt = (e2[i] * q).sum(-1) * inv
        ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (tt >= 1e-3)
        best = np.where(ok & (tt < best), tt, best)

    got_t = np.asarray(h.t)
    hit_ref = best < 1e20
    assert np.array_equal(np.asarray(h.hit), hit_ref)
    np.testing.assert_allclose(got_t[hit_ref], best[hit_ref], rtol=2e-4)


def test_mesh_render_end_to_end():
    sc = S.Scene(
        camera=S.Camera(position=S.Vec3(0, 1, 4), target=S.Vec3(0, 1, 0), up=S.Vec3(0, 1, 0), fov=50),
        sky=solid_sky((0.4, 0.5, 0.7)),
        materials=[
            mat("ground", "lambert", (0.5, 0.5, 0.5)),
            mat("gold", "metal", (1.0, 0.8, 0.3), smoothness=0.8),
            mat("lamp", "emissive", emit=(1, 1, 1), power=6),
        ],
        objects=[
            obj("floor", "plane", (0, 0, 0), material_id="ground"),
            _icosahedron_mesh("gold", pos=(0, 1.2, 0), scale=1.0),
            obj("l", "sphere_light", (2, 4, 2), (0.5, 0, 0), material_id="lamp"),
        ],
    )
    r = pt.Renderer(contract="gpu", seed=3, chunk=48 * 32)
    cfg = pt.RenderConfig(width=48, height=32, samples_per_px=1, max_depth=4)
    img = r.render(sc, cfg)
    assert np.isfinite(img.astype(float)).all()
    # the mesh occludes the sky in the center: center differs from corners
    center = img[12:20, 18:30].mean()
    corner = img[:4, :4].mean()
    assert abs(center - corner) > 2.0
    # deterministic
    img2 = pt.Renderer(contract="gpu", seed=3, chunk=48 * 32).render(sc, cfg)
    assert np.array_equal(img, img2)


def test_mesh_shadow_rays():
    """A triangle quad between light and floor must cast a shadow (the
    occluded() BVH path)."""
    quad = [
        _tri_obj("q1", (-1, 2, -1), (1, 2, -1), (1, 2, 1), "blocker"),
        _tri_obj("q2", (-1, 2, -1), (1, 2, 1), (-1, 2, 1), "blocker"),
    ]
    base = dict(
        camera=S.Camera(position=S.Vec3(0, 4, 6), target=S.Vec3(0, 0, 0), up=S.Vec3(0, 1, 0), fov=45),
        sky=solid_sky((0, 0, 0)),
        materials=[
            mat("floor", "lambert", (0.8, 0.8, 0.8)),
            mat("blocker", "lambert", (0.1, 0.1, 0.1)),
            mat("lamp", "emissive", emit=(1, 1, 1), power=20),
        ],
    )
    objects = [
        obj("p", "plane", (0, 0, 0), material_id="floor"),
        obj("l", "sphere_light", (0, 6, 0), (0.4, 0, 0), material_id="lamp"),
    ]
    cfg = pt.RenderConfig(width=40, height=30, samples_per_px=2, max_depth=2)
    lit = pt.Renderer(contract="gpu", seed=2, normalize_pass=True, chunk=40 * 30).render(
        S.Scene(objects=objects, **base), cfg
    )
    shadowed = pt.Renderer(contract="gpu", seed=2, normalize_pass=True, chunk=40 * 30).render(
        S.Scene(objects=objects + quad, **base), cfg
    )
    # the floor under the quad is darker with the blocker in place
    assert shadowed[18:28, 14:26].mean() < lit[18:28, 14:26].mean() - 5


def test_triangle_scene_json_roundtrip():
    sc = S.Scene(
        camera=base_camera(),
        materials=[mat("m")],
        objects=[_tri_obj("t", (0, 0, 0), (1, 0, 0), (0, 1, 0), "m"), _icosahedron_mesh("m")],
    )
    assert S.loads(S.dumps(sc)) == sc


# ---------------------------------------------------------------------------
# Dynamic packet walk (large meshes / Pallas SMEM tables)
# ---------------------------------------------------------------------------


def _random_tri_scene(t, seed=7, lo=-4, hi=4):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(lo, hi, size=(t, 3))
    e1 = rng.normal(size=(t, 3)) * 0.6
    e2 = rng.normal(size=(t, 3)) * 0.6
    mats = [mat("a", albedo=(0.6, 0.3, 0.2)), mat("b", albedo=(0.2, 0.6, 0.3))]
    objs = [
        _tri_obj(f"t{i}", v0[i], v0[i] + e1[i], v0[i] + e2[i], "a" if i % 2 else "b")
        for i in range(t)
    ]
    return S.Scene(camera=base_camera(), sky=solid_sky(), materials=mats, objects=objs)


def test_dynamic_walk_matches_static():
    """The dense paged sweep (large-mesh path) and the unrolled walk must
    agree on hits and winners.  t is compared to a few ulp: the paged
    sweep uses the plane/barycentric-dual form with float64-precomputed
    constants (bvh.build_paged_bvh), which rounds differently from the
    unrolled walk's classic Möller–Trumbore in f32."""
    import os

    import jax

    sc = _random_tri_scene(60)
    pack = pack_scene(sc)
    rng = np.random.default_rng(3)
    n = 256
    o_np = rng.uniform(-6, 6, size=(n, 3)).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o, d = V3.from_rows(jnp.asarray(o_np)), V3.from_rows(jnp.asarray(d_np))

    h_static = jax.jit(lambda o, d: geometry.intersect_world(o, d, pack))(o, d)
    os.environ["PATHTRACER_BVH_DYNAMIC"] = "1"
    try:
        # re-pack under the env flag: pack_scene builds the paged tables
        # only when the scene routes to the dynamic walk
        pack_dyn = pack_scene(sc)
        h_dyn = jax.jit(lambda o, d: geometry.intersect_world(o, d, pack_dyn))(o, d)
    finally:
        del os.environ["PATHTRACER_BVH_DYNAMIC"]

    hit = np.asarray(h_static.hit)
    assert hit.any()
    assert np.array_equal(hit, np.asarray(h_dyn.hit))
    np.testing.assert_allclose(
        np.asarray(h_static.t)[hit], np.asarray(h_dyn.t)[hit], rtol=2e-6
    )
    # normals/materials are only defined on hit lanes (miss lanes carry
    # whatever the winner chain defaulted to, which differs by walk).
    # Normals agree to 1 ulp: the unrolled walk folds the cross product in
    # python doubles at trace time, the dynamic walk computes it in f32.
    np.testing.assert_allclose(
        np.asarray(h_static.normal.to_rows())[hit.ravel()],
        np.asarray(h_dyn.normal.to_rows())[hit.ravel()],
        atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(h_static.albedo.to_rows())[hit.ravel()],
        np.asarray(h_dyn.albedo.to_rows())[hit.ravel()],
    )
    assert np.array_equal(np.asarray(h_static.mat_idx), np.asarray(h_dyn.mat_idx))
    assert np.array_equal(np.asarray(h_static.obj_idx), np.asarray(h_dyn.obj_idx))


def test_dynamic_walk_occlusion_matches_static():
    import os

    import jax

    sc = _random_tri_scene(48, seed=11)
    pack = pack_scene(sc)
    rng = np.random.default_rng(5)
    n = 256
    o_np = rng.uniform(-6, 6, size=(n, 3)).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o, d = V3.from_rows(jnp.asarray(o_np)), V3.from_rows(jnp.asarray(d_np))

    b_static = jax.jit(lambda o, d: geometry.occluded(o, d, pack, 1e-3, 8.0))(o, d)
    os.environ["PATHTRACER_BVH_DYNAMIC"] = "1"
    try:
        pack_dyn = pack_scene(sc)
        b_dyn = jax.jit(lambda o, d: geometry.occluded(o, d, pack_dyn, 1e-3, 8.0))(o, d)
    finally:
        del os.environ["PATHTRACER_BVH_DYNAMIC"]
    assert np.array_equal(np.asarray(b_static), np.asarray(b_dyn))


def test_large_mesh_routes_to_dynamic_walk_and_renders():
    """>128 triangles auto-selects the dynamic walk; an end-to-end render
    through it must be finite, deterministic and show the mesh."""
    from path_trace_golang_tpu.ops.bvh import use_dynamic_walk

    rng = np.random.default_rng(0)
    # a 10x10x2 grid of quads = 200 triangles forming a bumpy sheet
    tris = []
    for i in range(10):
        for j in range(10):
            x0, z0 = i * 0.4 - 2, j * 0.4 - 2
            y = 1.0 + 0.2 * rng.standard_normal()
            a, b, c, dd = (
                (x0, y, z0),
                (x0 + 0.4, y, z0),
                (x0 + 0.4, y, z0 + 0.4),
                (x0, y, z0 + 0.4),
            )
            tris.append(_tri_obj(f"q{i}_{j}a", a, b, c, "sheet"))
            tris.append(_tri_obj(f"q{i}_{j}b", a, c, dd, "sheet"))
    assert use_dynamic_walk(len(tris))
    sc = S.Scene(
        camera=S.Camera(position=S.Vec3(0, 4, 5), target=S.Vec3(0, 1, 0), up=S.Vec3(0, 1, 0), fov=50),
        sky=solid_sky((0.2, 0.3, 0.5)),
        materials=[mat("sheet", "lambert", (0.7, 0.5, 0.3)), mat("ground", "lambert", (0.2, 0.2, 0.2))],
        objects=[obj("p", "plane", (0, 0, 0), material_id="ground")] + tris,
    )
    r = pt.Renderer(contract="gpu", seed=4, chunk=48 * 32)
    cfg = pt.RenderConfig(width=48, height=32, samples_per_px=1, max_depth=3)
    img = r.render(sc, cfg)
    assert np.isfinite(img.astype(float)).all()
    assert img.mean() > 5.0
    img2 = pt.Renderer(contract="gpu", seed=4, chunk=48 * 32).render(sc, cfg)
    assert np.array_equal(img, img2)


def test_dynamic_walk_visits_sublinear_for_coherent_packet():
    """The paged walk skips pages the whole packet misses: a tight
    coherent packet must visit far less than the full per-page budget."""
    import jax

    from path_trace_golang_tpu.ops import bvh as bvh_mod

    # a long flat strip: 2*PAGE_TRIS quads along x => 4*PAGE_TRIS
    # triangles in 4 pages (at any PATHTRACER_PAGE_TRIS) whose bboxes
    # are spatially disjoint quarters of the strip
    nq = 2 * bvh_mod.PAGE_TRIS
    verts = [[float(i), 0.0, z] for i in range(nq + 1) for z in (0.0, 1.0)]
    faces = []
    for i in range(nq):
        a, b, c, e = 2 * i, 2 * i + 1, 2 * i + 2, 2 * i + 3
        faces.append([a, b, c])
        faces.append([b, e, c])
    sc = S.Scene(
        camera=base_camera(),
        materials=[mat("m", "lambert")],
        objects=[
            S.Object(
                id="strip",
                type="mesh",
                material_id="m",
                mesh={"vertices": verts, "faces": faces},
            )
        ],
        sky=solid_sky(),
    )
    pack = pack_scene(sc)
    # visit budget if nothing were skipped: every page swept
    n_budget = pack.paged.n_pages
    assert n_budget >= 4

    # tight packet shooting straight down at the strip's first quarter
    shape = (2, 128)
    jit = np.linspace(0, 1.0, 256, dtype=np.float32).reshape(shape)
    o = V3(jnp.asarray(jit) + 1.0, jnp.full(shape, 5.0), jnp.full(shape, 0.5))
    d = V3(jnp.zeros(shape), -jnp.ones(shape), jnp.zeros(shape)).normalize()

    state = dict(
        best_t=jnp.full(shape, geometry.BIG_T),
        best_m=jnp.zeros(shape, jnp.int32),
        best_type=jnp.zeros(shape, jnp.int32),
        best_mat=jnp.zeros(shape, jnp.int32),
        best_mtyp=jnp.zeros(shape, jnp.int32),
        b_rough=jnp.zeros(shape),
        b_ior=jnp.zeros(shape),
        b_smooth=jnp.zeros(shape),
        b_refl=jnp.zeros(shape),
        b_abss=jnp.zeros(shape),
        b_albedo=V3.zeros(shape),
        b_emit=V3.zeros(shape),
        b_absorb=V3.zeros(shape),
        b_tint=V3.zeros(shape),
        nx=jnp.zeros(shape),
        ny=jnp.zeros(shape),
        nz=jnp.zeros(shape),
    )
    _st, visits = jax.jit(
        lambda o, d: bvh_mod.traverse_triangles_paged(o, d, pack, 1e-3, state)
    )(o, d)
    visits = int(visits)
    assert visits < max(n_budget // 2, 1), (visits, n_budget)


@pytest.mark.parametrize("n_lat,n_lon,min_dot", [(4, 5, 0.98), (8, 10, 0.998)])
def test_smooth_vertex_normals_match_sphere(n_lat, n_lon, min_dot):
    """mesh{"smooth": true} interpolates area-weighted vertex normals by
    the hit barycentrics: on a coarse UV-sphere the shading normal must
    track the exact sphere normal far better than the flat face normal.
    40 triangles route through the static unrolled walk, 160 through
    the dynamic walk (> STATIC_TRI_MAX)."""
    import jax
    verts, faces = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            verts.append(
                [np.sin(th) * np.cos(ph), np.cos(th), np.sin(th) * np.sin(ph)]
            )
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            dd = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, dd, c])

    from helpers import base_camera

    def build(smooth):
        sc = S.Scene(
            camera=base_camera(),
            materials=[S.Material(id="m", type="lambert", albedo=S.Color(0.5, 0.5, 0.5))],
            objects=[
                S.Object(
                    id="s",
                    type="mesh",
                    material_id="m",
                    mesh={"vertices": verts, "faces": faces, "smooth": smooth},
                )
            ],
        )
        return pack_scene(sc, 8, 8)

    # rays from random directions toward the origin
    r = np.random.RandomState(5)
    dirs = r.normal(size=(256, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    o = V3(*(jnp.asarray((dirs[:, k] * 3.0).reshape(2, 128).astype(np.float32)) for k in range(3)))
    d = V3(*(jnp.asarray((-dirs[:, k]).reshape(2, 128).astype(np.float32)) for k in range(3)))

    def mean_dot(pack):
        hit = jax.jit(lambda o, d: geometry.intersect_world(o, d, pack, 1e-3))(o, d)
        p = np.stack([np.asarray(hit.p.x), np.asarray(hit.p.y), np.asarray(hit.p.z)], -1)
        n = np.stack(
            [np.asarray(hit.normal.x), np.asarray(hit.normal.y), np.asarray(hit.normal.z)], -1
        )
        mask = np.asarray(hit.hit)
        exact = p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-20)
        dots = (n * exact).sum(-1)[mask]
        assert dots.size > 200
        return float(dots.mean())

    flat = mean_dot(build(False))
    smooth = mean_dot(build(True))
    assert smooth > min_dot, smooth
    assert smooth > flat + 0.005, (smooth, flat)


@pytest.mark.parametrize("rows", [8, 2])  # 8: row-grouped (gstep=4); 2: gstep=1
def test_gather_walk_bitidentical_to_dense(rows):
    """The per-lane MXU gather traversal (Pallas kernel path) must be
    BIT-identical to the dense paged sweep: the bf16-limb one-hot gather
    reconstructs exact f32 attributes, so every winner key, t, normal
    and material field matches to the bit (PERF.md "per-lane gather
    walk").  Run here on plain CPU arrays by calling the gather
    traversal directly (in-kernel it engages via _use_gather)."""
    import os

    import jax

    from path_trace_golang_tpu.ops import bvh

    # size the soup off the page capacity so the walk is multi-page at
    # any PATHTRACER_PAGE_TRIS (>= 4 pages + an odd tail)
    n_tris = 4 * bvh.PAGE_TRIS + 88
    os.environ["PATHTRACER_BVH_DYNAMIC"] = "1"
    try:
        sc = _random_tri_scene(n_tris, seed=13)
        pack = pack_scene(sc)
    finally:
        del os.environ["PATHTRACER_BVH_DYNAMIC"]
    assert pack.paged is not None and pack.paged.n_pages >= 4

    rng = np.random.default_rng(17)
    n = rows * 128
    o_np = rng.uniform(-6, 6, size=(n, 3)).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    shape = (rows, 128)
    o = V3(*(jnp.asarray(o_np[:, k].reshape(shape)) for k in range(3)))
    d = V3(*(jnp.asarray(d_np[:, k].reshape(shape)) for k in range(3)))
    t_max = jnp.asarray(
        rng.uniform(2.0, 50.0, size=shape).astype(np.float32)
    )
    excl = jnp.asarray(
        rng.integers(0, n_tris, size=shape).astype(np.int32)
    )

    fz = jnp.zeros(shape, jnp.float32)
    iz = jnp.zeros(shape, jnp.int32)

    def state0():
        return dict(
            best_t=fz + 1e20, best_m=iz - 1, best_type=iz, best_mat=iz,
            best_mtyp=iz, b_rough=fz, b_ior=fz, b_smooth=fz, b_refl=fz,
            b_abss=fz, b_albedo=V3(fz, fz, fz), b_emit=V3(fz, fz, fz),
            b_absorb=V3(fz, fz, fz), b_tint=V3(fz, fz, fz),
            nx=fz, ny=fz, nz=fz,
        )

    dense_fn = jax.jit(
        lambda o, d, t_max, excl: bvh.traverse_triangles_paged(
            o, d, pack, 1e-3, state0(), exclude_obj=excl, t_max=t_max
        )[0]
    )
    gather_fn = jax.jit(
        lambda o, d, t_max, excl: bvh._traverse_gather(
            o, d, pack, 1e-3, state0(), excl, t_max, False
        )[0]
    )
    st_d = dense_fn(o, d, t_max, excl)
    st_g = gather_fn(o, d, t_max, excl)
    assert bool(np.asarray(st_d["best_t"] < 1e19).any())  # some hits
    for k in st_d:
        a, b = st_d[k], st_g[k]
        if isinstance(a, V3):
            for ax in "xyz":
                np.testing.assert_array_equal(
                    np.asarray(getattr(a, ax)), np.asarray(getattr(b, ax)), err_msg=k
                )
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=k)

    # ---- any-hit (shadow) walk, with some lanes pre-blocked ----------
    blocked0 = jnp.asarray((rng.random(shape) < 0.2))
    occ_dense = jax.jit(
        lambda o, d, b: bvh.occluded_triangles_paged(o, d, pack, 1e-3, 9.0, b)
    )(o, d, blocked0)
    occ_gather = jax.jit(
        lambda o, d, b: bvh._occluded_gather(o, d, pack, 1e-3, 9.0, b)
    )(o, d, blocked0)
    assert bool(np.asarray(occ_dense).any()) and not bool(np.asarray(occ_dense).all())
    np.testing.assert_array_equal(np.asarray(occ_dense), np.asarray(occ_gather))


def test_gather_walk_round_pops2_bitidentical(monkeypatch):
    """ROUND_POPS=2 (two independent page gathers per loop iteration)
    must not change results: a page gathered past its early-stop bound
    can never win, so only the iteration schedule differs."""
    import jax

    from path_trace_golang_tpu.ops import bvh

    sc = _random_tri_scene(500, seed=29)
    import os as _os

    _os.environ["PATHTRACER_BVH_DYNAMIC"] = "1"
    try:
        pack = pack_scene(sc)
    finally:
        del _os.environ["PATHTRACER_BVH_DYNAMIC"]

    rng = np.random.default_rng(31)
    shape = (4, 128)
    n = 4 * 128
    o_np = rng.uniform(-6, 6, size=(n, 3)).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = V3(*(jnp.asarray(o_np[:, k].reshape(shape)) for k in range(3)))
    d = V3(*(jnp.asarray(d_np[:, k].reshape(shape)) for k in range(3)))
    fz, iz = jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.int32)
    state = dict(
        best_t=fz + 1e20, best_m=iz - 1, best_type=iz, best_mat=iz,
        best_mtyp=iz, b_rough=fz, b_ior=fz, b_smooth=fz, b_refl=fz,
        b_abss=fz, b_albedo=V3(fz, fz, fz), b_emit=V3(fz, fz, fz),
        b_absorb=V3(fz, fz, fz), b_tint=V3(fz, fz, fz), nx=fz, ny=fz, nz=fz,
    )

    def run():
        st = jax.jit(
            lambda o, d: bvh._traverse_gather(o, d, pack, 1e-3, dict(state), None, None, False)[0]
        )(o, d)
        occ = jax.jit(
            lambda o, d: bvh._occluded_gather(o, d, pack, 1e-3, 10.0, jnp.zeros(shape, bool))
        )(o, d)
        return st, occ

    st1, occ1 = run()
    monkeypatch.setattr(bvh, "ROUND_POPS", 2)
    st2, occ2 = run()
    for k in st1:
        a, b = st1[k], st2[k]
        parts = [(a, b)] if not isinstance(a, V3) else list(zip(a, b))
        for pa, pb in parts:
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb), err_msg=k)
    np.testing.assert_array_equal(np.asarray(occ1), np.asarray(occ2))


def test_walk_skip_matches_on_live_lanes():
    """``skip`` lanes mark zero pages (work pruning for dead/masked
    lanes); every NON-skipped lane's winner must be bit-identical to the
    unskipped traversal, on both the dense and gather paths."""
    import os

    import jax

    from path_trace_golang_tpu.ops import bvh

    os.environ["PATHTRACER_BVH_DYNAMIC"] = "1"
    try:
        # multi-page at any PATHTRACER_PAGE_TRIS (500 at the default)
        sc = _random_tri_scene(4 * bvh.PAGE_TRIS - 12, seed=23)
        pack = pack_scene(sc)
    finally:
        del os.environ["PATHTRACER_BVH_DYNAMIC"]
    assert pack.paged is not None and pack.paged.n_pages >= 3

    rows = 8
    shape = (rows, 128)
    rng = np.random.default_rng(29)
    n = rows * 128
    o_np = rng.uniform(-6, 6, size=(n, 3)).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = V3(*(jnp.asarray(o_np[:, k].reshape(shape)) for k in range(3)))
    d = V3(*(jnp.asarray(d_np[:, k].reshape(shape)) for k in range(3)))
    skip = jnp.asarray(rng.random(shape) < 0.4)
    live = ~np.asarray(skip)

    fz, iz = jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.int32)

    def state0():
        return dict(
            best_t=fz + 1e20, best_m=iz - 1, best_type=iz, best_mat=iz,
            best_mtyp=iz, b_rough=fz, b_ior=fz, b_smooth=fz, b_refl=fz,
            b_abss=fz, b_albedo=V3(fz, fz, fz), b_emit=V3(fz, fz, fz),
            b_absorb=V3(fz, fz, fz), b_tint=V3(fz, fz, fz),
            nx=fz, ny=fz, nz=fz,
        )

    for fn in (
        lambda o, d, sk: bvh.traverse_triangles_paged(
            o, d, pack, 1e-3, state0(), skip=sk
        )[0],
        lambda o, d, sk: bvh._traverse_gather(
            o, d, pack, 1e-3, state0(), None, None, False, skip=sk
        )[0],
    ):
        ref = jax.jit(lambda o, d: fn(o, d, None))(o, d)
        got = jax.jit(lambda o, d, sk: fn(o, d, sk))(o, d, skip)
        assert bool(np.asarray(ref["best_t"] < 1e19).any())
        for k in ref:
            a, b = ref[k], got[k]
            parts = [(a, b)] if not isinstance(a, V3) else list(zip(a, b))
            for pa, pb in parts:
                np.testing.assert_array_equal(
                    np.asarray(pa)[live], np.asarray(pb)[live], err_msg=k
                )

def test_gather_sel_windowed_exact():
    """_gather_sel must reconstruct the exact f32 attribute values from
    the f32-stored bf16 limb planes, both full-width and through a page
    WINDOW: a windowed gather of an in-window lane equals the direct
    selection, and out-of-window / sentinel / -1 lanes gather exact
    zeros (their one-hot column is all-false)."""
    import jax
    import ml_dtypes

    from path_trace_golang_tpu.ops import bvh

    rng = np.random.default_rng(41)
    n_pages, p_pad, a_n, tris = 300, 384, 3, bvh.PAGE_TRIS
    g = (rng.standard_normal((a_n, p_pad, tris)) * 100).astype(np.float32)
    g[:, n_pages:, :] = 0.0
    bf16 = ml_dtypes.bfloat16
    hi = g.astype(bf16).astype(np.float32)
    r1 = g - hi
    mid = r1.astype(bf16).astype(np.float32)
    lo = (r1 - mid).astype(bf16).astype(np.float32)
    assert np.array_equal(hi + mid + lo, g)  # the limb-split invariant
    gt = jnp.asarray(np.concatenate([hi, mid, lo], axis=0))

    # per-lane pages: in-range, sentinel (== n_pages), and -1 (no hit)
    p_np = rng.integers(0, n_pages, size=(1, 128)).astype(np.int32)
    p_np[0, 3] = n_pages
    p_np[0, 77] = -1
    p_l = jnp.asarray(p_np)

    def direct(p_row):
        want = np.zeros((a_n, tris, 128), np.float32)
        for i, p in enumerate(p_row):
            if 0 <= p < n_pages:
                want[:, :, i] = g[:, p, :]
        return want

    plain = jax.jit(
        lambda p: bvh._gather_sel(gt, (0, 1, 2), 3, n_pages, p)
    )(p_l)
    want = direct(p_np[0])
    for a in range(a_n):
        np.testing.assert_array_equal(np.asarray(plain[a]), want[a])

    # windowed: base=128, w=128 — lanes outside [128, 256) gather zeros
    win = jax.jit(
        lambda p: bvh._gather_sel(
            gt, (0, 1, 2), 3, n_pages, p, base=jnp.int32(128), w=128
        )
    )(p_l)
    masked = p_np[0].copy()
    masked[(masked < 128) | (masked >= 256)] = -1
    want_w = direct(masked)
    for a in range(a_n):
        np.testing.assert_array_equal(np.asarray(win[a]), want_w[a])


def test_gather_walk_windowed_bitidentical_to_dense():
    """End-to-end gather==dense bit-identity on a mesh WIDE enough to
    engage page WINDOWING (>128 pages -> p_pad 256, window 128): the
    windowed per-round gather defers out-of-window lanes (restoring
    their mask bits), which may only REORDER page visits — every winner
    field must match the dense paged sweep bit-for-bit, windowed or
    not."""
    import os

    import jax

    from path_trace_golang_tpu.ops import bvh

    # 2*91*91 = 16,562 triangles -> 130 pages -> p_pad 256 (2 banks)
    n_lat = n_lon = 91
    verts, faces = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            verts.append(
                [np.sin(th) * np.cos(ph), 1.0 + np.cos(th), np.sin(th) * np.sin(ph)]
            )
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            dd = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, dd, c])
    sc = S.Scene(
        camera=base_camera(),
        sky=solid_sky(),
        materials=[mat("m", albedo=(0.5, 0.5, 0.5))],
        objects=[
            S.Object(
                id="s", type="mesh", material_id="m",
                mesh={"vertices": verts, "faces": faces},
            )
        ],
    )
    pack = pack_scene(sc)
    assert pack.paged is not None and pack.paged.n_pages > 128, pack.paged.n_pages
    assert pack.page_gather.shape[1] >= 256

    rng = np.random.default_rng(53)
    shape = (2, 128)
    n = shape[0] * shape[1]
    o_np = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = V3(*(jnp.asarray(o_np[:, k].reshape(shape)) for k in range(3)))
    d = V3(*(jnp.asarray(d_np[:, k].reshape(shape)) for k in range(3)))
    fz, iz = jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.int32)
    state = dict(
        best_t=fz + 1e20, best_m=iz - 1, best_type=iz, best_mat=iz,
        best_mtyp=iz, b_rough=fz, b_ior=fz, b_smooth=fz, b_refl=fz,
        b_abss=fz, b_albedo=V3(fz, fz, fz), b_emit=V3(fz, fz, fz),
        b_absorb=V3(fz, fz, fz), b_tint=V3(fz, fz, fz), nx=fz, ny=fz, nz=fz,
    )

    import os

    st_d = jax.jit(
        lambda o, d: bvh.traverse_triangles_paged(o, d, pack, 1e-3, dict(state))[0]
    )(o, d)
    occ_d = jax.jit(
        lambda o, d: bvh.occluded_triangles_paged(o, d, pack, 1e-3, 8.0, fz > 1)
    )(o, d)
    assert bool(np.asarray(st_d["best_t"] < 1e19).any())
    assert bool(np.asarray(occ_d).any())

    saved = bvh.GATHER_WINDOW
    try:
        for window in (0, 128):  # full-width AND a 128-page window
            bvh.GATHER_WINDOW = window
            st_g = jax.jit(
                lambda o, d: bvh._traverse_gather(
                    o, d, pack, 1e-3, dict(state), None, None, False
                )[0]
            )(o, d)
            occ_g = jax.jit(
                lambda o, d: bvh._occluded_gather(o, d, pack, 1e-3, 8.0, fz > 1)
            )(o, d)
            for k in st_d:
                a, b = st_d[k], st_g[k]
                parts = [(a, b)] if not isinstance(a, V3) else list(zip(a, b))
                for pa, pb in parts:
                    np.testing.assert_array_equal(
                        np.asarray(pa), np.asarray(pb), err_msg=f"{k} window={window}"
                    )
            np.testing.assert_array_equal(
                np.asarray(occ_d), np.asarray(occ_g), err_msg=f"occ window={window}"
            )
    finally:
        bvh.GATHER_WINDOW = saved
