"""Scene -> SoA device arrays (the TPU equivalent of the GPU SSBO/UBO packer).

Layouts are kept identical to the reference's GPU buffers so scenes
round-trip bit-compatibly:

* material stride 20 floats (shader comment gpu.go:402-406, packer
  gpu.go:1829-1913):
  ``[typ, rough, ior, smoothness, albedo.rgb, reflectivity,
  emit.rgb, pad, absorption.rgb, absorption_scale, tint.rgb, pad]``
* object stride 12 floats (gpu.go:411-416, packer gpu.go:1915-1968):
  ``[type, matIndex, pad, pad, pos.xyz, pad, size.xyz, pad]``
* light index list = indices of emissive objects with nonzero emit
  (gpu.go:1961-1967)
* camera block (gpu.go:1977-1985), sky block (gpu.go:1987-2009),
  fog block (gpu.go:2011-2104) — same 16-float std140-like layouts.

Pack-time defaults reproduce gpu.go exactly: metal ``smoothness = 1-rough``
and ``reflectivity = 1`` when unset, dielectric ``absorption_scale = 0.01``
and ``tint = white`` when unset, ``emit *= power``.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
from typing import Optional

import jax
import numpy as np

from .scene.model import Scene

__all__ = [
    "ScenePack",
    "pack_scene",
    "MAT_LAMBERT",
    "MAT_METAL",
    "MAT_DIELECTRIC",
    "MAT_EMISSIVE",
    "MAT_MIRROR",
    "OBJ_SPHERE",
    "OBJ_PLANE",
    "OBJ_BOX",
    "MAT_STRIDE",
    "OBJ_STRIDE",
]

# Material / object type codes — must match the shader constants
# (gpu.go:429-437) and the Go mirrors (gpu.go:236-248).
MAT_LAMBERT = 0
MAT_METAL = 1
MAT_DIELECTRIC = 2
MAT_EMISSIVE = 3
MAT_MIRROR = 4

OBJ_SPHERE = 0
OBJ_PLANE = 1
OBJ_BOX = 2

MAT_STRIDE = 20
OBJ_STRIDE = 12

_MAT_CODE = {
    "lambert": MAT_LAMBERT,
    "metal": MAT_METAL,
    "dielectric": MAT_DIELECTRIC,
    "emissive": MAT_EMISSIVE,
    "mirror": MAT_MIRROR,
}
_OBJ_CODE = {
    "sphere": OBJ_SPHERE,
    "sphere_light": OBJ_SPHERE,  # sphere with emissive material (objects.go:244-250)
    "plane": OBJ_PLANE,
    "box": OBJ_BOX,
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScenePack:
    """Device-resident SoA scene.

    Array fields are pytree leaves (jit-traceable); ``n_objects`` /
    ``n_materials`` / ``n_lights`` are static metadata — a new scene
    topology triggers a recompile, matching XLA's static-shape model.
    """

    mat: jax.Array  # f32[M, 20]
    obj: jax.Array  # f32[N, 12]
    light_idx: jax.Array  # i32[max(L,1)]
    cam: jax.Array  # f32[16]
    sky: jax.Array  # f32[16]
    fog: jax.Array  # f32[16]
    n_objects: int = dataclasses.field(metadata=dict(static=True))
    n_materials: int = dataclasses.field(metadata=dict(static=True))
    n_lights: int = dataclasses.field(metadata=dict(static=True))
    # Static topology mirrors of obj[:,0] / obj[:,1]: scene topology is a
    # compile-time constant on TPU (XLA static-shape model), which lets the
    # intersection sweep unroll per-object with only each object's needed
    # primitive test emitted and zero runtime gathers.
    obj_types: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    obj_mats: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    light_objs: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    mat_types: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    # Per-column uniformity of the material table: entry c is the shared
    # float value when every material row agrees on column c, else None.
    # The winner select-chains (ops/geometry.intersect_world,
    # ops/bvh._merge_winner_state) skip selects for uniform columns and
    # broadcast the constant instead — scenes that never vary a field
    # (tint, absorption, smoothness, ...) drop those ops at trace time.
    mat_uniform: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    # --- triangle-mesh extension (BASELINE.json north star) ---
    # tri rows are in BVH order, padded by LEAF_SIZE zero rows:
    # [v0.xyz, e1.xyz, e2.xyz, mat_idx, obj_idx, smooth_flag,
    #  n0.xyz, n1.xyz, n2.xyz, pad.xyz] (indices as exact small floats so
    # one row fetch serves the whole leaf test; n0-n2 are the vertex
    # normals smooth-shaded meshes interpolate by barycentrics)
    tri: Optional[jax.Array] = None  # f32[max(T,1)+LEAF_SIZE, 24]
    bvh_bounds: Optional[jax.Array] = None  # f32[max(B,1), 6]
    n_triangles: int = dataclasses.field(default=0, metadata=dict(static=True))
    tri_mats: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    tri_smooth: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    bvh: object = dataclasses.field(default=None, metadata=dict(static=True))
    # dense paged-sweep table (bvh.py traverse_triangles_paged; built when
    # the triangle count routes to the dynamic walk).  One
    # (PAGE_TRIS, N_PAGE_ATTRS) tile per page: triangles on sublanes,
    # precomputed plane/barycentric-dual constants on lanes; page bboxes
    # are static scalar immediates on ``paged`` (PagedBvh.page_bounds).
    page_tiles: Optional[jax.Array] = None  # f32[max(P,1), 128, 32]
    # limb-planed gather table (bvh.build_gather_table): plane l*A + a =
    # bf16 limb l of attr a, pages on the middle dim, slots on lanes —
    # the in-kernel per-lane traversal turns dot(plane window, onehot)
    # into an MXU gather; hi+mid+lo reconstructs the f32 table
    # bit-exactly.  Limbs are STORED AS f32 (each bf16-exact): Mosaic
    # rejects dynamic slices of bf16 refs, and the dynamic page window
    # (bvh.GATHER_WINDOW) is what kills the ~1/P_pad contraction wall.
    page_gather: Optional[jax.Array] = None  # f32[3*A, P_pad, PAGE_TRIS]
    paged: object = dataclasses.field(default=None, metadata=dict(static=True))
    # defocus model (scene camera extension, PHYSICS.md Q4): False =
    # reference's faithful unit-ball bokeh, True = thin-lens disk
    lens_disk: bool = dataclasses.field(default=False, metadata=dict(static=True))

    # ---- unpacked views used by the kernels (cheap in-jit slices) ----
    @property
    def tri_any_emissive(self) -> bool:
        """Whether any mesh triangle carries an emissive material (static).

        When False, a ``lite`` mesh query (the rough-metal specular-NEE
        ray, gpu.go:1474-1496) can never find an emissive winner among
        triangles — the mesh only matters as an OCCLUDER of the object
        sweep's winner, so intersect_world downgrades the closest-hit
        walk to the far cheaper any-hit walk (ops/geometry.py)."""
        return any(
            self.mat_types[mi] == MAT_EMISSIVE for mi in set(self.tri_mats)
        )

    @property
    def obj_type(self):
        return self.obj[:, 0].astype(np.int32)

    @property
    def obj_mat(self):
        return self.obj[:, 1].astype(np.int32)

    @property
    def obj_pos(self):
        return self.obj[:, 4:7]

    @property
    def obj_size(self):
        return self.obj[:, 8:11]

    @property
    def mat_type(self):
        return self.mat[:, 0].astype(np.int32)

    @property
    def mat_rough(self):
        return self.mat[:, 1]

    @property
    def mat_ior(self):
        return self.mat[:, 2]

    @property
    def mat_smoothness(self):
        return self.mat[:, 3]

    @property
    def mat_albedo(self):
        return self.mat[:, 4:7]

    @property
    def mat_reflectivity(self):
        return self.mat[:, 7]

    @property
    def mat_emit(self):
        return self.mat[:, 8:11]

    @property
    def mat_absorption(self):
        return self.mat[:, 12:15]

    @property
    def mat_absorption_scale(self):
        return self.mat[:, 15]

    @property
    def mat_tint(self):
        return self.mat[:, 16:19]


def _clamp(x: float, lo: float, hi: float) -> float:
    return lo if x < lo else hi if x > hi else x


# (paged BVH, page tiles, gather table) memo keyed on a sha1 of the
# triangle content — the interactive loop re-packs the same mesh every
# camera edit, and the build is the most expensive host step (~0.1 s at
# 10k triangles even vectorized).  Entries are immutable once built.
_BVH_BUILD_CACHE: dict = {}


def pack_scene(sc: Scene, width: int = 0, height: int = 0) -> ScenePack:
    """Pack a :class:`Scene` into SoA arrays (gpu.go:1813-2104).

    ``width``/``height`` feed the camera-aspect fallback
    (``aspect = W/H`` when ``camera.aspect_ratio == 0``, gpu.go:1972-1975);
    pass the render resolution, or leave 0 to defer the fallback to the
    ray-gen kernel.
    """
    m_count = len(sc.materials)
    mat = np.zeros((max(m_count, 1), MAT_STRIDE), dtype=np.float32)
    for i, m in enumerate(sc.materials):
        typ = _MAT_CODE.get(m.type, MAT_LAMBERT)
        mat[i, 0] = typ
        mat[i, 1] = m.rough
        mat[i, 2] = m.ior

        # smoothness default for metals: 1 - rough (gpu.go:1854-1866)
        smoothness = m.smoothness
        if smoothness == 0 and typ == MAT_METAL:
            smoothness = 1.0 - m.rough
        mat[i, 3] = _clamp(smoothness, 0.0, 1.0)

        mat[i, 4:7] = m.albedo.as_tuple()

        # reflectivity default for metals: 1.0 (gpu.go:1872-1883)
        reflectivity = m.reflectivity
        if reflectivity == 0 and typ == MAT_METAL:
            reflectivity = 1.0
        mat[i, 7] = _clamp(reflectivity, 0.0, 1.0)

        # emit * power (gpu.go:1886-1888)
        mat[i, 8] = m.emit.r * m.power
        mat[i, 9] = m.emit.g * m.power
        mat[i, 10] = m.emit.b * m.power

        mat[i, 12:15] = m.absorption.as_tuple()

        # absorption_scale default for dielectrics: 0.01 (gpu.go:1894-1899)
        absorption_scale = m.absorption_scale
        if absorption_scale == 0 and typ == MAT_DIELECTRIC:
            absorption_scale = 0.01
        mat[i, 15] = absorption_scale

        # tint default for dielectrics: white (gpu.go:1901-1912)
        tr, tg, tb = m.tint.as_tuple()
        if tr == 0 and tg == 0 and tb == 0 and typ == MAT_DIELECTRIC:
            tr = tg = tb = 1.0
        mat[i, 16], mat[i, 17], mat[i, 18] = tr, tg, tb

    # triangles/meshes are packed separately behind the BVH; the 12-float
    # object table holds only the reference's primitive types
    solid_objects = [o for o in sc.objects if o.type not in ("triangle", "mesh")]
    o_count = len(solid_objects)
    obj = np.zeros((max(o_count, 1), OBJ_STRIDE), dtype=np.float32)
    mat_index = sc.material_index()
    light_list = []
    for i, o in enumerate(solid_objects):
        obj[i, 0] = _OBJ_CODE.get(o.type, OBJ_SPHERE)
        midx = mat_index.get(o.material_id, 0)  # unknown id -> 0 (gpu.go:1944-1951)
        obj[i, 1] = midx
        obj[i, 4:7] = o.position.as_tuple()
        obj[i, 8:11] = o.size.as_tuple()
        # emissive objects with nonzero emit become lights (gpu.go:1961-1967)
        if midx < m_count:
            m = sc.materials[midx]
            if m.type == "emissive" and (m.emit.r > 0 or m.emit.g > 0 or m.emit.b > 0):
                light_list.append(i)

    n_lights = len(light_list)
    light_idx = np.zeros((max(n_lights, 1),), dtype=np.int32)
    light_idx[:n_lights] = light_list

    # --- camera block (gpu.go:1970-1985) ---
    cam_block = np.zeros((16,), dtype=np.float32)
    c = sc.camera
    aspect = c.aspect_ratio
    if aspect == 0 and width > 0 and height > 0:
        aspect = float(width) / float(height)
    cam_block[0:3] = c.position.as_tuple()
    cam_block[4:7] = c.target.as_tuple()
    cam_block[8:11] = c.up.as_tuple()
    cam_block[12] = c.fov
    cam_block[13] = c.aperture
    cam_block[14] = c.focus_dist
    cam_block[15] = aspect

    # --- sky block (gpu.go:1987-2009) ---
    sky_block = np.zeros((16,), dtype=np.float32)
    if sc.sky is not None:
        if sc.sky.type == "gradient":
            sky_block[0] = 2.0
            sky_block[8:11] = sc.sky.horizon.as_tuple()
            sky_block[12:15] = sc.sky.zenith.as_tuple()
        else:  # solid (and any other non-None type)
            sky_block[0] = 1.0
            sky_block[4:7] = sc.sky.color.as_tuple()
    else:
        sky_block[0] = 0.0
        sky_block[4:7] = sc.background.as_tuple()

    # --- fog block (gpu.go:2011-2104) ---
    fog_block = np.zeros((16,), dtype=np.float32)
    fog_block[12] = 4.0  # noise_scale default (gpu.go:2020)
    fog_block[13] = 3.0  # noise_octaves default (gpu.go:2021)
    f = sc.fog
    if f is not None:
        density = f.density if f.density > 0 else 0.0
        scatter = f.scatter if f.scatter > 0 else (1.0 if density > 0 else 0.0)
        fog_block[0] = density
        fog_block[1] = scatter
        fog_block[2] = 1.0 if f.affect_sky else 0.0
        fog_block[3] = 1.0 if f.gpu_volumetric else 0.0
        fog_block[4:7] = f.color.as_tuple()
        fog_block[7] = 1.0
        if f.sigma_s > 0 or f.sigma_a > 0:
            fog_block[8] = f.sigma_s
            fog_block[9] = f.sigma_a
        elif density > 0:
            s_mul = _clamp(scatter, 0.0, 1.0)
            sigma_s = density * s_mul
            fog_block[8] = sigma_s
            fog_block[9] = max(density - sigma_s, 0.0)
        fog_block[10] = _clamp(f.g, -0.9, 0.9)
        if f.hetero_strength > 0:
            fog_block[11] = min(f.hetero_strength, 1.0)
        if f.noise_scale > 0:
            fog_block[12] = f.noise_scale
        if f.noise_octaves > 0:
            fog_block[13] = min(f.noise_octaves, 5)

    # --- triangles / meshes -> BVH (extension) ---
    # Collected as (F,3) blocks per object and concatenated once: per-face
    # Python loops cost ~0.8 s at 10k triangles (measured, walk_attrib
    # round) and were half the mesh-scene render time.
    tri_v0b, tri_e1b, tri_e2b, tri_matb = [], [], [], []
    tri_smoothb, tri_vnb = [], []  # per-tri smooth flag / (3,3) vertex normals
    for o in sc.objects:
        midx = mat_index.get(o.material_id, 0)
        if o.type == "triangle" and o.vertices and len(o.vertices) >= 3:
            a, b, c = (np.array(v.as_tuple(), np.float64) for v in o.vertices[:3])
            tri_v0b.append(a[None])
            tri_e1b.append((b - a)[None])
            tri_e2b.append((c - a)[None])
            tri_matb.append(np.full((1,), midx, np.int64))
            tri_smoothb.append(np.zeros((1,), bool))
            tri_vnb.append(np.zeros((1, 3, 3), np.float64))
        elif o.type == "mesh" and o.mesh:
            verts = np.asarray(o.mesh.get("vertices", []), np.float64)
            faces = np.asarray(o.mesh.get("faces", []), np.int64)
            if verts.size == 0 or faces.size == 0:
                continue
            scale = np.array(
                [s if s != 0 else 1.0 for s in o.size.as_tuple()], np.float64
            )
            verts = verts * scale + np.array(o.position.as_tuple(), np.float64)
            smooth = bool(o.mesh.get("smooth", False))
            fa, fb, fc = faces[:, 0], faces[:, 1], faces[:, 2]
            a, b, c = verts[fa], verts[fb], verts[fc]
            nf = faces.shape[0]
            tri_v0b.append(a)
            tri_e1b.append(b - a)
            tri_e2b.append(c - a)
            tri_matb.append(np.full((nf,), midx, np.int64))
            tri_smoothb.append(np.full((nf,), smooth, bool))
            if smooth:
                # area-weighted vertex normals: sum of adjacent faces'
                # unnormalized cross products, normalized per vertex
                fn = np.cross(b - a, c - a)
                vert_n = np.zeros_like(verts)
                np.add.at(vert_n, fa, fn)
                np.add.at(vert_n, fb, fn)
                np.add.at(vert_n, fc, fn)
                norms = np.linalg.norm(vert_n, axis=1, keepdims=True)
                vert_n = vert_n / np.maximum(norms, 1e-20)
                tri_vnb.append(np.stack([vert_n[fa], vert_n[fb], vert_n[fc]], axis=1))
            else:
                tri_vnb.append(np.zeros((nf, 3, 3), np.float64))

    t_count = int(sum(b.shape[0] for b in tri_v0b))
    tri_mat_list = (
        np.concatenate(tri_matb) if t_count else np.zeros((0,), np.int64)
    )
    tri_smooth_list = (
        np.concatenate(tri_smoothb) if t_count else np.zeros((0,), bool)
    )
    tri_vn = (
        np.concatenate(tri_vnb) if t_count else np.zeros((0, 3, 3), np.float64)
    )
    # obj/mat indices ride the 24-float tri rows as float32 (cols 9-10),
    # exact only up to 2^24 — guard the invariant rather than silently
    # rounding indices on absurdly large meshes.
    if o_count + t_count >= 2**24:
        raise ValueError(
            f"scene has {o_count + t_count} objects+triangles; float32 "
            "index columns in the triangle table are exact only below 2^24"
        )
    topo = None
    paged = None
    bvh_bounds = np.zeros((1, 6), np.float32)
    tri_rows = np.zeros((1, 24), np.float32)
    page_tiles = np.zeros((1, 128, 32), np.float32)
    page_gather = np.zeros((3, 1, 128), np.float32)  # 3 limb planes, dummy
    if t_count:
        from .ops.bvh import (
            LEAF_SIZE,
            build_bvh,
            build_gather_table,
            build_paged_bvh,
            use_dynamic_walk,
        )

        v0 = np.concatenate(tri_v0b)
        e1 = np.concatenate(tri_e1b)
        e2 = np.concatenate(tri_e2b)
        if use_dynamic_walk(t_count):
            # Paged traversal (bvh.py round-3 redesign): page bboxes bake
            # into the traced code as scalar immediates; the XLA path
            # sweeps wanted pages densely (page_tiles), the Pallas kernel
            # gathers each lane's own page via one-hot matmul
            # (page_gather).  Build products are memoized on triangle
            # CONTENT (interactive camera/light edits re-render the same
            # mesh every frame; the build is pure in these inputs).
            tri_obj = np.arange(o_count, o_count + t_count, dtype=np.int64)
            key = hashlib.sha1()
            for arr in (v0, e1, e2, tri_mat_list, tri_obj, tri_smooth_list, tri_vn):
                key.update(np.ascontiguousarray(arr).tobytes())
            # build-shaping env knobs are part of the identity (perf A/B
            # tools flip PATHTRACER_BVH_SUBBOX in one process)
            key.update(os.environ.get("PATHTRACER_BVH_SUBBOX", "").encode())
            key = key.hexdigest()
            hitc = _BVH_BUILD_CACHE.get(key)
            if hitc is None:
                paged, page_tiles, _page_bbox = build_paged_bvh(
                    v0, e1, e2, tri_mat_list, tri_obj, tri_smooth_list, tri_vn
                )
                # limb-planed exact 3-limb split (bvh.build_gather_table,
                # stored f32): the kernel consumes it directly.  Cache
                # the tables as DEVICE arrays: re-rendering the same
                # mesh then reuses the resident buffers instead of
                # re-uploading megabytes over the (remote) device link
                # per render — measured 0.32 s of fixed per-render cost
                # at 10k tris on the tunnel (PERF.md round 4).
                page_gather = jax.numpy.asarray(
                    build_gather_table(page_tiles, paged)
                )
                page_tiles = jax.numpy.asarray(page_tiles)
                if len(_BVH_BUILD_CACHE) >= 4:  # tiny LRU: scenes are few
                    _BVH_BUILD_CACHE.pop(next(iter(_BVH_BUILD_CACHE)))
                _BVH_BUILD_CACHE[key] = (paged, page_tiles, page_gather)
            else:
                _BVH_BUILD_CACHE[key] = _BVH_BUILD_CACHE.pop(key)  # LRU touch
                paged, page_tiles, page_gather = hitc
        else:
            # Static unrolled walk: one 24-float row per BVH-ordered
            # triangle (geometry, material/object indices as exact small
            # floats, vertex normals); LEAF_SIZE zero rows of padding.
            topo, bvh_bounds = build_bvh(v0, e1, e2)
            tri_rows = np.zeros((t_count + LEAF_SIZE, 24), np.float32)
            for bvh_i, orig in enumerate(topo.order):
                tri_rows[bvh_i, 0:3] = v0[orig]
                tri_rows[bvh_i, 3:6] = e1[orig]
                tri_rows[bvh_i, 6:9] = e2[orig]
                tri_rows[bvh_i, 9] = float(tri_mat_list[orig])
                tri_rows[bvh_i, 10] = float(o_count + orig)
                if tri_smooth_list[orig]:
                    n0, n1, n2 = tri_vn[orig]
                    tri_rows[bvh_i, 11] = 1.0
                    tri_rows[bvh_i, 12:15] = n0
                    tri_rows[bvh_i, 15:18] = n1
                    tri_rows[bvh_i, 18:21] = n2

    return ScenePack(
        mat=jax.numpy.asarray(mat),
        obj=jax.numpy.asarray(obj),
        light_idx=jax.numpy.asarray(light_idx),
        cam=jax.numpy.asarray(cam_block),
        sky=jax.numpy.asarray(sky_block),
        fog=jax.numpy.asarray(fog_block),
        n_objects=o_count,
        n_materials=m_count,
        n_lights=n_lights,
        obj_types=tuple(int(t) for t in obj[:o_count, 0]) if o_count else (),
        obj_mats=tuple(int(m) for m in obj[:o_count, 1]) if o_count else (),
        light_objs=tuple(int(i) for i in light_list),
        mat_types=tuple(int(t) for t in mat[:m_count, 0]) if m_count else (),
        # per-column uniform-material constants (winner-chain select
        # pruning); PATHTRACER_NO_MAT_UNIFORM_PRUNE=1 disables for A/B
        mat_uniform=tuple(
            float(mat[0, c]) if bool(np.all(mat[:, c] == mat[0, c])) else None
            for c in range(MAT_STRIDE)
        )
        if os.environ.get("PATHTRACER_NO_MAT_UNIFORM_PRUNE", "") not in ("1", "true", "on")
        else (None,) * MAT_STRIDE,
        tri=jax.numpy.asarray(tri_rows),
        bvh_bounds=jax.numpy.asarray(bvh_bounds),
        n_triangles=t_count,
        tri_mats=tuple(tri_mat_list),
        tri_smooth=tuple(tri_smooth_list),
        bvh=topo,
        page_tiles=jax.numpy.asarray(page_tiles),
        page_gather=jax.numpy.asarray(page_gather),
        paged=paged,
        lens_disk=(getattr(sc.camera, "lens", "ball") == "disk"),
    )
