"""Scene model, JSON IO and SoA packing tests (SURVEY.md §4 strategy)."""

import json
import os

import numpy as np
import pytest

from path_trace_golang_tpu import scene as S
from path_trace_golang_tpu.soa import (
    MAT_DIELECTRIC,
    MAT_EMISSIVE,
    MAT_METAL,
    OBJ_BOX,
    OBJ_PLANE,
    OBJ_SPHERE,
    pack_scene,
)

from helpers import REF_SCENES, full_feature_scene, mat, obj

REF_FILES = [
    "example_simple.json",
    "test_scene.json",
    "metal_glass_room.json",
    "test_comprehensive.json",
    "gpu_showcase.json",
]


@pytest.mark.parametrize("name", REF_FILES)
def test_reference_scene_loads(name):
    path = os.path.join(REF_SCENES, name)
    if not os.path.exists(path):
        pytest.skip("reference scenes not mounted")
    sc = S.load(path)
    assert len(sc.objects) > 0
    assert len(sc.materials) > 0
    # every object's material id resolves (or falls back to 0 like the packer)
    pack = pack_scene(sc, 64, 36)
    assert pack.obj.shape == (len(sc.objects), 12)
    assert pack.mat.shape == (len(sc.materials), 20)
    assert np.isfinite(np.asarray(pack.mat)).all()
    assert np.isfinite(np.asarray(pack.obj)).all()


@pytest.mark.parametrize("name", REF_FILES)
def test_reference_scene_roundtrip(name):
    """save(load(x)) reparses to the same dataclass tree."""
    path = os.path.join(REF_SCENES, name)
    if not os.path.exists(path):
        pytest.skip("reference scenes not mounted")
    sc = S.load(path)
    text = S.dumps(sc)
    sc2 = S.loads(text)
    assert sc2 == sc


def test_camera_lens_field_roundtrip():
    """lens="disk" survives save/load; the default "ball" is omitted from
    the JSON so reference files stay byte-compatible."""
    sc = S.Scene(camera=S.Camera(lens="disk"))
    text = S.dumps(sc)
    assert '"lens": "disk"' in text
    assert S.loads(text).camera.lens == "disk"

    sc_default = S.Scene()
    assert '"lens"' not in S.dumps(sc_default)
    assert S.loads(S.dumps(sc_default)).camera.lens == "ball"


def test_known_scene_stats():
    """Spot-check parsed structure against SURVEY.md §6 ground truth."""
    path = os.path.join(REF_SCENES, "gpu_showcase.json")
    if not os.path.exists(path):
        pytest.skip("reference scenes not mounted")
    sc = S.load(path)
    assert sc.settings.width == 800 and sc.settings.height == 450
    assert sc.settings.samples_per_px == 1 and sc.settings.max_depth == 12
    assert sc.camera.aperture == pytest.approx(0.1)
    assert sc.fog is not None and sc.fog.gpu_volumetric
    pack = pack_scene(sc, 800, 450)
    assert pack.n_lights == 7  # seven sphere lights (SURVEY.md §6)


def test_pack_metal_defaults():
    """gpu.go:1854-1883: metal smoothness=1-rough, reflectivity=1 when unset."""
    sc = full_feature_scene()
    sc.materials = [mat("m", "metal", (1, 1, 1), rough=0.3)]
    sc.objects = [obj("s", "sphere", (0, 0, 0), (1, 0, 0), material_id="m")]
    p = pack_scene(sc)
    assert p.mat[0, 0] == MAT_METAL
    assert np.asarray(p.mat[0, 3]) == pytest.approx(0.7)  # smoothness
    assert np.asarray(p.mat[0, 7]) == pytest.approx(1.0)  # reflectivity


def test_pack_dielectric_defaults():
    """gpu.go:1894-1912: absorption_scale=0.01, tint=white when unset."""
    sc = full_feature_scene()
    sc.materials = [mat("g", "dielectric", ior=1.5)]
    sc.objects = [obj("s", "sphere", (0, 0, 0), (1, 0, 0), material_id="g")]
    p = pack_scene(sc)
    assert p.mat[0, 0] == MAT_DIELECTRIC
    assert np.asarray(p.mat[0, 15]) == pytest.approx(0.01)
    assert np.asarray(p.mat[0, 16:19]) == pytest.approx([1, 1, 1])


def test_pack_emit_power_and_lights():
    """emit*power packing (gpu.go:1886-1888) and light-list construction."""
    sc = full_feature_scene()
    p = pack_scene(sc)
    lamp_idx = [m.id for m in sc.materials].index("lamp")
    assert np.asarray(p.mat[lamp_idx, 8:11]) == pytest.approx([8.0, 7.2, 6.4])
    assert p.mat[lamp_idx, 0] == MAT_EMISSIVE
    # only the sphere_light object is emissive
    light_obj = [o.id for o in sc.objects].index("light")
    assert p.n_lights == 1
    assert int(p.light_idx[0]) == light_obj


def test_pack_object_types_and_unknown_material():
    sc = full_feature_scene()
    sc.objects.append(obj("orphan", "sphere", (9, 9, 9), (1, 0, 0), material_id="nope"))
    p = pack_scene(sc)
    types = np.asarray(p.obj[:, 0])
    id_by_name = {o.id: i for i, o in enumerate(sc.objects)}
    assert types[id_by_name["floor"]] == OBJ_PLANE
    assert types[id_by_name["cube"]] == OBJ_BOX
    assert types[id_by_name["light"]] == OBJ_SPHERE  # sphere_light -> sphere
    assert np.asarray(p.obj[id_by_name["orphan"], 1]) == 0  # unknown id -> 0


def test_settings_zero_fallback():
    sc = S.Scene()
    assert sc.settings.is_zero()
    sc.settings = S.RenderSettings(width=10, height=10, samples_per_px=1, max_depth=1)
    assert not sc.settings.is_zero()


def test_fog_block_derivation():
    """sigma_s/sigma_a derived from density/scatter (gpu.go:2048-2063)."""
    sc = full_feature_scene()
    sc.fog.sigma_s = 0.0
    sc.fog.sigma_a = 0.0
    sc.fog.density = 0.4
    sc.fog.scatter = 0.25
    p = pack_scene(sc)
    fb = np.asarray(p.fog)
    assert fb[8] == pytest.approx(0.1)  # sigma_s = density*scatter
    assert fb[9] == pytest.approx(0.3)  # sigma_a = density - sigma_s
    assert fb[3] == 1.0  # gpu_volumetric


def test_scene_copy_is_deep():
    sc = full_feature_scene()
    sc2 = sc.copy()
    sc2.camera.position.x = 99.0
    sc2.materials[0].albedo.r = 0.123
    assert sc.camera.position.x != 99.0
    assert sc.materials[0].albedo.r != 0.123


def test_obj_mesh_import(tmp_path):
    """OBJ importer (framework extension): v/f subset, slash forms,
    negative indices, quad fan-triangulation; scene JSONs expand
    {"obj": path} relative to the scene file at load time."""
    obj_text = """
# a unit quad split by the loader, mixed index forms
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1/1/1 2/2/2 3/3/3 4/4/4
f -4 -3 -2
"""
    (tmp_path / "quad.obj").write_text(obj_text)
    from path_trace_golang_tpu.scene import load_obj

    verts, faces = load_obj(tmp_path / "quad.obj")
    assert len(verts) == 4
    # quad fans to 2 triangles + the explicit negative-index one
    assert faces == [[0, 1, 2], [0, 2, 3], [0, 1, 2]]

    scene_json = {
        "camera": {"position": {"x": 0, "y": 0, "z": 3}, "target": {}},
        "materials": [{"id": "m", "type": "lambert"}],
        "objects": [
            {
                "id": "q",
                "type": "mesh",
                "material_id": "m",
                "mesh": {"obj": "quad.obj", "smooth": True},
            }
        ],
    }
    import json as _json

    (tmp_path / "sc.json").write_text(_json.dumps(scene_json))
    sc = S.load(tmp_path / "sc.json")
    m = sc.objects[0].mesh
    assert "obj" not in m and len(m["vertices"]) == 4 and len(m["faces"]) == 3
    assert m["smooth"] is True
    # packs into real triangles
    from path_trace_golang_tpu.soa import pack_scene

    pack = pack_scene(sc, 8, 8)
    assert pack.n_triangles == 3
    # save round-trips the EXPANDED mesh
    S.save(tmp_path / "out.json", sc)
    sc2 = S.load(tmp_path / "out.json")
    assert sc2.objects[0].mesh["vertices"] == m["vertices"]
