"""Scene assembly tests: every loader invariant from SURVEY.md §3.3."""

import numpy as np
import pytest

from path_tracer_ai_tpu.core.types import (
    MATERIAL_DIELECTRIC,
    MATERIAL_DIFFUSE,
    MATERIAL_SPECULAR,
)
from path_tracer_ai_tpu.scene.scene import (
    DEFAULT_LIGHTS,
    ROOM_TRIANGLES,
    build_scene,
    default_lights,
)

OBJ_SIMPLE = """
mtllib mats.mtl
v 0 0 0
v 2 0 0
v 2 2 0
v 0 0 2
usemtl gold_plate
f 1 2 3
"""

MTL_SIMPLE = """
newmtl gold_plate
Kd 0.5 0.5 0.5
newmtl plain_blue
Kd 0.1 0.2 0.9
newmtl glass_visor
Kd 1 1 1
illum 7
Ni 1.45
"""


@pytest.fixture
def scene_path(tmp_path):
    (tmp_path / "mats.mtl").write_text(MTL_SIMPLE)
    p = tmp_path / "model.obj"
    p.write_text(OBJ_SIMPLE)
    return str(p)


def test_room_prepended_with_wall_material(scene_path):
    scene = build_scene(scene_path)
    tris = scene.triangles
    assert tris.count == 8 + 1  # 8 room walls + 1 model triangle
    np.testing.assert_array_equal(np.asarray(tris.mat_id[:8]), [1] * 8)
    # first room triangle is the floor (scene.cpp:124-133)
    np.testing.assert_allclose(np.asarray(tris.v0[0]), [-8, 0, -8])
    np.testing.assert_allclose(np.asarray(tris.n0[0]), [0, 1, 0])


def test_model_transform_chain(scene_path):
    """(v - center) * (3/max_extent), z := -z, y += 1.8 (scene.cpp:236-238)."""
    scene = build_scene(scene_path)
    # bounds over all 4 vertices: min (0,0,0) max (2,2,2); scale 1.5, center (1,1,1)
    v = np.asarray(scene.triangles.v0[8])  # first model vertex (0,0,0)
    np.testing.assert_allclose(v, [-1.5, 1.8 - 1.5, 1.5], atol=1e-6)
    v2 = np.asarray(scene.triangles.v2[8])  # (2,2,0) -> (1.5, 1.5+1.8, 1.5... )
    np.testing.assert_allclose(v2, [1.5, 1.5 + 1.8, 1.5], atol=1e-6)


def test_bounds_use_all_file_vertices(scene_path):
    """Vertex 4 (0,0,2) is never referenced by a face but still shapes the
    bounds (scene.cpp:34-42 iterates attrib.vertices)."""
    scene = build_scene(scene_path)
    # max extent is 2 from (0..2) on every axis -> scale 1.5; already implied
    # by test_model_transform_chain, but assert z-extent came from vertex 4:
    v1 = np.asarray(scene.triangles.v1[8])  # raw (2,0,0)
    np.testing.assert_allclose(v1, [1.5, 0.3, 1.5], atol=1e-6)


def test_face_normal_fallback_from_transformed_verts(scene_path):
    scene = build_scene(scene_path)
    n = np.asarray(scene.triangles.n0[8])
    v0 = np.asarray(scene.triangles.v0[8])
    v1 = np.asarray(scene.triangles.v1[8])
    v2 = np.asarray(scene.triangles.v2[8])
    expected = np.cross(v1 - v0, v2 - v0)
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(n, expected, atol=1e-6)


def test_material_table_layout(scene_path):
    scene = build_scene(scene_path)
    m = scene.materials
    assert m.count == 2 + 3  # default + wall + 3 MTL materials
    # [0] default metallic red (scene.cpp:57-63)
    assert int(m.mtype[0]) == MATERIAL_SPECULAR
    np.testing.assert_allclose(np.asarray(m.albedo[0]), [0.9, 0.2, 0.2])
    np.testing.assert_allclose(float(m.roughness[0]), 0.1)
    np.testing.assert_allclose(float(m.metallic[0]), 1.0)
    # [1] wall diffuse (scene.cpp:65-71)
    assert int(m.mtype[1]) == MATERIAL_DIFFUSE
    np.testing.assert_allclose(np.asarray(m.albedo[1]), [0.9, 0.9, 0.9])
    np.testing.assert_allclose(float(m.roughness[1]), 0.95)


def test_name_overrides(scene_path):
    scene = build_scene(scene_path)
    m = scene.materials
    # gold_plate: contains "gold" -> (1.0, 0.8, 0.0), roughness 0.05
    np.testing.assert_allclose(np.asarray(m.albedo[2]), [1.0, 0.8, 0.0])
    np.testing.assert_allclose(float(m.roughness[2]), 0.05)
    assert int(m.mtype[2]) == MATERIAL_SPECULAR
    # plain_blue: else-branch Kd^0.8 * 1.2 clamped (scene.cpp:97-106)
    expected = np.clip(np.power([0.1, 0.2, 0.9], 0.8) * 1.2, 0, 1)
    np.testing.assert_allclose(np.asarray(m.albedo[3]), expected, rtol=1e-5)
    # glass_visor without the flag: forced metallic like everything else
    assert int(m.mtype[4]) == MATERIAL_SPECULAR


def test_mtl_offset_and_mat_ids(scene_path):
    scene = build_scene(scene_path)
    # model face used gold_plate = MTL index 0 -> scene id 0 + 2
    assert int(scene.triangles.mat_id[8]) == 2


def test_dielectric_extension_gated(scene_path):
    scene = build_scene(scene_path, enable_dielectrics=True)
    m = scene.materials
    assert int(m.mtype[4]) == MATERIAL_DIELECTRIC
    np.testing.assert_allclose(float(m.ior[4]), 1.45)
    # others untouched
    assert int(m.mtype[2]) == MATERIAL_SPECULAR


def test_default_lights():
    lights = default_lights()
    assert lights.count == 4
    np.testing.assert_allclose(
        np.asarray(lights.position), [l[0] for l in DEFAULT_LIGHTS]
    )
    np.testing.assert_allclose(
        np.asarray(lights.intensity), [9.0, 2.0, 1.0, 2.0]
    )


def test_room_geometry_is_watertight_floor():
    """The two floor triangles tile the full [-8,8]^2 square at y=0."""
    floor = ROOM_TRIANGLES[:2]
    pts = {tuple(v) for tri in floor for v in tri[:3]}
    assert (8.0, 0.0, 8.0) in pts and (-8.0, 0.0, -8.0) in pts
    assert all(v[1] == 0.0 for v in pts)


def test_missing_file_raises(tmp_path):
    with pytest.raises(OSError):
        build_scene(str(tmp_path / "missing.obj"))
