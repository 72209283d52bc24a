"""OBJ/MTL parser tests."""

import numpy as np

from path_tracer_ai_tpu.scene.objloader import load_obj, parse_mtl


def write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_basic_triangle(tmp_path):
    path = write(tmp_path, "t.obj", """
v 0 0 0
v 1 0 0
v 0 1 0
f 1 2 3
""")
    obj = load_obj(path)
    assert obj.vertices.shape == (3, 3)
    assert obj.v_idx.shape == (1, 3)
    np.testing.assert_array_equal(obj.v_idx[0], [0, 1, 2])
    np.testing.assert_array_equal(obj.n_idx[0], [-1, -1, -1])
    assert obj.mat_ids[0] == -1


def test_quad_fan_triangulation(tmp_path):
    path = write(tmp_path, "q.obj", """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
""")
    obj = load_obj(path)
    assert obj.v_idx.shape == (2, 3)
    np.testing.assert_array_equal(obj.v_idx, [[0, 1, 2], [0, 2, 3]])


def test_negative_indices(tmp_path):
    path = write(tmp_path, "n.obj", """
v 0 0 0
v 1 0 0
v 0 1 0
f -3 -2 -1
""")
    obj = load_obj(path)
    np.testing.assert_array_equal(obj.v_idx[0], [0, 1, 2])


def test_full_face_format(tmp_path):
    path = write(tmp_path, "ff.obj", """
v 0 0 0
v 1 0 0
v 0 1 0
vt 0 0
vt 1 0
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1
""")
    obj = load_obj(path)
    np.testing.assert_array_equal(obj.t_idx[0], [0, 1, 2])
    np.testing.assert_array_equal(obj.n_idx[0], [0, 0, 0])


def test_vn_only_format(tmp_path):
    path = write(tmp_path, "vn.obj", """
v 0 0 0
v 1 0 0
v 0 1 0
vn 0 0 1
f 1//1 2//1 3//1
""")
    obj = load_obj(path)
    np.testing.assert_array_equal(obj.t_idx[0], [-1, -1, -1])
    np.testing.assert_array_equal(obj.n_idx[0], [0, 0, 0])


def test_mtl_parsing(tmp_path):
    write(tmp_path, "m.mtl", """
newmtl gold_body
Kd 0.8 0.6 0.1
Ni 1.45
newmtl glass_visor
Kd 1 1 1
d 0.3
illum 7
""")
    mats = parse_mtl(str(tmp_path / "m.mtl"))
    assert [m.name for m in mats] == ["gold_body", "glass_visor"]
    np.testing.assert_allclose(mats[0].diffuse, (0.8, 0.6, 0.1))
    assert mats[0].ior == 1.45
    assert mats[1].dissolve == 0.3
    assert mats[1].illum == 7


def test_usemtl_assigns_per_face_ids(tmp_path):
    write(tmp_path, "m.mtl", """
newmtl a
Kd 1 0 0
newmtl b
Kd 0 1 0
""")
    path = write(tmp_path, "u.obj", """
mtllib m.mtl
v 0 0 0
v 1 0 0
v 0 1 0
f 1 2 3
usemtl b
f 1 2 3
usemtl a
f 1 2 3
usemtl nonexistent
f 1 2 3
""")
    obj = load_obj(path)
    np.testing.assert_array_equal(obj.mat_ids, [-1, 1, 0, -1])
    assert len(obj.materials) == 2


def test_default_kd_is_tinyobj_default(tmp_path):
    write(tmp_path, "m.mtl", "newmtl plain\n")
    mats = parse_mtl(str(tmp_path / "m.mtl"))
    np.testing.assert_allclose(mats[0].diffuse, (0.6, 0.6, 0.6))
