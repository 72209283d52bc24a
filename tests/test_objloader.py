"""OBJ/MTL parser tests."""

import numpy as np
import pytest

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


def test_concave_polygon_ear_clipped(tmp_path):
    """A concave (arrowhead) quad must not produce a triangle outside the
    polygon (naive fan from corner 0 does); ear clipping preserves area.
    Mirrors tinyobjloader triangulate=true (reference src/scene.cpp:13)."""
    p = tmp_path / "concave.obj"
    # Arrowhead: (0,0) (4,1) (0,2) with a notch vertex at (1,1).
    # Corner 3 (the notch) is reflex; fan from corner 0 would emit
    # (v0, v2, v3) which lies partly OUTSIDE the polygon.
    p.write_text(
        "v 0 0 0\nv 4 1 0\nv 0 2 0\nv 1 1 0\nf 1 2 3 4\n"
    )
    data = load_obj(str(p))
    assert data.v_idx.shape == (2, 3)

    def tri_area(tri):
        a, b, c = (data.vertices[i] for i in tri)
        return 0.5 * abs(np.cross(b - a, c - a)[2])

    total = sum(tri_area(t) for t in data.v_idx)
    # Polygon area via shoelace: 0.5*|sum| over the 4 corners.
    pts = data.vertices[:, :2]
    quad = [0, 1, 2, 3]
    sh = 0.0
    for i in range(4):
        x0, y0 = pts[quad[i]]
        x1, y1 = pts[quad[(i + 1) % 4]]
        sh += x0 * y1 - x1 * y0
    poly_area = 0.5 * abs(sh)
    assert abs(total - poly_area) < 1e-5, (total, poly_area)

    # Every triangle centroid must lie inside the polygon (the naive fan's
    # (v0, v2, v3) centroid falls outside the notch).
    def in_poly(pt):
        inside = False
        for i in range(4):
            x0, y0 = pts[quad[i]]
            x1, y1 = pts[quad[(i + 1) % 4]]
            if (y0 > pt[1]) != (y1 > pt[1]):
                xx = x0 + (pt[1] - y0) / (y1 - y0) * (x1 - x0)
                if pt[0] < xx:
                    inside = not inside
        return inside

    for tri in data.v_idx:
        cen = data.vertices[tri][:, :2].mean(axis=0)
        assert in_poly(cen), (tri, cen)


def test_concave_native_matches_python(tmp_path):
    """The native parser's ear clipping must be byte-identical to the
    Python twin (same algorithm, same double-precision order)."""
    from path_tracer_ai_tpu.scene.objloader import _load_obj_py

    p = tmp_path / "concave2.obj"
    # Two concave faces (one 5-gon) + one convex quad, mixed axes.
    p.write_text(
        "v 0 0 0\nv 4 1 0\nv 0 2 0\nv 1 1 0\n"
        "v 0 0 3\nv 2 0 3\nv 2 2 3\nv 1 0.5 3\nv 0 2 3\n"
        "v 5 0 0\nv 6 0 0\nv 6 0 1\nv 5 0 1\n"
        "f 1 2 3 4\nf 5 6 7 8 9\nf 10 11 12 13\n"
    )
    try:
        from path_tracer_ai_tpu.accel.native import native_load_obj

        nat = native_load_obj(str(p))
    except Exception:
        pytest.skip("native lib unavailable")
    if nat is None:
        pytest.skip("native lib unavailable")
    py = _load_obj_py(str(p))
    np.testing.assert_array_equal(nat.v_idx, py.v_idx)
    np.testing.assert_array_equal(nat.n_idx, py.n_idx)
    np.testing.assert_array_equal(nat.t_idx, py.t_idx)
    np.testing.assert_array_equal(nat.mat_ids, py.mat_ids)


def test_convex_faces_keep_fan_output(tmp_path):
    """Convex n-gons must still triangulate as the fan from corner 0
    (preserves byte-identity of all historical loader outputs)."""
    p = tmp_path / "convex.obj"
    p.write_text(
        "v 0 0 0\nv 2 0 0\nv 3 1 0\nv 2 2 0\nv 0 2 0\nf 1 2 3 4 5\n"
    )
    data = load_obj(str(p))
    np.testing.assert_array_equal(
        data.v_idx, np.asarray([[0, 1, 2], [0, 2, 3], [0, 3, 4]], np.int32)
    )
