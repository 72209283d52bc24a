"""Native C++ runtime components: byte-identical contracts with Python."""

import numpy as np
import pytest

from path_tracer_ai_tpu.accel import native
from path_tracer_ai_tpu.accel.morton import morton3d_np
from path_tracer_ai_tpu.scene.objloader import _load_obj_py, load_obj

needs_native = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)

OBJ = """mtllib m.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
vt 0.5 0.25
f 1/1/1 2/1/1 3/1/1 4/1/1
usemtl b
f -4 -3 -2
usemtl missing_material
f 1 2 3
f 1//1 2//1 4//1
"""

MTL = "newmtl a\nKd 1 0 0\nnewmtl b\nKd 0 1 0\nNi 1.33\n"


@pytest.fixture
def obj_path(tmp_path):
    (tmp_path / "m.mtl").write_text(MTL)
    p = tmp_path / "t.obj"
    p.write_text(OBJ)
    return str(p)


@needs_native
def test_obj_parse_identical_to_python(obj_path):
    a = load_obj(obj_path, prefer_native=True)
    b = _load_obj_py(obj_path)
    for f in ["vertices", "normals", "texcoords", "v_idx", "n_idx", "t_idx", "mat_ids"]:
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), err_msg=f)
    assert [m.name for m in a.materials] == [m.name for m in b.materials]
    assert a.materials[1].ior == b.materials[1].ior == 1.33


@needs_native
def test_morton_order_identical_to_python(rng):
    v0 = rng.uniform(-3, 3, (500, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    no = native.native_morton_order(v0, v1, v2)
    centers = (v0 + v1 + v2) / 3.0
    po = np.argsort(
        morton3d_np(centers, centers.min(0), centers.max(0)), kind="stable"
    )
    np.testing.assert_array_equal(no, po.astype(np.int32))


@needs_native
def test_split_order_same_partition_as_python(rng):
    """Native median split yields the same cluster PARTITION (as sets) as
    the Python builder on tie-free centroids; see pt_split_order contract."""
    from path_tracer_ai_tpu.accel.clusters import _median_split_order

    centers = rng.standard_normal((700, 3)).astype(np.float32)
    s = 32
    no = native.native_split_order(centers, s)
    po = _median_split_order(centers, s)
    assert sorted(no.tolist()) == list(range(700))
    for k in range(-(-700 // s)):
        assert set(no[k * s:(k + 1) * s].tolist()) == \
            set(po[k * s:(k + 1) * s].tolist()), f"cluster {k}"


@needs_native
def test_missing_file_raises(tmp_path):
    with pytest.raises(OSError):
        load_obj(str(tmp_path / "nope.obj"), prefer_native=True)


def test_python_fallback_always_works(obj_path):
    b = _load_obj_py(obj_path)
    assert b.v_idx.shape == (5, 3)  # quad fan (2) + 3 triangles
    # unknown usemtl -> -1 (tinyobj behavior)
    np.testing.assert_array_equal(b.mat_ids, [-1, -1, 1, -1, -1])
