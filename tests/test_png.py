"""PNG writer/reader + tonemap semantics."""

import numpy as np

from path_tracer_ai_tpu.io.image import tonemap_to_u8
from path_tracer_ai_tpu.io.png import read_png, write_png


def test_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, (13, 31, 3)).astype(np.uint8)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(img, back)


def test_tonemap_matches_reference_cast():
    """clamp -> pow(1/gamma) -> *255 -> truncating cast (renderer.cpp:9-16)."""
    img = np.asarray([[[0.0, 0.5, 1.0]], [[2.0, -1.0, 0.2176376]]], np.float32)
    out = tonemap_to_u8(img, 2.2)
    assert out[0, 0, 0] == 0
    assert out[0, 0, 2] == 255
    assert out[1, 0, 0] == 255  # clamped above
    assert out[1, 0, 1] == 0    # clamped below
    expected = int((0.5 ** (1 / 2.2)) * 255.0)
    assert out[0, 0, 1] == expected


def test_gamma_one_is_linear():
    img = np.full((1, 1, 3), 0.5, np.float32)
    out = tonemap_to_u8(img, 1.0)
    assert out[0, 0, 0] == 127  # 0.5*255 truncated
