"""CLI driver tests (flag parity with src/main.cpp:15-24 + extensions)."""

import numpy as np
import pytest

from path_tracer_ai_tpu.cli import build_parser, main
from path_tracer_ai_tpu.io.png import read_png

OBJ = """
v -1 0 -1
v 1 0 -1
v 0 2 -1
f 1 2 3
"""


@pytest.fixture
def obj_path(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text(OBJ)
    return str(p)


def test_defaults_match_reference():
    args = build_parser().parse_args([])
    assert args.mode == "gpu"
    assert (args.width, args.height) == (800, 450)
    assert (args.samples, args.bounces) == (100, 5)
    assert args.gamma == 2.2
    assert args.input == "IronMan/IronMan.obj"
    assert args.output == "output.png"


def test_h_is_height_not_help():
    args = build_parser().parse_args(["-h", "99"])
    assert args.height == 99


def test_cpu_mode_end_to_end(obj_path, tmp_path):
    out = str(tmp_path / "o.png")
    rc = main(["-m", "cpu", "-w", "24", "-h", "16", "-s", "2", "-b", "2",
               "-i", obj_path, "-o", out])
    assert rc == 0
    img = read_png(out)
    assert img.shape == (16, 24, 3)


def test_tpu_mode_end_to_end(obj_path, tmp_path):
    out = str(tmp_path / "o2.png")
    rc = main(["-m", "tpu", "-w", "24", "-h", "16", "-s", "2", "-b", "2",
               "-i", obj_path, "-o", out, "--validate"])
    assert rc == 0
    assert read_png(out).shape == (16, 24, 3)


def test_same_seed_modes_agree(obj_path, tmp_path):
    a = str(tmp_path / "a.png")
    b = str(tmp_path / "b.png")
    common = ["-w", "20", "-h", "12", "-s", "2", "-b", "2", "-i", obj_path,
              "--seed", "9"]
    assert main(["-m", "cpu", "-o", a] + common) == 0
    assert main(["-m", "tpu", "-o", b] + common) == 0
    np.testing.assert_array_equal(read_png(a), read_png(b))


def test_missing_input_fails(tmp_path):
    rc = main(["-i", str(tmp_path / "none.obj"), "-o", str(tmp_path / "x.png")])
    assert rc == 1


def test_checkpoint_roundtrip(obj_path, tmp_path):
    out = str(tmp_path / "c.png")
    ck = str(tmp_path / "c.ckpt")
    args = ["-m", "tpu", "-w", "16", "-h", "9", "-s", "3", "-b", "2",
            "-i", obj_path, "-o", out, "--checkpoint", ck]
    assert main(args) == 0
    first = read_png(out)
    # resume-from-complete: instant, identical output
    assert main(args) == 0
    np.testing.assert_array_equal(first, read_png(out))
