"""Multi-chip sharded rendering on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import pytest

from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.engine import wavefront
from path_tracer_ai_tpu.parallel.mesh import make_mesh, render_sharded, render_tiled
from path_tracer_ai_tpu.scene.camera import default_camera
from path_tracer_ai_tpu.scene.scene import build_scene_from_arrays

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def scene():
    tris = [
        ([-8, 0, -8], [8, 0, -8], [8, 0, 8], [0, 1, 0], 1),
        ([-8, 0, -8], [8, 0, 8], [-8, 0, 8], [0, 1, 0], 1),
        ([-8, 0, -8], [-8, 4, -8], [8, 4, -8], [0, 0, 1], 1),
        ([-1, 0, -1], [1, 0, -1], [0, 3, -1], [0, 0, 1], 0),
    ]
    col = lambda i: [t[i] for t in tris]
    n = col(3)
    uv = [[0, 0]] * len(tris)
    return build_scene_from_arrays(col(0), col(1), col(2), n, n, n, uv, uv, uv, col(4))


SETTINGS = RenderSettings(width=40, height=24, samples_per_pixel=4,
                          max_bounces=2, seed=3)


@pytest.fixture(scope="module")
def single_device_image(scene):
    return wavefront.render(scene, default_camera(), SETTINGS,
                            wave_size=1 << 11, block_size=64)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_mesh_shapes_match_single_device(scene, single_device_image, shape):
    """Any (tiles, samples) factorization must reproduce the single-device
    image: RNG streams are keyed by (pixel, global sample), so sharding is
    invisible up to float summation order."""
    mesh = make_mesh(*shape)
    img = render_sharded(scene, default_camera(), SETTINGS, mesh,
                         block_size=64, pix_chunk=1 << 9)
    np.testing.assert_allclose(img, single_device_image, atol=1e-4)


def test_render_tiled_wrapper(scene, single_device_image):
    img = render_tiled(scene, default_camera(), SETTINGS, n_devices=8,
                       block_size=64, pix_chunk=1 << 9)
    np.testing.assert_allclose(img, single_device_image, atol=1e-4)


def test_sharded_exact_cull_matches_single_device(scene,
                                                  single_device_image):
    """The round-4 exact_cull shadow config (adoption candidate
    shadow_g2_exact) must reproduce the production single-device image
    under the mesh: the 2-level cull's ops (per-lane slab, top_k
    shortlist, entry argsort, live-prefix fori_loop) all trace inside
    shard_map, and occlusion is exact under any cull."""
    occ0 = wavefront.HYBRID_OCCLUDE_KW
    try:
        wavefront.HYBRID_OCCLUDE_KW = dict(engine="packets", group_size=2,
                                           exact_cull=4)
        wavefront.clear_executable_caches()
        mesh = make_mesh(4, 2)
        img = render_sharded(scene, default_camera(), SETTINGS, mesh,
                             block_size=64, pix_chunk=1 << 9)
    finally:
        wavefront.HYBRID_OCCLUDE_KW = occ0
        wavefront.clear_executable_caches()
    np.testing.assert_allclose(img, single_device_image, atol=1e-4)


@pytest.mark.parametrize("shape", [(8, 1), (2, 4)])
def test_wavefront_scheduler_matches_single_device(scene, single_device_image,
                                                   shape):
    """The host-stepped sharded scheduler (per-shard compaction, psum over
    samples) must reproduce the single-chip image and its exact ray count."""
    from path_tracer_ai_tpu.parallel.mesh import render_sharded_wavefront

    mesh = make_mesh(*shape)
    stats = wavefront.RenderStats()
    img = render_sharded_wavefront(
        scene, default_camera(), SETTINGS, mesh, block_size=64,
        pix_chunk=1 << 9, stats=stats, compact_min_bucket=64,
    )
    np.testing.assert_allclose(img, single_device_image, atol=1e-4)
    assert stats.total_rays > 0


def test_wavefront_scheduler_checkpoint_resume(scene, tmp_path, monkeypatch):
    """Sharded per-pass checkpointing: resuming from the first pass's
    intermediate checkpoint must reproduce the uninterrupted image."""
    from path_tracer_ai_tpu.io import checkpoint as ckpt_io
    from path_tracer_ai_tpu.parallel import mesh as mesh_mod

    mesh = make_mesh(2, 2)
    ck = str(tmp_path / "mesh.ckpt")

    saves = []
    orig_save = ckpt_io.save

    def record_save(path, acc, cnt, next_sample, fp):
        saves.append((np.array(acc), np.array(cnt), next_sample, fp))
        orig_save(path, acc, cnt, next_sample, fp)

    monkeypatch.setattr(ckpt_io, "save", record_save)
    img_full = mesh_mod.render_sharded_wavefront(
        scene, default_camera(), SETTINGS, mesh, block_size=64,
        pix_chunk=1 << 9, checkpoint_path=ck, checkpoint_every=1,
        compact_min_bucket=64,
    )
    monkeypatch.setattr(ckpt_io, "save", orig_save)
    assert len(saves) >= 2  # one per pass (spp=4, samples axis=2 -> 2 passes)
    # Rewind to the FIRST pass's checkpoint (simulated interruption).
    acc, cnt, next_sample, fp = saves[0]
    assert next_sample < SETTINGS.samples_per_pixel
    ckpt_io.save(ck, acc, cnt, next_sample, fp)
    img_resumed = mesh_mod.render_sharded_wavefront(
        scene, default_camera(), SETTINGS, mesh, block_size=64,
        pix_chunk=1 << 9, checkpoint_path=ck, compact_min_bucket=64,
    )
    np.testing.assert_allclose(img_resumed, img_full, atol=1e-6)


def test_wavefront_scheduler_rejects_midpass_checkpoint(scene, tmp_path):
    """A checkpoint whose sample count is not a multiple of the mesh's
    samples axis cannot resume (flooring would double-count the partial
    pass's samples) — it must be rejected loudly, not silently biased."""
    from path_tracer_ai_tpu.io import checkpoint as ckpt_io
    from path_tracer_ai_tpu.parallel.mesh import render_sharded_wavefront

    mesh = make_mesh(2, 4)
    ck = str(tmp_path / "midpass.ckpt")
    npix = SETTINGS.width * SETTINGS.height
    fp = ckpt_io.fingerprint(SETTINGS, scene.triangles.count, SETTINGS.seed)
    ckpt_io.save(ck, np.zeros((npix, 3), np.float32),
                 np.zeros((npix,), np.int32), 3, fp)  # 3 % 4 != 0
    with pytest.raises(ValueError, match="not a multiple"):
        render_sharded_wavefront(scene, default_camera(), SETTINGS, mesh,
                                 block_size=64, pix_chunk=1 << 9,
                                 checkpoint_path=ck)


def test_render_tiled_fused_rejects_unsupported_kwargs(scene):
    """The fused scheduler must refuse (not silently drop) capabilities
    only the wave scheduler carries."""
    with pytest.raises(ValueError, match="base render surface"):
        render_tiled(scene, default_camera(), SETTINGS, n_devices=8,
                     scheduler="fused", stats=wavefront.RenderStats(),
                     block_size=64, pix_chunk=1 << 9)


def test_render_tile_devices_rejects_pool_scheduler(scene):
    with pytest.raises(ValueError, match="scheduler='wave'"):
        wavefront.render(scene, default_camera(), SETTINGS, tile_devices=8,
                         scheduler="pool", block_size=64)


def test_render_tiled_fused_base_surface(scene, single_device_image):
    """scheduler='fused' still works for the base surface."""
    img = render_tiled(scene, default_camera(), SETTINGS, n_devices=8,
                       scheduler="fused", block_size=64, pix_chunk=1 << 9)
    np.testing.assert_allclose(img, single_device_image, atol=1e-4)


def test_output_shards_live_on_distinct_devices(scene):
    """The framebuffer really is sharded: check the mesh covers 8 devices."""
    mesh = make_mesh(8, 1)
    assert len(set(np.asarray(mesh.devices).reshape(-1).tolist())) == 8


def test_uneven_pixels_padded(scene):
    """npix not divisible by n_tile: padded pixels must not corrupt output."""
    s = SETTINGS.replace(width=37, height=13)  # 481 px, prime-ish
    mesh = make_mesh(8, 1)
    img = render_sharded(scene, default_camera(), s, mesh,
                         block_size=64, pix_chunk=1 << 8)
    assert img.shape == (13, 37, 3)
    assert np.isfinite(img).all()


def test_cli_tile_devices(scene, tmp_path):
    """--tile-devices end-to-end through the CLI on the virtual mesh."""
    obj = tmp_path / "tri.obj"
    obj.write_text("v -1 0 -1\nv 1 0 -1\nv 0 2 -1\nf 1 2 3\n")
    out = str(tmp_path / "tiled.png")
    from path_tracer_ai_tpu.cli import main
    from path_tracer_ai_tpu.io.png import read_png

    rc = main(["-m", "tpu", "-w", "24", "-h", "12", "-s", "2", "-b", "2",
               "-i", str(obj), "-o", out, "--tile-devices", "8"])
    assert rc == 0
    assert read_png(out).shape == (12, 24, 3)
