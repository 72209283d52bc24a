"""Wavefront engine: equivalence with the oracle, checkpointing, stats."""

import numpy as np
import pytest

from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.engine import oracle, wavefront
from path_tracer_ai_tpu.scene.camera import default_camera
from path_tracer_ai_tpu.scene.scene import build_scene_from_arrays


@pytest.fixture(scope="module")
def room_scene():
    tris = [
        ([-8, 0, -8], [8, 0, -8], [8, 0, 8], [0, 1, 0], 1),
        ([-8, 0, -8], [8, 0, 8], [-8, 0, 8], [0, 1, 0], 1),
        ([-8, 0, -8], [-8, 4, -8], [8, 4, -8], [0, 0, 1], 1),
        ([-8, 0, -8], [8, 4, -8], [8, 0, -8], [0, 0, 1], 1),
        ([-1, 0, -1], [1, 0, -1], [0, 3, -1], [0, 0, 1], 0),
    ]
    col = lambda i: [t[i] for t in tris]
    n = col(3)
    uv = [[0, 0]] * len(tris)
    return build_scene_from_arrays(col(0), col(1), col(2), n, n, n, uv, uv, uv, col(4))


SETTINGS = RenderSettings(width=48, height=27, samples_per_pixel=8,
                          max_bounces=3, seed=11)


def test_matches_oracle_same_seed(room_scene):
    """Same RNG streams + same semantics -> near-identical images (only
    float-order and tie-break differences allowed)."""
    img_o = oracle.render(room_scene, default_camera(), SETTINGS)
    img_w = wavefront.render(room_scene, default_camera(), SETTINGS,
                             wave_size=1 << 12, block_size=64)
    assert np.abs(img_o - img_w).max() < 0.05
    assert np.abs(img_o - img_w).mean() < 1e-4


def test_wave_size_invariance(room_scene):
    a = wavefront.render(room_scene, default_camera(), SETTINGS,
                         wave_size=1 << 11, block_size=64)
    b = wavefront.render(room_scene, default_camera(), SETTINGS,
                         wave_size=1 << 13, block_size=128)
    # identical sample streams regardless of scheduling
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_nosort_bounce0_bit_identical(room_scene):
    """SHADOW_NOSORT_BOUNCE0 / CLOSEST_NOSORT_BOUNCE0 skip the bounce-0
    coherence sorts; traversal is exact under any blocking, so images
    must be bit-identical."""
    ref = wavefront.render(room_scene, default_camera(), SETTINGS,
                           wave_size=1 << 12, block_size=64,
                           backend="hybrid")
    wavefront.SHADOW_NOSORT_BOUNCE0 = True
    wavefront.CLOSEST_NOSORT_BOUNCE0 = True
    wavefront.clear_executable_caches()
    try:
        img = wavefront.render(room_scene, default_camera(), SETTINGS,
                               wave_size=1 << 12, block_size=64,
                               backend="hybrid")
    finally:
        wavefront.SHADOW_NOSORT_BOUNCE0 = False
        wavefront.CLOSEST_NOSORT_BOUNCE0 = False
        wavefront.clear_executable_caches()
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(img))


def test_worklist_occlude_packets_exact_bit_identical(room_scene):
    """WORKLIST_OCCLUDE_ENGINE="packets_exact" routes the worklist
    backend's shadow waves through the 2-level exact-cull packet cascade
    (the big-scene candidate adjudicated in round-5 session D). Occlusion
    is exact under either route, so images must be bit-identical."""
    ref = wavefront.render(room_scene, default_camera(), SETTINGS,
                           wave_size=1 << 12, block_size=64,
                           backend="worklist")
    wavefront.WORKLIST_OCCLUDE_ENGINE = "packets_exact"
    wavefront.clear_executable_caches()
    try:
        img = wavefront.render(room_scene, default_camera(), SETTINGS,
                               wave_size=1 << 12, block_size=64,
                               backend="worklist")
    finally:
        wavefront.WORKLIST_OCCLUDE_ENGINE = "worklist"
        wavefront.clear_executable_caches()
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(img))


def test_backend_equivalence(room_scene):
    """Every traversal backend is exact, so same-seed images must be
    bit-identical across backends (identical RNG streams and shading; the
    only degrees of freedom are traversal results, which are exact)."""
    ref = wavefront.render(room_scene, default_camera(), SETTINGS,
                           wave_size=1 << 12, block_size=64,
                           backend="packets")
    for backend in ["worklist", "pairs", "hybrid", "kslots", "ctiles"]:
        img = wavefront.render(room_scene, default_camera(), SETTINGS,
                               wave_size=1 << 12, block_size=64,
                               backend=backend)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(img),
                                      err_msg=backend)


def test_compaction_bit_identity(room_scene):
    """Live-lane compaction between bounces must not change any sample
    (RNG streams are keyed per (lane, depth, purpose), never by wave
    shape). Force tiny buckets so multi-level compaction triggers."""
    s = SETTINGS.replace(samples_per_pixel=2, max_bounces=4)
    ref = wavefront.render(room_scene, default_camera(), s,
                           wave_size=1 << 12, block_size=64,
                           backend="packets")
    orig = wavefront.COMPACT_MIN_BUCKET
    try:
        wavefront.COMPACT_MIN_BUCKET = 64
        img = wavefront.render(room_scene, default_camera(), s,
                               wave_size=1 << 12, block_size=64,
                               backend="packets")
    finally:
        wavefront.COMPACT_MIN_BUCKET = orig
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(img))


def test_default_backend_scale_routing():
    """Big scenes (clusters > 2048) route to the 2-level worklist; ctiles'
    flat per-ray cull only pays at bench-class cluster counts."""
    import types

    small = types.SimpleNamespace(num_clusters=641)
    big = types.SimpleNamespace(num_clusters=10241)
    assert wavefront.default_backend(None) == wavefront.default_backend(small)
    assert wavefront.default_backend(big) == "worklist"


def test_stats_count_rays(room_scene):
    st = wavefront.RenderStats()
    wavefront.render(room_scene, default_camera(), SETTINGS,
                     wave_size=1 << 12, block_size=64, stats=st)
    n_primary = 48 * 27 * 8
    assert st.closest_rays >= n_primary  # at least every primary ray
    assert st.shadow_rays > 0
    assert st.seconds > 0
    assert st.mrays_per_s > 0


def test_checkpoint_resume_identical(room_scene, tmp_path):
    ck = str(tmp_path / "render.ckpt")
    cam = default_camera()
    s = SETTINGS.replace(samples_per_pixel=8)

    # Straight-through render
    img_full = wavefront.render(room_scene, cam, s, wave_size=48 * 27 * 2,
                                block_size=64)

    # Interrupted render: stop after half the sample passes by rendering with
    # fewer samples into the checkpoint...
    s_half = s.replace(samples_per_pixel=4)
    wavefront.render(room_scene, cam, s_half, wave_size=48 * 27 * 2,
                     block_size=64, checkpoint_path=ck)
    # ...then resume to the full count. Fingerprints differ (spp is part of
    # them) so emulate a true resume: write a checkpoint with the full-run
    # fingerprint.
    from path_tracer_ai_tpu.io import checkpoint as ckpt_io

    loaded = ckpt_io.load(ck, ckpt_io.fingerprint(s_half, room_scene.triangles.count, 11))
    assert loaded is not None
    acc, cnt, next_s = loaded
    assert next_s == 4
    ckpt_io.save(ck, acc, cnt, next_s, ckpt_io.fingerprint(s, room_scene.triangles.count, 11))

    img_resumed = wavefront.render(room_scene, cam, s, wave_size=48 * 27 * 2,
                                   block_size=64, checkpoint_path=ck)
    np.testing.assert_allclose(img_full, img_resumed, atol=1e-6)


def test_checkpoint_fingerprint_mismatch_ignored(room_scene, tmp_path):
    ck = str(tmp_path / "stale.ckpt")
    cam = default_camera()
    s1 = SETTINGS.replace(samples_per_pixel=2)
    wavefront.render(room_scene, cam, s1, wave_size=48 * 27, block_size=64,
                     checkpoint_path=ck)
    # different resolution -> stale checkpoint must be ignored, not crash
    s2 = SETTINGS.replace(width=32, height=18, samples_per_pixel=2)
    img = wavefront.render(room_scene, cam, s2, wave_size=32 * 18,
                           block_size=64, checkpoint_path=ck)
    assert img.shape == (18, 32, 3)


def test_mid_chunk_checkpoint_resumable(tmp_path):
    """A checkpoint stamped mid-chunk (killed session) must be detected as
    resumable, not stale: compatible_spp returns its spp iff the stored
    fingerprint differs ONLY in the spp field, and the run_baselines
    helper surfaces it (round-5 incident: a spp320 mid-chunk stamp
    orphaned a 288-spp 4K lineage)."""
    import sys

    import numpy as np

    from path_tracer_ai_tpu.io import checkpoint as ckpt_io

    fp288 = ckpt_io.fingerprint(SETTINGS.replace(samples_per_pixel=288), 81928, 3)
    fp320 = ckpt_io.fingerprint(SETTINGS.replace(samples_per_pixel=320), 81928, 3)
    assert ckpt_io.compatible_spp(fp320, fp288) == 320
    assert ckpt_io.compatible_spp(fp288, fp288) is None  # no spp diff
    # any OTHER field differing -> not resumable
    fp_seed = ckpt_io.fingerprint(SETTINGS.replace(samples_per_pixel=320), 81928, 4)
    assert ckpt_io.compatible_spp(fp_seed, fp288) is None
    fp_tris = ckpt_io.fingerprint(SETTINGS.replace(samples_per_pixel=320), 99, 3)
    assert ckpt_io.compatible_spp(fp_tris, fp288) is None

    ck = str(tmp_path / "mid.npz")
    ckpt_io.save(ck, np.zeros((4, 3), np.float32), np.zeros((4,), np.int32),
                 7, fp320)
    assert ckpt_io.peek_fingerprint(ck) == fp320
    sys.path.insert(0, "/root/repo/scripts")
    from run_baselines import _orphaned_mid_chunk_spp

    assert _orphaned_mid_chunk_spp(ck, fp288) == 320
    assert _orphaned_mid_chunk_spp(str(tmp_path / "absent.npz"), fp288) is None


def test_spp_not_divisible_by_chunk(room_scene):
    """spp=5 with sc=2 -> tail pass half-masked; counts must equal spp."""
    s = SETTINGS.replace(samples_per_pixel=5)
    img5 = wavefront.render(room_scene, default_camera(), s,
                            wave_size=48 * 27 * 2, block_size=64)
    assert np.isfinite(img5).all()
    # spp=5 is between 4 and 8: noise level should sit between, not explode.
    img_ref = wavefront.render(room_scene, default_camera(),
                               SETTINGS, wave_size=48 * 27 * 2, block_size=64)
    assert np.abs(img5.mean() - img_ref.mean()) < 0.05


def test_pool_resume_starts_at_checkpoint_sample(room_scene, tmp_path):
    """Resuming a partial checkpoint in pool mode must NOT re-render (and
    double-count) the samples already in the accumulators."""
    ck = str(tmp_path / "pool.ckpt")
    cam = default_camera()
    s = SETTINGS.replace(samples_per_pixel=8)

    img_full = wavefront.render(room_scene, cam, s, wave_size=48 * 27 * 2,
                                block_size=64, scheduler="pool")

    # Halfway checkpoint, rewritten under the full-run fingerprint (as in
    # test_checkpoint_resume_identical).
    s_half = s.replace(samples_per_pixel=4)
    wavefront.render(room_scene, cam, s_half, wave_size=48 * 27 * 2,
                     block_size=64, checkpoint_path=ck)
    from path_tracer_ai_tpu.io import checkpoint as ckpt_io

    acc, cnt, next_s = ckpt_io.load(
        ck, ckpt_io.fingerprint(s_half, room_scene.triangles.count, 11)
    )
    assert next_s == 4
    ckpt_io.save(ck, acc, cnt, next_s,
                 ckpt_io.fingerprint(s, room_scene.triangles.count, 11))

    img_resumed = wavefront.render(room_scene, cam, s, wave_size=48 * 27 * 2,
                                   block_size=64, checkpoint_path=ck,
                                   scheduler="pool")
    np.testing.assert_allclose(img_full, img_resumed, atol=1e-6)


def test_pool_scheduler_matches_wave(room_scene):
    """Regeneration must be invisible to radiance: RNG streams depend only on
    (pixel, sample, bounce), never on lane scheduling."""
    cam = default_camera()
    img_wave = wavefront.render(room_scene, cam, SETTINGS,
                                wave_size=1 << 11, block_size=64,
                                scheduler="wave")
    st = wavefront.RenderStats()
    img_pool = wavefront.render(room_scene, cam, SETTINGS,
                                wave_size=1 << 11, block_size=64,
                                scheduler="pool", stats=st)
    np.testing.assert_allclose(img_wave, img_pool, atol=1e-5)
    assert st.closest_rays > 0 and st.shadow_rays > 0


def test_pool_scheduler_chunked_pixels(room_scene):
    """Pool mode with multiple pixel chunks (pool smaller than the image)."""
    cam = default_camera()
    img_pool = wavefront.render(room_scene, cam, SETTINGS,
                                wave_size=1 << 9, block_size=64,
                                scheduler="pool")
    img_wave = wavefront.render(room_scene, cam, SETTINGS,
                                wave_size=1 << 9, block_size=64)
    np.testing.assert_allclose(img_wave, img_pool, atol=1e-5)


def test_dual_accel_hybrid_bit_identical(room_scene):
    """HYBRID_CLOSEST_CLUSTER_SIZE routes closest waves through a second
    accel built from the original triangles — images must be bit-identical
    (the traversal-exactness invariant)."""
    import numpy as np

    from path_tracer_ai_tpu.accel.clusters import build_clusters
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.camera import default_camera

    scene = room_scene
    camera = default_camera()
    s = RenderSettings(width=24, height=16, samples_per_pixel=2,
                       max_bounces=3, seed=5)
    accel = build_clusters(scene.triangles, cluster_size=16)
    img_a = wavefront.render(scene, camera, s, accel=accel, wave_size=512,
                             block_size=64, backend="hybrid")
    try:
        wavefront.HYBRID_CLOSEST_CLUSTER_SIZE = 8
        wavefront.clear_executable_caches()
        img_b = wavefront.render(scene, camera, s, accel=accel,
                                 wave_size=512, block_size=64,
                                 backend="hybrid")
    finally:
        wavefront.HYBRID_CLOSEST_CLUSTER_SIZE = None
        wavefront.clear_executable_caches()
    np.testing.assert_array_equal(img_a, img_b)


class TestRussianRoulette:
    """Opt-in unbiased RR (RenderSettings.rr_start; the reference has none —
    renderer.hpp:129-250 is fixed-depth only, so rr_start=0 is quirk parity)."""

    def test_late_start_is_identical(self, room_scene):
        """rr_start >= max_bounces never fires: the image must equal the
        rr-off image exactly (same RNG consumption for all other purposes)."""
        ref = wavefront.render(room_scene, default_camera(), SETTINGS,
                               wave_size=1 << 12, block_size=64)
        img = wavefront.render(room_scene, default_camera(),
                               SETTINGS.replace(rr_start=SETTINGS.max_bounces),
                               wave_size=1 << 12, block_size=64)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(img))

    def test_engines_agree_same_seed(self, room_scene):
        """RR draws ride the keyed RNG (lane, depth, TAG_RR): oracle and
        wavefront terminate the SAME paths."""
        s = SETTINGS.replace(rr_start=1, max_bounces=4)
        img_o = oracle.render(room_scene, default_camera(), s)
        img_w = wavefront.render(room_scene, default_camera(), s,
                                 wave_size=1 << 12, block_size=64)
        assert np.abs(img_o - img_w).max() < 0.05
        assert np.abs(img_o - img_w).mean() < 1e-4

    def test_scheduling_invariance(self, room_scene):
        """RR termination must be invisible to scheduling: wave sizes,
        compaction buckets, and the pool scheduler all produce the same
        image for the same seed."""
        s = SETTINGS.replace(rr_start=1, max_bounces=4, samples_per_pixel=4)
        ref = wavefront.render(room_scene, default_camera(), s,
                               wave_size=1 << 12, block_size=64)
        b = wavefront.render(room_scene, default_camera(), s,
                             wave_size=1 << 11, block_size=128)
        np.testing.assert_allclose(ref, b, atol=1e-5)
        orig = wavefront.COMPACT_MIN_BUCKET
        try:
            wavefront.COMPACT_MIN_BUCKET = 64
            c = wavefront.render(room_scene, default_camera(), s,
                                 wave_size=1 << 12, block_size=64)
        finally:
            wavefront.COMPACT_MIN_BUCKET = orig
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(c))
        d = wavefront.render(room_scene, default_camera(), s,
                             wave_size=1 << 12, block_size=64,
                             scheduler="pool")
        np.testing.assert_allclose(ref, d, atol=1e-5)

    def test_unbiased_mean(self, room_scene):
        """E[radiance] is unchanged by RR: aggressive roulette (rr_start=1)
        at high spp must agree with the rr-off mean within MC noise."""
        s = RenderSettings(width=8, height=8, samples_per_pixel=512,
                           max_bounces=5, seed=3)
        base = wavefront.render(room_scene, default_camera(), s,
                                wave_size=1 << 13, block_size=64)
        rr = wavefront.render(room_scene, default_camera(),
                              s.replace(rr_start=1, seed=4),
                              wave_size=1 << 13, block_size=64)
        # Whole-image mean: 32768 samples; SE ~ 0.01 at sample std ~1-2.
        assert abs(float(base.mean()) - float(rr.mean())) < 0.03
        # Per-pixel agreement at MC-noise tolerance.
        assert float(np.abs(base - rr).mean()) < 0.15
