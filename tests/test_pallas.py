"""Pallas sweep kernels: exactness vs brute force (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from path_tracer_ai_tpu.accel.clusters import build_clusters
from path_tracer_ai_tpu.accel.pallas_sweep import (
    any_hit_pallas,
    build_slab_table,
    closest_hit_pallas,
)
from path_tracer_ai_tpu.core.types import triangles_from_numpy
from path_tracer_ai_tpu.engine.intersect import any_hit, closest_hit


def random_soup(rng, t, spread=4.0, size=0.6):
    base = rng.uniform(-spread, spread, (t, 3)).astype(np.float32)
    v0 = base
    v1 = base + rng.uniform(-size, size, (t, 3)).astype(np.float32)
    v2 = base + rng.uniform(-size, size, (t, 3)).astype(np.float32)
    n = np.tile([[0, 1, 0]], (t, 1)).astype(np.float32)
    uv = np.zeros((t, 2), np.float32)
    return triangles_from_numpy(v0, v1, v2, n, n, n, uv, uv, uv,
                                np.zeros(t, np.int32))


@pytest.fixture(scope="module")
def setup(rng_mod=np.random.default_rng(7)):
    tris = random_soup(rng_mod, 450)
    accel = build_clusters(tris, cluster_size=128)
    slab = build_slab_table(accel)
    return tris, accel, slab


def rays(rng, n, spread=6.0):
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_closest_matches_bruteforce(setup, rng):
    tris, accel, slab = setup
    o, d = rays(rng, 256)
    ph = closest_hit_pallas(accel, slab, o, d, 1e-3, np.inf,
                            block_size=64, interpret=True)
    bh = closest_hit(tris, o, d, 1e-3, np.inf)
    m = np.asarray(bh.hit)
    np.testing.assert_array_equal(np.asarray(ph.hit), m)
    np.testing.assert_allclose(np.asarray(ph.t)[m], np.asarray(bh.t)[m], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ph.tri)[m], np.asarray(bh.tri)[m])


def test_closest_with_dead_lanes(setup, rng):
    """Per-lane t_max < t_min lanes (dead) must return misses and must not
    stall their block's early termination."""
    tris, accel, slab = setup
    o, d = rays(rng, 128)
    tmax = np.full(128, np.inf, np.float32)
    tmax[::3] = -1.0
    ph = closest_hit_pallas(accel, slab, o, d, 1e-3, jnp.asarray(tmax),
                            block_size=64, interpret=True)
    assert not np.asarray(ph.hit)[::3].any()
    bh = closest_hit(tris, o, d, 1e-3, np.inf)
    alive = np.ones(128, bool)
    alive[::3] = False
    m = np.asarray(bh.hit) & alive
    np.testing.assert_allclose(np.asarray(ph.t)[m], np.asarray(bh.t)[m], rtol=1e-5)


def test_anyhit_matches_bruteforce(setup, rng):
    tris, accel, slab = setup
    o, d = rays(rng, 128)
    tmax = jnp.asarray(rng.uniform(0.3, 12.0, 128).astype(np.float32))
    pa = any_hit_pallas(accel, slab, o, d, 1e-3, tmax, block_size=64,
                        interpret=True)
    ba = any_hit(tris, o, d, 1e-3, tmax)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(ba))


def test_wavefront_render_with_pallas_backend(rng):
    """Full render through the Pallas backend (interpret) == XLA backend."""
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.cornell import build_cornell_scene

    scene, camera = build_cornell_scene()
    s = RenderSettings(width=24, height=24, samples_per_pixel=4,
                       max_bounces=3, seed=2)
    accel = build_clusters(scene.triangles, cluster_size=128)
    img_x = wavefront.render(scene, camera, s, accel=accel,
                             wave_size=24 * 24, block_size=64, use_pallas=False)
    from path_tracer_ai_tpu.engine.wavefront import packet_backend

    # interpret-mode pallas backend plugged in via the same machinery
    import functools
    import path_tracer_ai_tpu.engine.wavefront as wf

    orig = wf.packet_backend
    try:
        wf.packet_backend = functools.partial(orig, interpret=True)
        wf.clear_executable_caches()
        img_p = wavefront.render(scene, camera, s, accel=accel,
                                 wave_size=24 * 24, block_size=64,
                                 use_pallas=True)
    finally:
        wf.packet_backend = orig
        wf.clear_executable_caches()
    np.testing.assert_allclose(img_x, img_p, atol=1e-5)


class TestCtilesPallasIntegration:
    """closest/any_hit_ctiles(use_pallas=True) — the fused tile sweep wired
    into the full ctiles pipeline — must bit-match the XLA ctiles path and
    brute force (interpret mode on CPU)."""

    def _check(self, tris, accel, o, d, t_max=np.inf, **kw):
        from path_tracer_ai_tpu.accel.ctiles import (
            any_hit_ctiles,
            closest_hit_ctiles,
        )
        from path_tracer_ai_tpu.engine.intersect import any_hit, closest_hit

        kw.setdefault("row_chunk", 32)
        kw.setdefault("tile_chunk", 8)   # must be a multiple of GROUP
        ph = closest_hit_ctiles(accel, o, d, 1e-3, t_max,
                                use_pallas=True, interpret=True, **kw)
        px = closest_hit_ctiles(accel, o, d, 1e-3, t_max, **kw)
        bh = closest_hit(tris, o, d, 1e-3, t_max)
        # vs the XLA ctiles path: same pipeline, swapped sweep. On TPU the
        # two sweeps agree BITWISE (probe N: 0/8.4M lane mismatches, and
        # the bench session asserts it each round); CPU interpret mode may
        # differ by FMA contraction — allow ulp-level slack here only.
        np.testing.assert_array_equal(np.asarray(ph.hit), np.asarray(px.hit))
        np.testing.assert_allclose(np.asarray(ph.t), np.asarray(px.t),
                                   rtol=3e-7)
        np.testing.assert_array_equal(np.asarray(ph.tri), np.asarray(px.tri))
        m = np.asarray(bh.hit)
        np.testing.assert_array_equal(np.asarray(ph.hit), m)
        np.testing.assert_allclose(np.asarray(ph.t)[m], np.asarray(bh.t)[m],
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(ph.tri)[m],
                                      np.asarray(bh.tri)[m])
        tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                    (o.shape[0],))
        pa = any_hit_ctiles(accel, o, d, 1e-3, tmax_arr,
                            use_pallas=True, interpret=True, **kw)
        ba = any_hit(tris, o, d, 1e-3, tmax_arr)
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(ba))
        # sub-slab skip: gated [SUB, T] chunks must not change a bit
        ps = closest_hit_ctiles(accel, o, d, 1e-3, t_max, use_pallas=True,
                                interpret=True, sub_skip=True, **kw)
        np.testing.assert_array_equal(np.asarray(ps.hit), np.asarray(ph.hit))
        np.testing.assert_array_equal(np.asarray(ps.t), np.asarray(ph.t))
        np.testing.assert_array_equal(np.asarray(ps.tri), np.asarray(ph.tri))
        pas = any_hit_ctiles(accel, o, d, 1e-3, tmax_arr, use_pallas=True,
                             interpret=True, sub_skip=True, **kw)
        np.testing.assert_array_equal(np.asarray(pas), np.asarray(ba))
        # pre-transposed [C, S, 16] pack (round-5 kernel-floor lever):
        # same values, same MT op order — bitwise even in interpret mode
        # (the transpose is data movement, not arithmetic)
        pt = closest_hit_ctiles(accel, o, d, 1e-3, t_max, use_pallas=True,
                                interpret=True, pallas_pack_t=True, **kw)
        np.testing.assert_array_equal(np.asarray(pt.hit), np.asarray(ph.hit))
        np.testing.assert_array_equal(np.asarray(pt.t), np.asarray(ph.t))
        np.testing.assert_array_equal(np.asarray(pt.tri), np.asarray(ph.tri))
        pat = any_hit_ctiles(accel, o, d, 1e-3, tmax_arr, use_pallas=True,
                             interpret=True, pallas_pack_t=True, **kw)
        np.testing.assert_array_equal(np.asarray(pat), np.asarray(ba))

    def test_matches_bruteforce_and_xla(self, rng):
        from path_tracer_ai_tpu.core.types import triangles_from_numpy
        from tests.test_accel import random_rays, random_soup as soup

        tris = soup(rng, 600)
        accel = build_clusters(tris, cluster_size=16, super_size=4)
        o, d = random_rays(rng, 300)
        self._check(tris, accel, o, d)

    def test_dead_lanes_and_tmax(self, rng):
        from tests.test_accel import random_rays, random_soup as soup

        tris = soup(rng, 300)
        accel = build_clusters(tris, cluster_size=16)
        o, d = random_rays(rng, 256)
        tmax = rng.uniform(0.5, 15.0, 256).astype(np.float32)
        tmax[::4] = -1.0
        self._check(tris, accel, o, d, t_max=jnp.asarray(tmax))

    def test_cap_overflow_fallback(self, rng):
        """Tiny cap forces per-block overflow through the fallback while
        the Pallas sweep handles the rest — still exact."""
        from tests.test_accel import random_rays, random_soup as soup

        tris = soup(rng, 800, spread=2.0)
        accel = build_clusters(tris, cluster_size=8, super_size=4)
        o, d = random_rays(rng, 128)
        self._check(tris, accel, o, d, cap=4, tile_blocks=4)


class TestAnyHitFused:
    """any_hit_fused — the fused Pallas shadow cascade — must bit-match
    brute force and the XLA packet cascade (interpret mode on CPU).
    Occlusion is exact per ray, so every blocking/grouping choice must
    produce identical booleans."""

    def _check(self, tris, accel, o, d, t_max):
        from path_tracer_ai_tpu.accel.pallas_anyhit import any_hit_fused
        from path_tracer_ai_tpu.accel.traverse import any_hit_packets
        from path_tracer_ai_tpu.engine.intersect import any_hit

        fa = any_hit_fused(accel, o, d, 1e-3, t_max, interpret=True)
        tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                    (o.shape[0],))
        ba = any_hit(tris, o, d, 1e-3, tmax_arr)
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(ba))
        fs = any_hit_fused(accel, o, d, 1e-3, t_max, interpret=True,
                           early_skip=True)
        np.testing.assert_array_equal(np.asarray(fs), np.asarray(ba))
        # chunked kernel invocation (SMEM-bounded path) must be identical
        fc = any_hit_fused(accel, o, d, 1e-3, t_max, interpret=True,
                           kernel_chunk=8)
        np.testing.assert_array_equal(np.asarray(fc), np.asarray(ba))
        # unsorted path (live-masked block bounds) must be identical
        fn = any_hit_fused(accel, o, d, 1e-3, t_max, interpret=True,
                           sort=False, early_skip=True)
        np.testing.assert_array_equal(np.asarray(fn), np.asarray(ba))
        # sub-slab skip, alone and composed with early_skip
        fb = any_hit_fused(accel, o, d, 1e-3, t_max, interpret=True,
                           sub_skip=True)
        np.testing.assert_array_equal(np.asarray(fb), np.asarray(ba))
        fbe = any_hit_fused(accel, o, d, 1e-3, t_max, interpret=True,
                            sub_skip=True, early_skip=True)
        np.testing.assert_array_equal(np.asarray(fbe), np.asarray(ba))
        # per-ray-exact 2-level cull (round-4 lever): exact either way, so
        # occlusion is identical (the ksup=1 overflow fallback is pinned
        # at the cull level in test_accel.TestExactBlockCandidates and by
        # the packets-cascade test — interpret-mode kernels are slow, so
        # only the adoption-candidate config runs here)
        fe = any_hit_fused(accel, o, d, 1e-3, t_max, interpret=True,
                           exact_cull=16, early_skip=True, sub_skip=True)
        np.testing.assert_array_equal(np.asarray(fe), np.asarray(ba))
        if o.shape[0] % 64 == 0:
            pa = any_hit_packets(accel, o, d, 1e-3, tmax_arr,
                                 block_size=64, group_size=2)
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(pa))

    def test_matches_bruteforce_and_packets(self, rng):
        from tests.test_accel import random_rays, random_soup as soup

        tris = soup(rng, 600)
        accel = build_clusters(tris, cluster_size=16)
        o, d = random_rays(rng, 256)
        tmax = rng.uniform(0.5, 15.0, 256).astype(np.float32)
        tmax[::4] = -1.0                   # dead lanes mixed in
        self._check(tris, accel, o, d, jnp.asarray(tmax))

    def test_unaligned_wave_and_scalar_tmax(self, rng):
        """Wave size not a multiple of the block: pads internally."""
        from tests.test_accel import random_rays, random_soup as soup

        tris = soup(rng, 300)
        accel = build_clusters(tris, cluster_size=128)
        o, d = random_rays(rng, 173)
        self._check(tris, accel, o, d, 9.0)

    def test_all_dead_wave(self, rng):
        from tests.test_accel import random_rays, random_soup as soup

        tris = soup(rng, 200)
        accel = build_clusters(tris, cluster_size=64)
        o, d = random_rays(rng, 128)
        from path_tracer_ai_tpu.accel.pallas_anyhit import any_hit_fused

        fa = any_hit_fused(accel, o, d, 1e-3,
                           jnp.full((128,), -1.0, jnp.float32),
                           interpret=True)
        assert not np.asarray(fa).any()


class TestClosestFused:
    """closest_hit_fused — the fused Pallas closest cascade — must match
    brute force and be invariant to sub_skip / sort / kernel chunking
    (interpret mode on CPU)."""

    def _check(self, tris, accel, o, d, t_max):
        from path_tracer_ai_tpu.accel.pallas_closest import closest_hit_fused
        from path_tracer_ai_tpu.engine.intersect import closest_hit

        fh = closest_hit_fused(accel, o, d, 1e-3, t_max, interpret=True)
        tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                    (o.shape[0],))
        bh = closest_hit(tris, o, d, 1e-3, tmax_arr)
        m = np.asarray(bh.hit)
        np.testing.assert_array_equal(np.asarray(fh.hit), m)
        np.testing.assert_allclose(np.asarray(fh.t)[m],
                                   np.asarray(bh.t)[m], rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(fh.tri)[m],
                                      np.asarray(bh.tri)[m])
        for kw in (dict(sub_skip=False), dict(sort=False),
                   dict(kernel_chunk=8),
                   dict(sub_skip=False, sort=False),
                   # per-ray-exact cull: smaller candidate set, same
                   # per-cluster kernel arithmetic -> bitwise-equal
                   # (t, tri); the ksup=1 overflow fallback is pinned at
                   # the cull level in test_accel
                   dict(exact_cull=16)):
            fv = closest_hit_fused(accel, o, d, 1e-3, t_max,
                                   interpret=True, **kw)
            np.testing.assert_array_equal(np.asarray(fv.t),
                                          np.asarray(fh.t), err_msg=str(kw))
            np.testing.assert_array_equal(np.asarray(fv.tri),
                                          np.asarray(fh.tri),
                                          err_msg=str(kw))

    def test_matches_bruteforce(self, rng):
        from tests.test_accel import random_rays, random_soup as soup

        tris = soup(rng, 600)
        accel = build_clusters(tris, cluster_size=16)
        o, d = random_rays(rng, 256)
        tmax = rng.uniform(0.5, 15.0, 256).astype(np.float32)
        tmax[::4] = -1.0                   # dead lanes mixed in
        self._check(tris, accel, o, d, jnp.asarray(tmax))

    def test_unaligned_wave_and_scalar_tmax(self, rng):
        from tests.test_accel import random_rays, random_soup as soup

        tris = soup(rng, 300)
        accel = build_clusters(tris, cluster_size=128)
        o, d = random_rays(rng, 173)
        self._check(tris, accel, o, d, np.inf)

    def test_all_dead_wave(self, rng):
        from tests.test_accel import random_rays, random_soup as soup
        from path_tracer_ai_tpu.accel.pallas_closest import closest_hit_fused

        tris = soup(rng, 200)
        accel = build_clusters(tris, cluster_size=64)
        o, d = random_rays(rng, 128)
        fh = closest_hit_fused(accel, o, d, 1e-3,
                               jnp.full((128,), -1.0, jnp.float32),
                               interpret=True)
        assert not np.asarray(fh.hit).any()


def test_pallas_tile_sweep_matches_mt_sweep(rng):
    """Fused ctiles tile sweep (interpret mode) == the XLA dense sweep's
    per-slot results, including t_max masking, dead lanes, tri-id ties,
    and padding triangles."""
    import jax
    import jax.numpy as jnp

    from path_tracer_ai_tpu.accel import pallas_ctiles as pc
    from path_tracer_ai_tpu.accel.clusters import build_clusters
    from path_tracer_ai_tpu.accel.traverse import _mt_sweep
    from tests.test_accel import random_rays, random_soup

    tris = random_soup(rng, 300)
    accel = build_clusters(tris, cluster_size=128)
    c = accel.num_clusters

    from path_tracer_ai_tpu.accel.pallas_ctiles import GROUP

    nt, t_lanes = 2 * GROUP, 128
    n = nt * t_lanes
    o, d = random_rays(rng, n)
    tmax = rng.uniform(0.5, 20.0, n).astype(np.float32)
    tmax[::5] = -1.0                       # dead slots
    tmax = jnp.asarray(tmax)
    # cid constant within each GROUP-tile run (the builder's contract)
    tile_cid = jnp.asarray(
        np.repeat(rng.integers(0, c, nt // GROUP), GROUP), jnp.int32)

    tri_pack = pc.pack_tris(accel)
    rays_pack = pc.pack_rays_tiles(o, d, tmax, t_lanes)
    t_got, tri_got = pc.tile_sweep(tri_pack, rays_pack, tile_cid,
                                   interpret=True)

    # Reference: the XLA dense sweep at the same [nt, T, S] shape.
    ob = o.reshape(nt, t_lanes, 3)
    db = d.reshape(nt, t_lanes, 3)
    tb = tmax.reshape(nt, t_lanes)
    tt, ok = _mt_sweep(ob, db, accel.v0[tile_cid], accel.e1[tile_cid],
                       accel.e2[tile_cid], 1e-3, tb)
    tt = jnp.where(ok, tt, jnp.inf)
    t_ref = jnp.min(tt, axis=-1)
    cti = accel.tri_id[tile_cid][:, None, :]
    tri_ref = jnp.min(
        jnp.where(ok & (tt <= t_ref[..., None]), cti, np.int32(2**31 - 1)),
        axis=-1,
    )

    np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_ref),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(tri_got), np.asarray(tri_ref))

    # sub-slab skip must reproduce the unskipped kernel bit-for-bit
    t_sub, tri_sub = pc.tile_sweep(tri_pack, rays_pack, tile_cid,
                                   interpret=True, sub_skip=True)
    np.testing.assert_array_equal(np.asarray(t_sub), np.asarray(t_got))
    np.testing.assert_array_equal(np.asarray(tri_sub), np.asarray(tri_got))


def test_wavefront_render_combo_cascade_interpret(rng):
    """Full render through the round-4 adoption candidate (fused closest
    cascade + fused shadow cascade with early_skip/sub_skip, interpret
    mode) vs the production hybrid. hit/tri selection is exact, but t
    crosses a different arithmetic path (XLA CPU FMA contraction — see
    CLAUDE.md), so images compare at tolerance, not bitwise."""
    import functools

    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.camera import default_camera
    from tests.test_wavefront import room_scene

    scene = room_scene.__wrapped__()
    s = RenderSettings(width=32, height=18, samples_per_pixel=2,
                       max_bounces=3, seed=5)
    ref = wavefront.render(scene, default_camera(), s, wave_size=1 << 11,
                           block_size=64, backend="hybrid")
    occ0 = wavefront.HYBRID_OCCLUDE_KW
    cl0 = wavefront.HYBRID_CLOSEST_KW
    try:
        wavefront.HYBRID_OCCLUDE_KW = dict(
            engine="packets_fused", early_skip=True, sub_skip=True,
            interpret=True)
        wavefront.HYBRID_CLOSEST_KW = dict(
            engine="cascade_fused", interpret=True)
        wavefront.clear_executable_caches()
        img = wavefront.render(scene, default_camera(), s,
                               wave_size=1 << 11, block_size=64,
                               backend="hybrid")
        # combo_cascade_exact (round-4 candidate): the exact-union shadow
        # cull changes WHICH clusters are swept but not the occlusion
        # booleans, so the image must match the combo render bitwise.
        wavefront.HYBRID_OCCLUDE_KW = dict(
            engine="packets_fused", early_skip=True, sub_skip=True,
            exact_cull=16, interpret=True)
        wavefront.clear_executable_caches()
        img_x = wavefront.render(scene, default_camera(), s,
                                 wave_size=1 << 11, block_size=64,
                                 backend="hybrid")
    finally:
        wavefront.HYBRID_OCCLUDE_KW = occ0
        wavefront.HYBRID_CLOSEST_KW = cl0
        wavefront.clear_executable_caches()
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=5e-5)
    np.testing.assert_array_equal(np.asarray(img_x), np.asarray(img))
