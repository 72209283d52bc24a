"""Cluster accel + packet traversal: exact equivalence with brute force.

The packet traversal must be EXACT (conservative culling never drops a hit);
these tests sweep random soups and structured scenes against the
brute-force oracle backend.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from path_tracer_ai_tpu.accel.clusters import build_clusters
from path_tracer_ai_tpu.accel.morton import morton3d, morton3d_np
from path_tracer_ai_tpu.accel.traverse import any_hit_packets, closest_hit_packets
from path_tracer_ai_tpu.core.types import triangles_from_numpy
from path_tracer_ai_tpu.engine.intersect import any_hit, closest_hit


def random_soup(rng, t, spread=4.0, size=0.5):
    base = rng.uniform(-spread, spread, (t, 3)).astype(np.float32)
    v0 = base
    v1 = base + rng.uniform(-size, size, (t, 3)).astype(np.float32)
    v2 = base + rng.uniform(-size, size, (t, 3)).astype(np.float32)
    n = np.tile([[0, 1, 0]], (t, 1)).astype(np.float32)
    uv = np.zeros((t, 2), np.float32)
    return triangles_from_numpy(v0, v1, v2, n, n, n, uv, uv, uv,
                                np.zeros(t, np.int32))


def random_rays(rng, n, spread=6.0):
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestMorton:
    def test_locality(self):
        pts = np.asarray([[0, 0, 0], [0.01, 0, 0], [1, 1, 1]], np.float32)
        codes = morton3d_np(pts, np.zeros(3), np.ones(3))
        assert abs(int(codes[0]) - int(codes[1])) < abs(int(codes[0]) - int(codes[2]))

    def test_np_jnp_agree(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-2, 3, (256, 3)).astype(np.float32)
        lo, hi = pts.min(0), pts.max(0)
        a = morton3d_np(pts, lo, hi, bits=9)
        b = np.asarray(morton3d(jnp.asarray(pts), jnp.asarray(lo), jnp.asarray(hi), bits=9))
        np.testing.assert_array_equal(a, b)


class TestBuild:
    def test_every_triangle_in_exactly_one_slot(self, rng):
        tris = random_soup(rng, 333)
        accel = build_clusters(tris, cluster_size=64)
        ids = np.asarray(accel.tri_id).reshape(-1)
        real = ids[ids >= 0]
        assert sorted(real.tolist()) == list(range(333))

    def test_cluster_aabbs_contain_their_triangles(self, rng):
        tris = random_soup(rng, 200)
        accel = build_clusters(tris, cluster_size=32)
        v0 = np.asarray(accel.v0)
        e1 = np.asarray(accel.e1)
        e2 = np.asarray(accel.e2)
        ids = np.asarray(accel.tri_id)
        bmin = np.asarray(accel.bmin)
        bmax = np.asarray(accel.bmax)
        for c in range(accel.num_clusters):
            valid = ids[c] >= 0
            pts = np.concatenate([
                v0[c][valid], (v0[c] + e1[c])[valid], (v0[c] + e2[c])[valid]
            ])
            assert (pts >= bmin[c] - 1e-5).all()
            assert (pts <= bmax[c] + 1e-5).all()

    def test_padding_cannot_inflate_bounds(self):
        # single triangle far from origin; padding slots are zeros
        tris = triangles_from_numpy(
            [[10, 10, 10]], [[11, 10, 10]], [[10, 11, 10]],
            [[0, 0, 1]] * 1, [[0, 0, 1]], [[0, 0, 1]],
            [[0, 0]], [[0, 0]], [[0, 0]], [0],
        )
        accel = build_clusters(tris, cluster_size=8)
        assert np.asarray(accel.bmin)[0].min() >= 9.9


class TestTraversalExactness:
    @pytest.mark.parametrize("cluster_size,block", [(32, 64), (64, 128)])
    def test_closest_matches_bruteforce(self, rng, cluster_size, block):
        tris = random_soup(rng, 500)
        accel = build_clusters(tris, cluster_size=cluster_size)
        o, d = random_rays(rng, 256)
        ph = closest_hit_packets(accel, o, d, 1e-3, np.inf, block_size=block)
        bh = closest_hit(tris, o, d, 1e-3, np.inf)
        np.testing.assert_array_equal(np.asarray(ph.hit), np.asarray(bh.hit))
        m = np.asarray(bh.hit)
        np.testing.assert_allclose(
            np.asarray(ph.t)[m], np.asarray(bh.t)[m], rtol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(ph.tri)[m], np.asarray(bh.tri)[m])

    def test_anyhit_matches_bruteforce_per_ray_tmax(self, rng):
        tris = random_soup(rng, 400)
        accel = build_clusters(tris, cluster_size=32)
        o, d = random_rays(rng, 128)
        tmax = jnp.asarray(rng.uniform(0.3, 12.0, 128).astype(np.float32))
        pa = any_hit_packets(accel, o, d, 1e-3, tmax, block_size=64)
        ba = any_hit(tris, o, d, 1e-3, tmax)
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(ba))

    def test_dead_lanes_excluded_from_block_bounds(self, rng):
        """Mixed blocks must bound only LIVE lanes: dead lanes carry
        pinned placeholder rays (origin 0 / +x, as direct_lighting pins
        them) which, if included, widen the frustum to span the
        placeholder point — the round-2 unsorted-shadow catastrophe.
        Pins both the candidate-count property and exactness."""
        from path_tracer_ai_tpu.accel.traverse import _block_candidates

        # Geometry far from the origin so a placeholder-widened frustum
        # would sweep in extra clusters.
        tris = random_soup(rng, 400, spread=3.0)
        v0 = np.asarray(tris.v0) + np.float32(50.0)
        v1 = np.asarray(tris.v1) + np.float32(50.0)
        v2 = np.asarray(tris.v2) + np.float32(50.0)
        n = np.tile([[0, 1, 0]], (400, 1)).astype(np.float32)
        uv = np.zeros((400, 2), np.float32)
        from path_tracer_ai_tpu.core.types import triangles_from_numpy

        tris = triangles_from_numpy(v0, v0 + (v1 - v0), v0 + (v2 - v0),
                                    n, n, n, uv, uv, uv,
                                    np.zeros(400, np.int32))
        accel = build_clusters(tris, cluster_size=16)

        # One live ray aimed through the blob (strictly nonzero direction
        # components — a zero component makes the interval slab
        # conservatively unbounded on that axis regardless of this fix)
        # + 63 dead placeholder lanes.
        o = np.zeros((64, 3), np.float32)
        d = np.tile([[1.0, 0.0, 0.0]], (64, 1)).astype(np.float32)
        o[0] = [44.0, 45.0, 46.0]
        dv = np.asarray([6.0, 5.0, 4.0], np.float32)
        d[0] = dv / np.linalg.norm(dv)
        tm = np.full(64, -1.0, np.float32)
        tm[0] = 100.0

        o_blk = jnp.asarray(o)[None]
        d_blk = jnp.asarray(d)[None]
        tm_blk = jnp.asarray(tm)[None]
        _order, n_cand, _entry = _block_candidates(
            accel, o_blk, d_blk, tm_blk)
        # per-ray slab of the single live ray vs every cluster AABB
        bmin = np.asarray(accel.bmin)
        bmax = np.asarray(accel.bmax)
        t0 = (bmin - o[0]) / d[0][None]
        t1 = (bmax - o[0]) / d[0][None]
        near = np.max(np.minimum(t0, t1), axis=1)
        far = np.min(np.maximum(t0, t1), axis=1)
        exact = int(np.sum((far >= np.maximum(near, 0.0)) & (near <= 100.0)))
        # The interval slab of a SINGLE live ray degenerates to that
        # ray's exact slab; dead placeholder lanes must not widen it
        # back to ~every cluster.
        assert int(n_cand[0]) <= exact + 1, (
            int(n_cand[0]), exact, accel.num_clusters)
        assert int(n_cand[0]) < accel.num_clusters

        # exactness unchanged: the live ray's hit must match brute force
        pa = any_hit_packets(accel, jnp.asarray(o), jnp.asarray(d), 1e-3,
                             jnp.asarray(tm), block_size=64, sort=False)
        ba = any_hit(tris, jnp.asarray(o), jnp.asarray(d), 1e-3,
                     jnp.asarray(tm))
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(ba))

    def test_incoherent_rays_mixed_octants(self, rng):
        """Direction intervals spanning zero -> conservative path."""
        tris = random_soup(rng, 300)
        accel = build_clusters(tris, cluster_size=32)
        o, d = random_rays(rng, 128)
        # no sorting: blocks mix octants on purpose
        ph = closest_hit_packets(accel, o, d, 1e-3, np.inf, block_size=64, sort=False)
        bh = closest_hit(tris, o, d, 1e-3, np.inf)
        np.testing.assert_array_equal(np.asarray(ph.hit), np.asarray(bh.hit))
        m = np.asarray(bh.hit)
        np.testing.assert_allclose(np.asarray(ph.t)[m], np.asarray(bh.t)[m], rtol=1e-5)

    def test_rays_inside_geometry(self, rng):
        """Origins inside the soup's bounds (bounce-ray regime)."""
        tris = random_soup(rng, 300, spread=2.0)
        accel = build_clusters(tris, cluster_size=16)
        o = jnp.asarray(rng.uniform(-2, 2, (64, 3)).astype(np.float32))
        d = rng.standard_normal((64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        ph = closest_hit_packets(accel, o, d, 1e-3, np.inf, block_size=64)
        bh = closest_hit(tris, o, d, 1e-3, np.inf)
        np.testing.assert_array_equal(np.asarray(ph.hit), np.asarray(bh.hit))

    @pytest.mark.parametrize("block,group", [(16, 2), (32, 2), (16, 4)])
    def test_cascade_compaction_small_blocks(self, rng, block, group):
        """Regression: jitted cascade compaction corrupted results.

        The compaction step of _cascade_traverse used an in-place
        slice-permute (`a.at[:size].set(a[:size][perm])`) whose gather
        payload aliased the buffer being updated — XLA lowered it to an
        in-place update reading already-overwritten rows, silently
        corrupting the block permutation. Only manifested when block
        retirement was skewed (sorted shadow-like waves at small
        block/group sizes) and several compaction stages ran; the fix is a
        pure whole-array gather. This pins the failing shape: clumped
        surface-point origins toward point lights, 30% dead lanes, sorted.
        """
        tris = random_soup(rng, 600, spread=3.0)
        accel = build_clusters(tris, cluster_size=32)
        n = 2048
        v0 = np.asarray(tris.v0)
        pts = v0[rng.choice(len(v0), n)] + rng.standard_normal(
            (n, 3)).astype(np.float32) * 1e-3
        lights = np.asarray([[0, 5, 0], [4, 4, -4], [-4, 4, 4], [0, 6, 5]],
                            np.float32)
        lv = lights[rng.integers(0, 4, n)] - pts
        dist = np.linalg.norm(lv, axis=1)
        d = lv / np.maximum(dist, 1e-30)[:, None]
        tmax = (dist - 1e-3).astype(np.float32)
        tmax[rng.random(n) < 0.3] = -1.0
        o_j, d_j, tm_j = jnp.asarray(pts), jnp.asarray(d), jnp.asarray(tmax)
        ba = np.asarray(any_hit(tris, o_j, d_j, 1e-3, tm_j)) & (tmax >= 0)
        pa = any_hit_packets(accel, o_j, d_j, 1e-3, tm_j,
                             block_size=block, group_size=group)
        np.testing.assert_array_equal(np.asarray(pa), ba)
        ph = closest_hit_packets(accel, o_j, d_j, 1e-3, tm_j,
                                 block_size=block, group_size=group)
        bh = closest_hit(tris, o_j, d_j, 1e-3, tm_j)
        live = tmax >= 0
        np.testing.assert_array_equal(np.asarray(ph.hit)[live],
                                      np.asarray(bh.hit)[live])

    def test_shrinking_tmax_prunes_correctly(self, rng):
        """Dense planes stacked along z: nearest must win."""
        planes = []
        for z in [1.0, 2.0, 3.0, 4.0]:
            planes.append(([-5, -5, z], [5, -5, z], [0, 5, z]))
        v0 = np.asarray([p[0] for p in planes], np.float32)
        v1 = np.asarray([p[1] for p in planes], np.float32)
        v2 = np.asarray([p[2] for p in planes], np.float32)
        n = np.tile([[0, 0, -1]], (4, 1)).astype(np.float32)
        uv = np.zeros((4, 2), np.float32)
        tris = triangles_from_numpy(v0, v1, v2, n, n, n, uv, uv, uv,
                                    np.zeros(4, np.int32))
        accel = build_clusters(tris, cluster_size=2)
        o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0]), (64, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (64, 3))
        ph = closest_hit_packets(accel, o, d, 1e-3, np.inf, block_size=64)
        np.testing.assert_allclose(np.asarray(ph.t), 1.0, rtol=1e-6)


class TestPerRayTraversal:
    """Per-ray exact candidate traversal (closest_hit_perray/any_hit_perray)."""

    def test_closest_matches_bruteforce(self, rng):
        from path_tracer_ai_tpu.accel.traverse import closest_hit_perray

        tris = random_soup(rng, 400)
        accel = build_clusters(tris, cluster_size=32)
        o, d = random_rays(rng, 200)
        ph = closest_hit_perray(accel, o, d, 1e-3, np.inf)
        bh = closest_hit(tris, o, d, 1e-3, np.inf)
        np.testing.assert_array_equal(np.asarray(ph.hit), np.asarray(bh.hit))
        m = np.asarray(bh.hit)
        np.testing.assert_allclose(np.asarray(ph.t)[m], np.asarray(bh.t)[m], rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(ph.tri)[m], np.asarray(bh.tri)[m])

    def test_overflow_fallback_exact(self, rng):
        """cap=2 forces overflow on nearly every ray; the packet fallback
        must keep results exact."""
        from path_tracer_ai_tpu.accel.traverse import closest_hit_perray

        tris = random_soup(rng, 300, spread=2.0)
        accel = build_clusters(tris, cluster_size=8)  # many clusters
        o, d = random_rays(rng, 100, spread=3.0)
        ph = closest_hit_perray(accel, o, d, 1e-3, np.inf, cap=2)
        bh = closest_hit(tris, o, d, 1e-3, np.inf)
        np.testing.assert_array_equal(np.asarray(ph.hit), np.asarray(bh.hit))
        m = np.asarray(bh.hit)
        np.testing.assert_allclose(np.asarray(ph.t)[m], np.asarray(bh.t)[m], rtol=1e-5)

    def test_anyhit_matches_bruteforce(self, rng):
        from path_tracer_ai_tpu.accel.traverse import any_hit_perray

        tris = random_soup(rng, 300)
        accel = build_clusters(tris, cluster_size=16)
        o, d = random_rays(rng, 150)
        tmax = jnp.asarray(rng.uniform(0.3, 12.0, 150).astype(np.float32))
        pa = any_hit_perray(accel, o, d, 1e-3, tmax)
        ba = any_hit(tris, o, d, 1e-3, tmax)
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(ba))

    def test_coplanar_cluster_flat_aabb(self, rng):
        """A cluster whose AABB is flat along an axis (coplanar axis-aligned
        triangles, entry == exit == hit t) must NOT be culled: the slab
        bound is inclusive. Regression for the strict `hi > lo` exclusion."""
        from path_tracer_ai_tpu.accel.traverse import (
            any_hit_perray,
            closest_hit_perray,
        )

        # 64 coplanar triangles tiling the y=0 plane -> every cluster flat in y
        cells = []
        for i in range(8):
            for j in range(8):
                x, z = i - 4.0, j - 4.0
                cells.append(([x, 0, z], [x + 1, 0, z], [x, 0, z + 1]))
        v0 = np.asarray([c[0] for c in cells], np.float32)
        v1 = np.asarray([c[1] for c in cells], np.float32)
        v2 = np.asarray([c[2] for c in cells], np.float32)
        n = np.tile([[0, 1, 0]], (64, 1)).astype(np.float32)
        uv = np.zeros((64, 2), np.float32)
        tris = triangles_from_numpy(v0, v1, v2, n, n, n, uv, uv, uv,
                                    np.zeros(64, np.int32))
        accel = build_clusters(tris, cluster_size=16)
        assert (np.asarray(accel.bmax)[:, 1] == np.asarray(accel.bmin)[:, 1]).all()

        o = jnp.asarray(rng.uniform(-3.5, 3.5, (64, 3)).astype(np.float32))
        o = o.at[:, 1].set(2.0)
        d = rng.standard_normal((64, 3)).astype(np.float32)
        d[:, 1] = -np.abs(d[:, 1]) - 0.5  # downward: all rays cross y=0
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)

        bh = closest_hit(tris, o, d, 1e-3, np.inf)
        # half-covered floor (one tri per cell): expect roughly half the rays
        assert np.asarray(bh.hit).sum() > 16
        ph = closest_hit_perray(accel, o, d, 1e-3, np.inf)
        np.testing.assert_array_equal(np.asarray(ph.hit), np.asarray(bh.hit))
        m = np.asarray(bh.hit)
        np.testing.assert_allclose(np.asarray(ph.t)[m], np.asarray(bh.t)[m],
                                   rtol=1e-5)
        pa = any_hit_perray(accel, o, d, 1e-3, jnp.full((64,), np.inf))
        ba = any_hit(tris, o, d, 1e-3, np.inf)
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(ba))

    def test_tmin_respected(self, rng):
        """t_min below RAY_TMIN must not cull clusters intersected only in
        [t_min, RAY_TMIN) (regression for the hardcoded slab lower bound)."""
        from path_tracer_ai_tpu.accel.traverse import closest_hit_perray

        tris = random_soup(rng, 100, spread=1.0, size=0.3)
        accel = build_clusters(tris, cluster_size=8)
        # origins ON the soup: hits can land inside [1e-5, 1e-3)
        o = jnp.asarray(np.asarray(tris.v0)[:64] + 1e-4)
        _, d = random_rays(rng, 64)
        ph = closest_hit_perray(accel, o, d, 1e-5, np.inf)
        bh = closest_hit(tris, o, d, 1e-5, np.inf)
        np.testing.assert_array_equal(np.asarray(ph.hit), np.asarray(bh.hit))
        m = np.asarray(bh.hit)
        np.testing.assert_allclose(np.asarray(ph.t)[m], np.asarray(bh.t)[m],
                                   rtol=1e-5)

    def test_dead_rays(self, rng):
        from path_tracer_ai_tpu.accel.traverse import closest_hit_perray

        tris = random_soup(rng, 200)
        accel = build_clusters(tris, cluster_size=16)
        o, d = random_rays(rng, 64)
        tmax = np.full(64, np.inf, np.float32)
        tmax[::2] = -1.0
        ph = closest_hit_perray(accel, o, d, 1e-3, jnp.asarray(tmax))
        assert not np.asarray(ph.hit)[::2].any()


class TestPairTraversal:
    """Cluster-major pair-tile traversal (accel.pairs): exact vs brute force."""

    def _check_closest(self, tris, accel, o, d, t_max=np.inf, **kw):
        from path_tracer_ai_tpu.accel.pairs import closest_hit_pairs

        ph = closest_hit_pairs(accel, o, d, 1e-3, t_max, **kw)
        bh = closest_hit(tris, o, d, 1e-3, t_max)
        np.testing.assert_array_equal(np.asarray(ph.hit), np.asarray(bh.hit))
        m = np.asarray(bh.hit)
        np.testing.assert_allclose(np.asarray(ph.t)[m], np.asarray(bh.t)[m],
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(ph.tri)[m],
                                      np.asarray(bh.tri)[m])

    def test_closest_matches_bruteforce(self, rng):
        tris = random_soup(rng, 500)
        accel = build_clusters(tris, cluster_size=32)
        o, d = random_rays(rng, 300)
        self._check_closest(tris, accel, o, d)

    def test_small_tiles_many_chunk_boundaries(self, rng):
        tris = random_soup(rng, 300)
        accel = build_clusters(tris, cluster_size=16)
        o, d = random_rays(rng, 200)
        self._check_closest(tris, accel, o, d, tile_rays=8, tile_chunk=2,
                            row_chunk=64)

    def test_candidate_cap_overflow_fallback(self, rng):
        tris = random_soup(rng, 300, spread=2.0)
        accel = build_clusters(tris, cluster_size=8)  # many clusters
        o, d = random_rays(rng, 100, spread=3.0)
        self._check_closest(tris, accel, o, d, cap=2)

    def test_pair_budget_overflow_fallback(self, rng):
        tris = random_soup(rng, 400, spread=2.0)
        accel = build_clusters(tris, cluster_size=8)
        o, d = random_rays(rng, 128, spread=3.0)
        # budget of 1 pair/ray on a dense scene: most rays over budget
        self._check_closest(tris, accel, o, d, pair_budget=1, tile_chunk=4)

    def test_anyhit_matches_bruteforce(self, rng):
        from path_tracer_ai_tpu.accel.pairs import any_hit_pairs

        tris = random_soup(rng, 300)
        accel = build_clusters(tris, cluster_size=16)
        o, d = random_rays(rng, 150)
        tmax = jnp.asarray(rng.uniform(0.3, 12.0, 150).astype(np.float32))
        pa = any_hit_pairs(accel, o, d, 1e-3, tmax)
        ba = any_hit(tris, o, d, 1e-3, tmax)
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(ba))

    def test_coplanar_cluster_flat_aabb(self, rng):
        cells = []
        for i in range(8):
            for j in range(8):
                x, z = i - 4.0, j - 4.0
                cells.append(([x, 0, z], [x + 1, 0, z], [x, 0, z + 1]))
        v0 = np.asarray([c[0] for c in cells], np.float32)
        v1 = np.asarray([c[1] for c in cells], np.float32)
        v2 = np.asarray([c[2] for c in cells], np.float32)
        n = np.tile([[0, 1, 0]], (64, 1)).astype(np.float32)
        uv = np.zeros((64, 2), np.float32)
        tris = triangles_from_numpy(v0, v1, v2, n, n, n, uv, uv, uv,
                                    np.zeros(64, np.int32))
        accel = build_clusters(tris, cluster_size=16)
        o = jnp.asarray(rng.uniform(-3.5, 3.5, (64, 3)).astype(np.float32))
        o = o.at[:, 1].set(2.0)
        d = rng.standard_normal((64, 3)).astype(np.float32)
        d[:, 1] = -np.abs(d[:, 1]) - 0.5
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        self._check_closest(tris, accel, o, jnp.asarray(d))

    def test_dead_rays_produce_no_pairs(self, rng):
        from path_tracer_ai_tpu.accel.pairs import (
            build_pair_tables,
            closest_hit_pairs,
        )

        tris = random_soup(rng, 200)
        accel = build_clusters(tris, cluster_size=16)
        o, d = random_rays(rng, 64)
        tmax = np.full(64, np.inf, np.float32)
        tmax[::2] = -1.0
        ph = closest_hit_pairs(accel, o, d, 1e-3, jnp.asarray(tmax))
        assert not np.asarray(ph.hit)[::2].any()
        tables = build_pair_tables(accel, o, d, 1e-3, jnp.asarray(tmax))
        assert (np.asarray(tables.n_cand)[::2] == 0).all()
        # live lanes must still match brute force
        bh = closest_hit(tris, o, d, 1e-3, jnp.asarray(tmax))
        np.testing.assert_array_equal(np.asarray(ph.hit)[1::2],
                                      np.asarray(bh.hit)[1::2])

    def test_per_ray_tmax(self, rng):
        tris = random_soup(rng, 400)
        accel = build_clusters(tris, cluster_size=32)
        o, d = random_rays(rng, 128)
        tmax = jnp.asarray(rng.uniform(0.3, 12.0, 128).astype(np.float32))
        self._check_closest(tris, accel, o, d, t_max=tmax)

    def test_pair_table_invariants(self, rng):
        """Every non-overflow ray's (ray, cluster) pairs land in the right
        cluster segment exactly once."""
        from path_tracer_ai_tpu.accel.pairs import build_pair_tables

        tris = random_soup(rng, 300)
        accel = build_clusters(tris, cluster_size=32)
        o, d = random_rays(rng, 100)
        tmax = jnp.full((100,), np.inf, jnp.float32)
        tb = build_pair_tables(accel, o, d, 1e-3, tmax, tile_rays=8)
        pair_ray = np.asarray(tb.pair_ray)
        dst = np.asarray(tb.dst)
        n_cand = np.asarray(tb.n_cand)
        overflow = np.asarray(tb.overflow)
        tile_cluster = np.asarray(tb.tile_cluster)
        for r in range(100):
            if overflow[r]:
                continue
            for k in range(n_cand[r]):
                p = dst[r, k]
                assert pair_ray[p] == r
        # each live pair slot's tile cluster must really list that cluster
        bmin = np.asarray(accel.bmin)
        bmax = np.asarray(accel.bmax)
        on = np.asarray(o)
        dn = np.asarray(d)
        for p in np.nonzero(pair_ray >= 0)[0][:200]:
            r = pair_ray[p]
            cl = tile_cluster[p // 8]
            # slab re-check in numpy: ray r must intersect cluster cl's AABB
            inv = 1.0 / dn[r]
            t0 = (bmin[cl] - on[r]) * inv
            t1 = (bmax[cl] - on[r]) * inv
            lo = max(np.minimum(t0, t1).max(), 1e-3)
            hi = np.maximum(t0, t1).min()
            assert hi >= lo - 1e-4


class TestCtilesTraversal:
    """Cluster-major tile traversal (accel.ctiles): exact vs brute force."""

    def _check(self, tris, accel, o, d, t_max=np.inf, **kw):
        from path_tracer_ai_tpu.accel.ctiles import (
            any_hit_ctiles,
            closest_hit_ctiles,
        )

        kw.setdefault("row_chunk", 32)
        kw.setdefault("tile_chunk", 4)
        ph = closest_hit_ctiles(accel, o, d, 1e-3, t_max, **kw)
        bh = closest_hit(tris, o, d, 1e-3, t_max)
        np.testing.assert_array_equal(np.asarray(ph.hit), np.asarray(bh.hit))
        m = np.asarray(bh.hit)
        np.testing.assert_allclose(np.asarray(ph.t)[m], np.asarray(bh.t)[m],
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(ph.tri)[m],
                                      np.asarray(bh.tri)[m])
        tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                    (o.shape[0],))
        pa = any_hit_ctiles(accel, o, d, 1e-3, tmax_arr, **kw)
        ba = any_hit(tris, o, d, 1e-3, tmax_arr)
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(ba))

    def test_matches_bruteforce(self, rng):
        tris = random_soup(rng, 600)
        accel = build_clusters(tris, cluster_size=16, super_size=4)
        o, d = random_rays(rng, 300)
        self._check(tris, accel, o, d)

    def test_small_blocks_and_tiles(self, rng):
        tris = random_soup(rng, 300)
        accel = build_clusters(tris, cluster_size=16)
        o, d = random_rays(rng, 200)
        self._check(tris, accel, o, d, block=4, tile_blocks=8)

    def test_per_ray_pairs_block1(self, rng):
        """block=1: pure per-ray-exact pair scheduling (peel extraction)."""
        tris = random_soup(rng, 500)
        accel = build_clusters(tris, cluster_size=16)
        o, d = random_rays(rng, 192)
        self._check(tris, accel, o, d, block=1, cap=24, tile_blocks=64)

    def test_cap_overflow_fallback(self, rng):
        tris = random_soup(rng, 800, spread=2.0)
        accel = build_clusters(tris, cluster_size=8, super_size=4)
        o, d = random_rays(rng, 128, spread=3.0)
        self._check(tris, accel, o, d, cap=4)

    def test_pair_split(self, rng):
        """Opt-in split pair domain: head columns + compacted tail blocks.

        pair_split=2 routes most unions through the tail gather;
        pair_split=1 on a crowded soup overflows the nb//8 tail budget,
        exercising the budget->fallback path. Both must stay exact, and
        hit/tri must match the unsplit build exactly (t at tolerance:
        the CPU fusion-context FMA caveat, docs/ARCHITECTURE.md)."""
        from path_tracer_ai_tpu.accel.ctiles import closest_hit_ctiles

        tris = random_soup(rng, 600, spread=2.0)
        accel = build_clusters(tris, cluster_size=16, super_size=4)
        o, d = random_rays(rng, 256)
        for h in (1, 2):
            self._check(tris, accel, o, d, pair_split=h)
        kw = dict(row_chunk=32, tile_chunk=4)
        h0 = closest_hit_ctiles(accel, o, d, 1e-3, np.inf, **kw)
        h1 = closest_hit_ctiles(accel, o, d, 1e-3, np.inf, pair_split=2,
                                **kw)
        np.testing.assert_array_equal(np.asarray(h0.hit),
                                      np.asarray(h1.hit))
        np.testing.assert_array_equal(np.asarray(h0.tri),
                                      np.asarray(h1.tri))

    def test_budget_overflow_fallback(self, rng):
        tris = random_soup(rng, 600, spread=2.0)
        accel = build_clusters(tris, cluster_size=8, super_size=4)
        o, d = random_rays(rng, 128, spread=3.0)
        self._check(tris, accel, o, d, cap=8)

    def test_per_ray_tmax_and_dead_lanes(self, rng):
        tris = random_soup(rng, 400)
        accel = build_clusters(tris, cluster_size=16, super_size=4)
        o, d = random_rays(rng, 256)
        tmax = rng.uniform(0.3, 12.0, 256).astype(np.float32)
        tmax[::3] = -1.0
        self._check(tris, accel, o, d, t_max=jnp.asarray(tmax))

    def test_unsorted_and_sort_modes(self, rng):
        tris = random_soup(rng, 300)
        accel = build_clusters(tris, cluster_size=16)
        o, d = random_rays(rng, 128)
        self._check(tris, accel, o, d, sort=False)
        self._check(tris, accel, o, d, sort_mode="dir")

    def test_2level_cull_matches_bruteforce(self, rng):
        """levels=2: supercluster shortlist + per-ray child slab — exact."""
        tris = random_soup(rng, 900)
        accel = build_clusters(tris, cluster_size=8, super_size=4)
        o, d = random_rays(rng, 256)
        self._check(tris, accel, o, d, levels=2, super_cap=16, cap=32)

    def test_2level_cull_dead_lanes_and_overflow(self, rng):
        """levels=2 with tight super_cap: overflow blocks complete exactly
        via the fallback; dead lanes stay dead."""
        tris = random_soup(rng, 700, spread=2.0)
        accel = build_clusters(tris, cluster_size=8, super_size=4)
        o, d = random_rays(rng, 192, spread=3.0)
        tmax = rng.uniform(0.3, 12.0, 192).astype(np.float32)
        tmax[::5] = -1.0
        self._check(tris, accel, o, d, t_max=jnp.asarray(tmax),
                    levels=2, super_cap=4, cap=16)

    def test_fallback_sorted_matches_bitwise(self, rng):
        """fallback_sorted=True (overflow completion merged in the sorted
        domain before the unsort — round-5 outro lever) must be bit-identical
        to the default wave-domain fallback, including on waves that
        actually overflow (tight cap) and on dead lanes."""
        from path_tracer_ai_tpu.accel.ctiles import (
            any_hit_ctiles,
            closest_hit_ctiles,
        )

        tris = random_soup(rng, 800, spread=2.0)
        accel = build_clusters(tris, cluster_size=8, super_size=4)
        o, d = random_rays(rng, 192, spread=3.0)
        tmax = rng.uniform(0.3, 12.0, 192).astype(np.float32)
        tmax[::5] = -1.0
        tmax = jnp.asarray(tmax)
        for kw in (
            dict(cap=4),                      # heavy overflow
            dict(cap=48),                     # no overflow (production-like)
            dict(cap=4, sort=False),          # perm=None path
            dict(cap=8, levels=2, super_cap=4),
        ):
            kw.update(row_chunk=32, tile_chunk=4)
            h0 = closest_hit_ctiles(accel, o, d, 1e-3, tmax, **kw)
            h1 = closest_hit_ctiles(accel, o, d, 1e-3, tmax,
                                    fallback_sorted=True, **kw)
            np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(h1.t))
            np.testing.assert_array_equal(np.asarray(h0.tri),
                                          np.asarray(h1.tri))
            a0 = any_hit_ctiles(accel, o, d, 1e-3, tmax, **kw)
            a1 = any_hit_ctiles(accel, o, d, 1e-3, tmax,
                                fallback_sorted=True, **kw)
            np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
        # and exact vs brute force with the flag on
        self._check(tris, accel, o, d, t_max=tmax, cap=4,
                    fallback_sorted=True)

    def test_2level_matches_flat_bitwise(self, rng):
        """levels=2 must produce the same candidate coverage as the flat
        cull — (t, tri) outputs bit-identical on non-overflow rays."""
        from path_tracer_ai_tpu.accel.ctiles import closest_hit_ctiles

        tris = random_soup(rng, 600)
        accel = build_clusters(tris, cluster_size=16, super_size=4)
        o, d = random_rays(rng, 256)
        kw = dict(row_chunk=32, tile_chunk=4, cap=48)
        h1 = closest_hit_ctiles(accel, o, d, 1e-3, np.inf, levels=1, **kw)
        h2 = closest_hit_ctiles(accel, o, d, 1e-3, np.inf, levels=2,
                                super_cap=accel.num_supers, **kw)
        np.testing.assert_array_equal(np.asarray(h1.t), np.asarray(h2.t))
        np.testing.assert_array_equal(np.asarray(h1.tri), np.asarray(h2.tri))

    def test_2level_no_phantom_candidates(self, rng):
        """Padding slots in a partially-filled last super hold INVERTED
        boxes; the level-2 slab must FAIL them (regression: the min/max
        near-far form treated them as near-infinite boxes, inflating
        n_cand by up to super_size-1 phantoms per shortlisted block and
        spuriously overflowing cap)."""
        from path_tracer_ai_tpu.accel.ctiles import (
            _block_candidates_2level, _ray_masks)

        tris = random_soup(rng, 500)
        # 500 tris / 8 = 63 clusters; super_size 4 -> last super holds 3.
        accel = build_clusters(tris, cluster_size=8, super_size=4)
        assert accel.num_clusters % accel.super_size != 0
        o, d = random_rays(rng, 256)
        b = 8
        o_blk = o.reshape(-1, b, 3)
        d_blk = d.reshape(-1, b, 3)
        tm_blk = jnp.full(o_blk.shape[:2], jnp.inf, jnp.float32)
        _, n_flat = _ray_masks(accel, o_blk, d_blk, tm_blk, 1e-3,
                               row_chunk=8)
        order, n_2l, over = _block_candidates_2level(
            accel, o_blk, d_blk, tm_blk, 1e-3, cap=accel.num_clusters,
            row_chunk=8, super_cap=accel.num_supers)
        assert not np.asarray(over).any()
        np.testing.assert_array_equal(np.asarray(n_2l), np.asarray(n_flat))

    def test_coplanar_cluster_flat_aabb(self, rng):
        cells = []
        for i in range(8):
            for j in range(8):
                x, z = i - 4.0, j - 4.0
                cells.append(([x, 0, z], [x + 1, 0, z], [x, 0, z + 1]))
        v0 = np.asarray([c[0] for c in cells], np.float32)
        v1 = np.asarray([c[1] for c in cells], np.float32)
        v2 = np.asarray([c[2] for c in cells], np.float32)
        nrm = np.tile([[0, 1, 0]], (64, 1)).astype(np.float32)
        uv = np.zeros((64, 2), np.float32)
        tris = triangles_from_numpy(v0, v1, v2, nrm, nrm, nrm, uv, uv, uv,
                                    np.zeros(64, np.int32))
        accel = build_clusters(tris, cluster_size=16, super_size=2)
        o = jnp.asarray(rng.uniform(-3.5, 3.5, (64, 3)).astype(np.float32))
        o = o.at[:, 1].set(2.0)
        d = rng.standard_normal((64, 3)).astype(np.float32)
        d[:, 1] = -np.abs(d[:, 1]) - 0.5
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        self._check(tris, accel, o, jnp.asarray(d))


class TestExactBlockCandidates:
    """traverse._exact_block_candidates (round-4 shadow-cull lever): the
    per-ray-exact 2-level OR-union must cover every cluster any live lane
    can hit (coverage == exactness), equal the flat per-ray union when the
    super shortlist fits, and fall back to the conservative list on
    shortlist overflow."""

    def _waves(self, rng, n=512, b=64):
        o, d = random_rays(rng, n)
        tm = rng.uniform(0.5, 20.0, n).astype(np.float32)
        tm[::5] = -1.0                       # mixed dead lanes
        return (o.reshape(-1, b, 3), d.reshape(-1, b, 3),
                jnp.asarray(tm).reshape(-1, b))

    def test_matches_flat_perray_union(self, rng):
        from path_tracer_ai_tpu.accel.ctiles import _ray_masks
        from path_tracer_ai_tpu.accel.traverse import (
            _exact_block_candidates)

        tris = random_soup(rng, 500)
        # 63 clusters, super_size 4 -> last super partially filled, so the
        # inverted padding-box hazard is in play.
        accel = build_clusters(tris, cluster_size=8, super_size=4)
        assert accel.num_clusters % accel.super_size != 0
        o_blk, d_blk, tm_blk = self._waves(rng)
        cand_true, n_true = _ray_masks(accel, o_blk, d_blk, tm_blk, 1e-3,
                                       row_chunk=8)
        order, n_cand, entry = _exact_block_candidates(
            accel, o_blk, d_blk, tm_blk, 1e-3, ksup=accel.num_supers,
            row_chunk=4)
        np.testing.assert_array_equal(np.asarray(n_cand),
                                      np.asarray(n_true))
        # entry ordering: finite ascending within each block's candidates
        entry = np.asarray(entry)
        for i in range(entry.shape[0]):
            e = entry[i, : int(n_cand[i])]
            assert np.isfinite(e).all()
            assert (np.diff(e) >= 0).all()
        cand_true = np.asarray(cand_true)
        order = np.asarray(order)
        for i in range(order.shape[0]):
            got = set(order[i, : int(n_cand[i])].tolist())
            assert got == set(np.flatnonzero(cand_true[i]).tolist())

    def test_overflow_falls_back_conservative(self, rng):
        from path_tracer_ai_tpu.accel.ctiles import _ray_masks
        from path_tracer_ai_tpu.accel.traverse import (
            _block_candidates, _exact_block_candidates)

        tris = random_soup(rng, 600, spread=2.0)
        accel = build_clusters(tris, cluster_size=8, super_size=4)
        o_blk, d_blk, tm_blk = self._waves(rng)
        order, n_cand, _entry = _exact_block_candidates(
            accel, o_blk, d_blk, tm_blk, 1e-3, ksup=1, row_chunk=4)
        order_c, n_c, _e = _block_candidates(accel, o_blk, d_blk, tm_blk)
        cand_true, _ = _ray_masks(accel, o_blk, d_blk, tm_blk, 1e-3,
                                  row_chunk=8)
        order, n_cand = np.asarray(order), np.asarray(n_cand)
        order_c, n_c = np.asarray(order_c), np.asarray(n_c)
        cand_true = np.asarray(cand_true)
        overflowed = 0
        for i in range(order.shape[0]):
            got = set(order[i, : n_cand[i]].tolist())
            # coverage: never excludes a reachable cluster
            assert set(np.flatnonzero(cand_true[i]).tolist()) <= got
            if n_cand[i] == n_c[i] and n_cand[i] > 0:
                overflowed += 1
                assert got == set(order_c[i, : n_c[i]].tolist())
        assert overflowed > 0   # ksup=1 must actually exercise the fallback

    def test_live_blocks_prefix_matches_unbounded(self, rng):
        """Sorted dead-last waves: bounding the per-lane stages by the
        live-block prefix must reproduce the unbounded cull exactly
        (dead-tail blocks keep n_cand = 0)."""
        from path_tracer_ai_tpu.accel.traverse import (
            _exact_block_candidates)

        tris = random_soup(rng, 500)
        accel = build_clusters(tris, cluster_size=8, super_size=4)
        o, d = random_rays(rng, 512)
        tm = rng.uniform(0.5, 20.0, 512).astype(np.float32)
        tm[200:] = -1.0                      # dead tail (sorted dead-last)
        b = 64
        o_blk = o.reshape(-1, b, 3)
        d_blk = d.reshape(-1, b, 3)
        tm_blk = jnp.asarray(tm).reshape(-1, b)
        lv = jnp.sum(jnp.any(tm_blk >= 0.0, axis=1)).astype(jnp.int32)
        # row_chunk 2: the live prefix ends mid-array, exercising both
        # skipped chunks and a partially-live one
        a1 = _exact_block_candidates(accel, o_blk, d_blk, tm_blk, 1e-3,
                                     ksup=4, row_chunk=2)
        a2 = _exact_block_candidates(accel, o_blk, d_blk, tm_blk, 1e-3,
                                     ksup=4, row_chunk=2, live_blocks=lv)
        np.testing.assert_array_equal(np.asarray(a1[1]), np.asarray(a2[1]))
        n_cand = np.asarray(a1[1])
        for i in range(o_blk.shape[0]):
            np.testing.assert_array_equal(
                np.asarray(a1[0])[i, : n_cand[i]],
                np.asarray(a2[0])[i, : n_cand[i]])

    def test_anyhit_packets_exact_cull(self, rng):
        """The XLA packet cascade with exact_cull must bit-match brute
        force and the conservative-cull cascade (occlusion is exact under
        any candidate superset)."""
        from path_tracer_ai_tpu.accel.traverse import any_hit_packets
        from path_tracer_ai_tpu.engine.intersect import any_hit

        tris = random_soup(rng, 600)
        accel = build_clusters(tris, cluster_size=16, super_size=4)
        o, d = random_rays(rng, 512)
        tm = rng.uniform(0.5, 15.0, 512).astype(np.float32)
        tm[::5] = -1.0
        tm = jnp.asarray(tm)
        ba = any_hit(tris, o, d, 1e-3, tm)
        for kw in (dict(exact_cull=16), dict(exact_cull=1),
                   dict(exact_cull=16, sort=False, group_size=2,
                        block_size=64)):
            pa = any_hit_packets(accel, o, d, 1e-3, tm, **kw)
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(ba),
                                          err_msg=str(kw))


class TestKslotsTraversal:
    """Per-ray K-slot traversal (accel.kslots): exact vs brute force."""

    def _check(self, tris, accel, o, d, t_max=np.inf, **kw):
        from path_tracer_ai_tpu.accel.kslots import (
            any_hit_kslots,
            closest_hit_kslots,
        )

        ph = closest_hit_kslots(accel, o, d, 1e-3, t_max, **kw)
        bh = closest_hit(tris, o, d, 1e-3, t_max)
        np.testing.assert_array_equal(np.asarray(ph.hit), np.asarray(bh.hit))
        m = np.asarray(bh.hit)
        np.testing.assert_allclose(np.asarray(ph.t)[m], np.asarray(bh.t)[m],
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(ph.tri)[m],
                                      np.asarray(bh.tri)[m])
        tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                    (o.shape[0],))
        pa = any_hit_kslots(accel, o, d, 1e-3, tmax_arr, **kw)
        ba = any_hit(tris, o, d, 1e-3, tmax_arr)
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(ba))

    def test_matches_bruteforce(self, rng):
        tris = random_soup(rng, 600)
        accel = build_clusters(tris, cluster_size=16, super_size=4)
        o, d = random_rays(rng, 300)
        self._check(tris, accel, o, d)

    def test_flat_level_matches(self, rng):
        tris = random_soup(rng, 300)
        accel = build_clusters(tris, cluster_size=16)
        o, d = random_rays(rng, 200)
        self._check(tris, accel, o, d, levels=1, row_chunk=64)

    def test_super_overflow_fallback(self, rng):
        tris = random_soup(rng, 800, spread=2.0)
        accel = build_clusters(tris, cluster_size=8, super_size=4)
        o, d = random_rays(rng, 128, spread=3.0)
        self._check(tris, accel, o, d, k_supers=2, k_clusters=6)

    def test_cluster_overflow_fallback(self, rng):
        tris = random_soup(rng, 600, spread=2.0)
        accel = build_clusters(tris, cluster_size=8, super_size=4)
        o, d = random_rays(rng, 128, spread=3.0)
        self._check(tris, accel, o, d, k_supers=16, k_clusters=2)

    def test_per_ray_tmax_and_dead_lanes(self, rng):
        tris = random_soup(rng, 400)
        accel = build_clusters(tris, cluster_size=16, super_size=4)
        o, d = random_rays(rng, 256)
        tmax = rng.uniform(0.3, 12.0, 256).astype(np.float32)
        tmax[::3] = -1.0
        self._check(tris, accel, o, d, t_max=jnp.asarray(tmax))

    def test_axis_parallel_rays_on_slab_planes(self, rng):
        """Origin exactly on an AABB plane with an axis-parallel ray makes
        0 * inf NaNs in the slab test; they must stay conservative."""
        cells = []
        for i in range(4):
            for j in range(4):
                x, z = float(i), float(j)
                cells.append(([x, 0, z], [x + 1, 0, z], [x, 0, z + 1]))
        v0 = np.asarray([c[0] for c in cells], np.float32)
        v1 = np.asarray([c[1] for c in cells], np.float32)
        v2 = np.asarray([c[2] for c in cells], np.float32)
        nrm = np.tile([[0, 1, 0]], (16, 1)).astype(np.float32)
        uv = np.zeros((16, 2), np.float32)
        tris = triangles_from_numpy(v0, v1, v2, nrm, nrm, nrm, uv, uv, uv,
                                    np.zeros(16, np.int32))
        accel = build_clusters(tris, cluster_size=4, super_size=2)
        o = np.asarray([[0.0, 1.0, 0.5], [2.0, 1.0, 1.5], [0.5, 1.0, 0.0]],
                       np.float32)
        d = np.asarray([[0, -1, 0], [0, -1, 0], [0, -1, 0]], np.float32)
        self._check(tris, accel, jnp.asarray(o), jnp.asarray(d))

    def test_coplanar_cluster_flat_aabb(self, rng):
        cells = []
        for i in range(8):
            for j in range(8):
                x, z = i - 4.0, j - 4.0
                cells.append(([x, 0, z], [x + 1, 0, z], [x, 0, z + 1]))
        v0 = np.asarray([c[0] for c in cells], np.float32)
        v1 = np.asarray([c[1] for c in cells], np.float32)
        v2 = np.asarray([c[2] for c in cells], np.float32)
        nrm = np.tile([[0, 1, 0]], (64, 1)).astype(np.float32)
        uv = np.zeros((64, 2), np.float32)
        tris = triangles_from_numpy(v0, v1, v2, nrm, nrm, nrm, uv, uv, uv,
                                    np.zeros(64, np.int32))
        accel = build_clusters(tris, cluster_size=16, super_size=2)
        o = jnp.asarray(rng.uniform(-3.5, 3.5, (64, 3)).astype(np.float32))
        o = o.at[:, 1].set(2.0)
        d = rng.standard_normal((64, 3)).astype(np.float32)
        d[:, 1] = -np.abs(d[:, 1]) - 0.5
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        self._check(tris, accel, o, jnp.asarray(d))

    def test_peel_k_extracts_lowest_bits(self, rng):
        from path_tracer_ai_tpu.accel.kslots import _pack_bits, _peel_k

        cand = rng.random((50, 77)) < 0.15
        words = _pack_bits(jnp.asarray(cand))
        got = np.asarray(_peel_k(words, 8, 77))
        for i in range(50):
            want = np.nonzero(cand[i])[0][:8]
            want = np.concatenate([want, np.full(8 - want.size, 77)])
            np.testing.assert_array_equal(got[i], want.astype(np.int32))


class TestWorklistTraversal:
    """Block-major work-list traversal (accel.worklist): exact vs brute force."""

    def _check_closest(self, tris, accel, o, d, t_max=np.inf, **kw):
        from path_tracer_ai_tpu.accel.worklist import closest_hit_worklist

        ph = closest_hit_worklist(accel, o, d, 1e-3, t_max, **kw)
        bh = closest_hit(tris, o, d, 1e-3, t_max)
        np.testing.assert_array_equal(np.asarray(ph.hit), np.asarray(bh.hit))
        m = np.asarray(bh.hit)
        np.testing.assert_allclose(np.asarray(ph.t)[m], np.asarray(bh.t)[m],
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(ph.tri)[m],
                                      np.asarray(bh.tri)[m])

    def test_closest_matches_bruteforce(self, rng):
        tris = random_soup(rng, 500)
        accel = build_clusters(tris, cluster_size=32)
        o, d = random_rays(rng, 300)
        self._check_closest(tris, accel, o, d)

    def test_unsorted_and_small_chunks(self, rng):
        tris = random_soup(rng, 300)
        accel = build_clusters(tris, cluster_size=16)
        o, d = random_rays(rng, 200)
        self._check_closest(tris, accel, o, d, sort=False, block=4, group=2,
                            item_chunk=8, row_chunk=16)

    def test_cap_overflow_fallback(self, rng):
        tris = random_soup(rng, 300, spread=2.0)
        accel = build_clusters(tris, cluster_size=8)
        o, d = random_rays(rng, 100, spread=3.0)
        self._check_closest(tris, accel, o, d, cap=4)

    def test_item_budget_overflow_fallback(self, rng):
        tris = random_soup(rng, 400, spread=2.0)
        accel = build_clusters(tris, cluster_size=8)
        o, d = random_rays(rng, 128, spread=3.0)
        self._check_closest(tris, accel, o, d, item_budget=1, item_chunk=8)

    def test_anyhit_matches_bruteforce(self, rng):
        from path_tracer_ai_tpu.accel.worklist import any_hit_worklist

        tris = random_soup(rng, 300)
        accel = build_clusters(tris, cluster_size=16)
        o, d = random_rays(rng, 150)
        tmax = jnp.asarray(rng.uniform(0.3, 12.0, 150).astype(np.float32))
        pa = any_hit_worklist(accel, o, d, 1e-3, tmax)
        ba = any_hit(tris, o, d, 1e-3, tmax)
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(ba))

    def test_coplanar_cluster_flat_aabb(self, rng):
        cells = []
        for i in range(8):
            for j in range(8):
                x, z = i - 4.0, j - 4.0
                cells.append(([x, 0, z], [x + 1, 0, z], [x, 0, z + 1]))
        v0 = np.asarray([c[0] for c in cells], np.float32)
        v1 = np.asarray([c[1] for c in cells], np.float32)
        v2 = np.asarray([c[2] for c in cells], np.float32)
        n = np.tile([[0, 1, 0]], (64, 1)).astype(np.float32)
        uv = np.zeros((64, 2), np.float32)
        tris = triangles_from_numpy(v0, v1, v2, n, n, n, uv, uv, uv,
                                    np.zeros(64, np.int32))
        accel = build_clusters(tris, cluster_size=16)
        o = jnp.asarray(rng.uniform(-3.5, 3.5, (64, 3)).astype(np.float32))
        o = o.at[:, 1].set(2.0)
        d = rng.standard_normal((64, 3)).astype(np.float32)
        d[:, 1] = -np.abs(d[:, 1]) - 0.5
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        self._check_closest(tris, accel, o, jnp.asarray(d))

    def test_dead_rays(self, rng):
        from path_tracer_ai_tpu.accel.worklist import closest_hit_worklist

        tris = random_soup(rng, 200)
        accel = build_clusters(tris, cluster_size=16)
        o, d = random_rays(rng, 64)
        tmax = np.full(64, np.inf, np.float32)
        tmax[::2] = -1.0
        ph = closest_hit_worklist(accel, o, d, 1e-3, jnp.asarray(tmax))
        assert not np.asarray(ph.hit)[::2].any()
        bh = closest_hit(tris, o, d, 1e-3, jnp.asarray(tmax))
        np.testing.assert_array_equal(np.asarray(ph.hit)[1::2],
                                      np.asarray(bh.hit)[1::2])

    def test_per_ray_tmax(self, rng):
        tris = random_soup(rng, 400)
        accel = build_clusters(tris, cluster_size=32)
        o, d = random_rays(rng, 128)
        tmax = jnp.asarray(rng.uniform(0.3, 12.0, 128).astype(np.float32))
        self._check_closest(tris, accel, o, d, t_max=tmax)

    def test_dead_lanes_pinned_to_placeholder_unsorted(self, rng):
        """The shadow-wave pattern: dead lanes pinned to origin 0 / +x axis
        interleaved with live lanes, traversed UNSORTED so blocks mix them.
        The cull must exclude dead lanes from the block bounds (they would
        otherwise drag every mixed block's box to the placeholder point) and
        results must stay exact for live lanes, at both cull levels."""
        from path_tracer_ai_tpu.accel.worklist import (
            any_hit_worklist,
            closest_hit_worklist,
        )
        from path_tracer_ai_tpu.engine.intersect import any_hit, closest_hit

        tris = random_soup(rng, 600)
        accel = build_clusters(tris, cluster_size=16, super_size=4)
        o, d = random_rays(rng, 256)
        dead = np.zeros(256, bool)
        dead[rng.permutation(256)[:100]] = True
        o = jnp.where(jnp.asarray(dead)[:, None], 0.0, o)
        unit_x = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
        d = jnp.where(jnp.asarray(dead)[:, None], unit_x, d)
        tmax = np.where(dead, -1.0, rng.uniform(0.5, 14.0, 256)).astype(
            np.float32
        )
        tmax = jnp.asarray(tmax)
        bh = closest_hit(tris, o, d, 1e-3, tmax)
        ba = any_hit(tris, o, d, 1e-3, tmax)
        for levels in (1, 2):
            ph = closest_hit_worklist(accel, o, d, 1e-3, tmax, sort=False,
                                      levels=levels)
            assert not np.asarray(ph.hit)[dead].any()
            np.testing.assert_array_equal(np.asarray(ph.hit),
                                          np.asarray(bh.hit))
            m = np.asarray(bh.hit)
            np.testing.assert_allclose(np.asarray(ph.t)[m],
                                       np.asarray(bh.t)[m], rtol=1e-5)
            pa = any_hit_worklist(accel, o, d, 1e-3, tmax, sort=False,
                                  levels=levels)
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(ba))

    def test_two_level_cull_matches_flat_and_bruteforce(self, rng):
        """The supercluster prefilter (levels=2) must agree exactly with the
        flat cull (levels=1) and brute force."""
        from path_tracer_ai_tpu.accel.worklist import closest_hit_worklist

        tris = random_soup(rng, 3000, spread=5.0)
        accel = build_clusters(tris, cluster_size=32, super_size=8)
        o, d = random_rays(rng, 256)
        p2 = closest_hit_worklist(accel, o, d, 1e-3, np.inf, levels=2)
        p1 = closest_hit_worklist(accel, o, d, 1e-3, np.inf, levels=1)
        bh = closest_hit(tris, o, d, 1e-3, np.inf)
        for ph in (p1, p2):
            np.testing.assert_array_equal(np.asarray(ph.hit),
                                          np.asarray(bh.hit))
            m = np.asarray(bh.hit)
            np.testing.assert_allclose(np.asarray(ph.t)[m],
                                       np.asarray(bh.t)[m], rtol=1e-5)
            np.testing.assert_array_equal(np.asarray(ph.tri)[m],
                                          np.asarray(bh.tri)[m])

    def test_super_cap_overflow_fallback(self, rng):
        """super_cap=1 overflows nearly every block at the super level; the
        fallback must keep results exact."""
        from path_tracer_ai_tpu.accel.worklist import (
            any_hit_worklist,
            closest_hit_worklist,
        )

        tris = random_soup(rng, 800, spread=2.0)
        accel = build_clusters(tris, cluster_size=16, super_size=4)
        o, d = random_rays(rng, 128, spread=3.0)
        ph = closest_hit_worklist(accel, o, d, 1e-3, np.inf, super_cap=1)
        bh = closest_hit(tris, o, d, 1e-3, np.inf)
        np.testing.assert_array_equal(np.asarray(ph.hit), np.asarray(bh.hit))
        m = np.asarray(bh.hit)
        np.testing.assert_allclose(np.asarray(ph.t)[m], np.asarray(bh.t)[m],
                                   rtol=1e-5)
        pa = any_hit_worklist(accel, o, d, 1e-3,
                              jnp.full((128,), 6.0), super_cap=1)
        ba = any_hit(tris, o, d, 1e-3, 6.0)
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(ba))

    def test_large_scene_auto_two_level(self, rng):
        """A >2048-cluster scene auto-selects the 2-level cull; traversal
        stays exact at scale (the million-triangle path, scaled for CPU)."""
        from path_tracer_ai_tpu.accel.worklist import closest_hit_worklist
        from path_tracer_ai_tpu.scene.procgen import blob_mesh

        pts, faces, _ = blob_mesh(subdivisions=6, seed=3)  # 81920 tris
        v = pts[faces].astype(np.float32)
        n = np.tile([[0, 1, 0]], (faces.shape[0], 1)).astype(np.float32)
        uv = np.zeros((faces.shape[0], 2), np.float32)
        tris = triangles_from_numpy(v[:, 0], v[:, 1], v[:, 2], n, n, n,
                                    uv, uv, uv,
                                    np.zeros(faces.shape[0], np.int32))
        accel = build_clusters(tris, cluster_size=32)  # 2560 clusters
        assert accel.num_clusters > 2048
        o = jnp.asarray(rng.uniform(-2, 2, (64, 3)).astype(np.float32))
        d = rng.standard_normal((64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        ph = closest_hit_worklist(accel, o, d, 1e-3, np.inf)
        bh = closest_hit(tris, o, d, 1e-3, np.inf)
        np.testing.assert_array_equal(np.asarray(ph.hit), np.asarray(bh.hit))
        m = np.asarray(bh.hit)
        np.testing.assert_allclose(np.asarray(ph.t)[m], np.asarray(bh.t)[m],
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(ph.tri)[m],
                                      np.asarray(bh.tri)[m])

    def test_mxu_intersector_statistical(self, rng):
        """The matmul (MXU) intersector is the same math with different
        rounding: hits must agree except at epsilon-boundary cases, and t
        must match closely where both agree."""
        from path_tracer_ai_tpu.accel.worklist import closest_hit_worklist

        tris = random_soup(rng, 500)
        accel = build_clusters(tris, cluster_size=32)
        o, d = random_rays(rng, 512)
        ph = closest_hit_worklist(accel, o, d, 1e-3, np.inf,
                                  intersector="mxu", block=64, group=4)
        bh = closest_hit(tris, o, d, 1e-3, np.inf)
        hit_m = np.asarray(ph.hit)
        hit_b = np.asarray(bh.hit)
        assert (hit_m != hit_b).mean() < 5e-3  # boundary flips only
        both = hit_m & hit_b
        np.testing.assert_allclose(np.asarray(ph.t)[both],
                                   np.asarray(bh.t)[both], rtol=5e-3)
        same_tri = np.asarray(ph.tri)[both] == np.asarray(bh.tri)[both]
        assert same_tri.mean() > 0.99

    def test_mxu_anyhit_statistical(self, rng):
        from path_tracer_ai_tpu.accel.worklist import any_hit_worklist

        tris = random_soup(rng, 300)
        accel = build_clusters(tris, cluster_size=16)
        o, d = random_rays(rng, 256)
        tmax = jnp.asarray(rng.uniform(0.3, 12.0, 256).astype(np.float32))
        pa = any_hit_worklist(accel, o, d, 1e-3, tmax, intersector="mxu",
                              block=64, group=4)
        ba = any_hit(tris, o, d, 1e-3, tmax)
        assert (np.asarray(pa) != np.asarray(ba)).mean() < 5e-3
