"""Reference-parity BVH: build invariants + traversal correctness
(SURVEY.md §4: "BVH build invariants (every tri in exactly one leaf, child
AABBs ⊆ parent)")."""

import numpy as np
import pytest

from path_tracer_ai_tpu.accel.bvh import build_bvh, intersect_bvh


@pytest.fixture
def soup(rng):
    t = 333
    base = rng.uniform(-5, 5, (t, 3)).astype(np.float32)
    v0 = base
    v1 = base + rng.uniform(-0.8, 0.8, (t, 3)).astype(np.float32)
    v2 = base + rng.uniform(-0.8, 0.8, (t, 3)).astype(np.float32)
    return v0, v1, v2


def test_every_triangle_in_exactly_one_leaf(soup):
    v0, v1, v2 = soup
    bvh = build_bvh(v0, v1, v2)
    seen = []
    for ni in range(bvh.num_nodes):
        if bvh.left[ni] < 0:
            seen.extend(bvh.order[bvh.first[ni]: bvh.first[ni] + bvh.count[ni]].tolist())
    assert sorted(seen) == list(range(v0.shape[0]))


def test_leaf_size_limit(soup):
    v0, v1, v2 = soup
    bvh = build_bvh(v0, v1, v2, leaf_size=8)
    for ni in range(bvh.num_nodes):
        if bvh.left[ni] < 0:
            assert 1 <= bvh.count[ni] <= 8


def test_child_bounds_contained_in_parent(soup):
    v0, v1, v2 = soup
    bvh = build_bvh(v0, v1, v2)
    for ni in range(bvh.num_nodes):
        for ci in (bvh.left[ni], bvh.right[ni]):
            if ci >= 0:
                assert (bvh.bounds_min[ci] >= bvh.bounds_min[ni] - 1e-5).all()
                assert (bvh.bounds_max[ci] <= bvh.bounds_max[ni] + 1e-5).all()


def test_leaves_contain_their_triangles(soup):
    v0, v1, v2 = soup
    bvh = build_bvh(v0, v1, v2)
    for ni in range(bvh.num_nodes):
        if bvh.left[ni] < 0:
            ids = bvh.order[bvh.first[ni]: bvh.first[ni] + bvh.count[ni]]
            pts = np.concatenate([v0[ids], v1[ids], v2[ids]])
            assert (pts >= bvh.bounds_min[ni] - 1e-5).all()
            assert (pts <= bvh.bounds_max[ni] + 1e-5).all()


def test_traversal_matches_bruteforce(soup, rng):
    v0, v1, v2 = soup
    bvh = build_bvh(v0, v1, v2)

    def brute(o, d):
        best_t, best_i = np.inf, -1
        for i in range(v0.shape[0]):
            e1 = v1[i] - v0[i]
            e2 = v2[i] - v0[i]
            h = np.cross(d, e2)
            a = float(np.dot(e1, h))
            if abs(a) < 1e-7:
                continue
            f = 1.0 / a
            s = o - v0[i]
            u = f * float(np.dot(s, h))
            if u < 0 or u > 1:
                continue
            q = np.cross(s, e1)
            vv = f * float(np.dot(d, q))
            if vv < 0 or u + vv > 1:
                continue
            t = f * float(np.dot(e2, q))
            if 1e-3 <= t < best_t:
                best_t, best_i = t, i
        return best_i >= 0, best_t, best_i

    for _ in range(30):
        o = rng.uniform(-7, 7, 3)
        d = rng.standard_normal(3)
        d /= np.linalg.norm(d)
        hit_b, t_b, i_b = brute(o, d)
        hit_v, t_v, i_v = intersect_bvh(bvh, v0, v1, v2, o, d)
        assert hit_b == hit_v
        if hit_b:
            np.testing.assert_allclose(t_b, t_v, rtol=1e-6)
