"""Batched intersection vs brute-force numpy, attribute interpolation."""

import numpy as np
import jax.numpy as jnp

from path_tracer_ai_tpu.core.types import triangles_from_numpy
from path_tracer_ai_tpu.engine.intersect import any_hit, closest_hit, hit_attributes


def random_tris(rng, n):
    base = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    v0 = base
    v1 = base + rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    v2 = base + rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    n0 = rng.standard_normal((n, 3)).astype(np.float32)
    n0 /= np.linalg.norm(n0, axis=1, keepdims=True)
    uv = rng.uniform(0, 1, (n, 2)).astype(np.float32)
    mat = rng.integers(0, 3, n).astype(np.int32)
    return triangles_from_numpy(v0, v1, v2, n0, n0, n0, uv, uv, uv, mat)


def numpy_closest(tris, o, d, t_min, t_max):
    """Scalar reference brute force."""
    v0, v1, v2 = np.asarray(tris.v0), np.asarray(tris.v1), np.asarray(tris.v2)
    e1, e2 = v1 - v0, v2 - v0
    h = np.cross(d[None], e2)
    a = np.einsum("ij,ij->i", e1, h)
    ok = np.abs(a) > 1e-7
    f = 1.0 / np.where(ok, a, 1.0)
    s = o[None] - v0
    u = f * np.einsum("ij,ij->i", s, h)
    q = np.cross(s, e1)
    v = f * np.einsum("ij,ij->i", np.broadcast_to(d, q.shape), q)
    t = f * np.einsum("ij,ij->i", e2, q)
    ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= t_min) & (t <= t_max)
    t = np.where(ok, t, np.inf)
    i = int(np.argmin(t))
    return (np.isfinite(t[i]), t[i], i)


def test_closest_hit_matches_numpy(rng):
    tris = random_tris(rng, 300)
    origins = rng.uniform(-5, 5, (64, 3)).astype(np.float32)
    dirs = rng.standard_normal((64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    ch = closest_hit(tris, jnp.asarray(origins), jnp.asarray(dirs), 1e-3, np.inf,
                     chunk_size=64)
    for r in range(64):
        hit, t, i = numpy_closest(tris, origins[r], dirs[r], 1e-3, np.inf)
        assert bool(ch.hit[r]) == hit
        if hit:
            np.testing.assert_allclose(float(ch.t[r]), t, rtol=2e-4)


def test_closest_hit_chunk_invariance(rng):
    tris = random_tris(rng, 200)
    origins = rng.uniform(-5, 5, (16, 3)).astype(np.float32)
    dirs = rng.standard_normal((16, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    a = closest_hit(tris, jnp.asarray(origins), jnp.asarray(dirs), 1e-3, np.inf, chunk_size=7)
    b = closest_hit(tris, jnp.asarray(origins), jnp.asarray(dirs), 1e-3, np.inf, chunk_size=512)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), rtol=1e-6)


def test_any_hit_with_per_ray_tmax(rng):
    # Floor at y=0; shadow rays cast upward with tmax short/long of a blocker
    tris = triangles_from_numpy(
        [[-5, 1, -5]], [[5, 1, -5]], [[0, 1, 5]],
        [[0, 1, 0]], [[0, 1, 0]], [[0, 1, 0]],
        [[0, 0]], [[0, 0]], [[0, 0]], [0],
    )
    o = jnp.asarray([[0.0, 0, 0], [0.0, 0, 0]])
    d = jnp.asarray([[0.0, 1, 0], [0.0, 1, 0]])
    t_max = jnp.asarray([0.5, 2.0])  # blocker at t=1
    occ = any_hit(tris, o, d, 1e-3, t_max)
    assert not bool(occ[0]) and bool(occ[1])


def test_hit_attributes_interpolation():
    tris = triangles_from_numpy(
        [[0, 0, 0]], [[1, 0, 0]], [[0, 1, 0]],
        [[0, 0, 1]], [[1, 0, 0]], [[0, 1, 0]],   # distinct vertex normals
        [[0, 0]], [[1, 0]], [[0, 1]], [3],
    )
    o = jnp.asarray([[0.25, 0.25, 2.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    ch = closest_hit(tris, o, d, 1e-3, np.inf)
    attrs = hit_attributes(tris, o, d, ch.t, ch.tri)
    np.testing.assert_allclose(np.asarray(attrs.position[0]), [0.25, 0.25, 0.0], atol=1e-6)
    # barycentric (w,u,v) = (0.5, 0.25, 0.25)
    expected_n = 0.5 * np.array([0, 0, 1]) + 0.25 * np.array([1, 0, 0]) + 0.25 * np.array([0, 1, 0])
    expected_n /= np.linalg.norm(expected_n)
    np.testing.assert_allclose(np.asarray(attrs.normal[0]), expected_n, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attrs.uv[0]), [0.25, 0.25], atol=1e-6)
    assert int(attrs.mat_id[0]) == 3


def test_first_hit_tie_break(rng):
    """Two identical triangles: the earlier one wins (strict < update)."""
    v = dict(
        v0=[[0, 0, 0]] * 2, v1=[[1, 0, 0]] * 2, v2=[[0, 1, 0]] * 2,
        n0=[[0, 0, 1]] * 2, n1=[[0, 0, 1]] * 2, n2=[[0, 0, 1]] * 2,
        uv0=[[0, 0]] * 2, uv1=[[0, 0]] * 2, uv2=[[0, 0]] * 2,
    )
    tris = triangles_from_numpy(**v, mat_id=[0, 1])
    ch = closest_hit(tris, jnp.asarray([[0.2, 0.2, 1.0]]), jnp.asarray([[0.0, 0, -1]]),
                     1e-3, np.inf)
    assert int(ch.tri[0]) == 0
