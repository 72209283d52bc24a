"""Unit tests for core math: vec ops, Möller–Trumbore, AABB slab, BRDF utils."""

import numpy as np
import jax.numpy as jnp
import pytest

from path_tracer_ai_tpu.core import vec
from path_tracer_ai_tpu.core import materials as mat_utils
from path_tracer_ai_tpu.core.geometry import aabb_hit, moller_trumbore


def a(*xs):
    return jnp.asarray(xs, jnp.float32)


class TestVec:
    def test_dot_cross(self):
        assert float(vec.dot(a(1, 2, 3), a(4, 5, 6))) == 32.0
        np.testing.assert_allclose(vec.cross(a(1, 0, 0), a(0, 1, 0)), [0, 0, 1])

    def test_normalize(self):
        v = vec.normalize(a(3, 0, 4))
        np.testing.assert_allclose(v, [0.6, 0, 0.8], rtol=1e-6)

    def test_reflect(self):
        # 45° incidence onto floor
        d = vec.normalize(a(1, -1, 0))
        r = vec.reflect(d, a(0, 1, 0))
        np.testing.assert_allclose(r, vec.normalize(a(1, 1, 0)), atol=1e-6)

    def test_refract_normal_incidence(self):
        d = a(0, -1, 0)
        r = vec.refract(d, a(0, 1, 0), 1.0 / 1.5)
        np.testing.assert_allclose(r, [0, -1, 0], atol=1e-6)

    def test_refract_tir_returns_zero(self):
        # glancing exit from dense medium -> TIR -> glm returns zero vector
        d = vec.normalize(a(1, -0.1, 0))
        r = vec.refract(d, a(0, 1, 0), 1.5)
        np.testing.assert_allclose(r, [0, 0, 0], atol=1e-6)

    def test_refract_snell(self):
        # 45° incidence air->glass: sin(theta_t) = sin(45°)/1.5
        d = vec.normalize(a(1, -1, 0))
        r = vec.refract(d, a(0, 1, 0), 1.0 / 1.5)
        sin_t = float(r[0]) / float(vec.length(r))
        np.testing.assert_allclose(sin_t, np.sin(np.pi / 4) / 1.5, rtol=1e-5)


class TestMollerTrumbore:
    V0 = a(0, 0, 0)
    V1 = a(1, 0, 0)
    V2 = a(0, 1, 0)

    def tri(self):
        return (self.V0[None], self.V1[None], self.V2[None])

    def test_hit(self):
        h = moller_trumbore(a(0.25, 0.25, 1.0), a(0, 0, -1), *self.tri(), 1e-3, np.inf)
        assert bool(h.valid[0])
        np.testing.assert_allclose(h.t[0], 1.0, rtol=1e-6)
        np.testing.assert_allclose([h.u[0], h.v[0]], [0.25, 0.25], rtol=1e-5)

    def test_miss_outside(self):
        h = moller_trumbore(a(2.0, 2.0, 1.0), a(0, 0, -1), *self.tri(), 1e-3, np.inf)
        assert not bool(h.valid[0])

    def test_parallel(self):
        h = moller_trumbore(a(0.2, 0.2, 1.0), a(1, 0, 0), *self.tri(), 1e-3, np.inf)
        assert not bool(h.valid[0])

    def test_behind_origin(self):
        h = moller_trumbore(a(0.25, 0.25, -1.0), a(0, 0, -1), *self.tri(), 1e-3, np.inf)
        assert not bool(h.valid[0])

    def test_tmin_tmax_bounds(self):
        o, d = a(0.25, 0.25, 1.0), a(0, 0, -1)
        assert not bool(moller_trumbore(o, d, *self.tri(), 1e-3, 0.5).valid[0])
        assert not bool(moller_trumbore(o, d, *self.tri(), 1.5, np.inf).valid[0])
        # inclusive bound at exactly t = t_max
        assert bool(moller_trumbore(o, d, *self.tri(), 1e-3, 1.0).valid[0])

    def test_backface_hits(self):
        # no backface culling in the reference (triangle.hpp:36 tests |a|)
        h = moller_trumbore(a(0.25, 0.25, -1.0), a(0, 0, 1), *self.tri(), 1e-3, np.inf)
        assert bool(h.valid[0])

    def test_edge_hit(self):
        # u = 0 boundary is inclusive
        h = moller_trumbore(a(0.0, 0.5, 1.0), a(0, 0, -1), *self.tri(), 1e-3, np.inf)
        assert bool(h.valid[0])

    def test_batched_rays(self):
        o = jnp.stack([a(0.25, 0.25, 1.0), a(5, 5, 1.0)])
        d = jnp.broadcast_to(a(0, 0, -1), (2, 3))
        h = moller_trumbore(o, d, *self.tri(), 1e-3, np.inf)
        assert h.valid.shape == (2, 1)
        assert bool(h.valid[0, 0]) and not bool(h.valid[1, 0])


class TestAABB:
    BMIN = a(0, 0, 0)[None]
    BMAX = a(1, 1, 1)[None]

    def test_hit_through(self):
        hit, t = aabb_hit(a(0.5, 0.5, 2.0), a(0, 0, -1), self.BMIN, self.BMAX, 1e-3, np.inf)
        assert bool(hit[0])
        np.testing.assert_allclose(t[0], 1.0, rtol=1e-6)

    def test_miss(self):
        hit, _ = aabb_hit(a(2, 2, 2), a(0, 0, -1), self.BMIN, self.BMAX, 1e-3, np.inf)
        assert not bool(hit[0])

    def test_origin_inside(self):
        hit, _ = aabb_hit(a(0.5, 0.5, 0.5), a(0, 0, 1), self.BMIN, self.BMAX, 1e-3, np.inf)
        assert bool(hit[0])

    def test_axis_parallel_inside_slab(self):
        # direction.x == 0 while origin inside x-slab: inf slopes, still a hit
        hit, _ = aabb_hit(a(0.5, 0.5, 2.0), a(0, 0, -1), self.BMIN, self.BMAX, 1e-3, np.inf)
        assert bool(hit[0])

    def test_axis_parallel_outside_slab(self):
        hit, _ = aabb_hit(a(2.0, 0.5, 2.0), a(0, 0, -1), self.BMIN, self.BMAX, 1e-3, np.inf)
        assert not bool(hit[0])

    def test_on_boundary_nan_edge(self):
        # origin exactly on min x-bound with dx == 0: 0*inf NaN in slab math;
        # the C++ keeps prior bounds (NaN compares false) — must not poison
        hit, _ = aabb_hit(a(0.0, 0.5, 2.0), a(0, 0, -1), self.BMIN, self.BMAX, 1e-3, np.inf)
        assert bool(hit[0])  # grazing the face still counts in C++ semantics

    def test_tmax_prunes(self):
        hit, _ = aabb_hit(a(0.5, 0.5, 5.0), a(0, 0, -1), self.BMIN, self.BMAX, 1e-3, 2.0)
        assert not bool(hit[0])


class TestMaterialUtils:
    def test_schlick(self):
        np.testing.assert_allclose(float(mat_utils.schlick_fresnel(1.0, 0.04)), 0.04, rtol=1e-6)
        np.testing.assert_allclose(float(mat_utils.schlick_fresnel(0.0, 0.04)), 1.0, rtol=1e-6)

    def test_ggx_matches_scalar(self):
        for ndh, r in [(1.0, 0.1), (0.7, 0.5), (0.3, 0.95), (0.0, 0.2)]:
            alpha2 = (r * r) ** 2
            denom = ndh * ndh * (alpha2 - 1) + 1
            expected = alpha2 / (np.pi * denom * denom)
            np.testing.assert_allclose(
                float(mat_utils.ggx_distribution(ndh, r)), expected, rtol=1e-3
            )  # float32 vs float64 scalar

    def test_ggx_clamps_roughness(self):
        assert float(mat_utils.ggx_distribution(0.5, 2.0)) == pytest.approx(
            float(mat_utils.ggx_distribution(0.5, 1.0))
        )

    def test_geometry_smith(self):
        v = float(mat_utils.geometry_smith(0.8, 0.6, 0.5))
        k = ((0.5 + 1) ** 2) / 8
        g = lambda c: c / (c * (1 - k) + k)
        np.testing.assert_allclose(v, g(0.8) * g(0.6), rtol=1e-5)
