"""Statistical tests for the sampling primitives (SURVEY.md §4 unit list)."""

import numpy as np
import jax
import jax.numpy as jnp

from path_tracer_ai_tpu.core import sampling


def test_uniform_sphere_is_unit_and_centered():
    key = jax.random.key(0)
    d = np.asarray(sampling.uniform_sphere(key, (20000,)))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # mean ~ 0 with SE ~ 1/sqrt(3N)
    assert np.abs(d.mean(axis=0)).max() < 0.02


def test_uniform_sphere_octant_chi2():
    """Chi-square uniformity over the 8 octants."""
    key = jax.random.key(1)
    n = 40000
    d = np.asarray(sampling.uniform_sphere(key, (n,)))
    octant = (d[:, 0] > 0) * 4 + (d[:, 1] > 0) * 2 + (d[:, 2] > 0)
    counts = np.bincount(octant, minlength=8)
    expected = n / 8
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    assert chi2 < 24.3  # chi2_{0.999, df=7}


def test_uniform_hemisphere_respects_normal():
    key = jax.random.key(2)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (5000, 3))
    d = np.asarray(sampling.uniform_hemisphere(key, normal))
    assert (d[:, 1] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_uniform_hemisphere_cos_mean():
    """E[cos theta] = 1/2 for uniform hemisphere sampling — this is exactly
    what makes the reference's 2*albedo*cos estimator unbiased."""
    key = jax.random.key(3)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (100000, 3))
    d = np.asarray(sampling.uniform_hemisphere(key, normal))
    assert abs(d[:, 2].mean() - 0.5) < 0.005


def test_streams_are_independent_per_fold():
    base = jax.random.key(7)
    k1 = sampling.sample_key(base, 3, 5)
    k2 = sampling.sample_key(base, 3, 6)
    k3 = sampling.sample_key(base, 4, 5)
    v1 = float(jax.random.uniform(k1))
    v2 = float(jax.random.uniform(k2))
    v3 = float(jax.random.uniform(k3))
    assert len({v1, v2, v3}) == 3


def test_reproducible():
    base = jax.random.key(9)
    a = sampling.uniform_sphere(sampling.bounce_key(base, 2, 1), (4,))
    b = sampling.uniform_sphere(sampling.bounce_key(base, 2, 1), (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_diffuse_estimator_energy_conservation():
    """Furnace-style check on the reference's diffuse estimator
    (renderer.hpp:187): under a uniform unit environment, the one-bounce
    estimator 2*albedo*cos(theta) must average to albedo — i.e. the
    uniform-hemisphere pdf 1/(2pi) exactly cancels the (albedo/pi)*cos BRDF
    integral. This is the furnace test adapted to a non-emissive renderer
    (SURVEY.md §4)."""
    key = jax.random.key(11)
    n = 200000
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    d = sampling.uniform_hemisphere(key, normal)
    albedo = 0.7
    estimates = 2.0 * albedo * np.asarray(d[:, 2])
    mean = estimates.mean()
    se = estimates.std() / np.sqrt(n)
    assert abs(mean - albedo) < 4 * se + 1e-3, (mean, albedo, se)
