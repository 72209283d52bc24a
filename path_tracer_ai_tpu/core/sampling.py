"""Monte-Carlo sampling primitives on counter-based RNG.

The reference uses mutable per-thread mt19937 (renderer.hpp:55) and a
rejection-sampled unit-sphere direction (renderer.hpp:308-319). On TPU,
mutable per-lane state and data-dependent rejection loops don't map to the
hardware, so we use JAX's counter-based threefry keys and closed-form
samplers that are EQUAL IN DISTRIBUTION (not bitwise):

- randomInUnitSphere() normalizes its result (renderer.hpp:317), so it is a
  uniform direction on the unit sphere. A normalized 3D Gaussian is the same
  distribution, with no rejection loop.
- randomHemisphereDirection() (renderer.hpp:303-306) flips the sphere sample
  into the normal's hemisphere; we do the same flip.

Keys are derived as fold_in chains over (pixel, sample, bounce, purpose), so
every lane of every wave draws from an independent, reproducible stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from path_tracer_ai_tpu.core import vec

# Purpose tags for key folding (so draws for different uses never collide).
TAG_PIXEL_JITTER = 0
TAG_BSDF = 1
TAG_FRESNEL = 2
TAG_RR = 3  # Russian-roulette continuation draw (opt-in extension)


def uniform_sphere(key, shape=()) -> jnp.ndarray:
    """Uniform direction on the unit sphere, shape [..., 3].

    Equal in distribution to the reference's rejection sampler
    (renderer.hpp:308-319): uniform-in-ball followed by normalize is uniform
    on the sphere, and so is a normalized isotropic Gaussian.
    """
    g = jax.random.normal(key, tuple(shape) + (3,), dtype=jnp.float32)
    return vec.safe_normalize(g)


def uniform_hemisphere(key, normal: jnp.ndarray) -> jnp.ndarray:
    """Uniform direction in the hemisphere around `normal` [..., 3].

    Mirrors randomHemisphereDirection (renderer.hpp:303-306): sphere sample,
    flipped when it points below the surface (dot < 0; dot == 0 kept as-is).
    """
    d = uniform_sphere(key, normal.shape[:-1])
    flip = vec.dot(d, normal) < 0.0
    return jnp.where(flip[..., None], -d, d)


def sample_key(base_key, pixel_idx, sample_idx):
    """Per-(pixel, sample) independent stream."""
    k = jax.random.fold_in(base_key, pixel_idx)
    return jax.random.fold_in(k, sample_idx)


def bounce_key(sample_key_, depth, tag):
    """Per-(bounce, purpose) sub-stream of a sample stream."""
    k = jax.random.fold_in(sample_key_, depth)
    return jax.random.fold_in(k, tag)
