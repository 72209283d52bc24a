"""BRDF helper functions (mirrors MaterialUtils, material.hpp:20-58).

All helpers broadcast elementwise, so they work per-lane in the wavefront
engine and per-pixel in the oracle.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

PI = math.pi


def schlick_fresnel(cos_theta, f0):
    """Schlick approximation (material.hpp:21-26).

    Note: the reference passes F0 = (etai-etat)/(etai+etat) UNSQUARED
    (renderer.hpp:230) — which can be negative when entering a dense medium.
    We reproduce that behavior faithfully; this function itself is the plain
    Schlick form.
    """
    x = 1.0 - cos_theta
    x5 = (x * x) * (x * x) * x
    return f0 + (1.0 - f0) * x5


def ggx_distribution(n_dot_h, roughness):
    """GGX/Trowbridge-Reitz NDF (material.hpp:28-42)."""
    r = jnp.clip(roughness, 0.0, 1.0)
    alpha = r * r
    alpha2 = alpha * alpha
    ndh2 = n_dot_h * n_dot_h
    denom = ndh2 * (alpha2 - 1.0) + 1.0
    d = alpha2 / (PI * denom * denom)
    return jnp.where(denom <= 0.0, 0.0, d)


def geometry_schlick_ggx(n_dot_v, roughness):
    """Schlick-GGX geometry term (material.hpp:44-51).

    Unused by the reference render path but part of its public material API;
    kept for parity.
    """
    r = roughness + 1.0
    k = (r * r) / 8.0
    denom = n_dot_v * (1.0 - k) + k
    return jnp.where(denom <= 0.0, 0.0, n_dot_v / denom)


def geometry_smith(n_dot_v, n_dot_l, roughness):
    """Smith geometry term (material.hpp:53-57). Unused in shading; parity."""
    return geometry_schlick_ggx(n_dot_v, roughness) * geometry_schlick_ggx(
        n_dot_l, roughness
    )
