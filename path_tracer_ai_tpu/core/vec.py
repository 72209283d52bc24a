"""Vector math on [..., 3] arrays.

Replaces the reference's GLM usage (glm::dot/cross/normalize/reflect/refract).
All functions broadcast over leading dims so they work per-ray, per-wave, or
per-(ray, triangle) without change.

`normalize` intentionally has NO epsilon guard: the reference normalizes with
plain division (glm default), and NaNs from degenerate inputs are handled
downstream by the sample-validity filter (renderer.hpp:112-123). Use
`safe_normalize` only in non-semantic paths (e.g. sampling helpers).
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    # Manual expansion: avoids jnp.cross's generality, fuses cleanly.
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(dot(a, a))


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    return a / length(a)[..., None]


def safe_normalize(a: jnp.ndarray, eps: float = 1.0e-20) -> jnp.ndarray:
    return a / jnp.maximum(length(a), eps)[..., None]


def reflect(incident: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """glm::reflect: I - 2*dot(N,I)*N (renderer.hpp:191,231)."""
    return incident - 2.0 * dot(normal, incident)[..., None] * normal


def refract(incident: jnp.ndarray, normal: jnp.ndarray, eta) -> jnp.ndarray:
    """glm::refract semantics (renderer.hpp:233).

    Returns the zero vector on total internal reflection, like GLM.
    `eta` broadcasts over leading dims.
    """
    eta = jnp.asarray(eta)[..., None] if jnp.ndim(eta) else eta
    ndi = dot(normal, incident)[..., None]
    k = 1.0 - eta * eta * (1.0 - ndi * ndi)
    refr = eta * incident - (eta * ndi + jnp.sqrt(jnp.maximum(k, 0.0))) * normal
    return jnp.where(k < 0.0, 0.0, refr)
