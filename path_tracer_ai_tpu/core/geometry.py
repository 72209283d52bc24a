"""Ray/primitive intersection math as vmappable pure functions.

TPU-first rebuild of:
- Möller–Trumbore triangle intersection (reference triangle.hpp:23-67)
- AABB slab test (reference aabb.hpp:13-25)

Both are written for one ray against [T] primitives, broadcasting over
arbitrary leading ray dims. No early-outs — every condition becomes a mask so
the code stays branchless and vectorizes onto the VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from path_tracer_ai_tpu.core import vec
from path_tracer_ai_tpu.core.types import MT_EPSILON


class TriHits(NamedTuple):
    """Per-triangle intersection candidates for one (or a batch of) ray(s)."""

    t: jnp.ndarray      # [..., T] hit distance (inf where invalid)
    u: jnp.ndarray      # [..., T] barycentric u
    v: jnp.ndarray      # [..., T] barycentric v
    valid: jnp.ndarray  # [..., T] bool


def moller_trumbore(
    origin: jnp.ndarray,     # [..., 3]
    direction: jnp.ndarray,  # [..., 3]
    v0: jnp.ndarray,         # [T, 3]
    v1: jnp.ndarray,
    v2: jnp.ndarray,
    t_min,
    t_max,
) -> TriHits:
    """Möller–Trumbore with the reference's exact rejection tests.

    Mirrors triangle.hpp:23-67: determinant epsilon 1e-7, u in [0,1],
    v >= 0, u+v <= 1, t in [t_min, t_max] (both bounds inclusive-exclusive
    exactly as the C++ `t < tMin || t > tMax` rejection).
    `t_min`/`t_max` broadcast against the ray batch.
    """
    o = origin[..., None, :]
    d = direction[..., None, :]
    edge1 = (v1 - v0)
    edge2 = (v2 - v0)

    h = vec.cross(d, edge2)
    a = vec.dot(edge1, h)
    not_parallel = jnp.abs(a) > MT_EPSILON
    # Guard the reciprocal so masked-out lanes don't synthesize inf*0 NaNs.
    f = 1.0 / jnp.where(not_parallel, a, 1.0)
    s = o - v0
    u = f * vec.dot(s, h)
    q = vec.cross(s, edge1)
    vv = f * vec.dot(d, q)
    t = f * vec.dot(edge2, q)

    t_min = jnp.asarray(t_min)[..., None] if jnp.ndim(t_min) else t_min
    t_max = jnp.asarray(t_max)[..., None] if jnp.ndim(t_max) else t_max

    valid = (
        not_parallel
        & (u >= 0.0) & (u <= 1.0)
        & (vv >= 0.0) & (u + vv <= 1.0)
        & (t >= t_min) & (t <= t_max)
    )
    t = jnp.where(valid, t, jnp.inf)
    return TriHits(t=t, u=u, v=vv, valid=valid)


def aabb_hit(
    origin: jnp.ndarray,     # [..., 3]
    direction: jnp.ndarray,  # [..., 3]
    bmin: jnp.ndarray,       # [C, 3]
    bmax: jnp.ndarray,       # [C, 3]
    t_min,
    t_max,
):
    """Slab test against [C] boxes; returns (hit mask [..., C], entry t).

    Mirrors aabb.hpp:13-25 including its IEEE edge-case behavior: a zero
    direction component produces ±inf slopes; 0*inf NaNs compare false in the
    C++ `t0 > tMin ? t0 : tMin` update, which `jnp.where(t0 > lo, t0, lo)`
    reproduces exactly (unlike jnp.maximum, which propagates NaN).
    """
    o = origin[..., None, :]
    inv_d = 1.0 / direction[..., None, :]
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    near = jnp.where(inv_d < 0.0, t1, t0)
    far = jnp.where(inv_d < 0.0, t0, t1)

    lo = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), near[..., 0].shape)
    hi = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), near[..., 0].shape)
    for axis in range(3):
        lo = jnp.where(near[..., axis] > lo, near[..., axis], lo)
        hi = jnp.where(far[..., axis] < hi, far[..., axis], hi)
    return hi > lo, lo


def triangle_aabbs(v0, v1, v2):
    """Per-triangle bounds (triangle.hpp:73-77)."""
    bmin = jnp.minimum(jnp.minimum(v0, v1), v2)
    bmax = jnp.maximum(jnp.maximum(v0, v1), v2)
    return bmin, bmax


def triangle_centers(v0, v1, v2):
    """Triangle centroid (triangle.hpp:69-71)."""
    return (v0 + v1 + v2) / 3.0
