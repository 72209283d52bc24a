"""Batched ray/scene intersection, brute force over triangle chunks.

Plays the role of Scene::intersect -> BVH::intersect (scene.hpp:96-99,
bvh.hpp:74-116) for the oracle engine. Semantics: nearest hit over all
triangles with t in [t_min, t_max]; ties resolved to the earlier triangle in
array order (the reference's strict `t < best` update keeps the first-found
hit, and jnp.argmin picks the first minimum — same rule).

The reference's pointer-chasing BVH does not map to TPU vector memory, and
for the oracle we don't need it: an exhaustive masked sweep in [R, Tc] tiles
is exact. The accelerated engines (path_tracer_ai_tpu.accel / engine.wavefront)
provide the fast path.

A `lax.scan` over triangle chunks bounds peak memory at R x chunk_size
instead of R x T.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from path_tracer_ai_tpu.core import vec
from path_tracer_ai_tpu.core.geometry import moller_trumbore
from path_tracer_ai_tpu.core.types import TrianglesSoA


class ClosestHit(NamedTuple):
    hit: jnp.ndarray  # [R] bool
    t: jnp.ndarray    # [R] f32 (inf on miss)
    tri: jnp.ndarray  # [R] i32 (undefined on miss)


def _padded_chunks(tris: TrianglesSoA, chunk_size: int):
    """Stack v0/v1/v2 into [num_chunks, chunk, 3] with degenerate padding.

    Zero-area padding triangles have determinant 0 and are rejected by the
    Möller–Trumbore parallel test, so padding never produces hits.
    """
    t_count = tris.v0.shape[0]
    num_chunks = max(1, -(-t_count // chunk_size))
    pad = num_chunks * chunk_size - t_count

    def prep(a):
        a = jnp.pad(a, ((0, pad), (0, 0)))
        return a.reshape(num_chunks, chunk_size, 3)

    return prep(tris.v0), prep(tris.v1), prep(tris.v2), num_chunks


@partial(jax.jit, static_argnames=("chunk_size",))
def closest_hit(
    tris: TrianglesSoA,
    origins: jnp.ndarray,     # [R,3]
    directions: jnp.ndarray,  # [R,3]
    t_min,
    t_max,
    chunk_size: int = 512,
) -> ClosestHit:
    v0c, v1c, v2c, _ = _padded_chunks(tris, chunk_size)
    r = origins.shape[0]

    def step(carry, chunk):
        best_t, best_i = carry
        idx, (cv0, cv1, cv2) = chunk
        hits = moller_trumbore(origins, directions, cv0, cv1, cv2, t_min, t_max)
        ct = jnp.min(hits.t, axis=-1)                       # [R]
        ci = jnp.argmin(hits.t, axis=-1).astype(jnp.int32)  # first min: tie rule
        closer = ct < best_t                                # strict: keep first
        best_t = jnp.where(closer, ct, best_t)
        best_i = jnp.where(closer, idx * chunk_size + ci, best_i)
        return (best_t, best_i), None

    n_chunks = v0c.shape[0]
    init = (jnp.full((r,), jnp.inf, jnp.float32), jnp.zeros((r,), jnp.int32))
    (t, i), _ = jax.lax.scan(
        step, init, (jnp.arange(n_chunks, dtype=jnp.int32), (v0c, v1c, v2c))
    )
    return ClosestHit(hit=jnp.isfinite(t), t=t, tri=i)


@partial(jax.jit, static_argnames=("chunk_size",))
def any_hit(
    tris: TrianglesSoA,
    origins: jnp.ndarray,     # [R,3]
    directions: jnp.ndarray,  # [R,3]
    t_min,
    t_max,                    # scalar or [R]
    chunk_size: int = 512,
) -> jnp.ndarray:
    """Occlusion query (shadow rays): any triangle with t in [t_min, t_max]."""
    v0c, v1c, v2c, _ = _padded_chunks(tris, chunk_size)
    r = origins.shape[0]

    def step(occluded, chunk):
        cv0, cv1, cv2 = chunk
        hits = moller_trumbore(origins, directions, cv0, cv1, cv2, t_min, t_max)
        return occluded | jnp.any(hits.valid, axis=-1), None

    occluded, _ = jax.lax.scan(
        step, jnp.zeros((r,), bool), (v0c, v1c, v2c)
    )
    return occluded


class HitAttributes(NamedTuple):
    position: jnp.ndarray  # [R,3]
    normal: jnp.ndarray    # [R,3] interpolated, normalized
    uv: jnp.ndarray        # [R,2]
    mat_id: jnp.ndarray    # [R] i32


def hit_attributes(
    tris: TrianglesSoA,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t: jnp.ndarray,
    tri_idx: jnp.ndarray,
) -> HitAttributes:
    """Barycentric attribute interpolation at a known hit (triangle.hpp:60-66).

    Recomputes u,v for the winning triangle instead of carrying them through
    the reduction — one extra MT evaluation per ray, no extra scan state.
    Outputs are garbage on miss lanes; callers mask.
    """
    g = lambda a: a[tri_idx]
    v0, v1, v2 = g(tris.v0), g(tris.v1), g(tris.v2)

    edge1 = v1 - v0
    edge2 = v2 - v0
    h = vec.cross(directions, edge2)
    a = vec.dot(edge1, h)
    f = 1.0 / jnp.where(jnp.abs(a) > 0, a, 1.0)
    s = origins - v0
    u = f * vec.dot(s, h)
    q = vec.cross(s, edge1)
    v = f * vec.dot(directions, q)
    w = 1.0 - u - v

    normal = vec.normalize(
        w[..., None] * g(tris.n0) + u[..., None] * g(tris.n1) + v[..., None] * g(tris.n2)
    )
    uv = w[..., None] * g(tris.uv0) + u[..., None] * g(tris.uv1) + v[..., None] * g(tris.uv2)
    position = origins + t[..., None] * directions  # Ray::at (ray.hpp:14-16)
    return HitAttributes(position=position, normal=normal, uv=uv, mat_id=g(tris.mat_id))
