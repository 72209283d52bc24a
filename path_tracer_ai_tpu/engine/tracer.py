"""The bounce loop: reference tracePath semantics over lane batches.

Shared by both engines; the traversal backend is injected:
- oracle engine  -> brute-force exact scans (engine.intersect)
- wavefront engine -> packet cluster traversal (accel.traverse)

The loop is the iterative form of the recursive tracePath
(renderer.hpp:129-250); see engine.shading for the throughput derivation.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from path_tracer_ai_tpu.core import sampling
from path_tracer_ai_tpu.core.types import RAY_TMIN, SceneData
from path_tracer_ai_tpu.engine import intersect
from path_tracer_ai_tpu.engine.shading import (
    direct_lighting,
    gather_materials,
    sample_bsdf,
)

# closest_fn(origins, directions, t_min, t_max) -> intersect.ClosestHit-like
# occlude_fn(origins, directions, t_max) -> [K] bool
ClosestFn = Callable[..., object]
OccludeFn = Callable[..., jnp.ndarray]


def bounce_step(
    scene: SceneData,
    closest_fn: ClosestFn,
    occlude_fn: OccludeFn,
    o, d, beta, radiance, alive, keys, depth,
    rr_start: int = 0,
    rr_floor: float = 0.05,
):
    """ONE shading vertex of tracePath for a lane batch.

    `depth` may be a scalar (uniform-depth wave, trace_paths) or a per-lane
    [N] array (persistent pool, wavefront regeneration) — the RNG stream for
    a lane depends only on its own (key, depth), so scheduling is invisible
    to the radiance.

    rr_start (opt-in, see RenderSettings.rr_start): vertices of depth >=
    rr_start roulette their CONTINUATION — the current vertex's direct term
    is already in `radiance`, so survival p = clamp(max(beta'), rr_floor, 1)
    with beta' /= p keeps E[radiance] exactly; rr_start=0 disables (quirk
    parity with renderer.hpp's fixed-depth cutoff). The draw rides its own
    RNG purpose (TAG_RR) keyed by (lane, depth), so it is scheduling- and
    backend-invariant like every other stream.

    Returns (o, d, beta, radiance, alive, n_closest, n_shadow).
    """
    tris = scene.triangles
    n_lights = scene.lights.position.shape[0]

    # Dead lanes keep finite-but-stale rays; cap their t_max below t_min
    # so the traversal backends can terminate their blocks immediately.
    lane_tmax = jnp.where(alive, jnp.inf, -1.0)
    ch = closest_fn(o, d, RAY_TMIN, lane_tmax)
    safe_tri = jnp.maximum(ch.tri, 0)  # packet backend uses -1 for miss
    attrs = intersect.hit_attributes(tris, o, d, ch.t, safe_tri)
    active = alive & ch.hit

    # Invalid/null material -> magenta returned from this vertex and the
    # path terminates (renderer.hpp:142-157). Unreachable from the loader
    # (ids are always in range) but a documented reference behavior. A
    # negative id is treated as invalid too, rather than reproducing the
    # C++ out-of-bounds indexing it would cause.
    n_materials = scene.materials.mtype.shape[0]
    bad_mat = active & ((attrs.mat_id < 0) | (attrs.mat_id >= n_materials))
    magenta = jnp.asarray([1.0, 0.0, 1.0], jnp.float32)
    radiance = radiance + jnp.where(bad_mat[..., None], beta * magenta, 0.0)
    active = active & ~bad_mat
    mats = gather_materials(scene.materials, attrs.mat_id)

    # RNG: one sub-stream per (lane, bounce, purpose).
    depth_arr = jnp.broadcast_to(jnp.asarray(depth), alive.shape)
    kb = jax.vmap(jax.random.fold_in)(keys, depth_arr)
    k_sphere = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
        kb, sampling.TAG_BSDF
    )
    k_u = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
        kb, sampling.TAG_FRESNEL
    )
    sphere = jax.vmap(lambda k: sampling.uniform_sphere(k))(k_sphere)
    fresnel_u = jax.vmap(lambda k: jax.random.uniform(k))(k_u)

    n_shadow = n_lights * jnp.sum(active.astype(jnp.int32))
    direct = direct_lighting(
        scene.lights, occlude_fn, attrs.position, attrs.normal, -d, mats, active
    )
    # Whole-sum isValidColor(directLight) check (renderer.hpp:161-163): a
    # non-finite SUM (per-light contributions are already filtered, so only
    # overflow of the sum can trip this) returns black from this vertex —
    # nothing is added and the path terminates. Note the reference applies
    # this to dielectric vertices via uninitialized-garbage brdf values
    # (UB); here dielectric direct is exactly 0, so they never trip it.
    direct_ok = jnp.all(jnp.isfinite(direct), axis=-1)
    active = active & direct_ok

    bs = sample_bsdf(d, attrs.position, attrs.normal, mats, sphere, fresnel_u)

    add = (active & bs.adds_direct)[..., None]
    radiance = radiance + jnp.where(add, beta * direct, 0.0)
    beta = jnp.where(active[..., None], beta * bs.throughput, beta)
    o = jnp.where(active[..., None], bs.origin, o)
    d = jnp.where(active[..., None], bs.direction, d)

    if rr_start:
        # Unbiased continuation roulette on the UPDATED throughput. The
        # depth gate is data (depth may be per-lane in the pool scheduler);
        # rr_start itself is static so rr-off programs are unchanged.
        k_rr = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
            kb, sampling.TAG_RR
        )
        u_rr = jax.vmap(lambda k: jax.random.uniform(k))(k_rr)
        p = jnp.clip(jnp.max(beta, axis=-1), rr_floor, 1.0)
        roulette = active & (depth_arr >= rr_start)
        survive = ~roulette | (u_rr < p)
        beta = jnp.where((roulette & survive)[..., None],
                         beta / p[..., None], beta)
        active = active & survive

    n_closest = jnp.sum(alive.astype(jnp.int32))
    return o, d, beta, radiance, active, n_closest, n_shadow


def trace_paths(
    scene: SceneData,
    origins: jnp.ndarray,     # [N,3]
    directions: jnp.ndarray,  # [N,3]
    keys,                     # [N] key array (one stream per lane)
    max_bounces: int,
    closest_fn: ClosestFn,
    occlude_fn: OccludeFn,
    rr_start: int = 0,
):
    """Returns (radiance [N,3], valid [N], stats).

    stats = (n_closest_rays, n_shadow_rays): the number of live closest-hit
    and shadow rays actually traced across all bounces (the Mrays metric of
    BASELINE.md counts these).
    """
    n = origins.shape[0]

    def body(depth, state):
        o, d, beta, radiance, alive, n_closest, n_shadow = state
        o, d, beta, radiance, alive, nc, ns = bounce_step(
            scene, closest_fn, occlude_fn,
            o, d, beta, radiance, alive, keys, depth, rr_start=rr_start,
        )
        return (o, d, beta, radiance, alive, n_closest + nc, n_shadow + ns)

    state = (
        origins,
        directions,
        jnp.ones((n, 3), jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.ones((n,), bool),
        jnp.int32(0),
        jnp.int32(0),
    )
    out = jax.lax.fori_loop(0, max_bounces, body, state)
    radiance, _alive, n_closest, n_shadow = out[3], out[4], out[5], out[6]
    # isValidColor filter on the whole sample (renderer.hpp:69-73).
    valid = jnp.all(jnp.isfinite(radiance), axis=-1)
    return radiance, valid, (n_closest, n_shadow)


def brute_force_backend(scene: SceneData, tri_chunk: int = 512):
    """Exact traversal backend used by the oracle engine."""
    tris = scene.triangles

    def closest(o, d, t_min, t_max):
        return intersect.closest_hit(tris, o, d, t_min, t_max, chunk_size=tri_chunk)

    def occlude(o, d, t_max):
        return intersect.any_hit(tris, o, d, RAY_TMIN, t_max, chunk_size=tri_chunk)

    return closest, occlude
