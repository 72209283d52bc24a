"""Packet traversal of the cluster structure (the TPU "BVH intersect").

Replaces per-ray recursive BVH descent (bvh.hpp:74-116) and hardware
`optixTrace` (optix_kernels.cu:101-114) with a dense, branchless pipeline
shaped for the VPU:

1. SORT   — rays are keyed by (direction octant, origin Morton cell) and
            sorted so consecutive lanes are coherent (the TPU analog of GPU
            ray binning; restores coherence for bounce/shadow waves).
2. CULL   — for each block of `block_size` sorted rays, a CONSERVATIVE
            interval slab test (interval arithmetic over the block's origin
            and direction bounds) marks candidate clusters. Never excludes a
            cluster any member ray could hit, so traversal stays exact.
3. SWEEP  — a while_loop walks each block's candidate list front-to-back
            (ordered by conservative entry distance); each step gathers one
            cluster per block and runs a dense [block, S] Möller–Trumbore
            sweep, shrinking per-ray t_max exactly like the reference's
            mutable Ray::tMax pruning (bvh.hpp:91).

Everything is static-shaped; the only dynamic quantity is the while_loop
trip count (max candidates over blocks), which XLA supports natively.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from path_tracer_ai_tpu.accel.clusters import ClusterAccel
from path_tracer_ai_tpu.accel.morton import morton3d
from path_tracer_ai_tpu.core import vec
from path_tracer_ai_tpu.core.types import MT_EPSILON


class PacketHit(NamedTuple):
    hit: jnp.ndarray     # [N] bool
    t: jnp.ndarray       # [N] f32 (inf on miss)
    tri: jnp.ndarray     # [N] i32 global triangle index (-1 on miss)


def _sort_keys(accel: ClusterAccel, origins, directions):
    """Coherence key: 3-bit direction octant + 27-bit origin Morton cell."""
    octant = (
        (directions[:, 0] < 0).astype(jnp.uint32) * 4
        + (directions[:, 1] < 0).astype(jnp.uint32) * 2
        + (directions[:, 2] < 0).astype(jnp.uint32)
    )
    cell = morton3d(origins, accel.scene_min, accel.scene_max, bits=9)
    return (octant << 27) | cell


def _block_candidates(accel, o_blk, d_blk, t_max_blk):
    """Conservative candidate clusters per ray block.

    o_blk, d_blk: [B, R, 3] sorted rays; t_max_blk: [B, R].
    Returns (order [B, C] candidate cluster ids sorted by conservative entry,
             n_cand [B]).

    Correctness argument: for any ray r in the block and any axis a,
    entry_a(r) >= LB_a and exit_a(r) <= UB_a where LB/UB are interval-
    arithmetic bounds over the block's origin/direction ranges. Hence
    max_a LB_a <= max_a entry_a(r) and min_a UB_a >= min_a exit_a(r); if a
    member ray intersects the slab (max_a entry < min_a exit, aabb.hpp:21),
    the conservative test max_a LB_a <= min_a UB_a also passes.
    """
    olo = jnp.min(o_blk, axis=1)   # [B, 3]
    ohi = jnp.max(o_blk, axis=1)
    dlo = jnp.min(d_blk, axis=1)
    dhi = jnp.max(d_blk, axis=1)
    tmax_ub = jnp.max(t_max_blk, axis=1)  # [B]

    inf = jnp.float32(jnp.inf)
    lb = jnp.full((o_blk.shape[0], accel.num_clusters), -inf)
    ub = jnp.full((o_blk.shape[0], accel.num_clusters), inf)
    for a in range(3):
        bl = accel.bmin[None, :, a]  # [1, C]
        bh = accel.bmax[None, :, a]
        nlo = bl - ohi[:, None, a]   # [B, C] numerator interval low
        nhi = bh - olo[:, None, a]
        da_lo = dlo[:, None, a]
        da_hi = dhi[:, None, a]
        spans_zero = (da_lo <= 0.0) & (da_hi >= 0.0)
        # Interval quotient bounds over the 4 corner combinations; guard the
        # divisors so masked lanes don't produce NaNs that poison min/max.
        safe_lo = jnp.where(jnp.abs(da_lo) > 0, da_lo, 1.0)
        safe_hi = jnp.where(jnp.abs(da_hi) > 0, da_hi, 1.0)
        q1 = nlo / safe_lo
        q2 = nlo / safe_hi
        q3 = nhi / safe_lo
        q4 = nhi / safe_hi
        qmin = jnp.minimum(jnp.minimum(q1, q2), jnp.minimum(q3, q4))
        qmax = jnp.maximum(jnp.maximum(q1, q2), jnp.maximum(q3, q4))
        axis_lb = jnp.where(spans_zero, -inf, qmin)
        axis_ub = jnp.where(spans_zero, inf, qmax)
        lb = jnp.maximum(lb, axis_lb)
        ub = jnp.minimum(ub, axis_ub)

    cand = (lb <= ub) & (ub >= 0.0) & (lb <= tmax_ub[:, None])
    entry = jnp.where(cand, jnp.maximum(lb, 0.0), inf)
    order = jnp.argsort(entry, axis=1).astype(jnp.int32)  # candidates first
    n_cand = jnp.sum(cand, axis=1).astype(jnp.int32)
    return order, n_cand


def _mt_sweep(o_blk, d_blk, cv0, ce1, ce2, t_min, t_max_blk):
    """Dense Möller–Trumbore: [B,R] rays vs per-block [B,S] triangles.

    Returns (t [B,R,S] with inf where invalid, valid mask). Identical math to
    core.geometry.moller_trumbore (triangle.hpp:23-67) with precomputed edges.
    """
    o = o_blk[:, :, None, :]
    d = d_blk[:, :, None, :]
    e1 = ce1[:, None, :, :]
    e2 = ce2[:, None, :, :]
    v0 = cv0[:, None, :, :]

    h = vec.cross(d, e2)
    a = vec.dot(e1, h)
    ok = jnp.abs(a) > MT_EPSILON
    f = 1.0 / jnp.where(ok, a, 1.0)
    s = o - v0
    u = f * vec.dot(s, h)
    q = vec.cross(s, e1)
    v = f * vec.dot(d, q)
    t = f * vec.dot(e2, q)
    ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    ok &= (t >= t_min) & (t <= t_max_blk[:, :, None])
    return jnp.where(ok, t, jnp.inf), ok


@partial(jax.jit, static_argnames=("block_size", "sort"))
def closest_hit_packets(
    accel: ClusterAccel,
    origins: jnp.ndarray,     # [N,3]; N must be a multiple of block_size
    directions: jnp.ndarray,  # [N,3]
    t_min,
    t_max,                    # scalar or [N]
    block_size: int = 256,
    sort: bool = True,
) -> PacketHit:
    n = origins.shape[0]
    assert n % block_size == 0, f"wave size {n} not a multiple of {block_size}"
    nb = n // block_size

    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    if sort:
        keys = _sort_keys(accel, origins, directions)
        perm = jnp.argsort(keys).astype(jnp.int32)
        origins = origins[perm]
        directions = directions[perm]
        t_max = t_max[perm]

    o_blk = origins.reshape(nb, block_size, 3)
    d_blk = directions.reshape(nb, block_size, 3)
    tmax_blk = t_max.reshape(nb, block_size)

    order, n_cand = _block_candidates(accel, o_blk, d_blk, tmax_blk)
    k_max = jnp.max(n_cand)

    def body(state):
        k, best_t, best_id = state
        cid = order[:, k]                       # [B] cluster per block
        blk_on = (k < n_cand)                   # [B]
        cv0 = accel.v0[cid]                     # [B, S, 3]
        ce1 = accel.e1[cid]
        ce2 = accel.e2[cid]
        cti = accel.tri_id[cid]                 # [B, S]

        # tMax shrink-pruning: current best t bounds the sweep (bvh.hpp:91).
        t_cap = jnp.minimum(tmax_blk, best_t)
        t, _ = _mt_sweep(o_blk, d_blk, cv0, ce1, ce2, t_min, t_cap)
        ct = jnp.min(t, axis=-1)                # [B, R]
        slot = jnp.argmin(t, axis=-1)           # first-min tie rule
        gid = jnp.take_along_axis(cti, slot.reshape(nb, -1), axis=1).reshape(ct.shape)

        closer = blk_on[:, None] & (ct < best_t)
        best_t = jnp.where(closer, ct, best_t)
        best_id = jnp.where(closer, gid, best_id)
        return k + 1, best_t, best_id

    def cond(state):
        k, _, _ = state
        return k < k_max

    init = (
        jnp.int32(0),
        jnp.full((nb, block_size), jnp.inf, jnp.float32),
        jnp.full((nb, block_size), -1, jnp.int32),
    )
    _, best_t, best_id = jax.lax.while_loop(cond, body, init)

    t_out = best_t.reshape(n)
    id_out = best_id.reshape(n)
    if sort:
        inv = jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
        t_out = t_out[inv]
        id_out = id_out[inv]
    return PacketHit(hit=jnp.isfinite(t_out), t=t_out, tri=id_out)


@partial(jax.jit, static_argnames=("block_size", "sort"))
def any_hit_packets(
    accel: ClusterAccel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    block_size: int = 256,
    sort: bool = True,
) -> jnp.ndarray:
    """Occlusion query over a wave; early-exits once every lane is resolved."""
    n = origins.shape[0]
    assert n % block_size == 0, f"wave size {n} not a multiple of {block_size}"
    nb = n // block_size

    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    if sort:
        keys = _sort_keys(accel, origins, directions)
        perm = jnp.argsort(keys).astype(jnp.int32)
        origins = origins[perm]
        directions = directions[perm]
        t_max = t_max[perm]

    o_blk = origins.reshape(nb, block_size, 3)
    d_blk = directions.reshape(nb, block_size, 3)
    tmax_blk = t_max.reshape(nb, block_size)

    order, n_cand = _block_candidates(accel, o_blk, d_blk, tmax_blk)
    k_max = jnp.max(n_cand)

    def body(state):
        k, occ = state
        cid = order[:, k]
        blk_on = (k < n_cand) & ~jnp.all(occ, axis=1)
        cv0 = accel.v0[cid]
        ce1 = accel.e1[cid]
        ce2 = accel.e2[cid]
        _, ok = _mt_sweep(o_blk, d_blk, cv0, ce1, ce2, t_min, tmax_blk)
        occ = occ | (blk_on[:, None] & jnp.any(ok, axis=-1))
        return k + 1, occ

    def cond(state):
        k, occ = state
        return (k < k_max) & ~jnp.all(occ)

    _, occluded = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((nb, block_size), bool))
    )
    out = occluded.reshape(n)
    if sort:
        inv = jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
        out = out[inv]
    return out
