"""Per-ray K-slot traversal: exact per-ray candidates, one dense sweep.

The round-2 measurements (docs/ARCHITECTURE.md) killed every block-grouped
design for incoherent bounce waves: TRUE 8-block candidate unions average 75
clusters (p99 293) against ~4-6 per-ray exact, and the heavy tail carries
half the volume — block sweeps burn 8-15x the intersection floor no matter
how blocks are tuned. Pair packing (per-ray exact) pays a serialized
permutation scatter. This module removes BOTH by giving every ray its own
fixed K candidate slots:

1. CULL     — per-ray interval slab, two fixed levels: supercluster AABBs
              first, then the gathered children of the <= Ks surviving
              supers (the BVH-descent role, bvh.hpp:74-116, flattened).
2. EXTRACT  — candidate ids via POPCOUNT BITMASKS: the candidate set is
              packed into u32 words and the k lowest set bits are peeled
              with k unrolled isolate-lowest-bit steps (w & -w), each O(W)
              elementwise ops. Replaces lax.top_k, whose lane-axis sort was
              the dominant table cost (measured ~25-40ms per 2^20 wave).
3. SWEEP    — ONE dense masked Möller–Trumbore of shape [rows, K*S]: every
              ray tests exactly its own K gathered cluster slabs. No
              blocks, no sort, no scatter, no items — per-ray-exact work in
              the most VPU-friendly shape there is.
4. RESOLVE  — min-reduce over the row with the brute-force oracle's
              lexicographic (t, triangle-id) tie rule. Rays whose supers or
              clusters exceed the K budgets complete exactly via the
              compacted pair-tile fallback (worklist._overflow_fallback).

Everything is processed in fixed row chunks (lax.map) so peak memory is
O(row_chunk * K * S), independent of wave size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from path_tracer_ai_tpu.accel.clusters import ClusterAccel
from path_tracer_ai_tpu.accel.traverse import PacketHit, _mt_sweep
from path_tracer_ai_tpu.accel.worklist import I32_MAX, _overflow_fallback


def _pack_bits(cand: jnp.ndarray) -> jnp.ndarray:
    """[N, C] bool -> [N, W] uint32 candidate bitmask words (W = ceil(C/32))."""
    n, c = cand.shape
    w = -(-c // 32)
    pad = w * 32 - c
    if pad:
        cand = jnp.pad(cand, ((0, 0), (0, pad)))
    bits = cand.reshape(n, w, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None]
    return jnp.sum(bits * weights, axis=-1)


def _peel_k(words: jnp.ndarray, k: int, sentinel: int) -> jnp.ndarray:
    """Peel the k lowest set bits: [N, W] u32 -> [N, k] i32 bit positions.

    Rows with fewer than k set bits get `sentinel` in the remaining slots.
    Each step is a handful of elementwise ops (find first nonzero word,
    isolate its lowest bit with w & -w, position via popcount(b-1), clear) —
    O(k * W * N) total, versus lax.top_k's lane-axis sort.
    """
    n, w = words.shape
    widx = jnp.arange(w, dtype=jnp.int32)[None, :]
    out = []
    for _ in range(k):
        nz = words != 0
        any_nz = jnp.any(nz, axis=1)
        first = jnp.argmax(nz, axis=1).astype(jnp.int32)      # first True
        sel = jnp.take_along_axis(words, first[:, None], axis=1)[:, 0]
        b = sel & (~sel + jnp.uint32(1))                      # lowest set bit
        pos = first * 32 + jax.lax.population_count(
            b - jnp.uint32(1)
        ).astype(jnp.int32)
        out.append(jnp.where(any_nz, pos, jnp.int32(sentinel)))
        words = jnp.where(widx == first[:, None], (sel ^ b)[:, None], words)
    return jnp.stack(out, axis=1)


def _ray_slab(bmin, bmax, o, d, lo0, hi0):
    """Per-ray inclusive slab test: [N,3] rays vs [N,K,3] or [K,3] boxes.

    lo0/hi0: [N] initial interval (t_min, per-ray t_max). Returns cand
    [N, K] bool. Inclusive bounds (hi >= lo) keep flat AABBs in
    (conservative contract); IEEE inf slopes handle axis-parallel rays, and
    the 0*inf NaNs that arise when an origin sits exactly on a slab plane
    compare false (conservative would keep them — so guard them to keep).
    """
    inv = 1.0 / d                                             # [N, 3]
    if bmin.ndim == 2:
        bmin = bmin[None]
        bmax = bmax[None]
    o_ = o[:, None, :]
    inv_ = inv[:, None, :]
    t0 = (bmin - o_) * inv_
    t1 = (bmax - o_) * inv_
    near = jnp.minimum(t0, t1)
    far = jnp.maximum(t0, t1)
    # NaN (0 * inf: origin on the slab plane of an axis-parallel ray) must
    # not exclude: jnp.minimum/maximum propagate NaN, so replace with the
    # identity bounds for that axis.
    near = jnp.where(jnp.isnan(near), -jnp.inf, near)
    far = jnp.where(jnp.isnan(far), jnp.inf, far)
    lo = jnp.maximum(jnp.max(near, axis=-1), lo0[:, None])
    hi = jnp.minimum(jnp.min(far, axis=-1), hi0[:, None])
    return hi >= lo


def _chunk_pipeline(
    accel: ClusterAccel,
    oc, dc, tc,            # [R, 3], [R, 3], [R]
    t_min,
    k_supers: int,
    k_clusters: int,
    levels: int,
    want_tri: bool,
):
    """CULL -> EXTRACT -> SWEEP -> per-ray reduce, for one row chunk."""
    r = oc.shape[0]
    c = accel.num_clusters
    s = accel.cluster_size
    live = tc >= 0.0
    lo0 = jnp.full((r,), jnp.float32(t_min))
    hi0 = jnp.where(live, tc, -jnp.inf)

    if levels == 2:
        ss = accel.super_size
        cand_s = _ray_slab(accel.sbmin, accel.sbmax, oc, dc, lo0, hi0)
        n_sup = jnp.sum(cand_s, axis=1).astype(jnp.int32)
        over = n_sup > k_supers
        sup = _peel_k(_pack_bits(cand_s), k_supers, accel.num_supers)
        sup_c = jnp.minimum(sup, accel.num_supers - 1)
        # children of the selected supers (padding slots hold inverted
        # boxes that fail every slab test)
        cbmin = accel.cbmin[sup_c].reshape(r, k_supers * ss, 3)
        cbmax = accel.cbmax[sup_c].reshape(r, k_supers * ss, 3)
        sup_live = sup[:, :, None] < accel.num_supers
        sup_live = jnp.broadcast_to(sup_live, (r, k_supers, ss))
        cand = _ray_slab(cbmin, cbmax, oc, dc, lo0, hi0)
        cand &= sup_live.reshape(r, k_supers * ss)
        cid_table = (
            sup_c[:, :, None] * ss
            + jnp.arange(ss, dtype=jnp.int32)[None, None, :]
        ).reshape(r, k_supers * ss)
    else:
        cand = _ray_slab(accel.bmin, accel.bmax, oc, dc, lo0, hi0)
        over = jnp.zeros((r,), bool)
        cid_table = jnp.broadcast_to(
            jnp.arange(c, dtype=jnp.int32)[None, :], cand.shape
        )

    n_cand = jnp.sum(cand, axis=1).astype(jnp.int32)
    over = over | (n_cand > k_clusters)
    cand = cand & ~over[:, None]

    cols = cand.shape[1]
    slot = _peel_k(_pack_bits(cand), k_clusters, cols)        # [R, K]
    slot_live = slot < cols
    cid = jnp.take_along_axis(
        cid_table, jnp.minimum(slot, cols - 1), axis=1
    )                                                         # [R, K]
    cid = jnp.minimum(cid, c - 1)

    cv0 = accel.v0[cid].reshape(r, -1, 3)                     # [R, K*S, 3]
    ce1 = accel.e1[cid].reshape(r, -1, 3)
    ce2 = accel.e2[cid].reshape(r, -1, 3)
    tb = jnp.where(live & ~over, tc, -1.0)[:, None]           # [R, 1]
    tt, ok = _mt_sweep(
        oc[:, None, :], dc[:, None, :], cv0, ce1, ce2, t_min, tb
    )                                                         # [R, 1, K*S]
    tt = tt[:, 0]
    ok = ok[:, 0]
    mask = jnp.repeat(slot_live, s, axis=1)
    ok = ok & mask
    tt = jnp.where(ok, tt, jnp.inf)

    if want_tri:
        best_t = jnp.min(tt, axis=1)                          # [R]
        tri = accel.tri_id[cid].reshape(r, -1)
        best_tri = jnp.min(
            jnp.where(ok & (tt <= best_t[:, None]), tri, I32_MAX), axis=1
        )
        return best_t, best_tri, over
    return jnp.any(ok, axis=1), over


def _run(
    accel, origins, directions, t_min, t_max,
    k_supers, k_clusters, levels, row_chunk, want_tri,
):
    n = origins.shape[0]
    if levels == 0:
        # Flat slab against all C clusters only pays while C is small; the
        # 2-level descent is the production path.
        levels = 1 if accel.num_clusters <= 64 else 2
    pad = (-n) % row_chunk
    o = jnp.pad(origins, ((0, pad), (0, 0)))
    d = jnp.pad(directions, ((0, pad), (0, 0)), constant_values=1.0)
    tm = jnp.pad(t_max, (0, pad), constant_values=-1.0)
    nch = o.shape[0] // row_chunk

    def one(args):
        return _chunk_pipeline(
            accel, *args, t_min, k_supers, k_clusters, levels, want_tri
        )

    out = jax.lax.map(
        one,
        (
            o.reshape(nch, row_chunk, 3),
            d.reshape(nch, row_chunk, 3),
            tm.reshape(nch, row_chunk),
        ),
    )
    return tuple(a.reshape(-1)[:n] for a in out)


@partial(
    jax.jit,
    inline=True,
    static_argnames=(
        "k_supers", "k_clusters", "levels", "row_chunk",
        "fallback_block", "fallback_compact",
    ),
)
def closest_hit_kslots(
    accel: ClusterAccel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    k_supers: int = 6,
    k_clusters: int = 12,
    levels: int = 0,
    row_chunk: int = 1 << 15,
    fallback_block: int = 64,
    fallback_compact: int = 1 << 17,
) -> PacketHit:
    """Closest hit via per-ray K slots; exact for every ray."""
    n = origins.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    best_t, best_tri, over = _run(
        accel, origins, directions, t_min, t_max,
        k_supers, k_clusters, levels, row_chunk, want_tri=True,
    )
    fb_t, fb_tri = _overflow_fallback(
        accel, origins, directions, t_min, t_max, over,
        want_tri=True, compact_cap=fallback_compact,
        fallback_block=fallback_block,
    )
    best_t = jnp.where(over, fb_t, best_t)
    best_tri = jnp.where(over, fb_tri, best_tri)
    hit = jnp.isfinite(best_t)
    return PacketHit(hit=hit, t=best_t, tri=jnp.where(hit, best_tri, -1))


@partial(
    jax.jit,
    inline=True,
    static_argnames=(
        "k_supers", "k_clusters", "levels", "row_chunk",
        "fallback_block", "fallback_compact",
    ),
)
def any_hit_kslots(
    accel: ClusterAccel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    k_supers: int = 6,
    k_clusters: int = 12,
    levels: int = 0,
    row_chunk: int = 1 << 15,
    fallback_block: int = 64,
    fallback_compact: int = 1 << 17,
) -> jnp.ndarray:
    """Occlusion query via per-ray K slots; exact for every ray."""
    n = origins.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    occ, over = _run(
        accel, origins, directions, t_min, t_max,
        k_supers, k_clusters, levels, row_chunk, want_tri=False,
    )
    (fb_occ,) = _overflow_fallback(
        accel, origins, directions, t_min, t_max, over,
        want_tri=False, compact_cap=fallback_compact,
        fallback_block=fallback_block,
    )
    return jnp.where(over, fb_occ, occ)
