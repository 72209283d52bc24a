"""Cluster-major pair-tile traversal: exact per-ray work, dense tiles.

The round-1 packet path (accel.traverse) culls whole 64-ray blocks against
cluster AABBs; on incoherent bounce waves the block candidate UNION is
5-15x the true per-ray candidate count, and that union waste was the
measured throughput ceiling (docs/ARCHITECTURE.md). This module removes it:

1. CULL     — every ray gets its own EXACT slab test against all cluster
              AABBs (no blocks, no unions, no ray sorting needed).
2. PACK     — the surviving (ray, cluster) pairs are packed CLUSTER-MAJOR:
              each cluster owns a contiguous segment of pair slots, padded
              to the tile width. One permutation scatter builds the table.
3. SWEEP    — tiles of `tile_rays` pair-lanes that share one cluster are
              intersected as dense [tile_rays, S] Möller–Trumbore sweeps
              (the identical elementwise math as the packet path, so results
              are exact vs brute force). Each cluster's triangle slab is
              gathered ONCE per tile and amortized over all its rays — the
              cluster-major analog of hardware `optixTrace` sharing BVH
              nodes across a warp (optix_kernels.cu:101-114).
4. RESOLVE  — per-ray results are gathered back from the pair table (each
              ray knows its own pair slots), with the lexicographic
              (t, triangle-id) tie rule of the brute-force oracle.

Total intersection work = sum over rays of their exact candidate count x S,
i.e. the per-ray-exact floor, with zero per-item scheduling overhead: the
whole sweep is one dense loop whose trip count tracks the REAL pair count
(dynamic while bound), not a worst-case.

Rays whose candidate count exceeds `cap`, or whose pairs fall beyond the
static pair budget, are completed exactly by the conservative packet path
(same contract as traverse.closest_hit_perray's fallback).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from path_tracer_ai_tpu.accel.clusters import ClusterAccel
from path_tracer_ai_tpu.accel import traverse
from path_tracer_ai_tpu.accel.traverse import PacketHit, _mt_sweep

I32_MAX = np.int32(2**31 - 1)  # np scalar: inlines as a literal in every trace


class PairTables(NamedTuple):
    """Static-shape pair scheduling tables for one wave."""

    pair_ray: jnp.ndarray      # [P] i32 ray id per pair slot (-1 = padding)
    tile_cluster: jnp.ndarray  # [P // T] i32 cluster id per tile
    dst: jnp.ndarray           # [N, cap] i32 pair slot of candidate k (=P if none)
    n_cand: jnp.ndarray        # [N] i32 candidates per ray (0 for overflow rays)
    overflow: jnp.ndarray      # [N] bool ray needs the packet fallback
    n_tiles: jnp.ndarray       # [] i32 REAL tile count (dynamic sweep bound)


def _ray_slab_chunk(accel: ClusterAccel, oc, dc, tc, t_min):
    """Exact inclusive slab test of a row chunk vs all cluster AABBs.

    oc, dc: [R, 3]; tc: [R] per-ray t_max (negative = dead ray).
    Returns cand [R, C] bool. Inclusive bounds (hi >= lo): flat AABBs along
    an axis must not be excluded (conservative contract).
    """
    inv = 1.0 / dc                                         # IEEE inf slopes
    t0 = (accel.bmin[None] - oc[:, None, :]) * inv[:, None, :]
    t1 = (accel.bmax[None] - oc[:, None, :]) * inv[:, None, :]
    near = jnp.where(inv[:, None, :] < 0.0, t1, t0)
    far = jnp.where(inv[:, None, :] < 0.0, t0, t1)
    lo = jnp.full(near.shape[:2], jnp.float32(t_min))
    hi = jnp.minimum(jnp.broadcast_to(tc[:, None], near.shape[:2]), jnp.inf)
    for a in range(3):
        lo = jnp.where(near[..., a] > lo, near[..., a], lo)
        hi = jnp.where(far[..., a] < hi, far[..., a], hi)
    return (hi >= lo) & (tc >= 0.0)[:, None]


def build_pair_tables(
    accel: ClusterAccel,
    origins: jnp.ndarray,     # [N, 3]
    directions: jnp.ndarray,  # [N, 3]
    t_min,
    t_max: jnp.ndarray,       # [N] (negative = dead lane)
    cap: int = 32,
    pair_budget: int = 8,
    tile_rays: int = 128,
    row_chunk: int = 1 << 15,
    pair_align: int = 1,
) -> PairTables:
    """CULL + PACK: exact per-ray candidates -> cluster-major pair table.

    Memory is bounded by scanning row chunks; a lax.scan carries the running
    per-cluster ray counts so each pair's rank inside its cluster segment is
    known in one pass (no second sweep over the wave).

    pair_align: pair capacity is rounded up to a multiple of
    tile_rays * pair_align so the sweep's chunked dynamic slices never clamp.
    """
    n = origins.shape[0]
    c = accel.num_clusters
    t = tile_rays
    # Static pair capacity, rounded to whole sweep chunks.
    unit = t * pair_align
    p_cap = -(-(n * pair_budget) // unit) * unit

    pad_rows = (-n) % row_chunk
    o = jnp.pad(origins, ((0, pad_rows), (0, 0)))
    d = jnp.pad(directions, ((0, pad_rows), (0, 0)), constant_values=1.0)
    tm = jnp.pad(t_max, (0, pad_rows), constant_values=-1.0)
    nch = o.shape[0] // row_chunk

    k_eff = min(cap, c)

    def scan_chunk(counts, args):
        oc, dc, tc = args
        cand = _ray_slab_chunk(accel, oc, dc, tc, t_min)
        n_cand = jnp.sum(cand, axis=1).astype(jnp.int32)
        over = n_cand > cap
        # Overflow rays contribute no pairs (the fallback covers them fully).
        cand = cand & ~over[:, None]
        ci = cand.astype(jnp.int32)
        # First k_eff set columns per row via ONE top_k (descending values
        # -col put the smallest set column ids first); per-row searchsorted
        # was measured ~20x slower on v5e.
        col = jnp.arange(c, dtype=jnp.int32)[None, :]
        neg = jnp.where(cand, -col, jnp.int32(-(2**30)))
        vals, _ = jax.lax.top_k(neg, k_eff)
        order = jnp.minimum(-vals, c - 1)
        # Rank of each ray inside each cluster's (row-ordered) ray list:
        # running count so far + exclusive cumsum down this chunk's rows.
        col_excl = jnp.cumsum(ci, axis=0) - ci                # [R, C]
        rank_full = counts[None, :] + col_excl                # [R, C]
        rank = jnp.take_along_axis(rank_full, order, axis=1)  # [R, k_eff]
        counts = counts + jnp.sum(ci, axis=0)
        return counts, (order, jnp.where(over, 0, n_cand), over, rank)

    counts0 = jnp.zeros((c,), jnp.int32)
    counts, (order, n_cand, overflow, rank) = jax.lax.scan(
        scan_chunk,
        counts0,
        (
            o.reshape(nch, row_chunk, 3),
            d.reshape(nch, row_chunk, 3),
            tm.reshape(nch, row_chunk),
        ),
    )
    order = order.reshape(-1, k_eff)[:n]
    n_cand = n_cand.reshape(-1)[:n]
    overflow = overflow.reshape(-1)[:n]
    rank = rank.reshape(-1, k_eff)[:n]

    # Cluster segments, padded so every tile holds exactly one cluster.
    seg = -(-counts // t) * t                                 # [C]
    base = jnp.cumsum(seg) - seg                              # exclusive
    total = jnp.sum(seg)                                      # dynamic

    slot = jnp.arange(k_eff, dtype=jnp.int32)[None, :]
    valid_k = slot < n_cand[:, None]
    dst = jnp.where(valid_k, base[order] + rank, p_cap)       # [N, k_eff]
    # Rays with any pair beyond the static budget complete via the fallback.
    over_budget = jnp.any(valid_k & (dst >= p_cap), axis=1)
    overflow = overflow | over_budget
    n_cand = jnp.where(over_budget, 0, n_cand)
    dst = jnp.where(over_budget[:, None], p_cap, dst)

    # One permutation scatter builds the cluster-major ray table (unique
    # destinations by construction; invalid slots index p_cap -> dropped).
    ray_ids = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], dst.shape
    )
    pair_ray = jnp.full((p_cap,), -1, jnp.int32)
    pair_ray = pair_ray.at[dst.reshape(-1)].set(
        ray_ids.reshape(-1), mode="drop", unique_indices=True
    )

    # Tile -> cluster: segment lookup at each tile's first slot.
    tile_starts = jnp.arange(p_cap // t, dtype=jnp.int32) * t
    tile_cluster = (
        jnp.searchsorted(base, tile_starts, side="right").astype(jnp.int32) - 1
    )
    tile_cluster = jnp.clip(tile_cluster, 0, c - 1)
    n_tiles = jnp.minimum(total, p_cap) // t

    if k_eff < cap:
        padk = cap - k_eff
        dst = jnp.pad(dst, ((0, 0), (0, padk)), constant_values=p_cap)
    return PairTables(pair_ray, tile_cluster, dst, n_cand, overflow, n_tiles)


def _sweep_tiles(
    accel: ClusterAccel,
    tables: PairTables,
    origins,
    directions,
    t_min,
    t_max,
    tile_rays: int,
    tile_chunk: int,
    want_tri: bool,
):
    """SWEEP: dense [tile_rays, S] MT per tile, chunked with a DYNAMIC trip
    count (only real tiles are visited; the static budget's dead tail is
    never swept). Returns per-pair (t, tri) or (hit,) arrays of size [P].
    """
    t = tile_rays
    p_cap = tables.pair_ray.shape[0]
    tc = tile_chunk
    n_tile_chunks = -(-tables.n_tiles // tc)                 # dynamic

    t_pair0 = jnp.full((p_cap,), jnp.inf, jnp.float32)
    tri_pair0 = jnp.full((p_cap,), I32_MAX, jnp.int32)
    occ_pair0 = jnp.zeros((p_cap,), bool)

    def body(i, carry):
        start = i * tc                                       # tile index
        cl = jax.lax.dynamic_slice(tables.tile_cluster, (start,), (tc,))
        pr = jax.lax.dynamic_slice(
            tables.pair_ray, (start * t,), (tc * t,)
        ).reshape(tc, t)
        live = pr >= 0
        pr_safe = jnp.maximum(pr, 0)
        ob = origins[pr_safe]                                # [tc, t, 3]
        db = jnp.where(live[..., None], directions[pr_safe], 1.0)
        tb = jnp.where(live, t_max[pr_safe], -1.0)           # dead -> no hits

        cv0 = accel.v0[cl]                                   # [tc, S, 3]
        ce1 = accel.e1[cl]
        ce2 = accel.e2[cl]

        tt, ok = _mt_sweep(ob, db, cv0, ce1, ce2, t_min, tb)  # [tc, t, S]
        if want_tri:
            t_pair, tri_pair = carry
            ct = jnp.min(tt, axis=-1)                        # [tc, t]
            # Lexicographic (t, global tri id) tie rule == the brute-force
            # oracle's first-min-in-array-order (intersect.closest_hit).
            cti = accel.tri_id[cl][:, None, :]               # [tc, 1, S]
            at_min = tt <= ct[..., None]
            tri_min = jnp.min(
                jnp.where(at_min & ok, cti, I32_MAX), axis=-1
            )
            t_pair = jax.lax.dynamic_update_slice(
                t_pair, ct.reshape(-1), (start * t,)
            )
            tri_pair = jax.lax.dynamic_update_slice(
                tri_pair, tri_min.reshape(-1), (start * t,)
            )
            return t_pair, tri_pair
        (occ_pair,) = carry
        occ = jnp.any(ok, axis=-1)                           # [tc, t]
        occ_pair = jax.lax.dynamic_update_slice(
            occ_pair, occ.reshape(-1), (start * t,)
        )
        return (occ_pair,)

    init = (t_pair0, tri_pair0) if want_tri else (occ_pair0,)
    return jax.lax.fori_loop(0, n_tile_chunks, body, init)


def _overflow_fallback(
    accel: ClusterAccel,
    origins,
    directions,
    t_min,
    t_max,
    overflow,
    want_tri: bool,
    compact_cap: int,
    fallback_block: int,
):
    """Packet-path completion for overflow rays, costed to the actual need.

    Overflow is rare by construction (candidate cap + pair budget are sized
    for the tails), so the common cases must be cheap: a lax.cond ladder
    runs NOTHING when no ray overflowed, a small gathered wave (compact_cap
    rays) when few did, and the full-wave packet pass only as a last
    resort. Returns wave-aligned arrays that are meaningful on overflow
    lanes only.
    """
    n = origins.shape[0]
    count = jnp.sum(overflow.astype(jnp.int32))

    if want_tri:
        empty = (jnp.full((n,), jnp.inf, jnp.float32),
                 jnp.full((n,), -1, jnp.int32))
    else:
        empty = (jnp.zeros((n,), bool),)

    def full_branch(_):
        pad = (-n) % fallback_block
        fo = jnp.pad(origins, ((0, pad), (0, 0)))
        fd = jnp.pad(directions, ((0, pad), (0, 0)), constant_values=1.0)
        ftm = jnp.pad(jnp.where(overflow, t_max, -1.0), (0, pad),
                      constant_values=-1.0)
        if want_tri:
            fb = traverse.closest_hit_packets(
                accel, fo, fd, t_min, ftm, block_size=fallback_block
            )
            return fb.t[:n], fb.tri[:n]
        fb = traverse.any_hit_packets(
            accel, fo, fd, t_min, ftm, block_size=fallback_block
        )
        return (fb[:n],)

    k = -(-compact_cap // fallback_block) * fallback_block
    if n <= k:
        return jax.lax.cond(count > 0, full_branch, lambda _: empty, None)

    def compact_branch(_):
        # Gather the overflow rays into a small dense wave. fill_value=n is
        # out of range: gathers clamp (dead lanes), scatters drop.
        idx = jnp.nonzero(overflow, size=k, fill_value=n)[0].astype(jnp.int32)
        live = jnp.arange(k, dtype=jnp.int32) < count
        gi = jnp.minimum(idx, n - 1)
        o = origins[gi]
        d = jnp.where(live[:, None], directions[gi], 1.0)
        tm = jnp.where(live, t_max[gi], -1.0)
        if want_tri:
            fb = traverse.closest_hit_packets(
                accel, o, d, t_min, tm, block_size=fallback_block
            )
            t_full = empty[0].at[idx].set(fb.t, mode="drop")
            tri_full = empty[1].at[idx].set(fb.tri, mode="drop")
            return t_full, tri_full
        fb = traverse.any_hit_packets(
            accel, o, d, t_min, tm, block_size=fallback_block
        )
        return (empty[0].at[idx].set(fb, mode="drop"),)

    return jax.lax.cond(
        count == 0,
        lambda _: empty,
        lambda _: jax.lax.cond(count <= k, compact_branch, full_branch, _),
        None,
    )


@partial(
    jax.jit,
    inline=True,
    static_argnames=(
        "cap", "pair_budget", "tile_rays", "row_chunk", "tile_chunk",
        "fallback_block", "fallback_compact",
    ),
)
def closest_hit_pairs(
    accel: ClusterAccel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    cap: int = 32,
    pair_budget: int = 8,
    tile_rays: int = 128,
    row_chunk: int = 1 << 15,
    tile_chunk: int = 256,
    fallback_block: int = 64,
    fallback_compact: int = 4096,
) -> PacketHit:
    """Closest hit via cluster-major pair tiles; exact for every ray."""
    n = origins.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tables = build_pair_tables(
        accel, origins, directions, t_min, t_max,
        cap=cap, pair_budget=pair_budget, tile_rays=tile_rays,
        row_chunk=row_chunk, pair_align=tile_chunk,
    )
    t_pair, tri_pair = _sweep_tiles(
        accel, tables, origins, directions, t_min, t_max,
        tile_rays, tile_chunk, want_tri=True,
    )

    # RESOLVE: gather each ray's pair results (no scatter-min needed — every
    # ray knows its own pair slots) with the lexicographic tie rule.
    p_cap = tables.pair_ray.shape[0]
    dstc = jnp.minimum(tables.dst, p_cap - 1)
    valid_k = tables.dst < p_cap
    tk = jnp.where(valid_k, t_pair[dstc], jnp.inf)            # [N, cap]
    best_t = jnp.min(tk, axis=1)
    trik = jnp.where(valid_k & (tk <= best_t[:, None]), tri_pair[dstc], I32_MAX)
    best_tri = jnp.min(trik, axis=1)

    # Overflow rays (candidate cap / pair budget) via the packet path.
    fb_t, fb_tri = _overflow_fallback(
        accel, origins, directions, t_min, t_max, tables.overflow,
        want_tri=True, compact_cap=fallback_compact, fallback_block=fallback_block,
    )
    best_t = jnp.where(tables.overflow, fb_t, best_t)
    best_tri = jnp.where(tables.overflow, fb_tri, best_tri)

    hit = jnp.isfinite(best_t)
    return PacketHit(hit=hit, t=best_t, tri=jnp.where(hit, best_tri, -1))


@partial(
    jax.jit,
    inline=True,
    static_argnames=(
        "cap", "pair_budget", "tile_rays", "row_chunk", "tile_chunk",
        "fallback_block", "fallback_compact",
    ),
)
def any_hit_pairs(
    accel: ClusterAccel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    cap: int = 32,
    pair_budget: int = 8,
    tile_rays: int = 128,
    row_chunk: int = 1 << 15,
    tile_chunk: int = 256,
    fallback_block: int = 64,
    fallback_compact: int = 4096,
) -> jnp.ndarray:
    """Occlusion query via cluster-major pair tiles; exact for every ray."""
    n = origins.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tables = build_pair_tables(
        accel, origins, directions, t_min, t_max,
        cap=cap, pair_budget=pair_budget, tile_rays=tile_rays,
        row_chunk=row_chunk, pair_align=tile_chunk,
    )
    (occ_pair,) = _sweep_tiles(
        accel, tables, origins, directions, t_min, t_max,
        tile_rays, tile_chunk, want_tri=False,
    )

    p_cap = tables.pair_ray.shape[0]
    dstc = jnp.minimum(tables.dst, p_cap - 1)
    valid_k = tables.dst < p_cap
    occluded = jnp.any(valid_k & occ_pair[dstc], axis=1)

    (fb_occ,) = _overflow_fallback(
        accel, origins, directions, t_min, t_max, tables.overflow,
        want_tri=False, compact_cap=fallback_compact,
        fallback_block=fallback_block,
    )
    return jnp.where(tables.overflow, fb_occ, occluded)
