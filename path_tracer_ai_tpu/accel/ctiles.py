"""Cluster-major tile traversal: per-ray-exact work, bandwidth-free sweeps.

Round-2 measurements (docs/ARCHITECTURE.md) localized the traversal budget
in two places the earlier backends could not fix simultaneously:

- WORK: conservative interval culling over ray-block direction bounds
  explodes when blocks are origin-sorted (any block whose 8 rays span a
  direction axis sees most of the scene), so block-major worklists are
  pinned to dir-major sorting and its ~4100 tests/ray on bounce waves —
  5-10x the per-ray-exact floor (~4-6 clusters/ray).
- BANDWIDTH: per-ray-exact schedules (accel.kslots) gather a private copy
  of every candidate cluster's triangles per ray (~55 KB/ray); measured
  gather bandwidth (63 GB/s) caps that design at ~1 Mrays/s regardless of
  compute.

This backend splits the difference so neither cost appears:

1. SORT      — rays sorted by (octant, fine origin Morton) into blocks of
               B rays ("octorig": blocks share an origin cell AND a
               direction octant, minimizing the union of exact sets).
2. CULL      — PER-RAY inclusive slab tests against all cluster AABBs,
               packed into per-ray bitmask words; the block's candidate
               set is the bitwise OR over its rays — the TRUE union of
               exact per-ray sets, immune to direction spread (the
               conservative interval test is not used at all).
3. PAIRS     — (block, cluster) work items; each block's candidates are
               peeled from the OR'd bitmask in ascending-id order.
4. TRANSPOSE — items are reordered CLUSTER-major (argsort by cluster id)
               and each cluster's item list padded to whole tiles of
               T//B blocks. A tile's 128 rays all intersect ONE cluster,
               so the sweep gathers each cluster's triangles once per
               tile instead of once per item — triangle traffic drops
               from O(items * S * 36B) (~18 GB/bounce-wave) to
               O(tiles * S * 36B), and the sweep runs at the dense
               [tiles, T, S] shape measured at ~25 Gtests/s on v5e.
5. SWEEP     — chunked dense Möller–Trumbore, per-item-lane (t, tri).
6. RESOLVE   — results unsorted back to item order (one inverse-
               permutation scatter), then per-block min-reduction with
               the oracle's (t, triangle-id) tie rule.

Blocks whose union exceeds `cap` (or whose items overflow the budget)
complete exactly via the compacted pair-tile fallback, like the other
backends. Traversal is EXACT for every ray (tests/test_accel.py compares
against brute force).

Reference roles: hardware optixTrace + GAS
(/root/reference/src/gpu/ptx/optix_kernels.cu:101-114,
 /root/reference/src/gpu/optix_renderer.cu:233-353) and BVH descent
(/root/reference/include/bvh.hpp:74-116).

Scale note: the flat per-ray cull materializes [rows, C] masks in chunks;
fine to a few thousand clusters (~256k triangles at S=128). Larger scenes
should use the 2-level worklist backend until the hierarchical cull lands
here.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from path_tracer_ai_tpu.accel.clusters import ClusterAccel
from path_tracer_ai_tpu.accel.kslots import _ray_slab
from path_tracer_ai_tpu.accel.traverse import PacketHit, _mt_sweep
from path_tracer_ai_tpu.accel.worklist import (
    I32_MAX,
    _extract_k,
    _overflow_fallback,
    _prepare_blocks,
    _unsort,
)


def _ray_masks(accel: ClusterAccel, o_blk, d_blk, tm_blk, t_min, row_chunk):
    """Per-ray exact cull -> per-BLOCK OR'd candidate sets.

    Returns (cand [nb, C] bool, n_cand [nb] i32). Dead rays contribute
    nothing. Inclusive slab bounds (flat AABBs stay in); NaN guards per
    kslots._ray_slab.
    """
    nb, b = o_blk.shape[:2]

    pad_rows = (-nb) % row_chunk
    if pad_rows:
        o_blk = jnp.pad(o_blk, ((0, pad_rows), (0, 0), (0, 0)))
        d_blk = jnp.pad(d_blk, ((0, pad_rows), (0, 0), (0, 0)),
                        constant_values=1.0)
        tm_blk = jnp.pad(tm_blk, ((0, pad_rows), (0, 0)),
                         constant_values=-1.0)
    nch = o_blk.shape[0] // row_chunk

    def one_chunk(args):
        oc, dc, tc = args
        r = row_chunk * b
        of = oc.reshape(r, 3)
        df = dc.reshape(r, 3)
        tf = tc.reshape(r)
        live = tf >= 0.0
        lo0 = jnp.full((r,), jnp.float32(t_min))
        hi0 = jnp.where(live, tf, -jnp.inf)
        cand = _ray_slab(accel.bmin, accel.bmax, of, df, lo0, hi0)  # [r, C]
        cand = jnp.any(cand.reshape(row_chunk, b, -1), axis=1)
        return cand, jnp.sum(cand, axis=1).astype(jnp.int32)

    cand, n_cand = jax.lax.map(
        one_chunk,
        (
            o_blk.reshape(nch, row_chunk, b, 3),
            d_blk.reshape(nch, row_chunk, b, 3),
            tm_blk.reshape(nch, row_chunk, b),
        ),
    )
    c = cand.shape[-1]
    return cand.reshape(-1, c)[:nb], n_cand.reshape(-1)[:nb]


def _build_tiles(accel, cand, n_cand, cap, item_budget, tile_blocks):
    """Union tables -> cluster-major padded item slots.

    Returns a dict of index arrays; all shapes static except the live
    counts used as loop bounds.
    """
    nb = cand.shape[0]
    c = accel.num_clusters
    tb = tile_blocks
    i_cap = -(-(nb * item_budget) // tb) * tb

    over = n_cand > cap
    n_cand = jnp.where(over, 0, n_cand)
    ibase = jnp.cumsum(n_cand) - n_cand
    over_budget = ibase + n_cand > i_cap
    over = over | over_budget
    n_cand = jnp.where(over_budget, 0, n_cand)
    ibase = jnp.cumsum(n_cand) - n_cand
    n_items = jnp.sum(n_cand)

    # Per-block candidate ids, ascending (garbage past n_cand slots).
    # Small caps (block=1 per-ray pairs): popcount-bitmask peeling — cap
    # unrolled cheap passes over [nb, C/32] words. Large caps: lax.top_k
    # (the peel's unrolled trace would dominate compile time).
    if min(cap, c) <= 32:
        from path_tracer_ai_tpu.accel.kslots import _pack_bits, _peel_k

        words = _pack_bits(cand & ~over[:, None])
        order = jnp.minimum(_peel_k(words, min(cap, c), c), c - 1)
    else:
        neg_big = jnp.int32(-(2**30))
        col = jnp.arange(c, dtype=jnp.int32)[None, :]
        neg = jnp.where(cand & ~over[:, None], -col, neg_big)
        order = jnp.minimum(_extract_k(neg, min(cap, c), neg_big), c - 1)
    if cap > c:
        order = jnp.pad(order, ((0, 0), (0, cap - c)), constant_values=c - 1)

    # item j -> owning block (scatter-max + cummax, worklist trick)
    mark = jnp.where(n_cand > 0, ibase, i_cap)
    item_block = (
        jnp.zeros((i_cap,), jnp.int32)
        .at[mark].max(jnp.arange(nb, dtype=jnp.int32), mode="drop")
    )
    item_block = jax.lax.cummax(item_block)
    j = jnp.arange(i_cap, dtype=jnp.int32)
    k = j - ibase[item_block]
    live = j < n_items
    cid = order[item_block, jnp.minimum(k, cap - 1)]
    cid = jnp.where(live, cid, c)                             # sentinel c

    # Cluster-major order; sorted position -> padded tile slot.
    perm = jnp.argsort(cid).astype(jnp.int32)                 # [i_cap]
    cid_sorted = cid[perm]
    base = jnp.searchsorted(
        cid_sorted, jnp.arange(c + 1, dtype=jnp.int32)
    ).astype(jnp.int32)                                       # [c+1]
    counts = base[1:] - base[:-1]                             # [c]
    pcounts = (-(-counts // tb)) * tb
    pbase = jnp.cumsum(pcounts) - pcounts                     # [c]
    n_slots = jnp.sum(pcounts)

    ni_pad = i_cap + tb * c                   # static bound, tb-divisible
    mark2 = jnp.where(pcounts > 0, pbase, ni_pad)
    slot_cid = (
        jnp.zeros((ni_pad,), jnp.int32)
        .at[mark2].max(jnp.arange(c, dtype=jnp.int32), mode="drop")
    )
    slot_cid = jax.lax.cummax(slot_cid)                       # [ni_pad]

    p = jnp.arange(ni_pad, dtype=jnp.int32)
    rank = p - pbase[slot_cid]
    slot_live = (rank < counts[slot_cid]) & (p < n_slots)
    q = jnp.minimum(base[slot_cid] + rank, i_cap - 1)
    slot_item = jnp.where(slot_live, perm[q], 0)              # [ni_pad]

    # item j -> its padded slot (for the unsort after the sweep)
    inv_perm = (
        jnp.zeros((i_cap,), jnp.int32).at[perm].set(j)
    )
    item_slot = pbase[jnp.minimum(cid, c - 1)] + (inv_perm - base[
        jnp.minimum(cid, c - 1)])
    item_slot = jnp.where(live, item_slot, 0)

    return dict(
        order=order, n_cand=n_cand, ibase=ibase, overflow=over,
        item_block=item_block, slot_cid=slot_cid, slot_item=slot_item,
        slot_live=slot_live, item_slot=item_slot, n_slots=n_slots,
        i_cap=i_cap, ni_pad=ni_pad,
    )


def _sweep_tiles(
    accel, tiles, o_blk, d_blk, tm_blk, t_min,
    tile_blocks, tile_chunk, want_tri,
):
    """Dense [chunk, T, S] sweeps; one gathered cluster per TILE."""
    b = o_blk.shape[1]
    tb = tile_blocks
    t_lanes = tb * b
    ni_pad = tiles["ni_pad"]
    nt = ni_pad // tb
    tc = tile_chunk
    n_chunks = -(-(-(-tiles["n_slots"] // tb)) // tc)         # dynamic

    tile_cid = tiles["slot_cid"].reshape(nt, tb)[:, 0]
    blk_of_slot = tiles["item_block"][tiles["slot_item"]]
    slot_live = tiles["slot_live"]

    t_pad0 = jnp.full((nt, t_lanes), jnp.inf, jnp.float32)
    tri_pad0 = jnp.full((nt, t_lanes), I32_MAX, jnp.int32)
    occ_pad0 = jnp.zeros((nt, t_lanes), bool)

    def body(i, carry):
        start = i * tc
        cid_c = jax.lax.dynamic_slice(tile_cid, (start,), (tc,))
        blk_c = jax.lax.dynamic_slice(
            blk_of_slot, (start * tb,), (tc * tb,)
        )
        live_c = jax.lax.dynamic_slice(
            slot_live, (start * tb,), (tc * tb,)
        )
        ob = o_blk[blk_c].reshape(tc, t_lanes, 3)
        db = d_blk[blk_c].reshape(tc, t_lanes, 3)
        tm = jnp.where(
            live_c[:, None], tm_blk[blk_c], -1.0
        ).reshape(tc, t_lanes)
        cv0 = accel.v0[cid_c]                                 # [tc, S, 3]
        ce1 = accel.e1[cid_c]
        ce2 = accel.e2[cid_c]
        tt, ok = _mt_sweep(ob, db, cv0, ce1, ce2, t_min, tm)  # [tc, T, S]
        tt = jnp.where(ok, tt, jnp.inf)
        if want_tri:
            t_pad, tri_pad = carry
            ct = jnp.min(tt, axis=-1)                         # [tc, T]
            cti = accel.tri_id[cid_c][:, None, :]             # [tc, 1, S]
            tri_min = jnp.min(
                jnp.where((tt <= ct[..., None]) & ok, cti, I32_MAX), axis=-1
            )
            t_pad = jax.lax.dynamic_update_slice(t_pad, ct, (start, 0))
            tri_pad = jax.lax.dynamic_update_slice(
                tri_pad, tri_min, (start, 0)
            )
            return t_pad, tri_pad
        (occ_pad,) = carry
        occ_pad = jax.lax.dynamic_update_slice(
            occ_pad, jnp.any(ok, axis=-1), (start, 0)
        )
        return (occ_pad,)

    init = (t_pad0, tri_pad0) if want_tri else (occ_pad0,)
    out = jax.lax.fori_loop(0, n_chunks, body, init)
    # [nt, T] -> per item slot rows [ni_pad, b]
    return tuple(a.reshape(ni_pad, b) for a in out)


def _resolve_blocks(tiles, per_item, cap, nb, b, row_chunk, want_tri):
    """Per-block min over its item rows (gathered via ibase + slot map)."""
    i_cap = tiles["i_cap"]
    # item-order results: item j's row lives at padded slot item_slot[j]
    item_slot = tiles["item_slot"]

    rows = tiles["ibase"][:, None] + jnp.arange(cap, dtype=jnp.int32)[None]
    row_live = jnp.arange(cap, dtype=jnp.int32)[None, :] < \
        tiles["n_cand"][:, None]
    rowsc = jnp.minimum(rows, i_cap - 1)                      # [nb, cap]
    slot_rows = item_slot[rowsc]                              # [nb, cap]

    pad_rows = (-nb) % row_chunk
    if pad_rows:
        slot_rows = jnp.pad(slot_rows, ((0, pad_rows), (0, 0)))
        row_live = jnp.pad(row_live, ((0, pad_rows), (0, 0)))
    nch = slot_rows.shape[0] // row_chunk

    if want_tri:
        t_items, tri_items = per_item

        def one(args):
            sr, rl = args
            tk = jnp.where(rl[..., None], t_items[sr], jnp.inf)
            best_t = jnp.min(tk, axis=1)                      # [rc, B]
            trik = jnp.where(
                rl[..., None] & (tk <= best_t[:, None, :]),
                tri_items[sr], I32_MAX,
            )
            return best_t, jnp.min(trik, axis=1)

        bt, btri = jax.lax.map(one, (
            slot_rows.reshape(nch, row_chunk, cap),
            row_live.reshape(nch, row_chunk, cap),
        ))
        return bt.reshape(-1, b)[:nb], btri.reshape(-1, b)[:nb]

    (occ_items,) = per_item

    def one(args):
        sr, rl = args
        return (jnp.any(rl[..., None] & occ_items[sr], axis=1),)

    (occ,) = jax.lax.map(one, (
        slot_rows.reshape(nch, row_chunk, cap),
        row_live.reshape(nch, row_chunk, cap),
    ))
    return (occ.reshape(-1, b)[:nb],)


def _run(
    accel, origins, directions, t_min, t_max, *,
    block, cap, item_budget, tile_blocks, row_chunk, tile_chunk,
    sort, sort_mode, fallback_block, fallback_compact, want_tri,
):
    n = origins.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    o_blk, d_blk, tm_blk, perm, npad = _prepare_blocks(
        accel, origins, directions, t_max, block, sort, sort_mode
    )
    nb = o_blk.shape[0]
    cand, n_cand = _ray_masks(
        accel, o_blk, d_blk, tm_blk, t_min, row_chunk
    )
    tiles = _build_tiles(accel, cand, n_cand, cap, item_budget, tile_blocks)
    per_item = _sweep_tiles(
        accel, tiles, o_blk, d_blk, tm_blk, t_min,
        tile_blocks, tile_chunk, want_tri,
    )
    blk_res = _resolve_blocks(
        tiles, per_item, cap, nb, block, row_chunk, want_tri
    )
    res_u = _unsort(tuple(a.reshape(-1) for a in blk_res), perm, npad, n)

    over_blk = tiles["overflow"][:, None] & jnp.ones((nb, block), bool)
    (overflow_ray,) = _unsort((over_blk.reshape(-1),), perm, npad, n)
    fb = _overflow_fallback(
        accel, origins, directions, t_min, t_max, overflow_ray,
        want_tri=want_tri, compact_cap=fallback_compact,
        fallback_block=fallback_block,
    )
    return tuple(
        jnp.where(overflow_ray, f, r) for f, r in zip(fb, res_u)
    )


@partial(
    jax.jit,
    inline=True,
    static_argnames=(
        "block", "cap", "item_budget", "tile_blocks", "row_chunk",
        "tile_chunk", "sort", "sort_mode", "fallback_block",
        "fallback_compact",
    ),
)
def closest_hit_ctiles(
    accel: ClusterAccel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    block: int = 8,
    cap: int = 96,
    item_budget: int = 24,
    tile_blocks: int = 16,
    row_chunk: int = 1 << 11,
    tile_chunk: int = 256,
    sort: bool = True,
    sort_mode: str = "octorig",
    fallback_block: int = 64,
    fallback_compact: int = 1 << 17,
) -> PacketHit:
    """Closest hit via cluster-major tiles; exact for every ray."""
    best_t, best_tri = _run(
        accel, origins, directions, t_min, t_max,
        block=block, cap=cap, item_budget=item_budget,
        tile_blocks=tile_blocks, row_chunk=row_chunk, tile_chunk=tile_chunk,
        sort=sort, sort_mode=sort_mode, fallback_block=fallback_block,
        fallback_compact=fallback_compact, want_tri=True,
    )
    hit = jnp.isfinite(best_t)
    return PacketHit(hit=hit, t=best_t, tri=jnp.where(hit, best_tri, -1))


@partial(
    jax.jit,
    inline=True,
    static_argnames=(
        "block", "cap", "item_budget", "tile_blocks", "row_chunk",
        "tile_chunk", "sort", "sort_mode", "fallback_block",
        "fallback_compact",
    ),
)
def any_hit_ctiles(
    accel: ClusterAccel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    block: int = 8,
    cap: int = 96,
    item_budget: int = 24,
    tile_blocks: int = 16,
    row_chunk: int = 1 << 11,
    tile_chunk: int = 256,
    sort: bool = True,
    sort_mode: str = "octorig",
    fallback_block: int = 64,
    fallback_compact: int = 1 << 17,
) -> jnp.ndarray:
    """Occlusion query via cluster-major tiles; exact for every ray."""
    (occ,) = _run(
        accel, origins, directions, t_min, t_max,
        block=block, cap=cap, item_budget=item_budget,
        tile_blocks=tile_blocks, row_chunk=row_chunk, tile_chunk=tile_chunk,
        sort=sort, sort_mode=sort_mode, fallback_block=fallback_block,
        fallback_compact=fallback_compact, want_tri=False,
    )
    return occ
