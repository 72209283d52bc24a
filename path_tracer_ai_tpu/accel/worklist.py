"""Block-major work-list traversal: flat pair enumeration, zero scatters.

A sibling of accel.pairs solving the same problem — make traversal work
track the TRUE candidate count instead of worst-case while_loop bounds —
with the opposite memory-layout tradeoff:

- accel.pairs groups (ray, cluster) pairs CLUSTER-major: exact per-ray
  candidate work, but packing the table needs one large permutation
  scatter (measured slow on TPU: XLA serializes element scatters).
- this module groups rays into small sorted blocks (default 8 lanes) and
  enumerates (block, candidate-group) WORK ITEMS as one flat list. Because
  an item's payload is just (block id, group index) and items of a block
  are consecutive, the whole table is built from cumsums + searchsorted —
  gathers only, NO scatter. Block rays are contiguous rows, so ray loads
  are dense slices, and the per-ray waste is only the 8-lane candidate
  union (vs the 64-lane unions that capped the round-1 cascade).

Pipeline: SORT (coherence keys, traverse._sort_keys) -> CULL (conservative
8-lane interval slab, exact-inclusive) -> ENUMERATE (items via cumsum /
searchsorted) -> SWEEP (dense [items, 8, group*S] Möller–Trumbore chunks
with a DYNAMIC trip count) -> RESOLVE (each block gathers its own item
rows; lexicographic (t, tri) tie rule = the brute-force oracle's).

Blocks whose candidates exceed `cap` or whose items exceed the static
budget complete exactly via the compact packet fallback (accel.pairs).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from path_tracer_ai_tpu.accel import pairs as pairs_mod
from path_tracer_ai_tpu.accel.clusters import ClusterAccel
from path_tracer_ai_tpu.accel.pairs import I32_MAX
from path_tracer_ai_tpu.accel.traverse import (
    PacketHit,
    _interval_slab,
    _mt_sweep,
    _ray_block_bounds,
    _sort_keys,
)


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
    """Complete overflow rays via PER-RAY pair tiles on a compacted wave.

    The worklist's overflow population is the incoherent candidate TAIL
    (measured on v5e bounce waves: 11-22% of 8-blocks exceed cap 96/64 and
    carry ~half the total candidate volume) — exactly where block unions
    are worthless and per-ray-exact scheduling is cheap. Ray counts are a
    small fraction of the wave, so the pair path's per-ray cull and
    permutation scatter (its full-wave costs) stay tiny. pairs itself
    completes ITS rare overflow (per-ray candidates > cap) via the packet
    path, so every ray still resolves exactly.

    Returns wave-aligned arrays meaningful on overflow lanes only.
    """
    n = origins.shape[0]
    count = jnp.sum(overflow.astype(jnp.int32))

    if want_tri:
        empty = (jnp.full((n,), jnp.inf, jnp.float32),
                 jnp.full((n,), -1, jnp.int32))
    else:
        empty = (jnp.zeros((n,), bool),)

    pair_kw = dict(cap=64, pair_budget=12, fallback_block=fallback_block)

    def whole_wave(_):
        # Last resort when MORE than compact_cap rays overflowed: the pair
        # path's per-ray table costs are prohibitive at whole-wave scale
        # (measured 2.3-2.4s per 2^20 wave on v5e), so the packet cascade —
        # whose dead-lane sort packs the non-overflow majority into inert
        # blocks — completes the tail instead.
        from path_tracer_ai_tpu.accel import traverse

        tmx = jnp.where(overflow, t_max, -1.0)
        pad = (-n) % fallback_block
        fo = jnp.pad(origins, ((0, pad), (0, 0)))
        fd = jnp.pad(directions, ((0, pad), (0, 0)), constant_values=1.0)
        ftm = jnp.pad(tmx, (0, pad), constant_values=-1.0)
        if want_tri:
            fb = traverse.closest_hit_packets(
                accel, fo, fd, t_min, ftm, block_size=fallback_block
            )
            return fb.t[:n], fb.tri[:n]
        fb = traverse.any_hit_packets(
            accel, fo, fd, t_min, ftm, block_size=fallback_block
        )
        return (fb[:n],)

    def small_wave(_):
        tmx = jnp.where(overflow, t_max, -1.0)
        if want_tri:
            fb = pairs_mod.closest_hit_pairs(
                accel, origins, directions, t_min, tmx, **pair_kw
            )
            return fb.t, fb.tri
        return (pairs_mod.any_hit_pairs(
            accel, origins, directions, t_min, tmx, **pair_kw
        ),)

    k = min(compact_cap, n)
    if n <= k:
        return jax.lax.cond(count > 0, small_wave, lambda _: empty, None)

    def compact_branch(_):
        # Gather the overflow rays into a small dense wave. fill_value=n is
        # out of range: gathers clamp (dead lanes), scatters drop.
        idx = jnp.nonzero(overflow, size=k, fill_value=n)[0].astype(jnp.int32)
        live = jnp.arange(k, dtype=jnp.int32) < count
        gi = jnp.minimum(idx, n - 1)
        o = origins[gi]
        d = jnp.where(live[:, None], directions[gi], 1.0)
        tmx = jnp.where(live, t_max[gi], -1.0)
        if want_tri:
            fb = pairs_mod.closest_hit_pairs(accel, o, d, t_min, tmx,
                                             **pair_kw)
            t_full = empty[0].at[idx].set(fb.t, mode="drop")
            tri_full = empty[1].at[idx].set(fb.tri, mode="drop")
            return t_full, tri_full
        fb = pairs_mod.any_hit_pairs(accel, o, d, t_min, tmx, **pair_kw)
        return (empty[0].at[idx].set(fb, mode="drop"),)

    return jax.lax.cond(
        count == 0,
        lambda _: empty,
        lambda _: jax.lax.cond(count <= k, compact_branch, whole_wave, _),
        None,
    )


def _extract_k(neg: jnp.ndarray, k: int, neg_big) -> jnp.ndarray:
    """First k set columns per row (descending top_k of -col = ascending
    column ids; garbage past the row's count — callers mask by n_cand).

    Measured on v5e at [131k, 256] k=64: lax.top_k 13ms; an unrolled
    argmax+mask loop 83ms; per-row searchsorted over cumsums ~340ms. top_k
    wins decisively — earlier table-build cost attributed to it was actually
    elsewhere (child-AABB gathers of the 2-level cull).
    """
    vals, _ = jax.lax.top_k(neg, k)
    return -vals


class WorkList(NamedTuple):
    item_block: jnp.ndarray  # [I] i32 block id per work item
    ibase: jnp.ndarray       # [nb] i32 first item of each block
    order_g: jnp.ndarray     # [nb, n_groups, g] candidate cluster ids
    n_cand: jnp.ndarray      # [nb] i32 candidates per block (0 if overflow)
    overflow: jnp.ndarray    # [nb] bool block completes via fallback
    n_items: jnp.ndarray     # [] i32 REAL item count (dynamic sweep bound)


def _build_worklist(
    accel: ClusterAccel,
    o_blk,        # [nb, B, 3] sorted ray blocks
    d_blk,
    tm_blk,       # [nb, B]
    t_min,
    cap: int,
    group: int,
    item_budget: int,
    row_chunk: int,
    item_align: int,
    levels: int = 0,
    super_cap: int = 32,
) -> WorkList:
    nb = o_blk.shape[0]
    c = accel.num_clusters
    if levels == 0:
        # Auto: the flat cull wins while [rows, C] slab + top_k stays cheap;
        # the 2-level cull pays per-block child-AABB gathers that only
        # amortize once C is large (million-triangle scenes).
        levels = 2 if c > 2048 else 1
    g = group
    i_cap = -(-(nb * item_budget) // item_align) * item_align

    k_eff = min(cap, c)
    if levels == 2:
        # The 2-level cull sees at most super_cap * super_size children, so
        # a block can never have more candidates than that.
        k_eff = min(
            k_eff, min(super_cap, accel.num_supers) * accel.super_size
        )
    n_groups = -(-k_eff // g)
    neg_big = jnp.int32(-(2**30))

    pad_rows = (-nb) % row_chunk
    if pad_rows:
        o_blk = jnp.pad(o_blk, ((0, pad_rows), (0, 0), (0, 0)))
        d_blk = jnp.pad(d_blk, ((0, pad_rows), (0, 0), (0, 0)),
                        constant_values=1.0)
        tm_blk = jnp.pad(tm_blk, ((0, pad_rows), (0, 0)),
                         constant_values=-1.0)
    nch = o_blk.shape[0] // row_chunk

    def one_chunk_flat(args):
        oc, dc, tc = args
        olo, ohi, dlo, dhi = _ray_block_bounds(oc, dc, live=tc >= 0.0)
        lb, ub = _interval_slab(accel.bmin, accel.bmax, olo, ohi, dlo, dhi)
        tmax_ub = jnp.max(tc, axis=1)
        # Inclusive bound (flat AABBs must stay in) + dead-block kill.
        cand = (
            (lb <= ub) & (ub >= 0.0)
            & (lb <= tmax_ub[:, None]) & (tmax_ub >= 0.0)[:, None]
        )
        n_cand = jnp.sum(cand, axis=1).astype(jnp.int32)
        over = n_cand > cap
        col = jnp.arange(c, dtype=jnp.int32)[None, :]
        neg = jnp.where(cand & ~over[:, None], -col, neg_big)
        order = jnp.minimum(_extract_k(neg, k_eff, neg_big), c - 1)
        return order, jnp.where(over, 0, n_cand), over

    def one_chunk_2level(args):
        """Supercluster prefilter, then child AABBs of surviving supers only.

        Cull cost drops from O(rows * C) to O(rows * (C/ss + super_cap*ss)),
        the flat analog of one BVH level (bvh.hpp:74-116) — decisive once C
        grows past ~1k (million-triangle scenes).
        """
        oc, dc, tc = args
        rows = oc.shape[0]
        ss = accel.super_size
        cs = accel.num_supers
        scap = min(super_cap, cs)
        olo, ohi, dlo, dhi = _ray_block_bounds(oc, dc, live=tc >= 0.0)
        tmax_ub = jnp.max(tc, axis=1)
        live = (tmax_ub >= 0.0)[:, None]

        lbs, ubs = _interval_slab(accel.sbmin, accel.sbmax, olo, ohi, dlo, dhi)
        cand_s = (lbs <= ubs) & (ubs >= 0.0) & (lbs <= tmax_ub[:, None]) & live
        ns = jnp.sum(cand_s, axis=1).astype(jnp.int32)
        over_s = ns > scap  # supers beyond the cap are unseen -> fallback

        scol = jnp.arange(cs, dtype=jnp.int32)[None, :]
        negs = jnp.where(cand_s & ~over_s[:, None], -scol, neg_big)
        sorder = jnp.minimum(_extract_k(negs, scap, neg_big), cs - 1)
        slot_ok = (
            jnp.arange(scap, dtype=jnp.int32)[None, :] < ns[:, None]
        )

        # Child boxes of candidate supers, gathered a WHOLE SUPER per row
        # (contiguous [ss, 3] slabs; fine-grained 12-byte-row gathers were
        # measured far slower). Padding children carry inverted boxes
        # (min > max) that fail the slab test without masking.
        child = (
            sorder[:, :, None] * ss
            + jnp.arange(ss, dtype=jnp.int32)[None, None, :]
        ).reshape(rows, scap * ss)                             # [rows, K]
        cbmin = accel.cbmin[sorder].reshape(rows, scap * ss, 3)
        cbmax = accel.cbmax[sorder].reshape(rows, scap * ss, 3)
        lb, ub = _interval_slab(cbmin, cbmax, olo, ohi, dlo, dhi)
        slot_ok_k = jnp.repeat(slot_ok, ss, axis=1)
        cand = (
            (lb <= ub) & (ub >= 0.0) & (lb <= tmax_ub[:, None])
            & slot_ok_k & live
        )
        n_cand = jnp.sum(cand, axis=1).astype(jnp.int32)
        over = over_s | (n_cand > cap)
        # Extract over the ACTUAL child cluster ids: smallest ids first,
        # the same id-order contract as the flat path.
        neg = jnp.where(cand & ~over[:, None], -child, neg_big)
        order = jnp.minimum(_extract_k(neg, k_eff, neg_big), c - 1)
        return order, jnp.where(over, 0, n_cand), over

    one_chunk = one_chunk_2level if levels == 2 else one_chunk_flat

    order, n_cand, overflow = jax.lax.map(
        one_chunk,
        (
            o_blk.reshape(nch, row_chunk, -1, 3),
            d_blk.reshape(nch, row_chunk, -1, 3),
            tm_blk.reshape(nch, row_chunk, -1),
        ),
    )
    order = order.reshape(-1, k_eff)[:nb]
    n_cand = n_cand.reshape(-1)[:nb]
    overflow = overflow.reshape(-1)[:nb]

    m = -(-n_cand // g)                                      # items per block
    ibase = jnp.cumsum(m) - m
    # Blocks whose items spill past the static budget -> fallback.
    over_budget = ibase + m > i_cap
    overflow = overflow | over_budget
    m = jnp.where(over_budget, 0, m)
    n_cand = jnp.where(over_budget, 0, n_cand)
    # Recompute bases with the spilled blocks dropped (keeps items packed).
    ibase = jnp.cumsum(m) - m
    n_items = jnp.sum(m)

    # item j -> owning block. Both sides are sorted, so instead of a
    # searchsorted over i_cap queries (~0.15us per query on v5e — it was
    # silently the dominant table cost) mark each nonempty block's first
    # item with its id (one tiny scatter-max) and forward-fill with cummax.
    mark_pos = jnp.where(m > 0, ibase, i_cap)                 # empty -> drop
    blk_ids = jnp.arange(nb, dtype=jnp.int32)
    item_block = (
        jnp.zeros((i_cap,), jnp.int32)
        .at[mark_pos].max(blk_ids, mode="drop")
    )
    item_block = jax.lax.cummax(item_block)

    pad_k = n_groups * g - k_eff
    if pad_k:
        order = jnp.pad(order, ((0, 0), (0, pad_k)))
    order_g = order.reshape(nb, n_groups, g)
    return WorkList(item_block, ibase, order_g, n_cand, overflow, n_items)


def _sweep_items(
    accel: ClusterAccel,
    wl: WorkList,
    o_blk,       # [nb, B, 3]
    d_blk,
    tm_blk,      # [nb, B]
    t_min,
    group: int,
    item_chunk: int,
    want_tri: bool,
    intersector: str = "exact",
):
    """Dense [chunk, B, g*S] sweeps over the flat item list (dynamic bound).

    intersector "exact" = elementwise Möller–Trumbore (bitwise-identical to
    the brute-force oracle); "mxu" = the matmul decomposition (accel.mxu) —
    same math, different rounding, runs on the systolic array. For "mxu" use
    a LARGE block (>=64) so the matmul's M dimension fills MXU rows. An
    optional ":precision" suffix ("mxu:high", "mxu:default") selects the
    matmul precision (see accel.mxu.mxu_sweep); bare "mxu" = "highest".
    """
    g = group
    b = o_blk.shape[1]
    i_cap = wl.item_block.shape[0]
    ic = item_chunk
    n_chunks = -(-wl.n_items // ic)                           # dynamic
    n_groups = wl.order_g.shape[1]

    is_mxu = intersector.startswith("mxu")
    mxu_prec = (
        intersector.split(":", 1)[1] if ":" in intersector else "highest"
    )
    if is_mxu:
        from path_tracer_ai_tpu.accel import mxu

        w_table = mxu.build_linear_table(accel)              # [C, 10, S, 4]
        g_blocks = mxu.ray_features(o_blk, d_blk)            # [nb, B, 10]

    t_items0 = jnp.full((i_cap, b), jnp.inf, jnp.float32)
    tri_items0 = jnp.full((i_cap, b), I32_MAX, jnp.int32)
    occ_items0 = jnp.zeros((i_cap, b), bool)

    def body(i, carry):
        start = i * ic
        j = start + jnp.arange(ic, dtype=jnp.int32)
        blk = jax.lax.dynamic_slice(wl.item_block, (start,), (ic,))
        k = j - wl.ibase[blk]                                 # group index
        k = jnp.clip(k, 0, n_groups - 1)
        live_item = j < wl.n_items

        cid = wl.order_g[blk, k]                              # [ic, g]
        ob = o_blk[blk]                                       # [ic, B, 3]
        db = d_blk[blk]
        tb = jnp.where(live_item[:, None], tm_blk[blk], -1.0)

        if is_mxu:
            from path_tracer_ai_tpu.accel import mxu

            wg = w_table[cid]                     # [ic, g, 10, S, 4]
            ss_ = accel.cluster_size
            wg = jnp.moveaxis(wg, 1, 2).reshape(ic, 10, g * ss_, 4)
            gf = g_blocks[blk]                    # [ic, B, 10]
            tt, ok = mxu.mxu_sweep(gf, wg, t_min, tb, precision=mxu_prec)
        else:
            cv0 = accel.v0[cid].reshape(ic, g * accel.cluster_size, 3)
            ce1 = accel.e1[cid].reshape(ic, -1, 3)
            ce2 = accel.e2[cid].reshape(ic, -1, 3)
            tt, ok = _mt_sweep(ob, db, cv0, ce1, ce2, t_min, tb)  # [ic,B,g*S]
        # Mask candidate slots past the block's count (their order entries
        # are searchsorted garbage pointing at cluster c-1).
        slot_live = (
            k[:, None] * g + jnp.arange(g, dtype=jnp.int32)[None, :]
            < wl.n_cand[blk][:, None]
        )                                                     # [ic, g]
        mask = jnp.repeat(slot_live, accel.cluster_size, axis=1)[:, None, :]
        ok = ok & mask
        tt = jnp.where(ok, tt, jnp.inf)

        if want_tri:
            t_items, tri_items = carry
            ct = jnp.min(tt, axis=-1)                         # [ic, B]
            cti = accel.tri_id[cid].reshape(ic, 1, -1)
            tri_min = jnp.min(
                jnp.where((tt <= ct[..., None]) & ok, cti, I32_MAX), axis=-1
            )
            t_items = jax.lax.dynamic_update_slice(t_items, ct, (start, 0))
            tri_items = jax.lax.dynamic_update_slice(
                tri_items, tri_min, (start, 0)
            )
            return t_items, tri_items
        (occ_items,) = carry
        occ_items = jax.lax.dynamic_update_slice(
            occ_items, jnp.any(ok, axis=-1), (start, 0)
        )
        return (occ_items,)

    init = (t_items0, tri_items0) if want_tri else (occ_items0,)
    return jax.lax.fori_loop(0, n_chunks, body, init)


def _prepare_blocks(accel, origins, directions, t_max, block, sort,
                    sort_mode="dir"):
    """Pad to block granularity, sort for coherence, reshape to blocks.

    The sort permutation is applied as ONE packed row gather ([npad, 7]:
    o|d|tm) instead of three narrow ones — TPU gathers cost ~7.4ns per ROW
    regardless of row width (docs/ARCHITECTURE.md), so packing divides the
    permute cost by the array count. Bit-exact: pure data movement.
    """
    n = origins.shape[0]
    pad = (-n) % block
    o = jnp.pad(origins, ((0, pad), (0, 0)))
    d = jnp.pad(directions, ((0, pad), (0, 0)), constant_values=1.0)
    tm = jnp.pad(t_max, (0, pad), constant_values=-1.0)
    npad = n + pad

    if sort:
        keys = _sort_keys(accel, o, d, tm, mode=sort_mode)
        perm = jnp.argsort(keys).astype(jnp.int32)
        packed = jnp.concatenate([o, d, tm[:, None]], axis=1)[perm]
        o, d, tm = packed[:, 0:3], packed[:, 3:6], packed[:, 6]
    else:
        perm = None

    nb = npad // block
    return (
        o.reshape(nb, block, 3),
        d.reshape(nb, block, 3),
        tm.reshape(nb, block),
        perm,
        npad,
    )


def _unsort(arrs, perm, npad, n):
    """Restore original ray order: ONE packed row scatter.

    out[perm[i]] = sorted[i] directly (row scatter-set, ~10.5ns/row) instead
    of building the inverse permutation (a scatter) and gathering each array
    through it (~7.4ns/row EACH) — all arrays are bitcast to one i32 matrix
    so the whole unsort costs a single row scatter. Bit-exact: i32 bitcasts
    are pure bit movement (no float canonicalization touches the payload).
    """
    if perm is None:
        return tuple(a[:n] for a in arrs)
    cols = [
        jax.lax.bitcast_convert_type(
            a if a.dtype != jnp.bool_ else a.astype(jnp.int32), jnp.int32
        )
        for a in arrs
    ]
    packed = jnp.stack(cols, axis=1)
    out = jnp.zeros((npad, len(cols)), jnp.int32).at[perm].set(packed)
    res = []
    for i, a in enumerate(arrs):
        col = out[:n, i]
        if a.dtype == jnp.bool_:
            res.append(col != 0)
        else:
            res.append(jax.lax.bitcast_convert_type(col, a.dtype))
    return tuple(res)


@partial(
    jax.jit,
    inline=True,
    static_argnames=(
        "block", "group", "cap", "item_budget", "row_chunk", "item_chunk",
        "sort", "sort_mode", "intersector", "levels", "super_cap",
        "fallback_block", "fallback_compact",
    ),
)
def closest_hit_worklist(
    accel: ClusterAccel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    block: int = 8,
    group: int = 4,
    cap: int = 64,
    item_budget: int = 6,
    row_chunk: int = 1 << 13,
    item_chunk: int = 1024,
    sort: bool = True,
    sort_mode: str = "dir",
    intersector: str = "exact",
    levels: int = 0,
    super_cap: int = 32,
    fallback_block: int = 64,
    fallback_compact: int = 32768,
) -> PacketHit:
    """Closest hit via the block-major work list; exact for every ray."""
    n = origins.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    o_blk, d_blk, tm_blk, perm, npad = _prepare_blocks(
        accel, origins, directions, t_max, block, sort, sort_mode
    )
    wl = _build_worklist(
        accel, o_blk, d_blk, tm_blk, t_min, cap, group, item_budget,
        row_chunk, item_align=item_chunk, levels=levels, super_cap=super_cap,
    )
    t_items, tri_items = _sweep_items(
        accel, wl, o_blk, d_blk, tm_blk, t_min, group, item_chunk,
        want_tri=True, intersector=intersector,
    )

    # RESOLVE: each block min-reduces its own (contiguous) item rows.
    n_groups = wl.order_g.shape[1]
    i_cap = wl.item_block.shape[0]
    nb = o_blk.shape[0]
    rows = wl.ibase[:, None] + jnp.arange(n_groups, dtype=jnp.int32)[None, :]
    m = -(-wl.n_cand // group)
    row_live = jnp.arange(n_groups, dtype=jnp.int32)[None, :] < m[:, None]
    rowsc = jnp.minimum(rows, i_cap - 1)
    tk = jnp.where(row_live[..., None], t_items[rowsc], jnp.inf)  # [nb,G,B]
    best_t = jnp.min(tk, axis=1)                                  # [nb, B]
    trik = jnp.where(
        row_live[..., None] & (tk <= best_t[:, None, :]),
        tri_items[rowsc], I32_MAX,
    )
    best_tri = jnp.min(trik, axis=1)

    (best_t_u, best_tri_u) = _unsort(
        (best_t.reshape(-1), best_tri.reshape(-1)), perm, npad, n
    )

    # Fallback for overflow blocks (their rays, compacted).
    over_blk = wl.overflow[:, None] & jnp.broadcast_to(
        jnp.ones((1, block), bool), (nb, block)
    )
    (overflow_ray,) = _unsort((over_blk.reshape(-1),), perm, npad, n)
    fb_t, fb_tri = _overflow_fallback(
        accel, origins, directions, t_min, t_max, overflow_ray,
        want_tri=True, compact_cap=fallback_compact,
        fallback_block=fallback_block,
    )
    best_t_u = jnp.where(overflow_ray, fb_t, best_t_u)
    best_tri_u = jnp.where(overflow_ray, fb_tri, best_tri_u)

    hit = jnp.isfinite(best_t_u)
    return PacketHit(hit=hit, t=best_t_u, tri=jnp.where(hit, best_tri_u, -1))


@partial(
    jax.jit,
    inline=True,
    static_argnames=(
        "block", "group", "cap", "item_budget", "row_chunk", "item_chunk",
        "sort", "sort_mode", "intersector", "levels", "super_cap",
        "fallback_block", "fallback_compact",
    ),
)
def any_hit_worklist(
    accel: ClusterAccel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    block: int = 8,
    group: int = 4,
    cap: int = 64,
    item_budget: int = 6,
    row_chunk: int = 1 << 13,
    item_chunk: int = 1024,
    sort: bool = True,
    sort_mode: str = "dir",
    intersector: str = "exact",
    levels: int = 0,
    super_cap: int = 32,
    fallback_block: int = 64,
    fallback_compact: int = 32768,
) -> jnp.ndarray:
    """Occlusion query via the block-major work list; exact for every ray."""
    n = origins.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    o_blk, d_blk, tm_blk, perm, npad = _prepare_blocks(
        accel, origins, directions, t_max, block, sort, sort_mode
    )
    wl = _build_worklist(
        accel, o_blk, d_blk, tm_blk, t_min, cap, group, item_budget,
        row_chunk, item_align=item_chunk, levels=levels, super_cap=super_cap,
    )
    (occ_items,) = _sweep_items(
        accel, wl, o_blk, d_blk, tm_blk, t_min, group, item_chunk,
        want_tri=False, intersector=intersector,
    )

    n_groups = wl.order_g.shape[1]
    i_cap = wl.item_block.shape[0]
    rows = wl.ibase[:, None] + jnp.arange(n_groups, dtype=jnp.int32)[None, :]
    m = -(-wl.n_cand // group)
    row_live = jnp.arange(n_groups, dtype=jnp.int32)[None, :] < m[:, None]
    rowsc = jnp.minimum(rows, i_cap - 1)
    occ_blk = jnp.any(row_live[..., None] & occ_items[rowsc], axis=1)

    (occ_u,) = _unsort((occ_blk.reshape(-1),), perm, npad, n)

    nb = o_blk.shape[0]
    over_blk = wl.overflow[:, None] & jnp.ones((nb, o_blk.shape[1]), bool)
    (overflow_ray,) = _unsort((over_blk.reshape(-1),), perm, npad, n)
    (fb_occ,) = _overflow_fallback(
        accel, origins, directions, t_min, t_max, overflow_ray,
        want_tri=False, compact_cap=fallback_compact,
        fallback_block=fallback_block,
    )
    return jnp.where(overflow_ray, fb_occ, occ_u)
