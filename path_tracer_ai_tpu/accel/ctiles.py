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
3. PAIRS     — flat (block, cluster) pair domain: pair p = block p//cap,
               k-th candidate p%cap, so ownership is computed, never
               gathered (i_cap-sized index gathers cost ~25-45ms each on
               v5e — they dominated the v1 pipeline).
4. TRANSPOSE — ONE lax.sort by cluster id (payload = flat pair index);
               each cluster's pair list padded to whole tiles of
               `tile_blocks` blocks. A tile's 128 rays all intersect ONE
               cluster, so the sweep gathers each cluster's triangles
               once per tile instead of once per item — and runs at the
               dense [tiles, T, S] shape measured at ~25 Gtests/s.
5. SWEEP     — chunked dense Möller–Trumbore; slot->pair->block index
               math is chunk-local inside the (dynamically bounded)
               loop, so every stage scales with LIVE pairs.
6. RESOLVE   — fused into the sweep: per-block (t, tri) via chunked row
               scatter-min (59ms per 3.2M rows measured, vs 442ms for
               the gather-based resolve it replaces), with the oracle's
               (t, triangle-id) tie rule via a second MT-free pass.

Blocks whose union exceeds `cap` (or whose items overflow the budget)
complete exactly via the compacted pair-tile fallback, like the other
backends. Traversal is EXACT for every ray (tests/test_accel.py compares
against brute force).

Reference roles: hardware optixTrace + GAS
(/root/reference/src/gpu/ptx/optix_kernels.cu:101-114,
 /root/reference/src/gpu/optix_renderer.cu:233-353) and BVH descent
(/root/reference/include/bvh.hpp:74-116).

Scale note: the flat per-ray cull (levels=1) materializes [rows, C] masks
in chunks — fine to a few thousand clusters (~256k triangles at S=128).
Past that, levels=2 (`_block_candidates_2level`, auto-selected) culls a
per-block supercluster shortlist first and slab-tests only its children
per ray, keeping the cull linear in rays at 1M+ triangles while staying
per-ray-exact (a ray's candidates are a subset of its super candidates).
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


def _ray_masks(accel: ClusterAccel, o_blk, d_blk, tm_blk, t_min, row_chunk,
               live_blocks=None):
    """Per-ray exact cull -> per-BLOCK OR'd candidate sets.

    Returns (cand [nb, C] bool, n_cand [nb] i32). Dead rays contribute
    nothing. Inclusive slab bounds (flat AABBs stay in); NaN guards per
    kslots._ray_slab.

    live_blocks: dynamic count of blocks that can contain live rays (valid
    ONLY when rays are sorted dead-last); chunks past it are skipped —
    late-bounce waves are mostly dead and the flat slab is the dominant
    fixed cost.
    """
    nb, b = o_blk.shape[:2]
    c = accel.num_clusters

    pad_rows = (-nb) % row_chunk
    if pad_rows:
        o_blk = jnp.pad(o_blk, ((0, pad_rows), (0, 0), (0, 0)))
        d_blk = jnp.pad(d_blk, ((0, pad_rows), (0, 0), (0, 0)),
                        constant_values=1.0)
        tm_blk = jnp.pad(tm_blk, ((0, pad_rows), (0, 0)),
                         constant_values=-1.0)
    nch = o_blk.shape[0] // row_chunk

    o_ch = o_blk.reshape(nch, row_chunk, b, 3)
    d_ch = d_blk.reshape(nch, row_chunk, b, 3)
    t_ch = tm_blk.reshape(nch, row_chunk, b)

    def one_chunk(oc, dc, tc):
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

    if live_blocks is None:
        cand, n_cand = jax.lax.map(
            lambda args: one_chunk(*args), (o_ch, d_ch, t_ch)
        )
        return cand.reshape(-1, c)[:nb], n_cand.reshape(-1)[:nb]

    n_chunks = jnp.minimum(-(-live_blocks // row_chunk), nch)

    def body(i, carry):
        cand_all, n_all = carry
        cc, nc = one_chunk(o_ch[i], d_ch[i], t_ch[i])
        return (
            jax.lax.dynamic_update_slice(cand_all, cc[None], (i, 0, 0)),
            jax.lax.dynamic_update_slice(n_all, nc[None], (i, 0)),
        )

    cand0 = jnp.zeros((nch, row_chunk, c), bool)
    n0 = jnp.zeros((nch, row_chunk), jnp.int32)
    cand, n_cand = jax.lax.fori_loop(0, n_chunks, body, (cand0, n0))
    return cand.reshape(-1, c)[:nb], n_cand.reshape(-1)[:nb]


def _extract_order_flat(accel, cand, n_cand, cap, live_blocks=None,
                        row_chunk=1 << 11):
    """Per-block candidate ids (ascending) from flat [nb, C] masks.

    Returns (order [nb, kx], n_cand, over); garbage past n_cand slots.
    Small caps: popcount-bitmask peeling (cap cheap unrolled passes over
    [nb, C/32] words). Large caps: lax.top_k (the peel's unrolled trace
    would dominate compile time).
    """
    nb = cand.shape[0]
    c = accel.num_clusters
    over = n_cand > cap
    n_cand = jnp.where(over, 0, n_cand)

    kx = min(cap, c)
    if kx <= 32:
        from path_tracer_ai_tpu.accel.kslots import _pack_bits, _peel_k

        words = _pack_bits(cand & ~over[:, None])
        order = jnp.minimum(_peel_k(words, kx, c), c - 1)
    elif live_blocks is None:
        neg_big = jnp.int32(-(2**30))
        col = jnp.arange(c, dtype=jnp.int32)[None, :]
        neg = jnp.where(cand & ~over[:, None], -col, neg_big)
        order = jnp.minimum(_extract_k(neg, kx, neg_big), c - 1)
    else:
        # Chunked extraction bounded by the live-block prefix (rows past
        # it have n_cand == 0, so their order entries are never read).
        neg_big = jnp.int32(-(2**30))
        col = jnp.arange(c, dtype=jnp.int32)[None, :]
        pad_rows = (-nb) % row_chunk
        cand_p = jnp.pad(cand, ((0, pad_rows), (0, 0)))
        over_p = jnp.pad(over, (0, pad_rows))
        nch = cand_p.shape[0] // row_chunk
        cand_ch = cand_p.reshape(nch, row_chunk, c)
        over_ch = over_p.reshape(nch, row_chunk)
        n_chunks = jnp.minimum(-(-live_blocks // row_chunk), nch)

        def body(i, acc):
            neg = jnp.where(cand_ch[i] & ~over_ch[i][:, None], -col,
                            neg_big)
            oc = jnp.minimum(_extract_k(neg, kx, neg_big), c - 1)
            return jax.lax.dynamic_update_slice(acc, oc[None], (i, 0, 0))

        order0 = jnp.zeros((nch, row_chunk, kx), jnp.int32)
        order = jax.lax.fori_loop(0, n_chunks, body, order0)
        order = order.reshape(-1, kx)[:nb]
    return order, n_cand, over


def _block_candidates_2level(
    accel: ClusterAccel, o_blk, d_blk, tm_blk, t_min, cap, row_chunk,
    super_cap, live_blocks=None,
):
    """Hierarchical per-ray cull: supercluster shortlist per BLOCK, then
    per-RAY slab against only the shortlist's child clusters.

    The flat cull materializes [rows, C] masks — fine to a few thousand
    clusters, quadratic death at 1M+ triangles. This is the flat analog
    of BVH descent (bvh.hpp:74-116), per-ray-exact like the flat path:
    a ray's exact candidate set is a subset of its super candidate set,
    and the block shortlist is the OR of per-ray super sets, so no
    cluster a ray could hit is ever dropped (blocks whose super union
    exceeds super_cap overflow to the fallback). Child candidate ids come
    out ascending for free (supers ascend, children within a super
    ascend) — the same id-order contract as the flat extraction.

    Returns (order [nb, kx], n_cand [nb], over [nb]).
    """
    nb, b = o_blk.shape[:2]
    c = accel.num_clusters
    cs = accel.num_supers
    ss = accel.super_size
    scap = min(super_cap, cs)
    k_child = scap * ss
    kx = min(cap, k_child, c)
    neg_big = jnp.int32(-(2**30))

    pad_rows = (-nb) % row_chunk
    if pad_rows:
        o_blk = jnp.pad(o_blk, ((0, pad_rows), (0, 0), (0, 0)))
        d_blk = jnp.pad(d_blk, ((0, pad_rows), (0, 0), (0, 0)),
                        constant_values=1.0)
        tm_blk = jnp.pad(tm_blk, ((0, pad_rows), (0, 0)),
                         constant_values=-1.0)
    nch = o_blk.shape[0] // row_chunk

    o_ch = o_blk.reshape(nch, row_chunk, b, 3)
    d_ch = d_blk.reshape(nch, row_chunk, b, 3)
    t_ch = tm_blk.reshape(nch, row_chunk, b)

    def one_chunk(oc, dc, tc):
        rc = oc.shape[0]
        r = rc * b
        of = oc.reshape(r, 3)
        df = dc.reshape(r, 3)
        tf = tc.reshape(r)
        live = tf >= 0.0
        lo0 = jnp.full((r,), jnp.float32(t_min))
        hi0 = jnp.where(live, tf, -jnp.inf)

        # Level 1: per-ray super slab -> per-block OR -> shortlist.
        cand_s = _ray_slab(accel.sbmin, accel.sbmax, of, df, lo0, hi0)
        cand_sb = jnp.any(cand_s.reshape(rc, b, cs), axis=1)  # [rc, Cs]
        n_sup = jnp.sum(cand_sb, axis=1).astype(jnp.int32)
        over = n_sup > scap
        scol = jnp.arange(cs, dtype=jnp.int32)[None, :]
        negs = jnp.where(cand_sb & ~over[:, None], -scol, neg_big)
        sup = _extract_k(negs, scap, neg_big)                 # [rc, scap]
        # Empty shortlist slots come back as -neg_big = +2^30 (not
        # negative!): `sup >= 0` kept them all, so their clip to the LAST
        # super duplicated its children in the candidate count/order.
        # Harmless for exactness (duplicate sweeps), but it inflated
        # n_cand toward spurious cap overflows on every block whose
        # shortlist was shorter than super_cap.
        sup_live = sup < cs
        sup_c = jnp.clip(sup, 0, cs - 1)

        # Level 2: per-ray slab vs the block's gathered child AABBs
        # (whole-super contiguous rows; padding slots hold inverted
        # boxes that fail every slab test). Component-wise interval
        # refinement keeps temporaries at [rc, b, K] instead of
        # [rc, b, K, 3].
        cbmin = accel.cbmin[sup_c].reshape(rc, k_child, 3)
        cbmax = accel.cbmax[sup_c].reshape(rc, k_child, 3)
        inv = 1.0 / dc                                        # [rc, b, 3]
        lo = jnp.broadcast_to(
            jnp.float32(t_min), (rc, b, k_child)
        )
        hi = jnp.broadcast_to(
            jnp.where(tc >= 0.0, tc, -jnp.inf)[..., None], (rc, b, k_child)
        )
        for a in range(3):
            t0 = (cbmin[:, None, :, a] - oc[:, :, None, a]) * inv[:, :, None, a]
            t1 = (cbmax[:, None, :, a] - oc[:, :, None, a]) * inv[:, :, None, a]
            # Sign-select near/far (pairs._ray_slab_chunk form), NOT
            # min/max: min/max is inversion-INsensitive, so the padding
            # slots' inverted boxes (min=+3e37 > max=-3e37) would pass as
            # near-infinite boxes and inflate every shortlisted last-super
            # block by up to super_size-1 phantom candidates (spurious cap
            # overflows -> fallback). Sign-select makes inverted boxes
            # yield near=+big/far=-big, failing as documented.
            neg = inv[:, :, None, a] < 0.0
            near = jnp.where(neg, t1, t0)
            far = jnp.where(neg, t0, t1)
            # 0*inf NaN (origin on an axis-parallel slab plane) must keep
            # that axis unbounded: NaN compares false, so where-form keeps
            # the running bound (conservative).
            lo = jnp.where(near > lo, near, lo)
            hi = jnp.where(far < hi, far, hi)
        cand_k = jnp.any(hi >= lo, axis=1)                    # [rc, K]
        cand_k &= jnp.repeat(sup_live, ss, axis=1)
        cand_k &= ~over[:, None]

        child_id = (
            sup_c[:, :, None] * ss
            + jnp.arange(ss, dtype=jnp.int32)[None, None, :]
        ).reshape(rc, k_child)                                # ascending
        n_cand = jnp.sum(cand_k, axis=1).astype(jnp.int32)
        over = over | (n_cand > kx)
        cand_k &= ~over[:, None]
        n_cand = jnp.where(over, 0, n_cand)
        negk = jnp.where(cand_k, -child_id, neg_big)
        order = jnp.minimum(
            jnp.clip(_extract_k(negk, kx, neg_big), 0, None), c - 1
        )
        return order, n_cand, over

    if live_blocks is None:
        order, n_cand, over = jax.lax.map(
            lambda args: one_chunk(*args), (o_ch, d_ch, t_ch)
        )
        return (
            order.reshape(-1, kx)[:nb],
            n_cand.reshape(-1)[:nb],
            over.reshape(-1)[:nb],
        )

    n_chunks = jnp.minimum(-(-live_blocks // row_chunk), nch)

    def body(i, carry):
        ord_all, n_all, ov_all = carry
        oc, ncn, ov = one_chunk(o_ch[i], d_ch[i], t_ch[i])
        return (
            jax.lax.dynamic_update_slice(ord_all, oc[None], (i, 0, 0)),
            jax.lax.dynamic_update_slice(n_all, ncn[None], (i, 0)),
            jax.lax.dynamic_update_slice(ov_all, ov[None], (i, 0)),
        )

    ord0 = jnp.zeros((nch, row_chunk, kx), jnp.int32)
    n0 = jnp.zeros((nch, row_chunk), jnp.int32)
    ov0 = jnp.zeros((nch, row_chunk), bool)
    order, n_cand, over = jax.lax.fori_loop(
        0, n_chunks, body, (ord0, n0, ov0)
    )
    return (
        order.reshape(-1, kx)[:nb],
        n_cand.reshape(-1)[:nb],
        over.reshape(-1)[:nb],
    )


def _build_pairs(accel, order, n_cand, over, cap, tile_blocks, tile_chunk,
                 tile_group=1, split_head=0, split_tail_den=8):
    """Candidate tables -> cluster-major padded pair slots (flat domain).

    Pair p lives at flat index block*cap + k (k-th candidate of its
    block), so its owner is p // cap — COMPUTED, never gathered. One
    lax.sort by cluster id (payload = flat pair index) produces the
    cluster-major order; each cluster's pair list is padded to whole
    tiles of `tile_blocks` entries — or to `tile_group`-tile runs when
    the Pallas sweep consumes the table (its grid steps process
    tile_group tiles sharing ONE cluster, so a cluster run must never
    straddle a group). All per-slot index math happens chunk-locally
    inside the sweep loop, so nothing here scales with the static bound
    except the sort itself.

    order [nb, kx]: ascending candidate cluster ids per block (garbage
    past n_cand slots); over: blocks completing via the fallback.

    Returns a dict of index arrays; shapes static, live counts dynamic.
    """
    nb = order.shape[0]
    c = accel.num_clusters
    tb = tile_blocks

    if cap > order.shape[1]:
        order = jnp.pad(order, ((0, 0), (0, cap - order.shape[1])),
                        constant_values=c - 1)

    if split_head and split_head < cap:
        # SPLIT pair domain (round-5 candidate): the full nb*cap sort
        # domain is ~90% dead sentinel at cap=48 (measured mean union
        # ~6/block), so sort only the head columns k < H for every block
        # plus the tail columns of the few blocks whose union exceeds H,
        # compacted (cumsum+scatter over [nb] rows — cheap) into a
        # static budget of nb//split_tail_den block rows. Blocks past
        # the tail budget complete exactly via the overflow fallback
        # (rare: needs >nb/den blocks over H in one wave). Downstream is
        # unchanged — the sort payload IS the flat pair id b*cap+k in
        # both layouts, and within-cluster pair order is free (the
        # resolve is a lexicographic (t, tri) min). Unlike a per-block
        # cap cut (cap16 measured 2.5x WORSE — per-block overflow swamps
        # the fallback), the tail budget is a TOTAL bound with ~8x
        # headroom over the measured mean, so fallback traffic stays at
        # the cap-48 level.
        h = split_head
        tb_cap = max(1, nb // split_tail_den)
        is_tail = n_cand > h
        tail_rank = jnp.cumsum(is_tail.astype(jnp.int32))     # inclusive
        over_budget = is_tail & (tail_rank > tb_cap)
        over = over | over_budget
        n_cand = jnp.where(over_budget, 0, n_cand)
        kidx = jnp.arange(h, dtype=jnp.int32)[None, :]
        livek_h = kidx < n_cand[:, None]
        key_h = jnp.where(livek_h, order[:, :h], c).reshape(-1)
        pid_h = (jnp.arange(nb, dtype=jnp.int32)[:, None] * cap
                 + kidx).reshape(-1)
        # Compact the tail blocks (block order preserved -> deterministic
        # budget cut), then gather only their tail columns.
        tpos = jnp.where(is_tail & ~over_budget, tail_rank - 1, tb_cap)
        tail_blk = (
            jnp.full((tb_cap,), nb, jnp.int32)
            .at[tpos].set(jnp.arange(nb, dtype=jnp.int32), mode="drop")
        )
        tb_live = tail_blk < nb
        tbi = jnp.minimum(tail_blk, nb - 1)
        kt = h + jnp.arange(cap - h, dtype=jnp.int32)[None, :]
        livek_t = tb_live[:, None] & (kt < n_cand[tbi][:, None])
        key_t = jnp.where(livek_t, order[tbi, h:cap], c).reshape(-1)
        pid_t = (tbi[:, None] * cap + kt).reshape(-1)
        key = jnp.concatenate([key_h, key_t])
        pid = jnp.concatenate([pid_h, pid_t])
        n_pairs = int(key.shape[0])
        key_sorted, perm = jax.lax.sort((key, pid), num_keys=1)
    else:
        # Flat pair keys: cid for live pairs, sentinel c for dead slots.
        livek = jnp.arange(cap, dtype=jnp.int32)[None, :] < n_cand[:, None]
        key = jnp.where(livek, order, c).reshape(-1)          # [nb*cap]
        n_pairs = nb * cap
        key_sorted, perm = jax.lax.sort(
            (key, jnp.arange(n_pairs, dtype=jnp.int32)), num_keys=1
        )

    base = jnp.searchsorted(
        key_sorted, jnp.arange(c + 1, dtype=jnp.int32)
    ).astype(jnp.int32)                                       # [c+1]
    counts = base[1:] - base[:-1]                             # [c]
    unit = tb * tile_group
    pcounts = (-(-counts // unit)) * unit
    pbase = jnp.cumsum(pcounts) - pcounts                     # [c]
    n_slots = jnp.sum(pcounts)

    # Static bound; rounded so the tile count divides tile_chunk exactly
    # (the sweep's dynamic_slice must never clamp: chunk-local p_idx math
    # would desynchronize from a clamped slice).
    step = tb * tile_chunk
    assert step % unit == 0, (tile_chunk, tile_group)
    ni_pad = -(-(n_pairs + unit * c) // step) * step
    mark = jnp.where(pcounts > 0, pbase, ni_pad)
    slot_cid = (
        jnp.zeros((ni_pad,), jnp.int32)
        .at[mark].max(jnp.arange(c, dtype=jnp.int32), mode="drop")
    )
    slot_cid = jax.lax.cummax(slot_cid)                       # [ni_pad]

    # slot_pair [ni_pad]: flat pair id per padded slot (-1 = dead padding),
    # built by ONE chunked scatter over the LIVE sorted prefix (dead keys
    # sort last). The sweep previously resolved slot -> pair with three
    # [c]-table gathers PER SLOT PER PASS (pbase/counts lookups + perm) —
    # at ~7 cycles/row that indirection cost more than the MT it fed;
    # here it is paid once, at pair (not slot x passes) granularity.
    n_live_pairs = base[c]                                    # dynamic
    pair_chunk = min(1 << 17, n_pairs)
    n_pc = -(-n_pairs // pair_chunk)
    pad_q = n_pc * pair_chunk - n_pairs
    key_s = jnp.pad(key_sorted, (0, pad_q), constant_values=c)
    perm_p = jnp.pad(perm, (0, pad_q))
    n_chunks_p = jnp.minimum(-(-n_live_pairs // pair_chunk), n_pc)

    def pair_body(i, sp):
        q0 = i * pair_chunk
        keys = jax.lax.dynamic_slice(key_s, (q0,), (pair_chunk,))
        prm = jax.lax.dynamic_slice(perm_p, (q0,), (pair_chunk,))
        qi = q0 + jnp.arange(pair_chunk, dtype=jnp.int32)
        live = qi < n_live_pairs                              # => keys < c
        kc = jnp.minimum(keys, c - 1)
        pos = pbase[kc] + (qi - base[kc])
        pos = jnp.where(live, pos, ni_pad)                    # drop
        return sp.at[pos].set(prm, mode="drop")

    slot_pair = jax.lax.fori_loop(
        0, n_chunks_p, pair_body, jnp.full((ni_pad,), -1, jnp.int32)
    )

    return dict(
        overflow=over, slot_pair=slot_pair,
        slot_cid=slot_cid, n_slots=n_slots,
    )


def _sweep_resolve(
    accel, pairs, o_blk, d_blk, tm_blk, t_min,
    cap, tile_blocks, tile_chunk, want_tri,
    use_pallas=False, interpret=False, sub_skip=False, pack_t=False,
):
    """Fused sweep + resolve: dense [chunk, T, S] MT over cluster-major
    tiles, per-block reduction via chunked row scatter-min.

    Per chunk: slot -> sorted position -> flat pair -> owning block, all
    via small chunk-local gathers; every cost here scales with the LIVE
    pair count (the fori_loop bound is dynamic), not the static pair cap.
    The (t, triangle-id) tie rule needs the final per-block t before tri
    ids can be masked, so a second (cheap, MT-free) pass re-reads the
    stored per-slot results and scatter-mins the masked ids.

    use_pallas=True swaps the chunk's dense XLA MT for the fused Pallas
    tile sweep (accel.pallas_ctiles — measured 27.5-32.9 vs 22.8 Gtests/s
    on v5e at the production shape, exact agreement): rays are gathered
    chunk-locally into [tc, 8, T] tile packs, the kernel's scalar-prefetch
    cluster ids ride the cluster-major order so consecutive grid steps
    elide the triangle DMA, and the per-slot (t, tri) reduction happens
    in-kernel. Requires pairs built with tile_group == pallas_ctiles.GROUP.
    """
    nb, b = o_blk.shape[:2]
    tb = tile_blocks
    t_lanes = tb * b
    ni_pad = pairs["slot_cid"].shape[0]
    nt = ni_pad // tb
    tc = tile_chunk
    n_tiles = -(-pairs["n_slots"] // tb)
    n_chunks = -(-n_tiles // tc)                              # dynamic

    slot_cid = pairs["slot_cid"]
    slot_pair = pairs["slot_pair"]

    def chunk_indices(start):
        """Chunk-local slot -> (cid [tc*tb], blk [tc*tb], live [tc*tb]).

        Pure slices of the precomputed slot tables — zero per-slot
        gathers (the table is built once in _build_pairs)."""
        sc = jax.lax.dynamic_slice(slot_cid, (start * tb,), (tc * tb,))
        sp = jax.lax.dynamic_slice(slot_pair, (start * tb,), (tc * tb,))
        live = sp >= 0
        blk = jnp.where(live, sp // cap, nb)
        return sc, blk, live

    def mt_chunk(start):
        sc, blk, live = chunk_indices(start)
        blkc = jnp.minimum(blk, nb - 1)
        ob = o_blk[blkc].reshape(tc, t_lanes, 3)
        db = d_blk[blkc].reshape(tc, t_lanes, 3)
        tm = jnp.where(
            live[:, None], tm_blk[blkc], -1.0
        ).reshape(tc, t_lanes)
        cid_c = sc.reshape(tc, tb)[:, 0]
        cv0 = accel.v0[cid_c]                                 # [tc, S, 3]
        ce1 = accel.e1[cid_c]
        ce2 = accel.e2[cid_c]
        tt, ok = _mt_sweep(ob, db, cv0, ce1, ce2, t_min, tm)  # [tc, T, S]
        tt = jnp.where(ok, tt, jnp.inf)
        return sc, blk, tt, ok, cid_c

    if use_pallas:
        from path_tracer_ai_tpu.accel import pallas_ctiles as pc

        assert tc % pc.GROUP == 0, (tc, pc.GROUP)
        tri_pack = pc.pack_tris(accel)
        if pack_t:
            # Pre-transposed [C, S, 16] pack: the kernel consumes trit
            # directly (no per-step transpose) — bitwise-identical output
            # (round-5 ladder; transposition is exact).
            tri_pack = jnp.swapaxes(tri_pack, 1, 2)
        tmin_row = jnp.broadcast_to(
            jnp.asarray(t_min, jnp.float32), (nb, 1, b)
        )
        # Block-row ray pack [nb+1, 8, b] (component rows x ray lanes);
        # row nb is the dead block that dead slots gather — its t_max=-1
        # kills every test, matching mt_chunk's live masking.
        rb = jnp.concatenate(
            [
                jnp.moveaxis(o_blk, 1, 2),                    # [nb, 3, b]
                jnp.moveaxis(d_blk, 1, 2),
                tm_blk[:, None, :],
                tmin_row,
            ],
            axis=1,
        )
        dead = jnp.concatenate(
            [
                jnp.zeros((1, 3, b), jnp.float32),
                jnp.ones((1, 3, b), jnp.float32),
                jnp.full((1, 1, b), -1.0, jnp.float32),
                tmin_row[:1],
            ],
            axis=1,
        )
        ray_blocks = jnp.concatenate([rb, dead], axis=0)      # [nb+1, 8, b]

        def slot_chunk(start):
            """-> (blk [tc*tb], per-slot closest ct/tri_min [tc, T])."""
            sc, blk, _live = chunk_indices(start)
            rg = ray_blocks[blk]                              # [tc*tb, 8, b]
            rays_pack = (
                rg.reshape(tc, tb, 8, b)
                .transpose(0, 2, 1, 3)
                .reshape(tc, 8, t_lanes)
            )
            cid_c = sc.reshape(tc, tb)[:, 0]
            ct, tri_min = pc.tile_sweep(
                tri_pack, rays_pack, cid_c, interpret=interpret,
                sub_skip=sub_skip, pack_t=pack_t,
            )
            return blk, ct, tri_min
    else:

        def slot_chunk(start):
            _, blk, tt, ok, cid_c = mt_chunk(start)
            ct = jnp.min(tt, axis=-1)                         # [tc, T]
            cti = accel.tri_id[cid_c][:, None, :]             # [tc, 1, S]
            tri_min = jnp.min(
                jnp.where((tt <= ct[..., None]) & ok, cti, I32_MAX), axis=-1
            )
            return blk, ct, tri_min

    if not want_tri:
        occ0 = jnp.zeros((nb, b), jnp.int32)

        if use_pallas:

            def body(i, occ_blk):
                blk, _ct, tri_min = slot_chunk(i * tc)
                # tri_min != I32_MAX iff any slot test passed — exact
                # any(ok) even for (pathological) t = +inf hits.
                occ_c = (tri_min != I32_MAX).reshape(tc * tb, b)
                return occ_blk.at[blk].max(occ_c.astype(jnp.int32),
                                           mode="drop")
        else:

            def body(i, occ_blk):
                _, blk, tt, ok, _ = mt_chunk(i * tc)
                occ_c = jnp.any(ok, axis=-1).reshape(tc * tb, b)
                return occ_blk.at[blk].max(occ_c.astype(jnp.int32),
                                           mode="drop")

        occ_blk = jax.lax.fori_loop(0, n_chunks, body, occ0)
        return (occ_blk > 0,)

    # Pass 1: per-slot (t, tri) stored; per-block t scatter-min'd.
    t_pad0 = jnp.full((nt, t_lanes), jnp.inf, jnp.float32)
    tri_pad0 = jnp.full((nt, t_lanes), I32_MAX, jnp.int32)
    t_blk0 = jnp.full((nb, b), jnp.inf, jnp.float32)

    def body1(i, carry):
        t_pad, tri_pad, t_blk = carry
        start = i * tc
        blk, ct, tri_min = slot_chunk(start)
        t_blk = t_blk.at[blk].min(ct.reshape(tc * tb, b), mode="drop")
        t_pad = jax.lax.dynamic_update_slice(t_pad, ct, (start, 0))
        tri_pad = jax.lax.dynamic_update_slice(tri_pad, tri_min, (start, 0))
        return t_pad, tri_pad, t_blk

    t_pad, tri_pad, t_blk = jax.lax.fori_loop(
        0, n_chunks, body1, (t_pad0, tri_pad0, t_blk0)
    )

    # Pass 2 (MT-free): min tri id among slots achieving the block best.
    tri_blk0 = jnp.full((nb, b), I32_MAX, jnp.int32)

    def body2(i, tri_blk):
        start = i * tc
        _, blk, _ = chunk_indices(start)
        ct = jax.lax.dynamic_slice(t_pad, (start, 0), (tc, t_lanes))
        ctri = jax.lax.dynamic_slice(tri_pad, (start, 0), (tc, t_lanes))
        ct = ct.reshape(tc * tb, b)
        ctri = ctri.reshape(tc * tb, b)
        tb_best = t_blk[jnp.minimum(blk, nb - 1)]             # [tc*tb, b]
        keep = ct <= tb_best
        return tri_blk.at[blk].min(
            jnp.where(keep, ctri, I32_MAX), mode="drop"
        )

    tri_blk = jax.lax.fori_loop(0, n_chunks, body2, tri_blk0)
    return t_blk, tri_blk


def _run(
    accel, origins, directions, t_min, t_max, *,
    block, cap, tile_blocks, row_chunk, tile_chunk,
    sort, sort_mode, fallback_block, fallback_compact, want_tri,
    use_pallas=False, interpret=False, levels=0, super_cap=48,
    sub_skip=False, fallback_sorted=False, pair_split=0, pallas_pack_t=False,
):
    n = origins.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    o_blk, d_blk, tm_blk, perm, npad = _prepare_blocks(
        accel, origins, directions, t_max, block, sort, sort_mode
    )
    nb = o_blk.shape[0]
    # Sorted waves put dead rays last (the key's lead bit), so the cull
    # and extraction can stop at the live-block prefix.
    live_blocks = None
    if sort:
        n_live = jnp.sum((t_max >= 0.0).astype(jnp.int32))
        live_blocks = -(-n_live // block)
    if levels == 0:
        # Auto: the flat [rows, C] cull pays while C is small; past ~2048
        # clusters the 2-level descent keeps the cull linear in rays.
        levels = 2 if accel.num_clusters > 2048 else 1
    if levels == 2:
        order, n_cand, over = _block_candidates_2level(
            accel, o_blk, d_blk, tm_blk, t_min, cap, row_chunk, super_cap,
            live_blocks=live_blocks,
        )
    else:
        cand, n_cand = _ray_masks(
            accel, o_blk, d_blk, tm_blk, t_min, row_chunk,
            live_blocks=live_blocks,
        )
        order, n_cand, over = _extract_order_flat(
            accel, cand, n_cand, cap, live_blocks=live_blocks,
            row_chunk=row_chunk,
        )
    tile_group = 1
    if use_pallas:
        from path_tracer_ai_tpu.accel.pallas_ctiles import GROUP as tile_group
    pairs = _build_pairs(accel, order, n_cand, over, cap, tile_blocks,
                         tile_chunk, tile_group=tile_group,
                         split_head=pair_split)
    blk_res = _sweep_resolve(
        accel, pairs, o_blk, d_blk, tm_blk, t_min,
        cap, tile_blocks, tile_chunk, want_tri,
        use_pallas=use_pallas, interpret=interpret, sub_skip=sub_skip,
        pack_t=pallas_pack_t,
    )
    over_blk = pairs["overflow"][:, None] & jnp.ones((nb, block), bool)
    if fallback_sorted:
        # Overflow completion in the SORTED domain (round-5 lever): run the
        # fallback on the already-sorted wave and merge BEFORE the unsort,
        # so the packed unsort scatter carries one fewer column (t,tri vs
        # t,tri,over — probe K measured the 3-col unsort at 50.8ms/2^20
        # wave) and the overflow select runs pre-slice. Bit-exact: the
        # fallback's per-(ray, tri) MT arithmetic and the lexicographic
        # (t, tri) resolve are independent of ray order/block composition.
        over_s = over_blk.reshape(-1)
        fb = _overflow_fallback(
            accel, o_blk.reshape(npad, 3), d_blk.reshape(npad, 3),
            t_min, tm_blk.reshape(npad), over_s,
            want_tri=want_tri, compact_cap=fallback_compact,
            fallback_block=fallback_block,
        )
        merged = tuple(
            jnp.where(over_s, f, r.reshape(-1))
            for f, r in zip(fb, blk_res)
        )
        return _unsort(merged, perm, npad, n)
    # ONE _unsort for results + overflow (it builds the inverse
    # permutation with a [npad] scatter per call — don't pay it twice).
    unsorted = _unsort(
        tuple(a.reshape(-1) for a in blk_res) + (over_blk.reshape(-1),),
        perm, npad, n,
    )
    res_u, overflow_ray = unsorted[:-1], unsorted[-1]
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
        "block", "cap", "tile_blocks", "row_chunk",
        "tile_chunk", "sort", "sort_mode", "fallback_block",
        "fallback_compact", "use_pallas", "interpret",
        "levels", "super_cap", "sub_skip", "fallback_sorted",
        "pair_split", "pallas_pack_t",
    ),
)
def closest_hit_ctiles(
    accel: ClusterAccel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    block: int = 8,
    cap: int = 48,
    tile_blocks: int = 16,
    row_chunk: int = 1 << 11,
    tile_chunk: int = 256,
    sort: bool = True,
    sort_mode: str = "octorig",
    fallback_block: int = 64,
    fallback_compact: int = 1 << 13,
    use_pallas: bool = False,
    interpret: bool = False,
    levels: int = 0,
    super_cap: int = 48,
    sub_skip: bool = False,
    fallback_sorted: bool = False,
    pair_split: int = 0,
    pallas_pack_t: bool = False,
) -> PacketHit:
    """Closest hit via cluster-major tiles; exact for every ray."""
    best_t, best_tri = _run(
        accel, origins, directions, t_min, t_max,
        block=block, cap=cap,
        tile_blocks=tile_blocks, row_chunk=row_chunk, tile_chunk=tile_chunk,
        sort=sort, sort_mode=sort_mode, fallback_block=fallback_block,
        fallback_compact=fallback_compact, want_tri=True,
        use_pallas=use_pallas, interpret=interpret,
        levels=levels, super_cap=super_cap, sub_skip=sub_skip,
        fallback_sorted=fallback_sorted, pair_split=pair_split,
        pallas_pack_t=pallas_pack_t,
    )
    hit = jnp.isfinite(best_t)
    return PacketHit(hit=hit, t=best_t, tri=jnp.where(hit, best_tri, -1))


@partial(
    jax.jit,
    inline=True,
    static_argnames=(
        "block", "cap", "tile_blocks", "row_chunk",
        "tile_chunk", "sort", "sort_mode", "fallback_block",
        "fallback_compact", "use_pallas", "interpret",
        "levels", "super_cap", "sub_skip", "fallback_sorted",
        "pair_split", "pallas_pack_t",
    ),
)
def any_hit_ctiles(
    accel: ClusterAccel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    block: int = 8,
    cap: int = 48,
    tile_blocks: int = 16,
    row_chunk: int = 1 << 11,
    tile_chunk: int = 256,
    sort: bool = True,
    sort_mode: str = "octorig",
    fallback_block: int = 64,
    fallback_compact: int = 1 << 13,
    use_pallas: bool = False,
    interpret: bool = False,
    levels: int = 0,
    super_cap: int = 48,
    sub_skip: bool = False,
    fallback_sorted: bool = False,
    pair_split: int = 0,
    pallas_pack_t: bool = False,
) -> jnp.ndarray:
    """Occlusion query via cluster-major tiles; exact for every ray."""
    (occ,) = _run(
        accel, origins, directions, t_min, t_max,
        block=block, cap=cap,
        tile_blocks=tile_blocks, row_chunk=row_chunk, tile_chunk=tile_chunk,
        sort=sort, sort_mode=sort_mode, fallback_block=fallback_block,
        fallback_compact=fallback_compact, want_tri=False,
        use_pallas=use_pallas, interpret=interpret,
        levels=levels, super_cap=super_cap, sub_skip=sub_skip,
        fallback_sorted=fallback_sorted, pair_split=pair_split,
        pallas_pack_t=pallas_pack_t,
    )
    return occ
