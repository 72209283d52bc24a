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
from path_tracer_ai_tpu.core.types import MT_EPSILON


class PacketHit(NamedTuple):
    hit: jnp.ndarray     # [N] bool
    t: jnp.ndarray       # [N] f32 (inf on miss)
    tri: jnp.ndarray     # [N] i32 global triangle index (-1 on miss)


def _sort_keys(accel: ClusterAccel, origins, directions, t_max=None,
               mode: str = "dir"):
    """Coherence key; dead rays (t_max < 0) always sort to the end so they
    pack into all-dead blocks with zero traversal candidates.

    mode="dir":    dead(1) | octant(3) | dir-Morton(9) | origin-Morton(18).
                   Direction bits lead — right for the WIDE conservative
                   block frustum (64-ray packets): a block whose directions
                   span a cone sees most of the scene.
    mode="origin": dead(1) | origin-Morton(18) | octant(3) | dir-Morton(9).
                   Origin bits lead — right for SMALL blocks whose cost is
                   the union of per-ray candidate sets: candidates of short
                   bounce rays are dominated by the near field around their
                   shared origin region.
    mode="octorig": dead(1) | octant(3) | origin-Morton(21).
                   Octant leads, then FINE origin — a block never mixes
                   octants (each octant's interval slab is tight) and its
                   rays share an origin cell; the fine dir-Morton bits are
                   dropped (noise at small blocks: diffuse bounce dirs are
                   near-uniform within an octant).
    mode="origoct": dead(1) | origin-Morton(21) | octant(3).
                   Fine origin leads, octant breaks ties within a cell.
    """
    octant = (
        (directions[:, 0] < 0).astype(jnp.uint32) * 4
        + (directions[:, 1] < 0).astype(jnp.uint32) * 2
        + (directions[:, 2] < 0).astype(jnp.uint32)
    )
    ones = jnp.ones((3,), jnp.float32)
    if mode == "octorig":
        ocell7 = morton3d(origins, accel.scene_min, accel.scene_max, bits=7)
        key = (octant << 21) | ocell7
    elif mode == "origoct":
        ocell7 = morton3d(origins, accel.scene_min, accel.scene_max, bits=7)
        key = (ocell7 << 3) | octant
    else:
        dcell = morton3d(directions, -ones, ones, bits=3)   # 9 bits
        ocell = morton3d(
            origins, accel.scene_min, accel.scene_max, bits=6
        )  # 18
        if mode == "origin":
            key = (ocell << 12) | (octant << 9) | dcell
        else:
            key = (octant << 27) | (dcell << 18) | ocell
    if t_max is not None:
        key = key | ((t_max < 0.0).astype(jnp.uint32) << 31)
    return key


def _interval_slab(bmin, bmax, olo, ohi, dlo, dhi):
    """Interval-arithmetic slab bounds of ray blocks vs AABBs.

    bmin/bmax: [K, 3] (one box table shared by all blocks) or [B, K, 3]
    (per-block gathered boxes). olo/ohi/dlo/dhi: [B, 3] block ray bounds.
    Returns (lb, ub) [B, K]: for every member ray, slab entry >= lb and
    exit <= ub (see _block_candidates' correctness argument).
    """
    shared = bmin.ndim == 2
    nb = olo.shape[0]
    kdim = bmin.shape[0] if shared else bmin.shape[1]

    inf = jnp.float32(jnp.inf)
    lb = jnp.full((nb, kdim), -inf)
    ub = jnp.full((nb, kdim), inf)
    for a in range(3):
        if shared:
            bl = bmin[None, :, a]    # [1, K]
            bh = bmax[None, :, a]
        else:
            bl = bmin[:, :, a]       # [B, K]
            bh = bmax[:, :, a]
        nlo = bl - ohi[:, a][:, None]   # [B, K] numerator interval low
        nhi = bh - olo[:, a][:, None]
        da_lo = dlo[:, a][:, None]
        da_hi = dhi[:, a][:, None]
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
    return lb, ub


def _ray_block_bounds(o_blk, d_blk, live=None):
    """Per-block origin/direction interval bounds ([B, R, 3] -> [B, 3] x4).

    live: optional [B, R] mask; DEAD lanes are excluded from the bounds.
    Dead lanes carry pinned placeholder rays (e.g. direct_lighting pins
    inactive lanes to origin 0), which would otherwise widen a mixed block's
    interval box to include the placeholder point and inflate its candidate
    union. Exactness is unaffected: dead lanes produce no intersections
    (t_max < 0 fails every MT window), and all-dead blocks yield inverted/
    NaN bounds whose slab comparisons are all false — and are additionally
    killed by the caller's tmax_ub >= 0 guard.
    """
    if live is None:
        return (
            jnp.min(o_blk, axis=1),
            jnp.max(o_blk, axis=1),
            jnp.min(d_blk, axis=1),
            jnp.max(d_blk, axis=1),
        )
    m = live[..., None]
    inf = jnp.float32(jnp.inf)
    return (
        jnp.min(jnp.where(m, o_blk, inf), axis=1),
        jnp.max(jnp.where(m, o_blk, -inf), axis=1),
        jnp.min(jnp.where(m, d_blk, inf), axis=1),
        jnp.max(jnp.where(m, d_blk, -inf), axis=1),
    )


def _block_interval_bounds(accel, o_blk, d_blk, live=None):
    """Block bounds vs ALL cluster AABBs (compat wrapper)."""
    olo, ohi, dlo, dhi = _ray_block_bounds(o_blk, d_blk, live=live)
    return _interval_slab(accel.bmin, accel.bmax, olo, ohi, dlo, dhi)


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

    DEAD lanes (t_max < 0) are excluded from the block bounds: they carry
    pinned placeholder rays (direct_lighting pins inactive lanes to
    origin 0 / +x) that would otherwise widen a mixed block's frustum to
    span the placeholder point — the measured cause of the unsorted-wave
    candidate blowup. Exact: dead lanes produce no intersections, so
    shrinking the bounds to live lanes never drops a reachable cluster.
    """
    lb, ub = _block_interval_bounds(accel, o_blk, d_blk,
                                    live=t_max_blk >= 0.0)
    tmax_ub = jnp.max(t_max_blk, axis=1)  # [B]
    inf = jnp.float32(jnp.inf)

    cand = (lb <= ub) & (ub >= 0.0) & (lb <= tmax_ub[:, None])
    entry = jnp.where(cand, jnp.maximum(lb, 0.0), inf)
    order = jnp.argsort(entry, axis=1).astype(jnp.int32)  # candidates first
    entry_sorted = jnp.take_along_axis(entry, order, axis=1)
    n_cand = jnp.sum(cand, axis=1).astype(jnp.int32)
    return order, n_cand, entry_sorted


def _exact_block_candidates(accel, o_blk, d_blk, tm_blk, t_min,
                            ksup: int = 16, row_chunk: int = 1 << 8,
                            live_blocks=None):
    """PER-RAY-EXACT OR-union candidate clusters per block (round-4 lever).

    The conservative interval cull (`_block_candidates`) over-includes by
    8-10x on real 128-lane shadow waves (probe_r4_exact_shadow: 551k->65k
    candidates at b128_dir bounce-0) — every over-included candidate costs
    the fused cascade a [16, S] cluster-pack DMA that sub_skip cannot
    remove (it gates the MT, not the fetch). This cull computes the exact
    union of per-lane slab hits via the 2-level hierarchy so its own cost
    stays bounded:

      1. per-LANE slab vs the Cs supercluster AABBs, OR'd per block;
      2. per-block super shortlist (top_k, cap `ksup`) -> gather the
         shortlisted supers' child AABBs ([ksup, super_size, 3] rows,
         contiguous per super);
      3. per-LANE slab vs the gathered children, OR'd per block
         (row-chunked: [row_chunk, B, ksup*super_size] at a time).

    Blocks whose per-block super union exceeds `ksup` fall back to the
    conservative candidate list (over-inclusion is exact; measured p99
    super count is ~20-24 of 41 at b128, so the tail is small). Returns
    (order [nb, C], n_cand [nb], entry_sorted [nb, C]) — the same
    interface and conservative-entry ordering as `_block_candidates`
    (exact ⊆ conservative, so every exact candidate has a finite
    conservative entry; the closest cascade's front-to-back gate and
    early t-shrink keep working). Dead lanes (t_max < 0) contribute
    nothing (hi0 = -inf fails every slab).

    The slab uses the sign-select near/far form, so the inverted padding
    boxes in the child table (clusters.py builds min=+3e37/max=-3e37 for
    the last partially-filled super) fail every lane — the advisor-flagged
    hazard of the min/max form. No scatters (scatter-resolve measured
    2.3x worse, docs/ARCHITECTURE.md): the candidate list is built by
    sorting shortlist-child ids directly.

    live_blocks: dynamic count of blocks that can contain live rays —
    valid ONLY when rays are sorted dead-last (same contract as
    ctiles._ray_masks). Chunks past it skip the per-lane slab stages
    entirely; their blocks keep n_cand = 0 (dead lanes have no
    candidates, so this is exact). Late-bounce shadow waves are mostly
    dead and the per-lane refine is the cull's dominant cost.

    Reference role: per-ray BVH descent culling (bvh.hpp:74-116 visits
    only child boxes the ray's slab test passes), flattened to the two
    fixed hierarchy levels and vectorized over lanes — the packet
    cascade's interval cull is the frustum analog; this is the per-ray
    one at block granularity.
    """
    nb, bs = o_blk.shape[:2]
    c = accel.num_clusters
    cs = accel.num_supers
    ss = accel.super_size
    kx = min(ksup, cs)
    kchild = kx * ss

    # Conservative list: the overflow fallback, the uniform [nb, C]
    # return shape, AND the entry values that order the exact candidates.
    lb, ub = _block_interval_bounds(accel, o_blk, d_blk,
                                    live=tm_blk >= 0.0)
    tmax_ub = jnp.max(tm_blk, axis=1)
    inf = jnp.float32(jnp.inf)
    cand_cons = (lb <= ub) & (ub >= 0.0) & (lb <= tmax_ub[:, None])
    entry_all = jnp.where(cand_cons, jnp.maximum(lb, 0.0), inf)
    order_cons = jnp.argsort(entry_all, axis=1).astype(jnp.int32)
    entry_cons = jnp.take_along_axis(entry_all, order_cons, axis=1)
    n_cons = jnp.sum(cand_cons, axis=1).astype(jnp.int32)

    def slab_lanes(o, d, hi0, bmn, bmx):
        """Sign-select slab: rays [..., 3] vs boxes bmn/bmx.

        o, d, hi0: [R, B, 3]/[R, B]; bmn/bmx: [K, 3] (shared) or
        [R, K, 3] (per-chunk-row gathered). Returns pass [R, B, K] bool.
        Component-wise chains (no [..., 3] stacking) so XLA fuses into
        the OR-reduction. NaN (origin exactly on a slab plane of an
        axis-parallel ray) must not exclude — guard to the identity
        bounds; inverted boxes still fail on their other axes.
        """
        inv = 1.0 / d
        lo = jnp.full(o.shape[:2] + (bmn.shape[-2],), jnp.float32(t_min))
        hi = hi0[..., None]
        for a in range(3):
            if bmn.ndim == 2:
                bl = bmn[None, None, :, a]
                bh = bmx[None, None, :, a]
            else:
                bl = bmn[:, None, :, a]
                bh = bmx[:, None, :, a]
            iv = inv[..., a][..., None]
            o_ = o[..., a][..., None]
            pos = iv >= 0.0
            tn = (jnp.where(pos, bl, bh) - o_) * iv
            tf = (jnp.where(pos, bh, bl) - o_) * iv
            tn = jnp.where(jnp.isnan(tn), -jnp.inf, tn)
            tf = jnp.where(jnp.isnan(tf), jnp.inf, tf)
            lo = jnp.maximum(lo, tn)
            hi = jnp.minimum(hi, tf)
        return lo <= hi

    pad_rows = (-nb) % row_chunk
    if pad_rows:
        o_blk = jnp.pad(o_blk, ((0, pad_rows), (0, 0), (0, 0)))
        d_blk = jnp.pad(d_blk, ((0, pad_rows), (0, 0), (0, 0)),
                        constant_values=1.0)
        tm_blk = jnp.pad(tm_blk, ((0, pad_rows), (0, 0)),
                         constant_values=-1.0)
    nch = o_blk.shape[0] // row_chunk
    o_ch = o_blk.reshape(nch, row_chunk, bs, 3)
    d_ch = d_blk.reshape(nch, row_chunk, bs, 3)
    t_ch = tm_blk.reshape(nch, row_chunk, bs)

    neg_big = jnp.int32(-(2**30))
    scol = jnp.arange(cs, dtype=jnp.int32)[None, :]
    child = jnp.arange(ss, dtype=jnp.int32)

    def one_chunk(args):
        oc, dc, tc = args                           # [R, B, ...]
        hi0 = jnp.where(tc >= 0.0, tc, -jnp.inf)    # dead lanes fail all
        # 1. per-lane slab vs supers, OR'd per block
        sup = slab_lanes(oc, dc, hi0, accel.sbmin, accel.sbmax)
        sup_blk = jnp.any(sup, axis=1)              # [R, Cs]
        n_sup = jnp.sum(sup_blk, axis=1).astype(jnp.int32)
        # 2. shortlist (ascending super ids; garbage slots clamp to a
        # DUPLICATE of super cs-1 — masked below via the slot index)
        neg = jnp.where(sup_blk, -scol, neg_big)
        svals, _ = jax.lax.top_k(neg, kx)
        sup_ids = jnp.minimum(-svals, cs - 1)       # [R, kx]
        slot_ok = jnp.arange(kx, dtype=jnp.int32)[None, :] < n_sup[:, None]
        # 3. per-lane slab vs gathered children (padding slots hold
        # inverted boxes -> sign-select slab fails them on every lane)
        cbmn = accel.cbmin[sup_ids].reshape(-1, kchild, 3)
        cbmx = accel.cbmax[sup_ids].reshape(-1, kchild, 3)
        hitk = slab_lanes(oc, dc, hi0, cbmn, cbmx)  # [R, B, kchild]
        cand_k = jnp.any(hitk, axis=1)              # [R, kchild]
        cand_k &= jnp.repeat(slot_ok, ss, axis=1)
        cids = (sup_ids[:, :, None] * ss + child[None, None, :]).reshape(
            -1, kchild)
        # non-candidates (and child ids past C) sink to the sentinel C;
        # the entry argsort below orders the real ids (sentinels carry
        # +inf entries and sort last)
        ids = jnp.where(cand_k & (cids < c), cids, jnp.int32(c))
        n_ex = jnp.sum(ids < c, axis=1).astype(jnp.int32)
        return ids, n_ex, n_sup

    if live_blocks is None:
        ids, n_ex, n_sup = jax.lax.map(one_chunk, (o_ch, d_ch, t_ch))
    else:
        # Sorted dead-last waves: chunks past the live prefix keep the
        # zero init (n_cand = 0, exact for all-dead blocks).
        n_chunks = jnp.minimum(-(-live_blocks // row_chunk), nch)

        def body(i, carry):
            ids_a, nex_a, nsup_a = carry
            ic, nc, sc = one_chunk((o_ch[i], d_ch[i], t_ch[i]))
            return (
                jax.lax.dynamic_update_slice(ids_a, ic[None], (i, 0, 0)),
                jax.lax.dynamic_update_slice(nex_a, nc[None], (i, 0)),
                jax.lax.dynamic_update_slice(nsup_a, sc[None], (i, 0)),
            )

        ids, n_ex, n_sup = jax.lax.fori_loop(
            0, n_chunks, body,
            (jnp.full((nch, row_chunk, kchild), jnp.int32(c)),
             jnp.zeros((nch, row_chunk), jnp.int32),
             jnp.zeros((nch, row_chunk), jnp.int32)))
    ids = ids.reshape(-1, kchild)[:nb]
    n_ex = n_ex.reshape(-1)[:nb]
    over = n_sup.reshape(-1)[:nb] > kx

    # Order the exact candidates by conservative entry (exact ⊆
    # conservative, so lb is finite on every real id; the sentinel C
    # row carries +inf and sorts last).
    entry_pad = jnp.concatenate([entry_all, jnp.full((nb, 1), inf)],
                                axis=1)
    entry_ids = jnp.take_along_axis(entry_pad, ids, axis=1)
    eperm = jnp.argsort(entry_ids, axis=1).astype(jnp.int32)
    ids = jnp.take_along_axis(ids, eperm, axis=1)
    entry_ids = jnp.take_along_axis(entry_ids, eperm, axis=1)

    # Uniform [nb, C] order: exact ids first (sentinel-padded) for
    # in-cap blocks, the conservative list for overflow blocks.
    if kchild < c:
        ids = jnp.pad(ids, ((0, 0), (0, c - kchild)), constant_values=c)
        entry_ids = jnp.pad(entry_ids, ((0, 0), (0, c - kchild)),
                            constant_values=inf)
    else:
        ids = ids[:, :c]
        entry_ids = entry_ids[:, :c]
    order = jnp.where(over[:, None], order_cons, jnp.minimum(ids, c - 1))
    entry_sorted = jnp.where(over[:, None], entry_cons, entry_ids)
    n_cand = jnp.where(over, n_cons, n_ex)
    return order, n_cand, entry_sorted


def _mt_sweep(o_blk, d_blk, cv0, ce1, ce2, t_min, t_max_blk):
    """Dense Möller–Trumbore: [B,R] rays vs per-block [B,S] triangles.

    Returns (t [B,R,S] with inf where invalid, valid mask). Identical math to
    core.geometry.moller_trumbore (triangle.hpp:23-67) with precomputed edges.

    Written COMPONENT-WISE on [B,R,S] scalars (no [...,3] stacking): stacked
    cross/dot would materialize [B,R,S,3] intermediates in HBM, while pure
    elementwise chains fuse into the downstream min-reduction — this is the
    hot loop of the whole renderer (HBM bandwidth is the budget).
    """
    ox, oy, oz = (o_blk[:, :, None, k] for k in range(3))
    dx, dy, dz = (d_blk[:, :, None, k] for k in range(3))
    e1x, e1y, e1z = (ce1[:, None, :, k] for k in range(3))
    e2x, e2y, e2z = (ce2[:, None, :, k] for k in range(3))
    v0x, v0y, v0z = (cv0[:, None, :, k] for k in range(3))

    # h = d x e2
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    ok = jnp.abs(a) > MT_EPSILON
    f = 1.0 / jnp.where(ok, a, 1.0)
    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    u = f * (sx * hx + sy * hy + sz * hz)
    # q = s x e1
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    ok &= (t >= t_min) & (t <= t_max_blk[:, :, None])
    return jnp.where(ok, t, jnp.inf), ok


def _cascade_traverse(
    block_arrays: tuple,
    carry: tuple,
    sweep_update,
    active_fn,
    min_blocks: int = 32,
):
    """Cascaded block traversal: retire finished blocks, halve the array.

    The naive while_loop pays max(n_cand) iterations on EVERY block — a
    5-20x waste when candidate counts are skewed (incoherent bounce waves).
    Here each stage runs until at most half the blocks remain active, then
    compacts the active blocks to the front and continues on a HALF-SIZE
    slice (static shapes throughout; the stage count is log2(B) unrolled at
    trace time). Total sweep work approaches sum(n_cand) instead of
    B * max(n_cand).

    block_arrays: per-block inputs permuted alongside the carry.
    carry: per-block result accumulators.
    sweep_update(k, block_arrays_slice, carry_slice) -> carry_slice
    active_fn(k, block_arrays_slice, carry_slice) -> [size] bool
    Returns (carry, blk_index) where blk_index[i] = original position of the
    block now at position i.
    """
    nb = block_arrays[0].shape[0]
    blk_index = jnp.arange(nb, dtype=jnp.int32)
    full = tuple(block_arrays) + tuple(carry) + (blk_index,)
    n_in = len(block_arrays)
    n_carry = len(carry)

    size = nb
    k0 = jnp.int32(0)
    while True:
        sl = tuple(a[:size] for a in full)
        blocks_sl = sl[:n_in]
        carry_sl = sl[n_in:n_in + n_carry]

        last_stage = size // 2 < min_blocks
        threshold = 0 if last_stage else size // 2

        def cond(state):
            k = state[0]
            c = state[1:]
            act = active_fn(k, blocks_sl, c)
            return jnp.sum(act) > threshold

        def body(state):
            k = state[0]
            c = state[1:]
            c = sweep_update(k, blocks_sl, c)
            return (k + 1,) + tuple(c)

        out = jax.lax.while_loop(cond, body, (k0,) + tuple(carry_sl))
        k0 = out[0]
        carry_sl = out[1:]

        # write results back into the full arrays
        full = list(full)
        for i in range(n_carry):
            full[n_in + i] = full[n_in + i].at[:size].set(carry_sl[i])
        full = tuple(full)

        if last_stage:
            break

        # Compact still-active blocks to the front of the slice. MUST be a
        # pure whole-array gather: the natural in-place form
        # `a.at[:size].set(a[:size][perm])` MISCOMPILES under jit (XLA CPU,
        # jax 0.9.0) — the gather payload aliases the buffer being updated
        # in place and reads already-overwritten rows, silently corrupting
        # the permutation (scripts/debug_anyhit4.py; minimal repro in the
        # round-3 log). Eager mode and this gather form are correct.
        act = active_fn(k0, blocks_sl, carry_sl)
        perm = jnp.argsort(~act, stable=True).astype(jnp.int32)
        row_idx = jnp.concatenate(
            [perm, jnp.arange(size, nb, dtype=jnp.int32)]
        )
        full = tuple(a[row_idx] for a in full)
        size //= 2

    carry_out = full[n_in:n_in + n_carry]
    blk_index = full[-1]
    return carry_out, blk_index


def _unpermute_blocks(arr, blk_index):
    """arr[i] holds the result for original block blk_index[i]; invert."""
    inv = jnp.argsort(blk_index).astype(jnp.int32)
    return arr[inv]


def _perray_candidates(accel: ClusterAccel, origins, directions, t_min, t_max,
                       cap: int, row_chunk: int = 1 << 14,
                       order_mode: str = "id"):
    """EXACT per-ray candidate clusters, capped at `cap` per ray.

    Unlike the block-conservative interval cull, every ray gets its own slab
    test against all C cluster AABBs — incoherent bounce waves drop from
    block-union candidate counts (100-200) to the true per-ray count (~10).
    Memory is bounded by scanning row chunks ([chunk, C] transients).

    Returns (order [N, cap], n_cand [N] clipped to cap, entry [N, cap],
    overflow [N] = ray has more than cap candidates and needs the packet
    fallback for completeness).
    """
    n = origins.shape[0]
    pad_rows = (-n) % row_chunk
    o = jnp.pad(origins, ((0, pad_rows), (0, 0)))
    d = jnp.pad(directions, ((0, pad_rows), (0, 0)), constant_values=1.0)
    tm = jnp.pad(t_max, (0, pad_rows), constant_values=-1.0)
    nch = o.shape[0] // row_chunk

    def one_chunk(args):
        oc, dc, tc = args
        inv = 1.0 / dc                                     # IEEE inf slopes
        t0 = (accel.bmin[None] - oc[:, None, :]) * inv[:, None, :]
        t1 = (accel.bmax[None] - oc[:, None, :]) * inv[:, None, :]
        near = jnp.where(inv[:, None, :] < 0.0, t1, t0)
        far = jnp.where(inv[:, None, :] < 0.0, t0, t1)
        lo = jnp.full(near.shape[:2], jnp.float32(t_min))
        hi = jnp.minimum(jnp.broadcast_to(tc[:, None], near.shape[:2]), jnp.inf)
        for a in range(3):
            lo = jnp.where(near[..., a] > lo, near[..., a], lo)
            hi = jnp.where(far[..., a] < hi, far[..., a], hi)
        # INCLUSIVE bound: a cluster AABB that is flat along an axis
        # (coplanar triangle group) has entry == exit == hit t; the strict
        # `>` of aabb.hpp:21 would EXCLUDE it, breaking the exactness
        # contract (conservative culling may over-include, never exclude).
        cand = hi >= lo
        c = cand.shape[1]
        n_cand = jnp.sum(cand, axis=1).astype(jnp.int32)
        if order_mode == "entry":
            # front-to-back candidate order (enables entry termination);
            # costs a [rows, C] sort
            entry = jnp.where(cand, lo, jnp.inf)
            order = jnp.argsort(entry, axis=1)[:, :cap].astype(jnp.int32)
            entry_k = jnp.take_along_axis(entry, order, axis=1)
        else:
            # cluster-id (Morton/spatial) order via cumsum + searchsorted —
            # an order of magnitude cheaper than the sort at wave scale
            cums = jnp.cumsum(cand.astype(jnp.int32), axis=1)
            targets = jnp.arange(1, min(cap, c) + 1, dtype=jnp.int32)
            order = jax.vmap(
                lambda row: jnp.searchsorted(row, targets, side="left")
            )(cums).astype(jnp.int32)
            order = jnp.minimum(order, c - 1)
            entry_k = jnp.zeros_like(order, dtype=jnp.float32)
        if order.shape[1] < cap:  # fewer clusters than the cap
            pad_c = cap - order.shape[1]
            order = jnp.pad(order, ((0, 0), (0, pad_c)))
            entry_k = jnp.pad(entry_k, ((0, 0), (0, pad_c)),
                              constant_values=jnp.inf)
        return order, jnp.minimum(n_cand, cap), entry_k, n_cand > cap

    out = jax.lax.map(
        one_chunk,
        (o.reshape(nch, row_chunk, 3), d.reshape(nch, row_chunk, 3),
         tm.reshape(nch, row_chunk)),
    )
    order = out[0].reshape(-1, cap)[:n]
    n_cand = out[1].reshape(-1)[:n]
    entry = out[2].reshape(-1, cap)[:n]
    overflow = out[3].reshape(-1)[:n]
    return order, n_cand, entry, overflow


@partial(jax.jit, static_argnames=("cap", "group_size", "fallback_block"))
def closest_hit_perray(
    accel: ClusterAccel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    cap: int = 64,
    group_size: int = 4,
    fallback_block: int = 64,
) -> PacketHit:
    """Closest hit with EXACT per-ray candidate lists (no ray blocking).

    Rays whose candidate count exceeds `cap` (rare: grazing rays along the
    whole scene) are completed by the conservative packet path, so the
    result is exact for every ray.
    """
    n = origins.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    order, n_cand, _entry, overflow = _perray_candidates(
        accel, origins, directions, t_min, t_max, cap
    )
    # overflow rays are handled entirely by the fallback
    n_cand = jnp.where(overflow, 0, n_cand)

    g = group_size
    cap_pad = -(-cap // g) * g
    if cap_pad - cap:
        order = jnp.pad(order, ((0, 0), (0, cap_pad - cap)))
    order_g = order.reshape(n, cap_pad // g, g)
    max_k = cap_pad // g - 1

    o1 = origins[:, None, :]
    d1 = directions[:, None, :]
    tb1 = t_max[:, None]

    def active_fn(k, blocks, carry):
        # Candidates are id-ordered (not entry-ordered), so the only exact
        # stopping rules are candidate exhaustion and dead lanes; tMax
        # shrink-pruning inside the sweep handles distance culling.
        _, _, tb, nc = blocks[:4]
        return (k * g < nc) & (tb[:, 0] >= 0.0)

    def sweep_update(k, blocks, carry):
        ob, db, tb, nc, ordg = blocks
        best_t, best_id = carry
        size = ob.shape[0]
        kk = jnp.minimum(k, max_k)
        cid = ordg[:, kk]                          # [size, g]
        on = (k * g < nc)
        cv0 = accel.v0[cid].reshape(size, -1, 3)
        ce1 = accel.e1[cid].reshape(size, -1, 3)
        ce2 = accel.e2[cid].reshape(size, -1, 3)
        cti = accel.tri_id[cid].reshape(size, -1)
        t_cap2 = jnp.minimum(tb, best_t)
        t, _ = _mt_sweep(ob, db, cv0, ce1, ce2, t_min, t_cap2)
        ct = jnp.min(t, axis=-1)
        slot = jnp.argmin(t, axis=-1)
        gid = jnp.take_along_axis(cti, slot, axis=1)
        closer = on[:, None] & (ct < best_t)
        return (jnp.where(closer, ct, best_t), jnp.where(closer, gid, best_id))

    carry, blk_index = _cascade_traverse(
        (o1, d1, tb1, n_cand, order_g),
        (
            jnp.full((n, 1), jnp.inf, jnp.float32),
            jnp.full((n, 1), -1, jnp.int32),
        ),
        sweep_update,
        active_fn,
        min_blocks=1024,
    )
    best_t = _unpermute_blocks(carry[0], blk_index)[:, 0]
    best_id = _unpermute_blocks(carry[1], blk_index)[:, 0]

    # Complete overflow rays with the conservative packet path.
    pad = (-n) % fallback_block
    fo = jnp.pad(origins, ((0, pad), (0, 0)))
    fd = jnp.pad(directions, ((0, pad), (0, 0)), constant_values=1.0)
    ftm = jnp.pad(jnp.where(overflow, t_max, -1.0), (0, pad),
                  constant_values=-1.0)
    fb = closest_hit_packets(accel, fo, fd, t_min, ftm,
                             block_size=fallback_block)
    best_t = jnp.where(overflow, fb.t[:n], best_t)
    best_id = jnp.where(overflow, fb.tri[:n], best_id)
    return PacketHit(hit=jnp.isfinite(best_t), t=best_t, tri=best_id)


@partial(jax.jit, static_argnames=("cap", "group_size", "fallback_block"))
def any_hit_perray(
    accel: ClusterAccel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    cap: int = 64,
    group_size: int = 4,
    fallback_block: int = 64,
) -> jnp.ndarray:
    n = origins.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    order, n_cand, _entry, overflow = _perray_candidates(
        accel, origins, directions, t_min, t_max, cap
    )
    n_cand = jnp.where(overflow, 0, n_cand)

    g = group_size
    cap_pad = -(-cap // g) * g
    if cap_pad - cap:
        order = jnp.pad(order, ((0, 0), (0, cap_pad - cap)))
    order_g = order.reshape(n, cap_pad // g, g)
    max_k = cap_pad // g - 1

    o1 = origins[:, None, :]
    d1 = directions[:, None, :]
    tb1 = t_max[:, None]

    def active_fn(k, blocks, carry):
        nc = blocks[3]
        occ = carry[0][:, 0]
        return (k * g < nc) & ~occ

    def sweep_update(k, blocks, carry):
        ob, db, tb, nc, ordg = blocks
        (occ,) = carry
        size = ob.shape[0]
        kk = jnp.minimum(k, max_k)
        cid = ordg[:, kk]
        on = (k * g < nc) & ~occ[:, 0]
        cv0 = accel.v0[cid].reshape(size, -1, 3)
        ce1 = accel.e1[cid].reshape(size, -1, 3)
        ce2 = accel.e2[cid].reshape(size, -1, 3)
        _, ok = _mt_sweep(ob, db, cv0, ce1, ce2, t_min, tb)
        return (occ | (on[:, None] & jnp.any(ok, axis=-1)),)

    carry, blk_index = _cascade_traverse(
        (o1, d1, tb1, n_cand, order_g),
        (jnp.zeros((n, 1), bool),),
        sweep_update,
        active_fn,
        min_blocks=1024,
    )
    occluded = _unpermute_blocks(carry[0], blk_index)[:, 0]

    pad = (-n) % fallback_block
    fo = jnp.pad(origins, ((0, pad), (0, 0)))
    fd = jnp.pad(directions, ((0, pad), (0, 0)), constant_values=1.0)
    ftm = jnp.pad(jnp.where(overflow, t_max, -1.0), (0, pad),
                  constant_values=-1.0)
    fb = any_hit_packets(accel, fo, fd, t_min, ftm, block_size=fallback_block)
    return jnp.where(overflow, fb[:n], occluded)


@partial(jax.jit,
         static_argnames=("block_size", "sort", "group_size", "sort_mode"))
def closest_hit_packets(
    accel: ClusterAccel,
    origins: jnp.ndarray,     # [N,3]; N must be a multiple of block_size
    directions: jnp.ndarray,  # [N,3]
    t_min,
    t_max,                    # scalar or [N]
    block_size: int = 256,
    sort: bool = True,
    group_size: int = 8,
    sort_mode: str = "dir",
) -> PacketHit:
    n = origins.shape[0]
    assert n % block_size == 0, f"wave size {n} not a multiple of {block_size}"
    nb = n // block_size

    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    if sort:
        keys = _sort_keys(accel, origins, directions, t_max, mode=sort_mode)
        perm = jnp.argsort(keys).astype(jnp.int32)
        # ONE packed row gather (~7.4ns/row regardless of width) instead of
        # three narrow ones; bit-exact data movement.
        packed = jnp.concatenate(
            [origins, directions, t_max[:, None]], axis=1
        )[perm]
        origins, directions, t_max = (
            packed[:, 0:3], packed[:, 3:6], packed[:, 6]
        )

    o_blk = origins.reshape(nb, block_size, 3)
    d_blk = directions.reshape(nb, block_size, 3)
    tmax_blk = t_max.reshape(nb, block_size)

    order, n_cand, entry_sorted = _block_candidates(accel, o_blk, d_blk, tmax_blk)
    # Each loop iteration consumes a GROUP of `group_size` candidates per
    # block (gathered and swept together): TPU while_loop iterations carry a
    # fixed scheduling overhead, so iteration count — bounded by the worst
    # block's candidate count — must be divided down, not just the work.
    g = group_size
    c = accel.num_clusters
    c_pad = -(-c // g) * g
    pad_cols = c_pad - c
    if pad_cols:
        # padding candidates point at cluster 0 but are masked by n_cand
        order = jnp.pad(order, ((0, 0), (0, pad_cols)))
        entry_sorted = jnp.pad(entry_sorted, ((0, 0), (0, pad_cols)),
                               constant_values=jnp.inf)
    order_g = order.reshape(nb, c_pad // g, g)
    max_k = c_pad // g - 1

    def active_fn(k, blocks, carry):
        # Front-to-back early termination (the BVH-descent pruning analog):
        # once the next candidate group's conservative entry distance exceeds
        # every member ray's current best hit, no later group can improve the
        # block — candidates are entry-sorted. Dead lanes (t_max < 0) can
        # never hit and must not gate termination with their inf best.
        _, _, tb, nc, ent = blocks[:5]
        best_t = carry[0]
        best_eff = jnp.where(tb < 0.0, -jnp.inf, best_t)
        kk = jnp.minimum(k, max_k)
        entry_k = ent[:, kk * g]
        return (k * g < nc) & (entry_k <= jnp.max(best_eff, axis=1))

    def sweep_update(k, blocks, carry):
        ob, db, tb, nc, ent, ordg = blocks
        best_t, best_id = carry
        size = ob.shape[0]
        kk = jnp.minimum(k, max_k)
        cid = ordg[:, kk]                        # [size, g]
        blk_on = (k * g < nc)
        cv0 = accel.v0[cid].reshape(size, -1, 3)   # [size, g*S, 3]
        ce1 = accel.e1[cid].reshape(size, -1, 3)
        ce2 = accel.e2[cid].reshape(size, -1, 3)
        cti = accel.tri_id[cid].reshape(size, -1)  # [size, g*S]

        # tMax shrink-pruning: current best t bounds the sweep (bvh.hpp:91).
        t_cap = jnp.minimum(tb, best_t)
        t, _ = _mt_sweep(ob, db, cv0, ce1, ce2, t_min, t_cap)
        ct = jnp.min(t, axis=-1)
        slot = jnp.argmin(t, axis=-1)           # first-min tie rule
        gid = jnp.take_along_axis(cti, slot, axis=1)

        closer = blk_on[:, None] & (ct < best_t)
        best_t = jnp.where(closer, ct, best_t)
        best_id = jnp.where(closer, gid, best_id)
        return best_t, best_id

    carry, blk_index = _cascade_traverse(
        (o_blk, d_blk, tmax_blk, n_cand, entry_sorted, order_g),
        (
            jnp.full((nb, block_size), jnp.inf, jnp.float32),
            jnp.full((nb, block_size), -1, jnp.int32),
        ),
        sweep_update,
        active_fn,
    )
    best_t = _unpermute_blocks(carry[0], blk_index)
    best_id = _unpermute_blocks(carry[1], blk_index)

    t_out = best_t.reshape(n)
    id_out = best_id.reshape(n)
    if sort:
        # Direct packed row scatter out[perm[i]] = res[i] — one scatter
        # replaces inverse-permutation build + two gathers (bit-exact:
        # i32 bitcasts move bits only).
        packed = jnp.stack(
            [jax.lax.bitcast_convert_type(t_out, jnp.int32), id_out], axis=1
        )
        out = jnp.zeros((n, 2), jnp.int32).at[perm].set(packed)
        t_out = jax.lax.bitcast_convert_type(out[:, 0], jnp.float32)
        id_out = out[:, 1]
    return PacketHit(hit=jnp.isfinite(t_out), t=t_out, tri=id_out)


@partial(jax.jit,
         static_argnames=("block_size", "sort", "group_size", "sort_mode",
                          "exact_cull"))
def any_hit_packets(
    accel: ClusterAccel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    block_size: int = 256,
    sort: bool = True,
    group_size: int = 8,
    sort_mode: str = "dir",
    exact_cull: int = 0,
) -> jnp.ndarray:
    """Occlusion query over a wave; early-exits once every lane is resolved.

    exact_cull=K swaps the conservative interval cull for the per-ray-exact
    2-level OR-union (`_exact_block_candidates`, super shortlist cap K):
    the cascade walks 5-10x fewer candidates per block on real shadow
    waves (probe_r4_exact_shadow at b64/b128), cutting sweep iterations
    and their 3-row cluster gathers. Exact either way."""
    n = origins.shape[0]
    assert n % block_size == 0, f"wave size {n} not a multiple of {block_size}"
    nb = n // block_size

    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    if sort:
        keys = _sort_keys(accel, origins, directions, t_max, mode=sort_mode)
        perm = jnp.argsort(keys).astype(jnp.int32)
        packed = jnp.concatenate(
            [origins, directions, t_max[:, None]], axis=1
        )[perm]
        origins, directions, t_max = (
            packed[:, 0:3], packed[:, 3:6], packed[:, 6]
        )

    o_blk = origins.reshape(nb, block_size, 3)
    d_blk = directions.reshape(nb, block_size, 3)
    tmax_blk = t_max.reshape(nb, block_size)

    if exact_cull:
        # Sorted waves are dead-last, so the live blocks form a prefix
        # and the cull's per-lane stages can skip the dead tail.
        lv = (jnp.sum(jnp.any(tmax_blk >= 0.0, axis=1)).astype(jnp.int32)
              if sort else None)
        order, n_cand, _entry = _exact_block_candidates(
            accel, o_blk, d_blk, tmax_blk, t_min, ksup=exact_cull,
            live_blocks=lv)
    else:
        order, n_cand, _entry = _block_candidates(accel, o_blk, d_blk,
                                                  tmax_blk)
    g = group_size
    c = accel.num_clusters
    c_pad = -(-c // g) * g
    if c_pad - c:
        order = jnp.pad(order, ((0, 0), (0, c_pad - c)))
    order_g = order.reshape(nb, c_pad // g, g)
    max_k = c_pad // g - 1

    def active_fn(k, blocks, carry):
        # Dead lanes (t_max < 0) can never be occluded and count as
        # resolved — otherwise a mixed block retires only by candidate
        # exhaustion (sorted waves mix only at the live/dead boundary
        # block; unsorted waves mix everywhere).
        tb, nc = blocks[2], blocks[3]
        occ = carry[0]
        resolved = occ | (tb < 0.0)
        return (k * g < nc) & ~jnp.all(resolved, axis=1)

    def sweep_update(k, blocks, carry):
        ob, db, tb, nc, ordg = blocks
        (occ,) = carry
        size = ob.shape[0]
        cid = ordg[:, jnp.minimum(k, max_k)]        # [size, g]
        blk_on = (k * g < nc) & ~jnp.all(occ | (tb < 0.0), axis=1)
        cv0 = accel.v0[cid].reshape(size, -1, 3)
        ce1 = accel.e1[cid].reshape(size, -1, 3)
        ce2 = accel.e2[cid].reshape(size, -1, 3)
        _, ok = _mt_sweep(ob, db, cv0, ce1, ce2, t_min, tb)
        occ = occ | (blk_on[:, None] & jnp.any(ok, axis=-1))
        return (occ,)

    carry, blk_index = _cascade_traverse(
        (o_blk, d_blk, tmax_blk, n_cand, order_g),
        (jnp.zeros((nb, block_size), bool),),
        sweep_update,
        active_fn,
    )
    occluded = _unpermute_blocks(carry[0], blk_index)
    out = occluded.reshape(n)
    if sort:
        # Direct scatter out[perm[i]] = res[i]: one scatter instead of
        # inverse-permutation build + gather.
        out = jnp.zeros((n,), bool).at[perm].set(out)
    return out
