"""Fused Pallas closest-hit cascade (round-3 probe-Q lever).

The production hybrid closest wave spends ~150ms of its 256ms on
scheduling AROUND the sweep (per-ray cull, candidate extraction, pair
transpose, slot tables, pair-domain outro — CLAUDE.md stage split).
This module is the closest-hit twin of `pallas_anyhit.any_hit_fused`:
it keeps the packet cascade's structure (coherence sort, conservative
interval cull, entry-ordered while_loop with block retirement +
compaction — `traverse._cascade_traverse`) and replaces the sweep body
with ONE `pallas_call` per iteration, so NONE of the pair-domain
scheduling exists at all:

- grid = one step per 128-ray block; the step's 8 entry-ordered
  candidate cluster ids are scalar-prefetch operands (cluster packs
  DMA'd straight from HBM via index_maps, zero XLA gather rows).
- in-kernel (t, tri) accumulators live in the output block; every
  [SUB, T] MT chunk is gated on BOTH its sub-slab AABB and the lanes'
  running-best-shrunken [t_min, min(t_max, t_acc)] segments (probe Q:
  only 438-1289 tests/live-ray survive on real waves vs the 2188-18985
  dense conservative union — the sub boxes recover per-ray-exact
  tightness inside the kernel with no scheduling cost).
- between iterations the XLA carry shrinks each lane's t_max to its
  current best (`bvh.hpp:91` tMax pruning) and retires blocks whose
  next candidate's conservative entry exceeds every live lane's best.
- candidate-list padding points at the appended all-zero dummy cluster
  whose sub boxes are inverted — every predicate fails, so padding
  costs nothing.

Results are exact (same guarantees as every other backend: compared
against brute force in tests) with the oracle's lexicographic (t, tri)
tie rule. ADJUDICATED round 4 on-chip (probe J closest_cascade rows):
1.12 vs 2.70 Mrays/s wave-level against the production tile sweep —
the in-kernel per-lane gating it exists for is exactly the
work-elimination shape the round-4 campaign measured losing to dense
predictable MT on this part, and round-5 session D closed the same
question at 1.31M tris for the any-hit twin. Permanently opt-in;
retained as the measured record (the round-1 Pallas lesson: production
only after it beats the incumbent on wall-clock).

Reference role: hardware `optixTrace` closest-hit traversal
(/root/reference/src/gpu/ptx/optix_kernels.cu:101-114) and BVH descent
with tMax pruning (/root/reference/include/bvh.hpp:74-116).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from path_tracer_ai_tpu.accel import traverse
from path_tracer_ai_tpu.accel import pallas_ctiles as pc
from path_tracer_ai_tpu.accel.pallas_anyhit import GROUP, pack_tris_dummy
from path_tracer_ai_tpu.accel.pallas_ctiles import pack_rays_tiles
from path_tracer_ai_tpu.accel.traverse import PacketHit

I32_MAX = np.int32(2**31 - 1)


def _closest_kernel(cid_ref, rays_ref, *refs, dummy, sub_skip):
    """One grid step: one 128-ray block vs GROUP entry-ordered candidate
    clusters. Output rows: 0 = best t (inf = miss), 1 = min tri id at the
    best t, bitcast to f32 (I32_MAX = none). The accumulators are read
    back from the output block so each chunk's predicate and MT bound
    use the running best — candidates are entry-sorted, so hits from
    near clusters prune far clusters within the same kernel call."""
    from jax.experimental import pallas as pl

    tri_refs = refs[:-1]
    out_ref = refs[-1]

    rays = rays_ref[0]                                    # [8, T]
    ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]  # [1, T]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    tmax = rays[6:7, :]
    tmin = rays[7:8, :]
    s = tri_refs[0].shape[2]
    t_lanes = tmax.shape[1]

    i = pl.program_id(0)
    init = jnp.concatenate(
        [
            jnp.full((1, t_lanes), jnp.inf, jnp.float32),
            jax.lax.bitcast_convert_type(
                jnp.full((1, t_lanes), I32_MAX, jnp.int32), jnp.float32
            ),
            jnp.zeros((6, t_lanes), jnp.float32),
        ],
        axis=0,
    )
    out_ref[0] = init
    invx, invy, invz = 1.0 / dx, 1.0 / dy, 1.0 / dz

    def combine(rows_slice):
        """MT a row slice bounded by the running best; fold into out."""
        t_acc = out_ref[0, 0:1, :]
        cap = jnp.minimum(tmax, t_acc)
        best_k, trik = pc._mt_rows(rows_slice, ox, oy, oz, dx, dy, dz,
                                   tmin, cap)
        tri_acc = jax.lax.bitcast_convert_type(
            out_ref[0, 1:2, :], jnp.int32)
        t_new = jnp.minimum(t_acc, best_k)
        tri_new = jnp.minimum(
            jnp.where(t_acc <= t_new, tri_acc, I32_MAX),
            jnp.where(best_k <= t_new, trik, I32_MAX),
        )
        out_ref[0, 0, :] = t_new[0]
        out_ref[0, 1, :] = jax.lax.bitcast_convert_type(
            tri_new, jnp.float32)[0]

    for j in range(GROUP):
        cid_j = cid_ref[i * GROUP + j]

        if not sub_skip:

            @pl.when(cid_j < dummy)
            def _(j=j):
                combine(tri_refs[j][0].T)
            continue

        # Sub-slab gating: predicate segments shrink with the running
        # best, so chunks behind found hits are skipped (the in-kernel
        # front-to-back of probe Q). Dummy sub boxes are inverted —
        # padding candidates never fire a predicate.
        for k in range(pc.n_subs(s)):
            t_acc = out_ref[0, 0:1, :]
            cap = jnp.minimum(tmax, t_acc)
            pred = pc._sub_pred(tri_refs[j], k, ox, oy, oz,
                                invx, invy, invz, tmin, cap)

            @pl.when(pred)
            def _(j=j, k=k):
                trit = tri_refs[j][0].T
                combine(trit[k * pc.SUB:min((k + 1) * pc.SUB, s), :])


@functools.partial(jax.jit, static_argnames=("interpret", "sub_skip"))
def block_closest(tri_pack, rays_pack, cid8, interpret=False,
                  sub_skip=True):
    """Fused per-block closest hit: [size, 8, T] f32; row 0 = best t,
    row 1 = tri id (bitcast). Inputs as pallas_anyhit.block_anyhit
    (rays row 6 should carry min(t_max, running best))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    size, _, t_lanes = rays_pack.shape
    s = tri_pack.shape[2]

    tri_specs = [
        pl.BlockSpec(
            (1, 16, s),
            functools.partial(
                lambda i, cid, j: (cid[i * GROUP + j], 0, 0), j=j
            ),
        )
        for j in range(GROUP)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(size,),
        in_specs=[pl.BlockSpec((1, 8, t_lanes), lambda i, cid: (i, 0, 0))]
        + tri_specs,
        out_specs=pl.BlockSpec((1, 8, t_lanes), lambda i, cid: (i, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(
            _closest_kernel,
            dummy=tri_pack.shape[0] - 1,
            sub_skip=sub_skip,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((size, 8, t_lanes), jnp.float32),
        interpret=interpret,
    )(cid8, rays_pack, *([tri_pack] * GROUP))


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_size", "sort_mode", "interpret", "sub_skip", "kernel_chunk",
        "sort", "exact_cull",
    ),
)
def closest_hit_fused(
    accel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    block_size: int = 128,
    sort_mode: str = "octorig",
    interpret: bool = False,
    sub_skip: bool = True,
    kernel_chunk: int = 8192,
    sort: bool = True,
    exact_cull: int = 0,
) -> PacketHit:
    """Closest hit over a wave via the fused Pallas cascade.

    Exact per ray (tests compare against brute force); accepts any wave
    size (pads to a power-of-two block count with dead lanes). Runs on
    the BASE accel — no dual-accel closest build needed.

    exact_cull=K (round-4 lever): per-ray-exact 2-level OR-union
    candidates instead of the conservative interval ones — 1.8x fewer
    cluster-pack DMAs on primary waves, 4.7x at bounce-1
    (probe_r4_exact_closest, b128 octorig, full scale). Candidates stay
    conservative-entry-ordered, so the front-to-back gate and early
    t-shrink are preserved; results are exact either way."""
    n0 = origins.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n0,))

    nb = max(32, _next_pow2(-(-n0 // block_size)))
    n = nb * block_size
    if n - n0:
        origins = jnp.pad(origins, ((0, n - n0), (0, 0)))
        directions = jnp.pad(
            directions, ((0, n - n0), (0, 0)), constant_values=1.0
        )
        t_max = jnp.pad(t_max, (0, n - n0), constant_values=-1.0)

    if sort:
        keys = traverse._sort_keys(accel, origins, directions, t_max,
                                   mode=sort_mode)
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
        lv = (jnp.sum(jnp.any(tmax_blk >= 0.0, axis=1)).astype(jnp.int32)
              if sort else None)
        order, n_cand, entry_sorted = traverse._exact_block_candidates(
            accel, o_blk, d_blk, tmax_blk, t_min, ksup=exact_cull,
            live_blocks=lv
        )
    else:
        order, n_cand, entry_sorted = traverse._block_candidates(
            accel, o_blk, d_blk, tmax_blk
        )
    g = GROUP
    c = accel.num_clusters
    dummy = jnp.int32(c)
    c_pad = -(-c // g) * g
    if c_pad - c:
        order = jnp.pad(order, ((0, 0), (0, c_pad - c)))
        entry_sorted = jnp.pad(entry_sorted, ((0, 0), (0, c_pad - c)),
                               constant_values=jnp.inf)
    cols = jnp.arange(c_pad, dtype=jnp.int32)
    order = jnp.where(cols[None, :] < n_cand[:, None], order, dummy)
    order_g = order.reshape(nb, c_pad // g, g)
    max_k = c_pad // g - 1

    tri_pack = pack_tris_dummy(accel)
    rays_pack = pack_rays_tiles(origins, directions, t_max, block_size,
                                t_min=t_min)

    def active_fn(k, blocks, carry):
        # Front-to-back early termination at block granularity: once the
        # next group's conservative entry exceeds every live lane's
        # current best, no later candidate can improve the block. Dead
        # lanes (t_max < 0, rays row 6) must not gate with their inf.
        rays_pk, nc, ent, _ordg = blocks
        best_t = carry[0]
        tb = rays_pk[:, 6, :]
        best_eff = jnp.where(tb < 0.0, -jnp.inf, best_t)
        kk = jnp.minimum(k, max_k)
        entry_k = ent[:, kk * g]
        return (k * g < nc) & (entry_k <= jnp.max(best_eff, axis=1))

    def sweep_update(k, blocks, carry):
        rays_pk, _nc, _ent, ordg = blocks
        best_t, best_id = carry
        size = rays_pk.shape[0]
        kk = jnp.minimum(k, max_k)
        cid8 = ordg[:, kk]                                # [size, g]
        # tMax shrink-pruning (bvh.hpp:91): the kernel's row 6 carries
        # min(original t_max, running best) — dead lanes stay -1.
        cap = jnp.minimum(rays_pk[:, 6, :], best_t)
        rp = rays_pk.at[:, 6, :].set(cap)

        kc = min(kernel_chunk, size)
        if size <= kc:
            hit = block_closest(tri_pack, rp, cid8.reshape(-1),
                                interpret=interpret, sub_skip=sub_skip)
        else:
            nch = size // kc

            def body(i, acc):
                r_sl = jax.lax.dynamic_slice(
                    rp, (i * kc, 0, 0), (kc, 8, block_size))
                c_sl = jax.lax.dynamic_slice(
                    cid8, (i * kc, 0), (kc, g)).reshape(-1)
                h = block_closest(tri_pack, r_sl, c_sl,
                                  interpret=interpret, sub_skip=sub_skip)
                return jax.lax.dynamic_update_slice(acc, h, (i * kc, 0, 0))

            hit = jax.lax.fori_loop(
                0, nch, body,
                jnp.zeros((size, 8, block_size), jnp.float32))

        kt = hit[:, 0, :]
        ktri = jax.lax.bitcast_convert_type(hit[:, 1, :], jnp.int32)
        # Lexicographic (t, tri) combine — identical to the in-kernel rule
        t_new = jnp.minimum(best_t, kt)
        id_new = jnp.minimum(
            jnp.where(best_t <= t_new, best_id, I32_MAX),
            jnp.where(kt <= t_new, ktri, I32_MAX),
        )
        return t_new, id_new

    carry, blk_index = traverse._cascade_traverse(
        (rays_pack, n_cand, entry_sorted, order_g),
        (
            jnp.full((nb, block_size), jnp.inf, jnp.float32),
            jnp.full((nb, block_size), I32_MAX, jnp.int32),
        ),
        sweep_update,
        active_fn,
    )
    best_t = traverse._unpermute_blocks(carry[0], blk_index).reshape(n)
    best_id = traverse._unpermute_blocks(carry[1], blk_index).reshape(n)

    if sort:
        packed = jnp.stack(
            [jax.lax.bitcast_convert_type(best_t, jnp.int32), best_id],
            axis=1,
        )
        out = jnp.zeros((n, 2), jnp.int32).at[perm].set(packed)
        best_t = jax.lax.bitcast_convert_type(out[:, 0], jnp.float32)
        best_id = out[:, 1]
    best_t = best_t[:n0]
    best_id = best_id[:n0]
    hit = jnp.isfinite(best_t)
    return PacketHit(hit=hit, t=best_t,
                     tri=jnp.where(hit, best_id, -1))
