"""Fused Pallas any-hit cascade for shadow waves (round-3 shadow lever).

Shadow rays are ~80% of all traced rays and ride the sorted packet
cascade (`traverse.any_hit_packets`), whose per-iteration XLA body —
3 row-granular cluster gathers + a dense [B, R, g*S] Möller–Trumbore +
an any-reduction — runs well below the measured dense-MT peak (the
row tax: ~7.4ns/gathered row, docs/ARCHITECTURE.md). This module keeps
the cascade's winning structure (coherence sort, conservative interval
cull, while_loop with block retirement + compaction, any-hit early-out)
and replaces the sweep body with ONE `pallas_call` per iteration:

- grid = one step per RAY BLOCK (128 sorted rays = the natural f32 lane
  tile); the step's 8 candidate cluster ids are scalar-prefetch
  operands, so 8 triangle-block index_maps DMA the [16, S] cluster
  packs straight from HBM — no XLA gather rows at all.
- rays arrive packed [nb, 8, 128] (component rows: ox oy oz dx dy dz
  t_max t_min — `pallas_ctiles.pack_rays_tiles`).
- in-kernel: per cluster, one [16, S] -> [S, 16] transpose puts
  triangle components on sublanes; MT runs as [S, 128] outer-broadcast
  chains with the exact op order of `traverse._mt_sweep` (identical
  floats => identical occlusion bits), and the 8 clusters' any-hits
  OR-reduce to one [1, 128] row.
- candidate-list padding and exhausted blocks point at an appended
  ALL-ZERO dummy cluster: a zero triangle has MT determinant a == 0,
  so |a| > MT_EPSILON fails every lane — no masking needed in-kernel.

Consuming 8 candidates per while-iteration coarsens the early-out from
the XLA path's group_size=2 (probe F: g2 beat g8 by ~8% wave-level);
the kernel must win more than that back. ADJUDICATED — it does not, at
either measured scale: 82k tris 4.71 vs 7.17 Mrays/s wave-level
(round 4) and 1.31M tris 619.5 vs 278.5 ms on a 2^16 shadow wave
(round-5 session D, occlusion-equality gated). Permanently opt-in;
retained as the scalar-prefetch DMA-cascade exemplar and the measured
record of why single-kernel fusion loses to XLA's pipelined cascade on
v5e (the round-1 Pallas lesson: production only after it beats XLA on
wall-clock).

Reference role: shadow `optixTrace` with TERMINATE_ON_FIRST_HIT
(/root/reference/src/gpu/ptx/optix_kernels.cu:159-181).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from path_tracer_ai_tpu.accel import traverse
from path_tracer_ai_tpu.accel import pallas_ctiles as pc
from path_tracer_ai_tpu.accel.pallas_ctiles import pack_rays_tiles, pack_tris
from path_tracer_ai_tpu.core.types import MT_EPSILON

GROUP = 8  # candidate clusters consumed per block per while-iteration


def pack_tris_dummy(accel) -> jnp.ndarray:
    """[C+1, 16, S] triangle pack with an all-zero dummy cluster at index C
    (the no-hit sink for candidate-list padding). The dummy's sub-slab
    AABB rows are inverted boxes so sub_skip never sweeps it."""
    pack = pack_tris(accel)
    dummy = jnp.zeros((1,) + pack.shape[1:], pack.dtype)
    fill = jnp.asarray([jnp.inf] * 3 + [-jnp.inf] * 3, jnp.float32)
    dummy = dummy.at[0, 10:16, :].set(fill[:, None])
    return jnp.concatenate([pack, dummy], axis=0)


def _anyhit_kernel(cid_ref, rays_ref, *refs, early_skip, dummy,
                   sub_skip=False):
    """One grid step: one 128-ray block vs GROUP candidate clusters.

    early_skip=True recovers the 8-candidate granularity waste that made
    g2 beat g8 on the XLA cascade: once every lane of the block is
    occluded — or the next candidate is the dummy cluster (candidate
    list exhausted) — the remaining clusters' MT compute is skipped via
    pl.when (their DMAs are already prefetched; only vector work is
    saved). The occlusion accumulator lives in the VMEM output block so
    the skip predicate can read it back between clusters.

    sub_skip=True additionally gates each cluster's [SUB, T] MT row
    chunks on their sub-slab AABBs (pack_tris rows 10-15) — probe P
    measured only ~10-15% of sub-slabs active on real shadow waves (the
    conservative interval candidates are loose), so most of the dense
    sweep is skippable exactly. Composes with early_skip.
    """
    from jax.experimental import pallas as pl

    tri_refs = refs[:-1]
    out_ref = refs[-1]

    rays = rays_ref[0]                                    # [8, T]
    ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]  # [1, T]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    tmax = rays[6:7, :]
    tmin = rays[7:8, :]
    s = tri_refs[0].shape[2]

    def sweep_rows(trit_k):
        """Any-hit over a row slice of a transposed pack -> [1, T] 0/1."""
        v0x, v0y, v0z = trit_k[:, 0:1], trit_k[:, 1:2], trit_k[:, 2:3]
        e1x, e1y, e1z = trit_k[:, 3:4], trit_k[:, 4:5], trit_k[:, 5:6]
        e2x, e2y, e2z = trit_k[:, 6:7], trit_k[:, 7:8], trit_k[:, 8:9]

        # Möller–Trumbore, identical op order to traverse._mt_sweep
        # ([rows, T] outer-broadcast chains).
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
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        ok &= (t >= tmin) & (t <= tmax)

        okf = jnp.where(ok, 1.0, 0.0)                     # [rows, T]
        return jnp.max(okf, axis=0, keepdims=True)        # [1, T]

    if not early_skip and not sub_skip:
        acc = jnp.zeros_like(tmax)                        # [1, T] 0/1
        for j in range(GROUP):
            acc = jnp.maximum(acc, sweep_rows(tri_refs[j][0].T))
        # Output blocks need (8, 128)-divisible trailing dims; broadcast
        # the reduced row (the caller reads row 0).
        out_ref[0] = jnp.broadcast_to(acc, out_ref.shape[1:])
        return

    i = pl.program_id(0)
    out_ref[0] = jnp.zeros_like(out_ref[0])
    # Dead lanes (t_max < 0) can never be occluded; count them as done
    # or mixed blocks would never trigger the skip.
    deadf = jnp.where(tmax < 0.0, 1.0, 0.0)                  # [1, T]
    if sub_skip:
        invx, invy, invz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    for j in range(GROUP):
        cid_j = cid_ref[i * GROUP + j]
        if early_skip:
            done = jnp.min(
                jnp.maximum(out_ref[0, 0:1, :], deadf)) >= 1.0
            guard = (cid_j < dummy) & ~done
        else:
            guard = None

        if not sub_skip:

            @pl.when(guard)
            def _(j=j):
                row = sweep_rows(tri_refs[j][0].T)
                out_ref[0] = jnp.maximum(
                    out_ref[0], jnp.broadcast_to(row, out_ref.shape[1:])
                )
            continue

        # Padding candidates point at the dummy cluster, whose sub boxes
        # are inverted (pack_tris_dummy) — every sub predicate is False,
        # so no guard is needed when early_skip is off.
        for k in range(pc.n_subs(s)):
            pred = pc._sub_pred(tri_refs[j], k, ox, oy, oz,
                                invx, invy, invz, tmin, tmax)

            @pl.when(pred if guard is None else (pred & guard))
            def _(j=j, k=k):
                trit = tri_refs[j][0].T
                row = sweep_rows(
                    trit[k * pc.SUB:min((k + 1) * pc.SUB, s), :])
                out_ref[0] = jnp.maximum(
                    out_ref[0], jnp.broadcast_to(row, out_ref.shape[1:])
                )


@functools.partial(jax.jit,
                   static_argnames=("interpret", "early_skip", "sub_skip"))
def block_anyhit(tri_pack, rays_pack, cid8, interpret=False,
                 early_skip=False, sub_skip=False):
    """Fused per-block any-hit: [size, 8, T] f32, row 0 = 1.0 where occluded.

    tri_pack [C+1, 16, S] (pack_tris_dummy), rays_pack [size, 8, T]
    (pack_rays_tiles; row 7 = t_min), cid8 [size*GROUP] i32 candidate
    cluster ids (block i's candidates at i*GROUP..i*GROUP+7; padding
    entries point at the dummy cluster C).
    """
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
            _anyhit_kernel,
            early_skip=early_skip,
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
        "block_size", "sort_mode", "interpret", "early_skip", "kernel_chunk",
        "sort", "sub_skip", "exact_cull",
    ),
)
def any_hit_fused(
    accel,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    block_size: int = 128,
    sort_mode: str = "dir",
    interpret: bool = False,
    early_skip: bool = False,
    kernel_chunk: int = 8192,
    sort: bool = True,
    sub_skip: bool = False,
    exact_cull: int = 0,
) -> jnp.ndarray:
    """Occlusion query over a wave via the fused Pallas cascade.

    Exact per ray (same guarantees as traverse.any_hit_packets; blocking
    never affects the result). Accepts any wave size: rays pad to a
    power-of-two block count (>= 32 blocks) with dead lanes that sort to
    the end and retire in the first compaction.

    sort=False skips the coherence sort AND the unsort scatter (~75ms of
    row movement per 4M-ray wave): in-render shadow waves arrive
    light-major with consecutive lanes = neighboring compacted pixels, so
    blocks are already origin/direction coherent, and the cull's
    live-masked bounds keep interleaved dead lanes from widening them.

    exact_cull=K (round-4 lever) replaces the conservative interval cull
    with traverse._exact_block_candidates (per-ray-exact OR-union via the
    2-level hierarchy, super shortlist cap K): 8-10x fewer candidate
    cluster DMAs on real b128 shadow waves (probe_r4_exact_shadow), at
    the cost of the per-lane 2-level slab pass. Exact either way — the
    candidate set still contains every cluster any live lane can hit —
    so occlusion results are identical bit-for-bit.
    """
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
        order, n_cand, _entry = traverse._exact_block_candidates(
            accel, o_blk, d_blk, tmax_blk, t_min, ksup=exact_cull,
            live_blocks=lv
        )
    else:
        order, n_cand, _entry = traverse._block_candidates(
            accel, o_blk, d_blk, tmax_blk
        )
    g = GROUP
    c = accel.num_clusters
    dummy = jnp.int32(c)
    c_pad = -(-c // g) * g
    if c_pad - c:
        order = jnp.pad(order, ((0, 0), (0, c_pad - c)))
    # Entries past a block's candidate count sink into the dummy cluster
    # (zero triangles: determinant 0 fails MT_EPSILON on every lane).
    cols = jnp.arange(c_pad, dtype=jnp.int32)
    order = jnp.where(cols[None, :] < n_cand[:, None], order, dummy)
    order_g = order.reshape(nb, c_pad // g, g)
    max_k = c_pad // g - 1

    tri_pack = pack_tris_dummy(accel)
    rays_pack = pack_rays_tiles(origins, directions, t_max, block_size,
                                t_min=t_min)

    def active_fn(k, blocks, carry):
        # Dead lanes (t_max < 0, rays row 6) can never be occluded and
        # must count as resolved, or a mixed block would only retire by
        # candidate exhaustion — fatal for unsorted waves where nearly
        # every block holds some dead lanes.
        rays_pk, nc = blocks[:2]
        occ = carry[0]
        resolved = occ | (rays_pk[:, 6, :] < 0.0)
        return (k * g < nc) & ~jnp.all(resolved, axis=1)

    def sweep_update(k, blocks, carry):
        rays_pk, _nc, ordg = blocks
        (occ,) = carry
        size = rays_pk.shape[0]
        kk = jnp.minimum(k, max_k)
        cid8 = ordg[:, kk]                                # [size, g]
        kc = min(kernel_chunk, size)
        if size <= kc:
            hit = block_anyhit(tri_pack, rays_pk, cid8.reshape(-1),
                               interpret=interpret, early_skip=early_skip,
                               sub_skip=sub_skip)
            return (occ | (hit[:, 0, :] > 0.0),)

        # Bound the per-call scalar-prefetch array (SMEM) to kernel_chunk
        # blocks; stage sizes are powers of two, so chunks divide exactly
        # and every large stage reuses ONE kernel shape.
        nch = size // kc

        def body(i, occ_acc):
            r_sl = jax.lax.dynamic_slice(
                rays_pk, (i * kc, 0, 0), (kc, 8, block_size))
            c_sl = jax.lax.dynamic_slice(
                cid8, (i * kc, 0), (kc, g)).reshape(-1)
            hit = block_anyhit(tri_pack, r_sl, c_sl, interpret=interpret,
                               early_skip=early_skip, sub_skip=sub_skip)
            o_sl = jax.lax.dynamic_slice(
                occ_acc, (i * kc, 0), (kc, block_size))
            return jax.lax.dynamic_update_slice(
                occ_acc, o_sl | (hit[:, 0, :] > 0.0), (i * kc, 0))

        return (jax.lax.fori_loop(0, nch, body, occ),)

    carry, blk_index = traverse._cascade_traverse(
        (rays_pack, n_cand, order_g),
        (jnp.zeros((nb, block_size), bool),),
        sweep_update,
        active_fn,
    )
    occluded = traverse._unpermute_blocks(carry[0], blk_index).reshape(n)
    if sort:
        occluded = jnp.zeros((n,), bool).at[perm].set(occluded)
    return occluded[:n0]
