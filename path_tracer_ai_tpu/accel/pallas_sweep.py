"""Pallas traversal kernels for the packet-cascade backend (OPT-IN).

STATUS (measured on v5e, round 1-2): these kernels are compiled-verified and
exactly agree with the XLA cascade, but LOSE to it on wall-clock (~5us per
in-kernel cluster visit: DMA wait + bookkeeping on small [R, S] tiles vs
XLA's pipelined dense sweeps), and the cascade itself has been superseded by
the worklist backend (accel.worklist) as the production path. They are kept
as an opt-in (`backend="pallas"`) and as the scaffolding for a future fused
worklist-sweep kernel; see docs/ARCHITECTURE.md "Negative results".

Replaces the XLA cascade sweep (accel.traverse) for the per-(block, cluster)
candidate walk. Architectural ideas over the XLA formulation:

1. ZERO load imbalance: the grid runs one step per RAY BLOCK, and each step
   loops over exactly its own candidate count in-kernel (data-dependent
   fori/while are native in Mosaic) — XLA's while_loop pays the worst
   block's trip count on every block.
2. VMEM-resident compute: the [R, S] Möller–Trumbore tile and its reduction
   never touch HBM (the XLA sweep streams multi-MB intermediates).
3. Double-buffered DMA: cluster triangle slabs ([9, S] f32, ~4.6 KB) are
   prefetched from HBM by candidate index while the previous cluster is
   being intersected.

Data layout: the "slab" table packs v0/e1/e2 components as [C, 9, S] with
S = cluster_size along lanes (128-multiple for full VPU tiles); rays arrive
as [B, 8, R] component-packed blocks (ox,oy,oz,dx,dy,dz,t_cap,pad).

The candidate lists (order / counts / entry bounds) still come from the
XLA-side conservative interval cull (accel.traverse._block_candidates) —
that part is cheap and fuses well.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from path_tracer_ai_tpu.accel.clusters import ClusterAccel
from path_tracer_ai_tpu.core.types import MT_EPSILON


class SlabTable(NamedTuple):
    """HBM-resident triangle data in kernel layout."""

    tri: jnp.ndarray     # [C, 9, S] f32: v0xyz, e1xyz, e2xyz rows
    tri_id: jnp.ndarray  # [C, S] i32 global ids (-1 padding)


def build_slab_table(accel: ClusterAccel) -> SlabTable:
    v0 = jnp.transpose(accel.v0, (0, 2, 1))  # [C, 3, S]
    e1 = jnp.transpose(accel.e1, (0, 2, 1))
    e2 = jnp.transpose(accel.e2, (0, 2, 1))
    return SlabTable(
        tri=jnp.concatenate([v0, e1, e2], axis=1),  # [C, 9, S]
        tri_id=accel.tri_id,
    )


def _closest_kernel(
    # scalar prefetch
    n_cand_ref,            # [B] i32 (SMEM)
    # inputs
    rays_ref,              # [1, 8, R] VMEM: ox,oy,oz,dx,dy,dz,tcap,unused
    order_ref,             # [1, C_pad] i32 VMEM: entry-sorted candidate ids
    entry_ref,             # [1, C_pad] f32 VMEM: sorted entry lower bounds
    tri_hbm,               # [C, 9, S] f32 ANY/HBM
    # outputs
    best_t_ref,            # [1, R] f32
    best_cid_ref,          # [1, R] i32
    best_slot_ref,         # [1, R] i32
    # scratch
    slab_ref,              # [2, 9, S] f32 VMEM double buffer
    sem,                   # DMA sems [2]
    *,
    t_min: float,
    s: int,
):
    i = pl.program_id(0)
    n_i = n_cand_ref[i]

    ox = rays_ref[0, 0, :][:, None]  # [R, 1]
    oy = rays_ref[0, 1, :][:, None]
    oz = rays_ref[0, 2, :][:, None]
    dx = rays_ref[0, 3, :][:, None]
    dy = rays_ref[0, 4, :][:, None]
    dz = rays_ref[0, 5, :][:, None]
    t_cap = rays_ref[0, 6, :][:, None]  # [R, 1]

    best_t_ref[0, 0, :] = jnp.full_like(best_t_ref[0, 0, :], jnp.inf)
    best_cid_ref[0, 0, :] = jnp.full_like(best_cid_ref[0, 0, :], -1)
    best_slot_ref[0, 0, :] = jnp.zeros_like(best_slot_ref[0, 0, :])

    def dma(slot, k):
        cid = order_ref[0, 0, k]
        return pltpu.make_async_copy(
            tri_hbm.at[cid], slab_ref.at[slot], sem.at[slot]
        )

    @pl.when(n_i > 0)
    def _():
        dma(0, 0).start()

        def cond(state):
            k, _ = state
            # Front-to-back termination: sorted entry bound vs best hits.
            # Dead lanes (t_cap < 0) can never hit and must not gate it.
            best_eff = jnp.where(t_cap[:, 0] < 0.0, -jnp.inf, best_t_ref[0, 0, :])
            best_max = jnp.max(best_eff)
            return (k < n_i) & (entry_ref[0, 0, jnp.minimum(k, n_i - 1)] <= best_max)

        def body(state):
            k, _ = state
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < n_i)
            def _():
                dma(1 - slot, k + 1).start()

            dma(slot, k).wait()

            v0x = slab_ref[slot, 0, :][None, :]  # [1, S]
            v0y = slab_ref[slot, 1, :][None, :]
            v0z = slab_ref[slot, 2, :][None, :]
            e1x = slab_ref[slot, 3, :][None, :]
            e1y = slab_ref[slot, 4, :][None, :]
            e1z = slab_ref[slot, 5, :][None, :]
            e2x = slab_ref[slot, 6, :][None, :]
            e2y = slab_ref[slot, 7, :][None, :]
            e2z = slab_ref[slot, 8, :][None, :]

            # Möller–Trumbore [R, S] (triangle.hpp:23-67 semantics)
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
            bt = best_t_ref[0, 0, :][:, None]
            ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            ok &= (t >= t_min) & (t <= t_cap) & (t < bt)
            t = jnp.where(ok, t, jnp.inf)

            ct = jnp.min(t, axis=1)           # [R]
            slot_idx = jnp.argmin(t, axis=1).astype(jnp.int32)
            closer = ct < best_t_ref[0, 0, :]
            cid = order_ref[0, 0, k]
            best_cid_ref[0, 0, :] = jnp.where(closer, cid, best_cid_ref[0, 0, :])
            best_slot_ref[0, 0, :] = jnp.where(closer, slot_idx, best_slot_ref[0, 0, :])
            best_t_ref[0, 0, :] = jnp.where(closer, ct, best_t_ref[0, 0, :])
            return k + 1, 0

        k_final, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))

        # Drain the in-flight prefetch when the loop exits early (front-to-
        # back termination): iteration k-1 started the DMA for k; leaving its
        # semaphore signaled would corrupt the next grid step.
        @pl.when(k_final < n_i)
        def _():
            dma(jax.lax.rem(k_final, 2), k_final).wait()


@functools.partial(
    jax.jit, static_argnames=("t_min", "interpret")
)
def closest_sweep_pallas(
    slab: SlabTable,
    rays_packed: jnp.ndarray,   # [B, 8, R] f32
    order: jnp.ndarray,         # [B, C_pad] i32
    entry: jnp.ndarray,         # [B, C_pad] f32
    n_cand: jnp.ndarray,        # [B] i32
    t_min: float = 1.0e-3,
    interpret: bool = False,
):
    """Per-block candidate sweep -> (best_t [B,R], best_cid, best_slot)."""
    b, _, r = rays_packed.shape
    c, nine, s = slab.tri.shape
    assert nine == 9

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 8, r), lambda i, nc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, order.shape[1]), lambda i, nc: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, entry.shape[1]), lambda i, nc: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # tri table stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, 1, r), lambda i, nc: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r), lambda i, nc: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r), lambda i, nc: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 9, s), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(_closest_kernel, t_min=t_min, s=s)
    best_t, best_cid, best_slot = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, r), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, r), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, r), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(n_cand, rays_packed, order[:, None, :], entry[:, None, :], slab.tri)
    return best_t[:, 0], best_cid[:, 0], best_slot[:, 0]


def _anyhit_kernel(
    n_cand_ref,
    rays_ref,              # [1, 8, R]
    order_ref,             # [1, C_pad] i32
    tri_hbm,               # [C, 9, S]
    occ_ref,               # [1, R] i32 (0/1)
    slab_ref,
    sem,
    *,
    t_min: float,
    s: int,
):
    i = pl.program_id(0)
    n_i = n_cand_ref[i]

    ox = rays_ref[0, 0, :][:, None]
    oy = rays_ref[0, 1, :][:, None]
    oz = rays_ref[0, 2, :][:, None]
    dx = rays_ref[0, 3, :][:, None]
    dy = rays_ref[0, 4, :][:, None]
    dz = rays_ref[0, 5, :][:, None]
    t_cap = rays_ref[0, 6, :][:, None]

    occ_ref[0, 0, :] = jnp.zeros_like(occ_ref[0, 0, :])

    def dma(slot, k):
        cid = order_ref[0, 0, k]
        return pltpu.make_async_copy(
            tri_hbm.at[cid], slab_ref.at[slot], sem.at[slot]
        )

    @pl.when(n_i > 0)
    def _():
        dma(0, 0).start()

        def cond(state):
            k, _ = state
            # stop when every lane is occluded (any-hit early exit)
            return (k < n_i) & (jnp.min(occ_ref[0, 0, :]) == 0)

        def body(state):
            k, _ = state
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < n_i)
            def _():
                dma(1 - slot, k + 1).start()

            dma(slot, k).wait()

            v0x = slab_ref[slot, 0, :][None, :]
            v0y = slab_ref[slot, 1, :][None, :]
            v0z = slab_ref[slot, 2, :][None, :]
            e1x = slab_ref[slot, 3, :][None, :]
            e1y = slab_ref[slot, 4, :][None, :]
            e1z = slab_ref[slot, 5, :][None, :]
            e2x = slab_ref[slot, 6, :][None, :]
            e2y = slab_ref[slot, 7, :][None, :]
            e2z = slab_ref[slot, 8, :][None, :]

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
            ok &= (t >= t_min) & (t <= t_cap)

            hit = jnp.any(ok, axis=1).astype(occ_ref.dtype)  # [R]
            occ_ref[0, 0, :] = jnp.maximum(occ_ref[0, 0, :], hit)
            return k + 1, 0

        k_final, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))

        # Drain the in-flight prefetch on early exit (all lanes occluded).
        @pl.when(k_final < n_i)
        def _():
            dma(jax.lax.rem(k_final, 2), k_final).wait()


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def anyhit_sweep_pallas(
    slab: SlabTable,
    rays_packed: jnp.ndarray,  # [B, 8, R]
    order: jnp.ndarray,        # [B, C_pad] i32
    n_cand: jnp.ndarray,       # [B] i32
    t_min: float = 1.0e-3,
    interpret: bool = False,
):
    b, _, r = rays_packed.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 8, r), lambda i, nc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, order.shape[1]), lambda i, nc: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, r), lambda i, nc: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 9, slab.tri.shape[2]), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_anyhit_kernel, t_min=t_min, s=slab.tri.shape[2])
    (occ,) = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((b, 1, r), jnp.int32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(n_cand, rays_packed, order[:, None, :], slab.tri)
    return occ[:, 0] > 0


# ---------------------------------------------------------------------------
# High-level wrappers: sort + cull (XLA) -> Pallas sweep -> unsort.
# ---------------------------------------------------------------------------


def _prep_wave(accel, origins, directions, t_max, block_size, sort):
    from path_tracer_ai_tpu.accel import traverse as T

    n = origins.shape[0]
    assert n % block_size == 0
    nb = n // block_size
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    perm = None
    if sort:
        keys = T._sort_keys(accel, origins, directions, t_max)
        perm = jnp.argsort(keys).astype(jnp.int32)
        origins = origins[perm]
        directions = directions[perm]
        t_max = t_max[perm]
    o_blk = origins.reshape(nb, block_size, 3)
    d_blk = directions.reshape(nb, block_size, 3)
    tb = t_max.reshape(nb, block_size)
    order, n_cand, entry = T._block_candidates(accel, o_blk, d_blk, tb)
    # pad candidate tables to a lane-friendly width
    c = order.shape[1]
    c_pad = -(-c // 128) * 128
    if c_pad - c:
        order = jnp.pad(order, ((0, 0), (0, c_pad - c)))
        entry = jnp.pad(entry, ((0, 0), (0, c_pad - c)),
                        constant_values=jnp.inf)
    rays_packed = jnp.concatenate(
        [
            jnp.transpose(o_blk, (0, 2, 1)),            # [B,3,R]
            jnp.transpose(d_blk, (0, 2, 1)),            # [B,3,R]
            tb[:, None, :],                             # [B,1,R]
            jnp.zeros_like(tb)[:, None, :],
        ],
        axis=1,
    )  # [B, 8, R]
    return rays_packed, order, entry, n_cand, perm, nb


@functools.partial(
    jax.jit, static_argnames=("block_size", "sort", "interpret", "t_min")
)
def closest_hit_pallas(
    accel: ClusterAccel,
    slab: SlabTable,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    block_size: int = 128,
    sort: bool = True,
    interpret: bool = False,
):
    """Drop-in equivalent of traverse.closest_hit_packets on the Pallas path."""
    from path_tracer_ai_tpu.accel.traverse import PacketHit

    n = origins.shape[0]
    rays_packed, order, entry, n_cand, perm, nb = _prep_wave(
        accel, origins, directions, t_max, block_size, sort
    )
    best_t, best_cid, best_slot = closest_sweep_pallas(
        slab, rays_packed, order, entry, n_cand,
        t_min=float(t_min), interpret=interpret,
    )
    gid = slab.tri_id[jnp.maximum(best_cid, 0), best_slot]
    gid = jnp.where(best_cid >= 0, gid, -1)

    t_out = best_t.reshape(n)
    id_out = gid.reshape(n)
    if perm is not None:
        inv = jnp.zeros((n,), jnp.int32).at[perm].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        t_out = t_out[inv]
        id_out = id_out[inv]
    return PacketHit(hit=jnp.isfinite(t_out), t=t_out, tri=id_out)


@functools.partial(
    jax.jit, static_argnames=("block_size", "sort", "interpret", "t_min")
)
def any_hit_pallas(
    accel: ClusterAccel,
    slab: SlabTable,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min,
    t_max,
    block_size: int = 128,
    sort: bool = True,
    interpret: bool = False,
):
    n = origins.shape[0]
    rays_packed, order, _entry, n_cand, perm, nb = _prep_wave(
        accel, origins, directions, t_max, block_size, sort
    )
    occ = anyhit_sweep_pallas(
        slab, rays_packed, order, n_cand,
        t_min=float(t_min), interpret=interpret,
    )
    out = occ.reshape(n)
    if perm is not None:
        inv = jnp.zeros((n,), jnp.int32).at[perm].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        out = out[inv]
    return out
