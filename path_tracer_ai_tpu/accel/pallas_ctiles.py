"""Pallas fused tile sweep for the ctiles backend (round-3 lever #1).

The XLA `_sweep_resolve` runs at ~6.5 Gtests/s effective on real waves vs
the 18-28 Gtests/s dense-MT peak (docs/ARCHITECTURE.md): the gap is
materialized [chunk, T, S] intermediates, chunk-loop overhead, and
row-granular gathers. This kernel fuses the per-tile Möller–Trumbore
sweep and the per-slot (t, tri) reduction into one `pallas_call`:

- grid = one step per TILE; the tile's cluster id is a scalar-prefetch
  operand, so the triangle block's index_map selects cluster `cid[i]`
  directly from HBM — and because pairs are sorted CLUSTER-major,
  consecutive steps usually map to the SAME block and the pipeline
  elides the redundant DMA (the "hardware RT core feed" this design has
  aimed at since round 2).
- rays arrive pre-packed [nt, 8, T] (component rows: ox oy oz dx dy dz
  t_max pad) — 8 sublanes x T lanes, the natural f32 tile.
- triangles are packed once per accel as [C, 16, S]: rows 0-8 are
  v0/e1/e2 xyz, row 9 is the global triangle id bitcast to f32, rows
  10-15 carry per-sub-slab AABBs (lo.xyz / hi.xyz over lanes
  0..n_subs-1) that let the kernels skip [SUB, T] MT chunks no ray of
  the tile can hit (see pack_tris).
- in-kernel: one [16, S] -> [S, 16] transpose puts triangle components
  on sublanes; MT runs as [S, T] outer-broadcast elementwise chains
  (identical op order to traverse._mt_sweep, so results are exact), and
  the per-slot reduction collapses sublanes to the [1, T] outputs.

Everything else (per-ray culling, pair transpose, scatter-min resolve,
overflow fallback) stays in XLA — this kernel replaces only the
measured-hot dense sweep. Opt-in and CI-tested in interpret mode; wire
into ctiles once the on-chip win is measured (the round-1 Pallas lesson:
a kernel is production only after it beats XLA on wall-clock).

Reference role: the RT-core fixed-function intersect feed
(/root/reference/src/gpu/ptx/optix_kernels.cu:101-114).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from path_tracer_ai_tpu.core.types import MT_EPSILON

I32_MAX = np.int32(2**31 - 1)


SUB = 32  # sub-slab width (rows per pl.when-gated MT chunk)


def n_subs(s: int) -> int:
    """Sub-slabs per cluster for an S-wide accel."""
    return -(-s // SUB)


def pack_tris(accel) -> jnp.ndarray:
    """[C, 16, S] f32 triangle pack (see module docstring for rows).

    Rows 10-15 carry per-sub-slab AABBs over lanes 0..n_subs(S)-1
    (rows 10-12 = lo.xyz, rows 13-15 = hi.xyz): clusters are Morton-
    ordered, so contiguous SUB-triangle ranges have tight boxes, and the
    kernels can skip any [SUB, T] MT chunk whose box misses every ray of
    the tile (probe P: active sub fraction 0.31-0.54 closest, ~0.1-0.15
    shadow). Padding slots and all-padding subs yield inverted boxes
    (lo=+inf, hi=-inf) that fail every slab test."""
    c, s = accel.v0.shape[0], accel.v0.shape[1]
    rows = [accel.v0[:, :, k] for k in range(3)]
    rows += [accel.e1[:, :, k] for k in range(3)]
    rows += [accel.e2[:, :, k] for k in range(3)]
    rows.append(
        jax.lax.bitcast_convert_type(accel.tri_id, jnp.float32)
    )
    pack = jnp.stack(rows, axis=1)                        # [C, 10, S]

    ns = n_subs(s)
    pad_s = ns * SUB - s
    v0, v1, v2 = accel.v0, accel.v0 + accel.e1, accel.v0 + accel.e2
    valid = (accel.tri_id >= 0)[..., None]                # [C, S, 1]
    lo = jnp.where(valid, jnp.minimum(jnp.minimum(v0, v1), v2), jnp.inf)
    hi = jnp.where(valid, jnp.maximum(jnp.maximum(v0, v1), v2), -jnp.inf)
    if pad_s:
        lo = jnp.pad(lo, ((0, 0), (0, pad_s), (0, 0)),
                     constant_values=jnp.inf)
        hi = jnp.pad(hi, ((0, 0), (0, pad_s), (0, 0)),
                     constant_values=-jnp.inf)
    sub_lo = lo.reshape(c, ns, SUB, 3).min(axis=2)        # [C, ns, 3]
    sub_hi = hi.reshape(c, ns, SUB, 3).max(axis=2)
    box = jnp.concatenate(
        [jnp.moveaxis(sub_lo, 2, 1), jnp.moveaxis(sub_hi, 2, 1)], axis=1
    )                                                     # [C, 6, ns]
    fill = jnp.asarray([jnp.inf] * 3 + [-jnp.inf] * 3, jnp.float32)
    box_rows = jnp.broadcast_to(fill[None, :, None], (c, 6, s))
    box_rows = jax.lax.dynamic_update_slice(box_rows, box, (0, 0, 0))
    return jnp.concatenate([pack, box_rows], axis=1)      # [C, 16, S]


def pack_rays_tiles(o, d, t_max, t_lanes: int, t_min=1e-3) -> jnp.ndarray:
    """[nt, 8, T] ray pack; N must be a multiple of t_lanes.

    Row 7 carries t_min (a per-lane constant) so the kernel needs no
    static t_min argument — the ctiles pipeline receives t_min as a
    traced value and cannot turn it back into a static."""
    n = o.shape[0]
    nt = n // t_lanes
    rows = [o[:, k] for k in range(3)] + [d[:, k] for k in range(3)]
    rows += [t_max, jnp.full((n,), t_min, jnp.float32)]
    flat = jnp.stack(rows, axis=0)                        # [8, N]
    return jnp.moveaxis(flat.reshape(8, nt, t_lanes), 0, 1)


def _mt_rows(trit_k, ox, oy, oz, dx, dy, dz, tmin, tmax):
    """Möller–Trumbore over a row slice of the transposed pack, identical
    op order to traverse._mt_sweep ([rows, T] outer-broadcast chains).
    Returns (best t [1, T], min tri id at best [1, T])."""
    v0x, v0y, v0z = trit_k[:, 0:1], trit_k[:, 1:2], trit_k[:, 2:3]
    e1x, e1y, e1z = trit_k[:, 3:4], trit_k[:, 4:5], trit_k[:, 5:6]
    e2x, e2y, e2z = trit_k[:, 6:7], trit_k[:, 7:8], trit_k[:, 8:9]
    tid = jax.lax.bitcast_convert_type(trit_k[:, 9:10], jnp.int32)

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

    tt = jnp.where(ok, t, jnp.inf)
    best = jnp.min(tt, axis=0, keepdims=True)             # [1, T]
    tid_masked = jnp.where(ok & (tt <= best), tid, I32_MAX)
    return best, jnp.min(tid_masked, axis=0, keepdims=True)


def _sub_pred(tri_ref, k, ox, oy, oz, invx, invy, invz, tmin, tmax):
    """Scalar predicate: does ANY lane's [tmin, tmax] segment touch
    sub-slab k's AABB (pack rows 10-15)? Inclusive slab with the
    comparison-select form of _ray_slab: NaNs from 0*inf edges keep the
    running bound (over-include, never exclude). Dead lanes (tmax < 0)
    fail naturally (tmax < tmin)."""
    near_far = []
    for axis, (o_row, inv) in enumerate(
        ((ox, invx), (oy, invy), (oz, invz))
    ):
        t0 = (tri_ref[0, 10 + axis, k] - o_row) * inv     # [1, T]
        t1 = (tri_ref[0, 13 + axis, k] - o_row) * inv
        neg = inv < 0.0
        near_far.append((jnp.where(neg, t1, t0), jnp.where(neg, t0, t1)))
    lo = tmin
    hi = tmax
    for near, far in near_far:
        lo = jnp.where(near > lo, near, lo)
        hi = jnp.where(far < hi, far, hi)
    return jnp.max(jnp.where(hi >= lo, 1.0, 0.0)) > 0.0


def _sweep_kernel(cid_ref, rays_ref, tri_ref, t_out_ref, tri_out_ref,
                  *, group, sub_skip=False, pack_t=False):
    """One grid step = `group` tiles sharing ONE cluster (Mosaic needs
    output blocks with last-two dims divisible by (8, 128), so tiles are
    processed in groups of 8; the host pads each cluster's tile list).

    sub_skip=True gates each [SUB, T] row chunk on its sub-slab AABB
    (pack_tris rows 10-15): a chunk whose box misses every lane's
    [t_min, t_max] segment contains no hittable triangle, so skipping
    its MT is exact (probe P: only 0.31-0.54 of chunks are active on
    real closest waves). The (t, tri) accumulators live in the output
    block and combine incrementally with the oracle's lexicographic tie
    rule — min is exact, so results are bitwise identical to the
    unskipped sweep.

    pack_t=True consumes a PRE-TRANSPOSED [C, S, 16] pack (see
    tile_sweep), deleting the per-step [16, S] -> [S, 16] transpose.
    Bitwise: transposition is exact and the MT op order is unchanged
    (round-5 kernel ladder measured 37% of kernel time in the per-step
    pipeline/DMA/transpose floor)."""
    from jax.experimental import pallas as pl

    assert not (pack_t and sub_skip), "sub_skip reads [16,S]-layout rows"
    del cid_ref  # consumed by the index_map only
    tri = tri_ref[0]                                      # [16,S] / [S,16]
    trit = tri if pack_t else tri.T                       # [S, 16]
    s = trit.shape[0]

    for g in range(group):
        rays = rays_ref[g]                                # [8, T]
        ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]  # [1, T]
        dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
        tmax = rays[6:7, :]
        tmin = rays[7:8, :]

        if not sub_skip:
            best, tri_min = _mt_rows(trit, ox, oy, oz, dx, dy, dz,
                                     tmin, tmax)
            t_out_ref[g, :] = best[0]
            tri_out_ref[g, :] = tri_min[0]
            continue

        t_out_ref[g, :] = jnp.full_like(tmax[0], jnp.inf)
        tri_out_ref[g, :] = jnp.full_like(tmax[0], I32_MAX, dtype=jnp.int32)
        invx, invy, invz = 1.0 / dx, 1.0 / dy, 1.0 / dz
        for k in range(n_subs(s)):
            pred = _sub_pred(tri_ref, k, ox, oy, oz, invx, invy, invz,
                             tmin, tmax)

            @pl.when(pred)
            def _(k=k, g=g, ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
                  tmin=tmin, tmax=tmax):
                best_k, trik = _mt_rows(
                    trit[k * SUB:min((k + 1) * SUB, s), :],
                    ox, oy, oz, dx, dy, dz, tmin, tmax)
                t_acc = t_out_ref[g:g + 1, :]             # [1, T]
                tri_acc = tri_out_ref[g:g + 1, :]
                t_new = jnp.minimum(t_acc, best_k)
                tri_new = jnp.minimum(
                    jnp.where(t_acc <= t_new, tri_acc, I32_MAX),
                    jnp.where(best_k <= t_new, trik, I32_MAX),
                )
                t_out_ref[g, :] = t_new[0]
                tri_out_ref[g, :] = tri_new[0]


GROUP = 8  # tiles per grid step; output block (GROUP, T) satisfies Mosaic


@functools.partial(jax.jit,
                   static_argnames=("interpret", "sub_skip", "pack_t"))
def tile_sweep(tri_pack, rays_pack, tile_cid, interpret=False,
               sub_skip=False, pack_t=False):
    """Fused per-tile sweep: (t [nt, T], tri [nt, T]); tri = I32_MAX on miss.

    tri_pack [C, 16, S] (pack_tris) — or [C, S, 16] when pack_t=True
    (jnp.swapaxes(pack, 1, 2)), which deletes the kernel's per-step
    transpose — rays_pack [nt, 8, T] (pack_rays_tiles; row 7 = t_min),
    tile_cid [nt] i32. nt must be a multiple of GROUP and tile_cid must
    be constant within each GROUP-tile run (the cluster-major pair
    builder pads each cluster's tile list to GROUP-tile granularity —
    _build_pairs tile_group); tile_cid is also the DMA-elision key
    across consecutive steps.

    The production caller (ctiles._sweep_resolve use_pallas=True) invokes
    this per tile-chunk inside a dynamically-bounded fori_loop, so kernel
    work — like every other pipeline stage — scales with LIVE pairs while
    the chunk-local ray gather stays memory-bounded.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nt, _, t_lanes = rays_pack.shape
    s = tri_pack.shape[1] if pack_t else tri_pack.shape[2]
    g = GROUP
    assert nt % g == 0, nt

    tri_block = (1, s, 16) if pack_t else (1, 16, s)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt // g,),
        in_specs=[
            pl.BlockSpec((g, 8, t_lanes), lambda i, cid: (i, 0, 0)),
            pl.BlockSpec(tri_block, lambda i, cid: (cid[i * g], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((g, t_lanes), lambda i, cid: (i, 0)),
            pl.BlockSpec((g, t_lanes), lambda i, cid: (i, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_sweep_kernel, group=g, sub_skip=sub_skip,
                          pack_t=pack_t),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, t_lanes), jnp.float32),
            jax.ShapeDtypeStruct((nt, t_lanes), jnp.int32),
        ],
        interpret=interpret,
    )(tile_cid, rays_pack, tri_pack)
