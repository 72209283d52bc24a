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
  10-15 pad the sublane tile.
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


def pack_tris(accel) -> jnp.ndarray:
    """[C, 16, S] f32 triangle pack (see module docstring for rows)."""
    c, s = accel.v0.shape[0], accel.v0.shape[1]
    rows = [accel.v0[:, :, k] for k in range(3)]
    rows += [accel.e1[:, :, k] for k in range(3)]
    rows += [accel.e2[:, :, k] for k in range(3)]
    rows.append(
        jax.lax.bitcast_convert_type(accel.tri_id, jnp.float32)
    )
    pack = jnp.stack(rows, axis=1)                        # [C, 10, S]
    return jnp.pad(pack, ((0, 0), (0, 6), (0, 0)))        # [C, 16, S]


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


def _sweep_kernel(cid_ref, rays_ref, tri_ref, t_out_ref, tri_out_ref,
                  *, group):
    """One grid step = `group` tiles sharing ONE cluster (Mosaic needs
    output blocks with last-two dims divisible by (8, 128), so tiles are
    processed in groups of 8; the host pads each cluster's tile list)."""
    del cid_ref  # consumed by the index_map only
    tri = tri_ref[0]                                      # [16, S]
    trit = tri.T                                          # [S, 16]

    v0x, v0y, v0z = trit[:, 0:1], trit[:, 1:2], trit[:, 2:3]  # [S, 1]
    e1x, e1y, e1z = trit[:, 3:4], trit[:, 4:5], trit[:, 5:6]
    e2x, e2y, e2z = trit[:, 6:7], trit[:, 7:8], trit[:, 8:9]
    tid = jax.lax.bitcast_convert_type(trit[:, 9:10], jnp.int32)

    for g in range(group):
        rays = rays_ref[g]                                # [8, T]
        ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]  # [1, T]
        dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
        tmax = rays[6:7, :]
        tmin = rays[7:8, :]

        # Möller–Trumbore, identical op order to traverse._mt_sweep
        # ([S, T] outer-broadcast chains).
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
        best = jnp.min(tt, axis=0, keepdims=True)         # [1, T]
        tid_masked = jnp.where(ok & (tt <= best), tid, I32_MAX)
        t_out_ref[g, :] = best[0]
        tri_out_ref[g, :] = jnp.min(tid_masked, axis=0)


GROUP = 8  # tiles per grid step; output block (GROUP, T) satisfies Mosaic


@functools.partial(jax.jit, static_argnames=("interpret",))
def tile_sweep(tri_pack, rays_pack, tile_cid, interpret=False):
    """Fused per-tile sweep: (t [nt, T], tri [nt, T]); tri = I32_MAX on miss.

    tri_pack [C, 16, S] (pack_tris), rays_pack [nt, 8, T]
    (pack_rays_tiles; row 7 = t_min), tile_cid [nt] i32. nt must be a
    multiple of GROUP and tile_cid must be constant within each
    GROUP-tile run (the cluster-major pair builder pads each cluster's
    tile list to GROUP-tile granularity — _build_pairs tile_group);
    tile_cid is also the DMA-elision key across consecutive steps.

    The production caller (ctiles._sweep_resolve use_pallas=True) invokes
    this per tile-chunk inside a dynamically-bounded fori_loop, so kernel
    work — like every other pipeline stage — scales with LIVE pairs while
    the chunk-local ray gather stays memory-bounded.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nt, _, t_lanes = rays_pack.shape
    s = tri_pack.shape[2]
    g = GROUP
    assert nt % g == 0, nt

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt // g,),
        in_specs=[
            pl.BlockSpec((g, 8, t_lanes), lambda i, cid: (i, 0, 0)),
            pl.BlockSpec((1, 16, s), lambda i, cid: (cid[i * g], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((g, t_lanes), lambda i, cid: (i, 0)),
            pl.BlockSpec((g, t_lanes), lambda i, cid: (i, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_sweep_kernel, group=g),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, t_lanes), jnp.float32),
            jax.ShapeDtypeStruct((nt, t_lanes), jnp.int32),
        ],
        interpret=interpret,
    )(tile_cid, rays_pack, tri_pack)
