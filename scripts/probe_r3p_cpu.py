"""Round-3 probe P (CPU-only): in-kernel sub-cluster skip rates.

The fused Pallas sweeps (pallas_ctiles closest, pallas_anyhit shadow)
process whole [S, 128] cluster packs per tile/block. Clusters are Morton-
ordered, so contiguous 32-triangle sub-ranges have tight AABBs; a kernel
that carries 8 (S=256) / 4 (S=128) sub-AABB rows per cluster can
`pl.when`-skip any [32, 128] MT chunk whose sub-AABB misses every ray in
the tile — exact (no triangle inside a missed box can be hit) and cheap
(8 slab tests per 128 lanes vs the 32x128 MT rows they gate).

This probe measures the ACTIVE sub-slab fraction on real waves at the
production shapes:

- closest: octorig b=8 blocks, per-ray-exact block unions, S=256 accel,
  tiles of 16 blocks (128 lanes) sharing one cluster — the pallas_ctiles
  grid step. `active_tile` = fraction of 32-tri sub-slabs hit by >=1 of
  the tile's 128 rays (what pl.when can skip); `active_pair` = same at
  8-ray block granularity (the ceiling if lanes could gate per block).
- shadow: dir-sorted 128-ray blocks, conservative interval candidates,
  S=128 base accel, sub=32 (4 subs/cluster) — the pallas_anyhit grid
  step (t_max bounded per ray).

Expected payoff: sweep MT work scales with the active fraction; 0.5 ->
~2x fewer MT rows inside the measured-hot kernels.

Platform-independent scheduling facts (probe M/N/O pattern).
Usage: python scripts/probe_r3p_cpu.py [--small]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel import traverse
from path_tracer_ai_tpu.accel.clusters import build_clusters
from path_tracer_ai_tpu.core.types import RAY_TMIN, MATERIAL_DIELECTRIC
from path_tracer_ai_tpu.core import vec
from path_tracer_ai_tpu.engine import intersect as isect
from path_tracer_ai_tpu.scene.camera import default_camera, get_rays
from path_tracer_ai_tpu.scene.scene import DEFAULT_LIGHTS

small = "--small" in sys.argv
SUB = 32  # sub-slab width (Mosaic sublane-friendly: 32 f32 rows = 4 tiles)

host = {}
scene, accel = _demo_scene(subdivisions=4 if small else 6, host_out=host)
accel_c = build_clusters(host["tris"], cluster_size=256)
emit(probe="scene", tris=int(scene.triangles.count),
     clusters_s128=accel.num_clusters, clusters_s256=accel_c.num_clusters)


def sub_aabbs(acc):
    """[C, S//SUB, 3] sub-slab AABBs over valid tri slots (padding slots
    yield inverted boxes that fail every slab test)."""
    v0 = np.asarray(acc.v0)
    v1 = v0 + np.asarray(acc.e1)
    v2 = v0 + np.asarray(acc.e2)
    valid = (np.asarray(acc.tri_id) >= 0)[..., None]        # [C, S, 1]
    lo = np.where(valid, np.minimum(np.minimum(v0, v1), v2), np.inf)
    hi = np.where(valid, np.maximum(np.maximum(v0, v1), v2), -np.inf)
    c, s = v0.shape[:2]
    ns = s // SUB
    lo = lo.reshape(c, ns, SUB, 3).min(axis=2)
    hi = hi.reshape(c, ns, SUB, 3).max(axis=2)
    return lo.astype(np.float32), hi.astype(np.float32)


def slab_any(o, d, tm, lo, hi):
    """Any-ray-hits-box: o,d [R,3], tm [R], lo/hi [M,3] -> [M] bool."""
    inv = (1.0 / d).astype(np.float32)
    t0 = (lo[None] - o[:, None, :]) * inv[:, None, :]       # [R, M, 3]
    t1 = (hi[None] - o[:, None, :]) * inv[:, None, :]
    near = np.where(inv[:, None, :] < 0.0, t1, t0)
    far = np.where(inv[:, None, :] < 0.0, t0, t1)
    lo_t = np.full(near.shape[:2], np.float32(RAY_TMIN))
    hi_t = np.broadcast_to(tm[:, None], near.shape[:2]).copy()
    for a in range(3):
        np.maximum(lo_t, near[..., a], out=lo_t)
        np.minimum(hi_t, far[..., a], out=hi_t)
    ok = (hi_t >= lo_t) & (tm >= 0.0)[:, None]
    return ok.any(axis=0)


def cluster_hit(o, d, tm, bmin, bmax):
    """Per-ray cluster slab: [R, C] bool (exact per-ray cull)."""
    inv = (1.0 / d).astype(np.float32)
    t0 = (bmin[None] - o[:, None, :]) * inv[:, None, :]
    t1 = (bmax[None] - o[:, None, :]) * inv[:, None, :]
    near = np.where(inv[:, None, :] < 0.0, t1, t0)
    far = np.where(inv[:, None, :] < 0.0, t0, t1)
    lo = np.full(near.shape[:2], np.float32(RAY_TMIN))
    hi = np.broadcast_to(tm[:, None], near.shape[:2]).copy()
    for a in range(3):
        np.maximum(lo, near[..., a], out=lo)
        np.minimum(hi, far[..., a], out=hi)
    return (hi >= lo) & (tm >= 0.0)[:, None]


def study_closest(tag, o, d, tm):
    """pallas_ctiles granularity: b=8 blocks -> cluster-major 16-block
    tiles; active sub-slab fraction per tile and per pair."""
    t_start = time.perf_counter()
    acc = accel_c
    sub_lo, sub_hi = sub_aabbs(acc)
    bmin, bmax = np.asarray(acc.bmin), np.asarray(acc.bmax)
    C = acc.num_clusters
    ns = sub_lo.shape[1]
    B, TBK = 8, 16

    n = o.shape[0]
    pad = (-n) % B
    o = np.pad(np.asarray(o, np.float32), ((0, pad), (0, 0)))
    d = np.pad(np.asarray(d, np.float32), ((0, pad), (0, 0)),
               constant_values=1.0)
    tm = np.pad(np.asarray(tm, np.float32), (0, pad), constant_values=-1.0)
    keys = np.asarray(traverse._sort_keys(
        acc, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm),
        mode="octorig"))
    perm = np.argsort(keys, kind="stable")
    o, d, tm = o[perm], d[perm], tm[perm]
    nb = o.shape[0] // B

    # block -> candidate clusters (per-ray-exact union), block-major pairs
    pair_blk, pair_cid = [], []
    chunk = 4096
    for s in range(0, nb, chunk):
        c2 = min(s + chunk, nb)
        ch = cluster_hit(o[s * B:c2 * B], d[s * B:c2 * B],
                         tm[s * B:c2 * B], bmin, bmax)
        cb = ch.reshape(c2 - s, B, C).any(axis=1)           # [cb, C]
        bi, ci = np.nonzero(cb)
        pair_blk.append((bi + s).astype(np.int32))
        pair_cid.append(ci.astype(np.int32))
    pair_blk = np.concatenate(pair_blk)
    pair_cid = np.concatenate(pair_cid)

    # cluster-major order (stable: block-major within a cluster), tiles of
    # TBK blocks — the real pallas_ctiles tile composition
    order = np.argsort(pair_cid, kind="stable")
    pair_blk, pair_cid = pair_blk[order], pair_cid[order]

    # per-pair active subs (8-ray granularity) + per-tile active subs
    n_pairs = len(pair_blk)
    act_pair = np.zeros((n_pairs, ns), bool)
    for s in range(0, n_pairs, chunk):
        c2 = min(s + chunk, n_pairs)
        for j in range(s, c2):
            b, c = pair_blk[j], pair_cid[j]
            rs = slice(b * B, (b + 1) * B)
            act_pair[j] = slab_any(o[rs], d[rs], tm[rs],
                                   sub_lo[c], sub_hi[c])
    # group into tiles: consecutive pairs of the SAME cluster, TBK per tile
    # (cluster runs padded to whole tiles like _build_pairs)
    tile_act, tile_cnt = [], 0
    # run-length over pair_cid
    change = np.nonzero(np.diff(pair_cid))[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [n_pairs]])
    act_tile_sum = 0
    n_tiles = 0
    for st, en in zip(starts, ends):
        for ts in range(st, en, TBK):
            te = min(ts + TBK, en)
            n_tiles += 1
            act_tile_sum += act_pair[ts:te].any(axis=0).sum()
    emit(probe="subskip_closest", wave=tag, rays=n, blocks=nb,
         pairs=n_pairs, tiles=n_tiles, subs_per_cluster=ns,
         active_frac_pair=round(float(act_pair.sum())
                                / max(n_pairs * ns, 1), 3),
         active_frac_tile=round(float(act_tile_sum)
                                / max(n_tiles * ns, 1), 3),
         wall_s=round(time.perf_counter() - t_start, 1))


def study_shadow(tag, o, d, tm):
    """pallas_anyhit granularity: dir-sorted 128-ray blocks, conservative
    interval candidates, S=128 accel, 4 subs/cluster."""
    t_start = time.perf_counter()
    acc = accel
    sub_lo, sub_hi = sub_aabbs(acc)
    BS = 128

    n = o.shape[0]
    pad = (-n) % BS
    o = np.pad(np.asarray(o, np.float32), ((0, pad), (0, 0)))
    d = np.pad(np.asarray(d, np.float32), ((0, pad), (0, 0)),
               constant_values=1.0)
    tm = np.pad(np.asarray(tm, np.float32), (0, pad), constant_values=-1.0)
    keys = np.asarray(traverse._sort_keys(
        acc, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm), mode="dir"))
    perm = np.argsort(keys, kind="stable")
    o, d, tm = o[perm], d[perm], tm[perm]
    nb = o.shape[0] // BS
    ns = sub_lo.shape[1]

    ordk, n_cand, _e = traverse._block_candidates(
        acc, jnp.asarray(o.reshape(nb, BS, 3)),
        jnp.asarray(d.reshape(nb, BS, 3)),
        jnp.asarray(tm.reshape(nb, BS)))
    ordk = np.asarray(ordk)
    n_cand = np.asarray(n_cand)

    act_sum = 0
    pair_cnt = 0
    for b in range(nb):
        k = int(n_cand[b])
        if k == 0:
            continue
        rs = slice(b * BS, (b + 1) * BS)
        for c in ordk[b, :k]:
            act = slab_any(o[rs], d[rs], tm[rs], sub_lo[c], sub_hi[c])
            act_sum += int(act.sum())
            pair_cnt += 1
    emit(probe="subskip_shadow", wave=tag, rays=n, live=int((tm >= 0).sum()),
         blocks=nb, pairs=pair_cnt, subs_per_cluster=ns,
         active_frac_block=round(float(act_sum) / max(pair_cnt * ns, 1), 3),
         wall_s=round(time.perf_counter() - t_start, 1))


# ---- waves (probe N/O recipes) ----------------------------------------
cam = default_camera()
W, H = (320, 180) if small else (960, 540)
xs = jnp.arange(W * H, dtype=jnp.int32) % W
ys = jnp.arange(W * H, dtype=jnp.int32) // W
u = (xs.astype(jnp.float32) + 0.5) / W
v = (ys.astype(jnp.float32) + 0.5) / H
o0, d0 = get_rays(cam, u, v, 16.0 / 9.0)
o0, d0 = np.asarray(o0), np.asarray(d0)
tm0 = np.full(W * H, np.inf, np.float32)

study_closest("primary", o0, d0, tm0)

hit0 = traverse.closest_hit_packets(accel, jnp.asarray(o0),
                                    jnp.asarray(d0), RAY_TMIN, jnp.inf,
                                    block_size=256)
rng = np.random.default_rng(7)


def continuations(o_in, d_in, hit):
    alive = np.asarray(hit.hit)
    idx = np.flatnonzero(alive)
    t = np.asarray(hit.t)[idx]
    tri = np.asarray(hit.tri)[idx]
    attrs = isect.hit_attributes(
        scene.triangles, jnp.asarray(o_in[idx]), jnp.asarray(d_in[idx]),
        jnp.asarray(t), jnp.asarray(tri))
    pos = np.asarray(attrs.position)
    nrm = np.asarray(attrs.normal)
    mt = np.asarray(scene.materials.mtype)[np.asarray(attrs.mat_id)]
    r1 = rng.random(len(idx)).astype(np.float32)
    r2 = rng.random(len(idx)).astype(np.float32)
    phi = 2.0 * np.pi * r1
    sq = np.sqrt(r2)
    local = np.stack([np.cos(phi) * sq, np.sin(phi) * sq,
                      np.sqrt(np.maximum(0.0, 1.0 - r2))], axis=1)
    up = np.where(np.abs(nrm[:, 2:3]) < 0.9,
                  np.tile([[0.0, 0.0, 1.0]], (len(idx), 1)),
                  np.tile([[1.0, 0.0, 0.0]], (len(idx), 1))).astype(
                      np.float32)
    tx = np.cross(up, nrm)
    tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-20)
    ty = np.cross(nrm, tx)
    d1 = (local[:, 0:1] * tx + local[:, 1:2] * ty
          + local[:, 2:3] * nrm).astype(np.float32)
    o1 = (pos + nrm * 1e-3).astype(np.float32)
    return o1, d1, pos, nrm, mt


o1, d1, pos0, nrm0, mt0 = continuations(o0, d0, hit0)
tm1 = np.full(len(o1), np.inf, np.float32)
study_closest("bounce1", o1, d1, tm1)

# shadow wave at bounce 0 (light-major, from primary hits)
lights_pos = np.asarray([l[0] for l in DEFAULT_LIGHTS], np.float32)
lv = lights_pos[:, None, :] - pos0[None, :, :]
dist = np.linalg.norm(lv, axis=-1)
ld = lv / np.maximum(dist, 1e-30)[..., None]
cos = np.maximum((nrm0[None] * ld).sum(-1), 0.0)
contrib = (cos > 0.0) & (mt0 != MATERIAL_DIELECTRIC)[None]
tms = np.where(contrib, dist - 1e-3, -1.0).astype(np.float32)
osh = np.broadcast_to((pos0 + nrm0 * 1e-3)[None],
                      ld.shape).reshape(-1, 3).astype(np.float32)
dsh = ld.reshape(-1, 3).astype(np.float32)
tsh = tms.reshape(-1)
study_shadow("shadow_b0", osh, dsh, tsh)

# shadow wave at bounce 1
hit1 = traverse.closest_hit_packets(
    accel, jnp.asarray(np.pad(o1, ((0, (-len(o1)) % 256), (0, 0)))),
    jnp.asarray(np.pad(d1, ((0, (-len(d1)) % 256), (0, 0)),
                       constant_values=1.0)),
    RAY_TMIN,
    jnp.asarray(np.pad(tm1, (0, (-len(tm1)) % 256), constant_values=-1.0)),
    block_size=256)
hit1 = hit1._replace(hit=hit1.hit[:len(o1)], t=hit1.t[:len(o1)],
                     tri=hit1.tri[:len(o1)])
o2, d2, pos1, nrm1, mt1 = continuations(o1, d1, hit1)
lv = lights_pos[:, None, :] - pos1[None, :, :]
dist = np.linalg.norm(lv, axis=-1)
ld = lv / np.maximum(dist, 1e-30)[..., None]
cos = np.maximum((nrm1[None] * ld).sum(-1), 0.0)
contrib = (cos > 0.0) & (mt1 != MATERIAL_DIELECTRIC)[None]
tms = np.where(contrib, dist - 1e-3, -1.0).astype(np.float32)
osh = np.broadcast_to((pos1 + nrm1 * 1e-3)[None],
                      ld.shape).reshape(-1, 3).astype(np.float32)
dsh = ld.reshape(-1, 3).astype(np.float32)
tsh = tms.reshape(-1)
study_shadow("shadow_b1", osh, dsh, tsh)
