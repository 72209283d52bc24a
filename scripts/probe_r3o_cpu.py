"""Round-3 probe O (CPU-only): front-to-back early-termination ceiling.

Lever 2 (docs/ARCHITECTURE.md): the ctiles closest sweep visits every
(block, cluster) candidate pair; a front-to-back scheme would process each
block's candidates in entry order and stop once every ray's current best t
precedes the remaining clusters. This probe measures, on REAL closest
waves (primary / bounce-1 / bounce-2 of the bench blob scene at the
production shape: octorig-sorted b=8 blocks, S=256 closest accel), the
fraction of pair MT work such a scheme could skip:

- ideal    : pair skippable given each ray's FINAL best t (upper bound on
             any front-to-back scheme),
- perray   : sequential sim, per-ray rule (every ray: entry > running
             best, or no overlap) — what an in-kernel per-lane check buys,
- blockagg : sequential sim, block-aggregate rule (min_r entry > max_r
             running best) — the cheap rule a two-phase implementation can
             evaluate from block tables alone,
- firstk   : fraction of rays whose final best tri lies in their block's
             k nearest-entry candidates (how much a k-candidate prepass
             resolves).

Tile counts (tile_blocks=16 padding) are reported alongside raw pairs:
savings must survive tile padding to reach the sweep.

These are platform-independent scheduling facts (probe M/N pattern).
Usage: python scripts/probe_r3o_cpu.py [--small]
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
from path_tracer_ai_tpu.core.types import RAY_TMIN
from path_tracer_ai_tpu.engine import intersect as isect
from path_tracer_ai_tpu.scene.camera import default_camera, get_rays

small = "--small" in sys.argv
B = 8          # production ctiles closest block
CAP = 48       # production candidate cap
TB = 16        # tile_blocks (tile padding granularity)
K = CAP        # effective extraction width (min(CAP, C), set post-build)

host = {}
scene, accel = _demo_scene(subdivisions=4 if small else 6, host_out=host)
accel_c = build_clusters(host["tris"], cluster_size=256)
C = accel_c.num_clusters
K = min(CAP, C)
emit(probe="scene", tris=int(scene.triangles.count), clusters_256=C)

# tri -> cluster map (in the S=256 accel's cluster space)
tid = np.asarray(accel_c.tri_id)
cluster_of = np.full(int(scene.triangles.count), -1, np.int32)
rows = np.repeat(np.arange(tid.shape[0], dtype=np.int32), tid.shape[1])
flat = tid.reshape(-1)
cluster_of[flat[flat >= 0]] = rows[flat >= 0]

bmin = np.asarray(accel_c.bmin)  # [C, 3]
bmax = np.asarray(accel_c.bmax)


def entry_chunk(o, d, tm):
    """Per-ray slab entry t vs all clusters: [r, C] f32, inf = no overlap.

    Same inclusive slab semantics as pairs._ray_slab_chunk (conservative
    contract: flat AABBs stay in)."""
    inv = 1.0 / d                                        # IEEE inf slopes
    t0 = (bmin[None] - o[:, None, :]) * inv[:, None, :]
    t1 = (bmax[None] - o[:, None, :]) * inv[:, None, :]
    near = np.where(inv[:, None, :] < 0.0, t1, t0)
    far = np.where(inv[:, None, :] < 0.0, t0, t1)
    lo = np.full(near.shape[:2], np.float32(RAY_TMIN))
    hi = np.minimum(tm[:, None], np.inf).astype(np.float32)
    hi = np.broadcast_to(hi, near.shape[:2]).copy()
    for a in range(3):
        np.maximum(lo, near[..., a], out=lo)
        np.minimum(hi, far[..., a], out=hi)
    ok = (hi >= lo) & (tm >= 0.0)[:, None]
    return np.where(ok, lo, np.inf).astype(np.float32)


def closest_padded(o, d, tm):
    """Exact ground truth, padded to packet granularity."""
    n = o.shape[0]
    pad = (-n) % 256
    op = np.pad(np.asarray(o, np.float32), ((0, pad), (0, 0)))
    dp = np.pad(np.asarray(d, np.float32), ((0, pad), (0, 0)),
                constant_values=1.0)
    tp = np.pad(np.asarray(tm, np.float32), (0, pad), constant_values=-1.0)
    hit = traverse.closest_hit_packets(
        accel_c, jnp.asarray(op), jnp.asarray(dp), RAY_TMIN,
        jnp.asarray(tp), block_size=256)
    return hit._replace(hit=hit.hit[:n], t=hit.t[:n], tri=hit.tri[:n])


def study(tag, o, d, tm):
    t_start = time.perf_counter()
    n = o.shape[0]
    o = np.asarray(o, np.float32)
    d = np.asarray(d, np.float32)
    tm = np.asarray(tm, np.float32)

    # Final exact best hit (ground truth for the skip rules).
    hit = closest_padded(o, d, tm)
    final_t = np.asarray(hit.t)
    final_tri = np.asarray(hit.tri)
    best_cl = np.where(final_tri >= 0, cluster_of[np.maximum(final_tri, 0)],
                       -1).astype(np.int32)

    # Production lane order: octorig sort, blocks of B.
    pad = (-n) % B
    if pad:
        o = np.pad(o, ((0, pad), (0, 0)))
        d = np.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        tm = np.pad(tm, (0, pad), constant_values=-1.0)
        final_t = np.pad(final_t, (0, pad), constant_values=np.inf)
        best_cl = np.pad(best_cl, (0, pad), constant_values=-1)
    keys = np.asarray(traverse._sort_keys(
        accel_c, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm),
        mode="octorig"))
    perm = np.argsort(keys, kind="stable")
    o, d, tm = o[perm], d[perm], tm[perm]
    final_t, best_cl = final_t[perm], best_cl[perm]
    nb = o.shape[0] // B

    # Per-block top-CAP candidates by entry order, with per-ray entries.
    e_rk = np.full((nb, K, B), np.inf, np.float32)
    cid_k = np.full((nb, K), -1, np.int32)
    ncand = np.zeros((nb,), np.int32)
    over = np.zeros((nb,), bool)
    chunk = 4096  # blocks per chunk
    for s in range(0, nb, chunk):
        e = s * B
        c2 = min(s + chunk, nb)
        ent = entry_chunk(o[e:c2 * B], d[e:c2 * B], tm[e:c2 * B])
        ent = ent.reshape(c2 - s, B, C)
        blk_e = ent.min(axis=1)                     # [cb, C] block entry
        cand = np.isfinite(blk_e)
        nc = cand.sum(axis=1).astype(np.int32)
        ncand[s:c2] = np.minimum(nc, K)
        over[s:c2] = nc > CAP
        ordk = np.argsort(blk_e, axis=1, kind="stable")[:, :K]  # [cb, K]
        cid_k[s:c2] = np.where(
            np.take_along_axis(cand, ordk, axis=1), ordk, -1)
        e_sel = np.take_along_axis(
            ent, ordk[:, None, :], axis=2)          # [cb, B, K]
        e_rk[s:c2] = e_sel.transpose(0, 2, 1)

    fb = final_t.reshape(nb, B)
    bc = best_cl.reshape(nb, B)
    live = (tm >= 0.0).reshape(nb, B)

    # first-k coverage: best cluster's rank in the block's entry order
    rank = np.full((nb, B), -1, np.int32)
    for k in range(K):
        m = (bc == cid_k[:, k][:, None]) & (rank < 0) & (bc >= 0)
        rank[m] = k
    hits_total = int(((bc >= 0) & live).sum())
    firstk = {f"k{kk}": round(float(
        ((rank >= 0) & (rank <= kk) & live).sum() / max(hits_total, 1)), 3)
        for kk in (0, 1, 3, 7)}

    # Sequential sims.
    run_pr = np.full((nb, B), np.inf, np.float32)   # per-ray rule
    run_ba = np.full((nb, B), np.inf, np.float32)   # block-aggregate rule
    swept_pr = np.zeros((nb, K), bool)
    swept_ba = np.zeros((nb, K), bool)
    swept_id = np.zeros((nb, K), bool)
    for k in range(K):
        ek = e_rk[:, k, :]                          # [nb, B]
        validb = cid_k[:, k] >= 0
        no_c = np.isinf(ek)
        # ideal (final best known up front)
        sk_id = np.all((ek > fb) | no_c, axis=1)
        swept_id[:, k] = validb & ~sk_id
        # per-ray running rule
        sk_pr = np.all((ek > run_pr) | no_c, axis=1)
        sw = validb & ~sk_pr
        swept_pr[:, k] = sw
        upd = sw[:, None] & (bc == cid_k[:, k][:, None])
        run_pr = np.where(upd, fb, run_pr)
        # block-aggregate rule
        rb_max = np.where(live, run_ba, -np.inf).max(axis=1)
        e_min = ek.min(axis=1)
        sk_ba = e_min > rb_max
        swb = validb & ~sk_ba
        swept_ba[:, k] = swb
        updb = swb[:, None] & (bc == cid_k[:, k][:, None])
        run_ba = np.where(updb, fb, run_ba)

    def tiles(mask):
        cc = cid_k[mask]
        return int(np.ceil(np.bincount(cc[cc >= 0], minlength=C)
                           / TB).sum())

    total = int(ncand.sum())
    all_mask = cid_k >= 0
    emit(probe="ft_ceiling", wave=tag, rays=n,
         live=int((tm >= 0).sum()), blocks=nb,
         overflow_blocks=int(over.sum()),
         pairs_total=total,
         pairs_ideal=int(swept_id.sum()),
         pairs_perray=int(swept_pr.sum()),
         pairs_blockagg=int(swept_ba.sum()),
         frac_ideal=round(1 - swept_id.sum() / max(total, 1), 3),
         frac_perray=round(1 - swept_pr.sum() / max(total, 1), 3),
         frac_blockagg=round(1 - swept_ba.sum() / max(total, 1), 3),
         tiles_total=tiles(all_mask), tiles_perray=tiles(swept_pr),
         tiles_blockagg=tiles(swept_ba),
         firstk=firstk,
         wall_s=round(time.perf_counter() - t_start, 1))
    return final_t


cam = default_camera()
W, H = (320, 180) if small else (960, 540)
xs = jnp.arange(W * H, dtype=jnp.int32) % W
ys = jnp.arange(W * H, dtype=jnp.int32) // W
u = (xs.astype(jnp.float32) + 0.5) / W
v = (ys.astype(jnp.float32) + 0.5) / H
o0, d0 = get_rays(cam, u, v, 16.0 / 9.0)
o0 = np.asarray(o0)
d0 = np.asarray(d0)
tm0 = np.full(W * H, np.inf, np.float32)
study("primary", o0, d0, tm0)

# bounce-1: cosine-sampled continuations from primary hits (probe-N recipe)
hit0 = closest_padded(o0, d0, tm0)
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
    return o1, d1


o1, d1 = continuations(o0, d0, hit0)
tm1 = np.full(len(o1), np.inf, np.float32)
study("bounce1", o1, d1, tm1)

hit1 = closest_padded(o1, d1, tm1)
o2, d2 = continuations(o1, d1, hit1)
tm2 = np.full(len(o2), np.inf, np.float32)
study("bounce2", o2, d2, tm2)
