"""Round-3 probe Q (CPU-only): fused closest-cascade feasibility.

Today's hybrid closest wave spends ~150ms of its 256ms on scheduling
around the ~105ms sweep (prepare 27 | cull 14 | extract 16 | pairs 41 |
outro 89 — CLAUDE.md stage split). A closest twin of the fused any-hit
cascade (128-ray blocks, conservative interval candidates, entry-ordered
while-loop with tMax shrink, sub-slab-gated MT in-kernel) would delete
the per-ray cull + pair transpose + slot tables + pair-domain outro
entirely — IF its MT work (conservative unions tightened by sub boxes
and the shrinking t_max) stays comparable to the per-ray-exact
pipeline's.

On real primary / bounce-1 closest waves this probe reports, for both
the S=128 and S=256 accels at b=128 octorig blocks:
- conservative candidates per block (cascade iterations = ceil/8),
- candidates surviving IDEAL entry-order termination (entry <= block
  max final-best t — the cascade active_fn bound at convergence),
- active [SUB, 128] sub-chunks under the shrunken per-lane t_max
  (final best t) — the kernel MT that remains,
- tests/live-ray, to set against today's pipeline (probe P: S=256
  16-block tiles x active_frac_tile 0.305/0.539 -> 365/935 tests/ray
  with sub_skip; 1197/1735 without).

Platform-independent scheduling facts (probe M-P pattern).
Usage: python scripts/probe_r3q_cpu.py [--small]
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
SUB = 32
BS = 128  # cascade ray block

host = {}
scene, accel = _demo_scene(subdivisions=4 if small else 6, host_out=host)
accel_c = build_clusters(host["tris"], cluster_size=256)
emit(probe="scene", tris=int(scene.triangles.count),
     clusters_s128=accel.num_clusters, clusters_s256=accel_c.num_clusters)


def sub_aabbs(acc):
    v0 = np.asarray(acc.v0)
    v1 = v0 + np.asarray(acc.e1)
    v2 = v0 + np.asarray(acc.e2)
    valid = (np.asarray(acc.tri_id) >= 0)[..., None]
    lo = np.where(valid, np.minimum(np.minimum(v0, v1), v2), np.inf)
    hi = np.where(valid, np.maximum(np.maximum(v0, v1), v2), -np.inf)
    c, s = v0.shape[:2]
    ns = -(-s // SUB)
    pad = ns * SUB - s
    if pad:
        lo = np.pad(lo, ((0, 0), (0, pad), (0, 0)),
                    constant_values=np.inf)
        hi = np.pad(hi, ((0, 0), (0, pad), (0, 0)),
                    constant_values=-np.inf)
    return (lo.reshape(c, ns, SUB, 3).min(axis=2).astype(np.float32),
            hi.reshape(c, ns, SUB, 3).max(axis=2).astype(np.float32))


def active_subs(o, d, tm, lo, hi):
    """[R,3] rays x [ns,3] boxes -> [ns] bool (any ray segment hits)."""
    inv = (1.0 / d).astype(np.float32)
    t0 = (lo[None] - o[:, None, :]) * inv[:, None, :]
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


def closest_padded(o, d, tm):
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


def study(tag, acc, acc_tag, o, d, tm, final_t):
    t_start = time.perf_counter()
    sub_lo, sub_hi = sub_aabbs(acc)
    ns = sub_lo.shape[1]
    n = o.shape[0]
    pad = (-n) % BS
    o = np.pad(np.asarray(o, np.float32), ((0, pad), (0, 0)))
    d = np.pad(np.asarray(d, np.float32), ((0, pad), (0, 0)),
               constant_values=1.0)
    tm = np.pad(np.asarray(tm, np.float32), (0, pad), constant_values=-1.0)
    ft = np.pad(np.asarray(final_t, np.float32), (0, pad),
                constant_values=-1.0)
    keys = np.asarray(traverse._sort_keys(
        acc, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm),
        mode="octorig"))
    perm = np.argsort(keys, kind="stable")
    o, d, tm, ft = o[perm], d[perm], tm[perm], ft[perm]
    nb = o.shape[0] // BS

    order, n_cand, entry = traverse._block_candidates(
        acc, jnp.asarray(o.reshape(nb, BS, 3)),
        jnp.asarray(d.reshape(nb, BS, 3)), jnp.asarray(tm.reshape(nb, BS)))
    order = np.asarray(order)
    n_cand = np.asarray(n_cand)
    entry = np.asarray(entry)

    # shrunken per-lane t_max: final best (inf for misses), dead lanes -1
    shr = np.where(tm.reshape(nb, BS) >= 0,
                   np.where(ft.reshape(nb, BS) >= 0, ft.reshape(nb, BS),
                            np.inf), -1.0).astype(np.float32)
    live_mask = shr >= 0
    bmax = np.where(live_mask, shr, -np.inf).max(axis=1)  # [nb]

    total_cand = 0
    surv_cand = 0
    act_chunks = 0
    iters = 0
    for b in range(nb):
        k = int(n_cand[b])
        if k == 0:
            continue
        iters += -(-k // 8)
        total_cand += k
        ents = entry[b, :k]
        surv = ents <= bmax[b]
        surv_cand += int(surv.sum())
        rs = slice(b * BS, (b + 1) * BS)
        for c in order[b, :k][surv]:
            act_chunks += int(active_subs(o[rs], d[rs], shr[b],
                                          sub_lo[c], sub_hi[c]).sum())
    live = int((tm >= 0).sum())
    emit(probe="closest_cascade", wave=tag, accel=acc_tag, rays=n,
         live=live, blocks=nb, subs_per_cluster=ns,
         cand_total=total_cand, cand_surviving=surv_cand,
         iters_total=iters,
         active_chunks=act_chunks,
         tests_per_live_ray=round(act_chunks * SUB * BS / max(live, 1), 0),
         dense_tests_per_live_ray=round(
             surv_cand * ns * SUB * BS / max(live, 1), 0),
         wall_s=round(time.perf_counter() - t_start, 1))


cam = default_camera()
W, H = (320, 180) if small else (960, 540)
xs = jnp.arange(W * H, dtype=jnp.int32) % W
ys = jnp.arange(W * H, dtype=jnp.int32) // W
u = (xs.astype(jnp.float32) + 0.5) / W
v = (ys.astype(jnp.float32) + 0.5) / H
o0, d0 = get_rays(cam, u, v, 16.0 / 9.0)
o0, d0 = np.asarray(o0), np.asarray(d0)
tm0 = np.full(W * H, np.inf, np.float32)
hit0 = closest_padded(o0, d0, tm0)
# final_t convention in study(): >=0 -> hit t, <0 -> miss (keeps inf bound)
f0 = np.where(np.asarray(hit0.hit), np.asarray(hit0.t), -1.0).astype(
    np.float32)

study("primary", accel, "s128", o0, d0, tm0, f0)
study("primary", accel_c, "s256", o0, d0, tm0, f0)

rng = np.random.default_rng(7)
alive = np.asarray(hit0.hit)
idx = np.flatnonzero(alive)
t = np.asarray(hit0.t)[idx]
tri = np.asarray(hit0.tri)[idx]
attrs = isect.hit_attributes(scene.triangles, jnp.asarray(o0[idx]),
                             jnp.asarray(d0[idx]), jnp.asarray(t),
                             jnp.asarray(tri))
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
              np.tile([[1.0, 0.0, 0.0]], (len(idx), 1))).astype(np.float32)
tx = np.cross(up, nrm)
tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-20)
ty = np.cross(nrm, tx)
d1 = (local[:, 0:1] * tx + local[:, 1:2] * ty
      + local[:, 2:3] * nrm).astype(np.float32)
o1 = (pos + nrm * 1e-3).astype(np.float32)
tm1 = np.full(len(o1), np.inf, np.float32)
hit1 = closest_padded(o1, d1, tm1)
f1 = np.where(np.asarray(hit1.hit), np.asarray(hit1.t), -1.0).astype(
    np.float32)

study("bounce1", accel, "s128", o1, d1, tm1, f1)
study("bounce1", accel_c, "s256", o1, d1, tm1, f1)
