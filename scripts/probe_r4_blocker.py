"""Round-4 probe (CPU-only): shadow blocker locality on REAL waves.

Hypothesis (hash-based ray-path-prediction literature, PAPERS.md): a
shadow ray's blocker is usually LOCAL — most often a triangle in the
same Morton cluster as the ray's origin surface. Any-hit traversal
needs no ordering for exactness, so if the hypothesis holds, putting
the block's likely-blocker cluster FIRST in the candidate list makes
the cascade's early-out trip in iteration ~1 for occluded blocks
instead of walking the (id-ordered) conservative union.

Measured questions, on the engine's actual bounce-0 shadow wave
(primary hits -> 4 light-major shadow rays, real contributes mask):

  1. occluded fraction of live shadow rays;
  2. of the occluded, what fraction is confirmed by testing ONLY the
     ray's own origin cluster (per-ray predictor);
  3. ... by testing the block's MODAL origin cluster (per-block
     predictor — what a block-granular reorder can exploit);
  4. iterations-to-retire under the current id-ordered candidate walk
     vs predictor-first, simulated from a per-(ray, candidate) blocking
     bitmap (small scale only — the bitmap is R x cap x S MT tests).

Usage: python scripts/probe_r4_blocker.py [--small]
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
from path_tracer_ai_tpu.core import vec
from path_tracer_ai_tpu.core.types import RAY_TMIN, MATERIAL_DIELECTRIC
from path_tracer_ai_tpu.engine import intersect as isect
from path_tracer_ai_tpu.scene.camera import default_camera, get_rays
from path_tracer_ai_tpu.scene.scene import DEFAULT_LIGHTS

small = "--small" in sys.argv
host = {}
scene, accel = _demo_scene(subdivisions=4 if small else 6, host_out=host)
S = accel.cluster_size
C = accel.num_clusters
emit(probe="scene", tris=int(scene.triangles.count), clusters=C)

# global tri id -> cluster id (accel.tri_id is [C, S] global ids)
tri2cl = np.full(int(scene.triangles.count), -1, np.int32)
tid = np.asarray(accel.tri_id)
for c in range(C):
    row = tid[c]
    tri2cl[row[row >= 0]] = c

cam = default_camera()
W, H = (320, 180) if small else (960, 540)
xs = jnp.arange(W * H, dtype=jnp.int32) % W
ys = jnp.arange(W * H, dtype=jnp.int32) // W
u = (xs.astype(jnp.float32) + 0.5) / W
v = (ys.astype(jnp.float32) + 0.5) / H
o, d = get_rays(cam, u, v, 16.0 / 9.0)

hit = traverse.closest_hit_packets(accel, o, d, RAY_TMIN, jnp.inf,
                                   block_size=256)
tri = jnp.maximum(hit.tri, 0)
attrs = isect.hit_attributes(scene.triangles, o, d,
                             jnp.where(hit.hit, hit.t, 0.0), tri)
active = hit.hit
mats_t = scene.materials.mtype[attrs.mat_id]

lights_pos = jnp.asarray([l[0] for l in DEFAULT_LIGHTS], jnp.float32)
n_lights = lights_pos.shape[0]
n_lanes = W * H
position = jnp.where(active[..., None], attrs.position, 0.0)
normal = jnp.where(active[..., None], attrs.normal, 0.0)
lvec = lights_pos[:, None, :] - position[None]
dist = vec.length(lvec)
ldir = jnp.where(active[None, :, None],
                 lvec / jnp.maximum(dist, 1e-30)[..., None],
                 jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
so = jnp.broadcast_to((position + normal * 1e-3)[None],
                      (n_lights, n_lanes, 3))
cos_theta = jnp.maximum(vec.dot(normal[None], ldir), 0.0)
contributes = (active[None] & (cos_theta > 0.0)
               & (mats_t != MATERIAL_DIELECTRIC)[None])
t_max = jnp.where(contributes, dist - 1e-3, -1.0)

osh = np.asarray(so.reshape(-1, 3))
dsh = np.asarray(ldir.reshape(-1, 3))
tsh = np.asarray(t_max.reshape(-1))
# per-shadow-ray origin cluster (the cluster of the surface triangle)
ocl = np.broadcast_to(tri2cl[np.asarray(tri)][None], (n_lights, n_lanes))
ocl = ocl.reshape(-1).copy()
live = tsh >= 0.0
emit(probe="shadow_wave", rays=int(tsh.shape[0]), live=int(live.sum()))

# ---- ground-truth occlusion + own-cluster confirmation -------------------
t0 = time.perf_counter()
occ = np.asarray(traverse.any_hit_packets(
    accel, jnp.asarray(osh), jnp.asarray(dsh), RAY_TMIN, jnp.asarray(tsh),
    block_size=64, group_size=2))
emit(probe="occlusion", occluded=int((occ & live).sum()),
     frac_of_live=round(float((occ & live).sum() / max(live.sum(), 1)), 3),
     wall_s=round(time.perf_counter() - t0, 1))

v0a = np.asarray(accel.v0)
e1a = np.asarray(accel.e1)
e2a = np.asarray(accel.e2)


def anyhit_vs_cluster(o_, d_, tm_, cl_):
    """[R] bool: does ray i hit ANY triangle of cluster cl_[i]?"""
    from path_tracer_ai_tpu.core.types import MT_EPSILON

    out = np.zeros(o_.shape[0], bool)
    chunk = 1 << 14
    for lo in range(0, o_.shape[0], chunk):
        hi = min(lo + chunk, o_.shape[0])
        cl = np.clip(cl_[lo:hi], 0, C - 1)
        v0 = v0a[cl]                            # [r, S, 3]
        e1 = e1a[cl]
        e2 = e2a[cl]
        oo = o_[lo:hi, None, :]
        dd = d_[lo:hi, None, :]
        h = np.cross(dd, e2)
        a = np.einsum("rsk,rsk->rs", e1, h)
        ok = np.abs(a) > MT_EPSILON
        f = 1.0 / np.where(ok, a, 1.0)
        s = oo - v0
        uu = f * np.einsum("rsk,rsk->rs", s, h)
        q = np.cross(s, e1)
        vv = f * np.einsum("rsk,rsk->rs", dd, q)
        t = f * np.einsum("rsk,rsk->rs", e2, q)
        ok &= (uu >= 0) & (uu <= 1) & (vv >= 0) & (uu + vv <= 1)
        ok &= (t >= RAY_TMIN) & (t <= tm_[lo:hi, None])
        ok &= cl_[lo:hi, None] >= 0
        out[lo:hi] = ok.any(axis=1)
    return out


t0 = time.perf_counter()
own = anyhit_vs_cluster(osh, dsh, tsh, ocl)
n_occ = int((occ & live).sum())
emit(probe="own_cluster_predictor",
     confirmed=int((own & occ & live).sum()),
     frac_of_occluded=round(float((own & occ & live).sum() / max(n_occ, 1)),
                            3),
     false_pos=int((own & ~occ & live).sum()),
     wall_s=round(time.perf_counter() - t0, 1))

# ---- block-modal predictor (light-major natural order, b=64) -------------
bs = 64
pad = (-osh.shape[0]) % bs
ocl_p = np.pad(ocl, (0, pad), constant_values=-1)
live_p = np.pad(live, (0, pad))
occ_p = np.pad(occ, (0, pad))
blocks = ocl_p.reshape(-1, bs)
modal = np.full(blocks.shape[0], -1, np.int32)
for b in range(blocks.shape[0]):
    vals = blocks[b][live_p.reshape(-1, bs)[b]]
    vals = vals[vals >= 0]
    if vals.size:
        ids, cnt = np.unique(vals, return_counts=True)
        modal[b] = ids[np.argmax(cnt)]
modal_per_ray = np.repeat(modal, bs)[:osh.shape[0]]
t0 = time.perf_counter()
mod = anyhit_vs_cluster(osh, dsh, tsh, modal_per_ray)
emit(probe="block_modal_predictor", block=bs,
     confirmed=int((mod & occ & live).sum()),
     frac_of_occluded=round(float((mod & occ & live).sum() / max(n_occ, 1)),
                            3),
     wall_s=round(time.perf_counter() - t0, 1))

# Combined: own-cluster OR block-modal
both = own | mod
emit(probe="combined_predictor",
     frac_of_occluded=round(float((both & occ & live).sum()
                                  / max(n_occ, 1)), 3))

# ---- iteration-savings simulation (small scale only) ----------------------
if small:
    # per-(ray, candidate) blocking bitmap over the conservative unions
    o_j = jnp.asarray(np.pad(osh, ((0, pad), (0, 0))))
    d_j = jnp.asarray(np.pad(dsh, ((0, pad), (0, 0)), constant_values=1.0))
    t_j = jnp.asarray(np.pad(tsh, (0, pad), constant_values=-1.0))
    nb = o_j.shape[0] // bs
    order, n_cand, _ = traverse._block_candidates(
        accel, o_j.reshape(nb, bs, 3), d_j.reshape(nb, bs, 3),
        t_j.reshape(nb, bs))
    order = np.asarray(order)
    n_cand = np.asarray(n_cand)
    g = 2  # production group_size
    it_cur = np.zeros(nb)
    it_pred = np.zeros(nb)
    for b in range(nb):
        k = int(n_cand[b])
        if k == 0:
            continue
        cand = order[b, :k]
        rays = slice(b * bs, (b + 1) * bs)
        ob, db, tb = osh[None] if False else (
            np.pad(osh, ((0, pad), (0, 0)))[rays],
            np.pad(dsh, ((0, pad), (0, 0)))[rays],
            np.pad(tsh, (0, pad), constant_values=-1.0)[rays])
        lv = tb >= 0
        if not lv.any():
            continue
        blk = np.zeros((bs, k), bool)
        for j, c in enumerate(cand):
            blk[:, j] = anyhit_vs_cluster(
                ob, db, tb, np.full(bs, c, np.int32))

        def iters(cols):
            # lane retires at first blocking col; block at max over
            # occluded lanes (non-occluded lanes force full exhaustion)
            bj = blk[:, cols]
            anyb = bj.any(axis=1)
            if not (lv & anyb).all() and lv.any():
                return -(-len(cols) // g)  # some lane never blocks
            first = np.argmax(bj, axis=1)
            first = np.where(lv, first, 0)
            return -(-(int(first.max()) + 1) // g)

        it_cur[b] = iters(list(range(k)))
        pm = modal[b]
        pred_order = ([int(np.where(cand == pm)[0][0])]
                      if pm in cand else []) + [
            j for j in range(k) if cand[j] != pm]
        it_pred[b] = iters(pred_order)
    sel = n_cand > 0
    emit(probe="iteration_sim", group=g,
         mean_iters_current=round(float(it_cur[sel].mean()), 2),
         mean_iters_predictor_first=round(float(it_pred[sel].mean()), 2))

emit(probe="blocker_done")
