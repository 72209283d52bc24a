"""Round-4 probe (CPU-only): exact-union shadow candidates vs conservative.

Next-lever #5 (docs/ARCHITECTURE.md) proposes a ctiles-style per-ray-exact
OR-union candidate set for shadow blocks while keeping the cascade's any-hit
early-out. This probe measures the ONLY platform-independent unknowns on the
REAL bounce-0 and bounce-1 shadow waves (probe N's construction):

  1. candidate clusters/block under per-ray-exact OR-union (ctiles._ray_masks)
     vs today's conservative interval test (traverse._block_candidates),
     at the fused kernel's block sizes (64/128), sorted and nosort
     -> the DMA-count / grid-step reduction factor the lever buys;
  2. per-block OR'd SUPER counts (per-ray slab vs supercluster AABBs)
     -> whether a 2-level exact cull can bound the cull's own cost
     (the per-ray flat slab domain is lanes x C = 128x the conservative
     interval domain; the 2-level route is lanes x Cs then children of
     surviving supers only).

Decision rule (recorded up front): the exact union saves kernel DMA +
grid steps that sub_skip does NOT already remove (sub_skip gates the MT
chunks but every conservative candidate's [16, S] pack is still DMA'd).
If exact/conservative sum-candidate ratio is <~3x, the cull's own cost
(>= a lanes x Cs slab pass) cannot pay and the lever is dead; if it is
>=5x at b=128 the lever is worth building behind the usual opt-in flag
and an on-chip A/B row.

Usage: python scripts/probe_r4_exact_shadow.py [--small]
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
from path_tracer_ai_tpu.accel.ctiles import _ray_masks
from path_tracer_ai_tpu.accel.kslots import _ray_slab
from path_tracer_ai_tpu.core.types import RAY_TMIN, MATERIAL_DIELECTRIC
from path_tracer_ai_tpu.engine import intersect as isect
from path_tracer_ai_tpu.scene.camera import default_camera, get_rays
from path_tracer_ai_tpu.scene.scene import DEFAULT_LIGHTS
from path_tracer_ai_tpu.core import vec

small = "--small" in sys.argv
host = {}
scene, accel = _demo_scene(subdivisions=4 if small else 6, host_out=host)
emit(probe="scene", tris=int(scene.triangles.count),
     clusters=accel.num_clusters, supers=accel.num_supers,
     super_size=accel.super_size, s=accel.cluster_size)

cam = default_camera()
W, H = (320, 180) if small else (960, 540)
xs = jnp.arange(W * H, dtype=jnp.int32) % W
ys = jnp.arange(W * H, dtype=jnp.int32) // W
u = (xs.astype(jnp.float32) + 0.5) / W
v = (ys.astype(jnp.float32) + 0.5) / H
o, d = get_rays(cam, u, v, 16.0 / 9.0)

hit = traverse.closest_hit_packets(accel, o, d, RAY_TMIN, jnp.inf,
                                   block_size=256)
jax.block_until_ready(hit.t)
emit(probe="primary", rays=W * H, hits=int(jnp.sum(hit.hit)))

tri = jnp.maximum(hit.tri, 0)
t_safe = jnp.where(hit.hit, hit.t, 0.0)
attrs = isect.hit_attributes(scene.triangles, o, d, t_safe, tri)
position = attrs.position
normal = attrs.normal
active = hit.hit
mats_t = scene.materials.mtype[attrs.mat_id]

lights_pos = jnp.asarray([l[0] for l in DEFAULT_LIGHTS], jnp.float32)
n_lights = lights_pos.shape[0]
n_lanes = W * H

position = jnp.where(active[..., None], position, 0.0)
normal = jnp.where(active[..., None], normal, 0.0)
lp = lights_pos[:, None, :]
lvec = lp - position[None, :, :]
dist = vec.length(lvec)
unit_x = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
ldir = jnp.where(active[None, :, None],
                 lvec / jnp.maximum(dist, 1e-30)[..., None], unit_x)
so = jnp.broadcast_to((position + normal * 1e-3)[None],
                      (n_lights, n_lanes, 3))
cos_theta = jnp.maximum(vec.dot(normal[None], ldir), 0.0)
contributes = (active[None] & (cos_theta > 0.0)
               & (mats_t != MATERIAL_DIELECTRIC)[None])
t_max = jnp.where(contributes, dist - 1e-3, -1.0)

osh = so.reshape(-1, 3)
dsh = ldir.reshape(-1, 3)
tsh = t_max.reshape(-1)
emit(probe="shadow_wave", bounce=0, rays=int(tsh.shape[0]),
     live=int(jnp.sum(tsh >= 0)))


def _dist(tag, nc_np, live_blocks_mask, group=8):
    alive = live_blocks_mask & (nc_np > 0)
    na = int(alive.sum())
    vals = np.sort(nc_np[alive]) if na else np.zeros(1, np.int64)
    return dict(
        live_blocks=na, sum_cand=int(nc_np[alive].sum()),
        mean=round(float(vals.mean()) if na else 0.0, 1),
        p50=int(vals[na // 2]) if na else 0,
        p99=int(vals[min(na - 1, int(na * 0.99))]) if na else 0,
        max=int(vals.max()) if na else 0,
        grid_steps=int(np.ceil(vals / group).sum()) if na else 0,
    )


def compare(tag, bs, sort, bounce, mode="dir"):
    """Conservative vs exact per-block candidate populations, one config."""
    t0 = time.perf_counter()
    o_, d_, tm = osh, dsh, tsh
    n = o_.shape[0]
    pad = (-n) % bs
    if pad:
        o_ = jnp.pad(o_, ((0, pad), (0, 0)))
        d_ = jnp.pad(d_, ((0, pad), (0, 0)), constant_values=1.0)
        tm = jnp.pad(tm, (0, pad), constant_values=-1.0)
    if sort:
        keys = traverse._sort_keys(accel, o_, d_, tm, mode=mode)
        perm = jnp.argsort(keys).astype(jnp.int32)
        packed = jnp.concatenate([o_, d_, tm[:, None]], axis=1)[perm]
        o_, d_, tm = packed[:, 0:3], packed[:, 3:6], packed[:, 6]
    nb = o_.shape[0] // bs
    o_blk = o_.reshape(nb, bs, 3)
    d_blk = d_.reshape(nb, bs, 3)
    tm_blk = tm.reshape(nb, bs)
    live_mask = np.asarray(jnp.any(tm_blk >= 0.0, axis=1))

    _order, n_cons, _e = traverse._block_candidates(accel, o_blk, d_blk,
                                                    tm_blk)
    cons = _dist(tag, np.asarray(n_cons), live_mask)

    _cand, n_exact = _ray_masks(accel, o_blk, d_blk, tm_blk, RAY_TMIN,
                                row_chunk=1 << 8)
    exact = _dist(tag, np.asarray(n_exact), live_mask)

    # 2-level cull cost model: per-ray slab vs supers, OR'd per block.
    flat = tm_blk.reshape(-1)
    live = flat >= 0.0
    lo0 = jnp.full(flat.shape, jnp.float32(RAY_TMIN))
    hi0 = jnp.where(live, flat, -jnp.inf)
    sup = _ray_slab(accel.sbmin, accel.sbmax, o_blk.reshape(-1, 3),
                    d_blk.reshape(-1, 3), lo0, hi0)
    sup_blk = jnp.any(sup.reshape(nb, bs, -1), axis=1)
    n_sup = np.asarray(jnp.sum(sup_blk, axis=1).astype(jnp.int32))
    supd = _dist(tag, n_sup, live_mask, group=1)

    ratio = cons["sum_cand"] / max(exact["sum_cand"], 1)
    emit(probe="exact_shadow", config=tag, block=bs, sorted=sort,
         bounce=bounce, conservative=cons, exact=exact, supers=supd,
         dma_reduction=round(ratio, 2),
         # refine cost domain: lanes x (children of per-BLOCK passing supers)
         refine_rows=int(n_sup.astype(np.int64).sum() * accel.super_size * bs),
         flat_rows=int(live_mask.sum()) * bs * accel.num_clusters,
         wall_s=round(time.perf_counter() - t0, 1))


for bs in (64, 128):
    compare(f"b{bs}_dir", bs, True, 0)
    compare(f"b{bs}_nosort", bs, False, 0)

# ---- bounce-1 shadow wave (probe N's construction) --------------------
rng = np.random.default_rng(7)
alive_idx = np.flatnonzero(np.asarray(active))
pos1 = np.asarray(position)[alive_idx]
nrm1 = np.asarray(normal)[alive_idx]
r1 = rng.random(len(alive_idx)).astype(np.float32)
r2 = rng.random(len(alive_idx)).astype(np.float32)
phi = 2.0 * np.pi * r1
sq = np.sqrt(r2)
local = np.stack([np.cos(phi) * sq, np.sin(phi) * sq,
                  np.sqrt(np.maximum(0.0, 1.0 - r2))], axis=1)
up = np.where(np.abs(nrm1[:, 2:3]) < 0.9,
              np.tile([[0.0, 0.0, 1.0]], (len(alive_idx), 1)),
              np.tile([[1.0, 0.0, 0.0]], (len(alive_idx), 1))).astype(np.float32)
tx = np.cross(up, nrm1)
tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-20)
ty = np.cross(nrm1, tx)
d1 = (local[:, 0:1] * tx + local[:, 1:2] * ty
      + local[:, 2:3] * nrm1).astype(np.float32)
o1 = (pos1 + nrm1 * 1e-3).astype(np.float32)

pad1 = (-len(alive_idx)) % 256
o1p = np.pad(o1, ((0, pad1), (0, 0)))
d1p = np.pad(d1, ((0, pad1), (0, 0)), constant_values=1.0)
tm1p = np.full(len(alive_idx) + pad1, np.inf, np.float32)
tm1p[len(alive_idx):] = -1.0
hit1 = traverse.closest_hit_packets(
    accel, jnp.asarray(o1p), jnp.asarray(d1p), RAY_TMIN,
    jnp.asarray(tm1p), block_size=256, sort=True)
hit1 = hit1._replace(hit=hit1.hit[:len(alive_idx)],
                     t=hit1.t[:len(alive_idx)],
                     tri=hit1.tri[:len(alive_idx)])
jax.block_until_ready(hit1.t)

alive2 = np.asarray(hit1.hit)
idx2 = np.flatnonzero(alive2)
t2 = np.asarray(hit1.t)[idx2]
tri2 = np.asarray(hit1.tri)[idx2]
attrs2 = isect.hit_attributes(
    scene.triangles, jnp.asarray(o1[idx2]), jnp.asarray(d1[idx2]),
    jnp.asarray(t2), jnp.asarray(tri2))
pos2 = attrs2.position
nrm2 = attrs2.normal
m2 = scene.materials.mtype[attrs2.mat_id]
nl2 = pos2.shape[0]
lv2 = lights_pos[:, None, :] - pos2[None, :, :]
dist2 = vec.length(lv2)
ld2 = lv2 / jnp.maximum(dist2, 1e-30)[..., None]
cos2 = jnp.maximum(vec.dot(nrm2[None], ld2), 0.0)
contrib2 = (cos2 > 0.0) & (m2 != MATERIAL_DIELECTRIC)[None]
tm2 = jnp.where(contrib2, dist2 - 1e-3, -1.0)
osh = jnp.broadcast_to((pos2 + nrm2 * 1e-3)[None],
                       (n_lights, nl2, 3)).reshape(-1, 3)
dsh = ld2.reshape(-1, 3)
tsh = tm2.reshape(-1)
emit(probe="shadow_wave", bounce=1, rays=int(tsh.shape[0]),
     live=int(jnp.sum(tsh >= 0)))

for bs in (64, 128):
    compare(f"b1_b{bs}_dir", bs, True, 1)
    compare(f"b1_b{bs}_nosort", bs, False, 1)
# octant+origin-led sort: exact unions care about per-lane origin
# coherence, not frustum tightness — octorig may shrink bounce-1 super
# shortlists below dir's (mean 7.6), enabling a smaller ksup
compare("b1_b128_octorig", 128, True, 1, mode="octorig")
