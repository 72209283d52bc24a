"""Round-3 probe N (CPU-only): candidate populations on a REAL shadow wave.

Probe M's synthetic distribution has lanes in subdivision order — far
less coherent than real in-render waves whose lanes ride pixel order.
This probe builds bounce-0's actual shadow wave (primary camera rays ->
closest hit -> 4 light-major shadow rays with the real contributes
mask, exactly engine/shading.direct_lighting's construction) and
reports block candidate populations sorted vs not. If nosort unions on
the REAL wave are within ~1.5x of sorted, dropping the 4M-row
sort+unsort is the right call; if they balloon like probe M, nosort is
dead and the sorted fused kernel carries alone.

Usage: python scripts/probe_r3n_cpu.py [--small]
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
from path_tracer_ai_tpu.core.types import RAY_TMIN, MATERIAL_DIELECTRIC
from path_tracer_ai_tpu.engine import intersect as isect
from path_tracer_ai_tpu.scene.camera import default_camera, get_rays
from path_tracer_ai_tpu.scene.scene import DEFAULT_LIGHTS
from path_tracer_ai_tpu.core import vec

small = "--small" in sys.argv
host = {}
scene, accel = _demo_scene(subdivisions=4 if small else 6, host_out=host)
emit(probe="scene", tris=int(scene.triangles.count),
     clusters=accel.num_clusters)

cam = default_camera()
W, H = (320, 180) if small else (960, 540)
xs = jnp.arange(W * H, dtype=jnp.int32) % W
ys = jnp.arange(W * H, dtype=jnp.int32) // W
# pixel centers, no jitter: the lane ORDER is what matters here
u = (xs.astype(jnp.float32) + 0.5) / W
v = (ys.astype(jnp.float32) + 0.5) / H
o, d = get_rays(cam, u, v, 16.0 / 9.0)

t0 = time.perf_counter()
hit = traverse.closest_hit_packets(accel, o, d, RAY_TMIN, jnp.inf,
                                   block_size=256)
jax.block_until_ready(hit.t)
emit(probe="primary", rays=W * H, hits=int(jnp.sum(hit.hit)),
     wall_s=round(time.perf_counter() - t0, 1))

# surface frame at the hits (barycentric normals like the engine)
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
live = int(jnp.sum(tsh >= 0))
emit(probe="shadow_wave", rays=int(tsh.shape[0]), live=live)


def stats(tag, bs, sort, mode="dir"):
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
    _order, n_cand, _e = traverse._block_candidates(
        accel, o_.reshape(nb, bs, 3), d_.reshape(nb, bs, 3),
        tm.reshape(nb, bs))
    nc = np.asarray(n_cand)
    alive = nc > 0
    na = int(alive.sum())
    vals = np.sort(nc[alive]) if na else np.zeros(1)
    s = accel.v0.shape[1]
    emit(probe="shadow_pop_real", config=tag, block=bs, sorted=sort,
         live_blocks=na, total_blocks=nb, sum_cand=int(nc.sum()),
         mean=round(float(nc[alive].mean()) if na else 0.0, 1),
         p50=int(vals[na // 2]) if na else 0,
         p99=int(vals[min(na - 1, int(na * 0.99))]) if na else 0,
         max=int(nc.max()),
         tests_per_live_ray=round(nc.sum() * s * bs / max(live, 1), 0),
         wall_s=round(time.perf_counter() - t0, 1))


stats("b64_dir", 64, True)
stats("b128_dir", 128, True)
stats("b64_nosort", 64, False)
stats("b128_nosort", 128, False)
stats("b256_nosort", 256, False)

# ---- bounce-1 shadow wave: diffuse-sampled directions, compacted lane
# order (order-preserving, like the engine's live-lane compaction) ------
rng = np.random.default_rng(7)
alive_idx = np.flatnonzero(np.asarray(active))
pos1 = np.asarray(position)[alive_idx]
nrm1 = np.asarray(normal)[alive_idx]
# cosine-weighted hemisphere around the normal
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

t0 = time.perf_counter()
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
emit(probe="bounce1", rays=len(alive_idx), hits=int(jnp.sum(hit1.hit)),
     wall_s=round(time.perf_counter() - t0, 1))

# compact to live lanes (order-preserving) and build the shadow wave
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
live = int(jnp.sum(tsh >= 0))
emit(probe="shadow_wave_b1", rays=int(tsh.shape[0]), live=live)

stats("b1_b64_dir", 64, True)
stats("b1_b64_nosort", 64, False)
stats("b1_b128_dir", 128, True)
stats("b1_b128_nosort", 128, False)
# origin-led keys: shadow rays to a shared light from nearby origins
# have similar directions, so origin coherence may beat dir coherence
# on scattered bounce-1 origins
stats("b1_b64_origin", 64, True, mode="origin")
stats("b1_b128_origin", 128, True, mode="origin")
stats("b1_b64_octorig", 64, True, mode="octorig")
stats("b1_b128_octorig", 128, True, mode="octorig")
