"""Round-4 probe (CPU-only): exact-union CLOSEST-wave candidates vs
conservative at the fused cascade's b=128.

probe_r4_exact_shadow measured 8.5-21.5x conservative over-inclusion on
shadow waves; this measures the same quantity on the closest cascade's
waves (primary, bounce-1) with its production sort (octorig), where rays
are UNBOUNDED (t_max=inf) so per-lane unions are necessarily looser than
shadow's segment-capped ones. Decides whether exact_cull is worth wiring
into pallas_closest.closest_hit_fused (which would also surrender the
conservative-entry block-termination gate — measured ineffective on
bounce waves, 466614/466619 candidates survive, probe Q).

Usage: python scripts/probe_r4_exact_closest.py [--small]
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
from path_tracer_ai_tpu.core.types import RAY_TMIN
from path_tracer_ai_tpu.engine import intersect as isect
from path_tracer_ai_tpu.scene.camera import default_camera, get_rays

small = "--small" in sys.argv
host = {}
scene, accel = _demo_scene(subdivisions=4 if small else 6, host_out=host)
emit(probe="scene", tris=int(scene.triangles.count),
     clusters=accel.num_clusters, supers=accel.num_supers)

cam = default_camera()
W, H = (320, 180) if small else (960, 540)
xs = jnp.arange(W * H, dtype=jnp.int32) % W
ys = jnp.arange(W * H, dtype=jnp.int32) // W
u = (xs.astype(jnp.float32) + 0.5) / W
v = (ys.astype(jnp.float32) + 0.5) / H
o, d = get_rays(cam, u, v, 16.0 / 9.0)
tm = jnp.full((W * H,), jnp.inf, jnp.float32)


def _dist(nc_np, group=8):
    alive = nc_np > 0
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


def compare(tag, o_, d_, tm_, bs=128, sort_mode="octorig"):
    t0 = time.perf_counter()
    n = o_.shape[0]
    pad = (-n) % bs
    if pad:
        o_ = jnp.pad(o_, ((0, pad), (0, 0)))
        d_ = jnp.pad(d_, ((0, pad), (0, 0)), constant_values=1.0)
        tm_ = jnp.pad(tm_, (0, pad), constant_values=-1.0)
    keys = traverse._sort_keys(accel, o_, d_, tm_, mode=sort_mode)
    perm = jnp.argsort(keys).astype(jnp.int32)
    packed = jnp.concatenate([o_, d_, tm_[:, None]], axis=1)[perm]
    o_, d_, tm_ = packed[:, 0:3], packed[:, 3:6], packed[:, 6]
    nb = o_.shape[0] // bs
    o_blk = o_.reshape(nb, bs, 3)
    d_blk = d_.reshape(nb, bs, 3)
    tm_blk = tm_.reshape(nb, bs)

    _o, n_cons, _e = traverse._block_candidates(accel, o_blk, d_blk, tm_blk)
    _o2, n_exact = traverse._exact_block_candidates(
        accel, o_blk, d_blk, tm_blk, RAY_TMIN, ksup=accel.num_supers,
        row_chunk=1 << 7)
    cons = _dist(np.asarray(n_cons))
    exact = _dist(np.asarray(n_exact))
    emit(probe="exact_closest", config=tag, block=bs,
         conservative=cons, exact=exact,
         dma_reduction=round(cons["sum_cand"] / max(exact["sum_cand"], 1),
                             2),
         wall_s=round(time.perf_counter() - t0, 1))


compare("primary_octorig", o, d, tm)

hit = traverse.closest_hit_packets(accel, o, d, RAY_TMIN, jnp.inf,
                                   block_size=256)
jax.block_until_ready(hit.t)
tri = jnp.maximum(hit.tri, 0)
t_safe = jnp.where(hit.hit, hit.t, 0.0)
attrs = isect.hit_attributes(scene.triangles, o, d, t_safe, tri)
alive_idx = np.flatnonzero(np.asarray(hit.hit))
pos1 = np.asarray(attrs.position)[alive_idx]
nrm1 = np.asarray(attrs.normal)[alive_idx]
rng = np.random.default_rng(7)
r1 = rng.random(len(alive_idx)).astype(np.float32)
r2 = rng.random(len(alive_idx)).astype(np.float32)
phi = 2.0 * np.pi * r1
sq = np.sqrt(r2)
local = np.stack([np.cos(phi) * sq, np.sin(phi) * sq,
                  np.sqrt(np.maximum(0.0, 1.0 - r2))], axis=1)
up = np.where(np.abs(nrm1[:, 2:3]) < 0.9,
              np.tile([[0.0, 0.0, 1.0]], (len(alive_idx), 1)),
              np.tile([[1.0, 0.0, 0.0]], (len(alive_idx), 1))).astype(
                  np.float32)
tx = np.cross(up, nrm1)
tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-20)
ty = np.cross(nrm1, tx)
d1 = (local[:, 0:1] * tx + local[:, 1:2] * ty
      + local[:, 2:3] * nrm1).astype(np.float32)
o1 = (pos1 + nrm1 * 1e-3).astype(np.float32)
tm1 = np.full(len(alive_idx), np.inf, np.float32)
emit(probe="bounce1_wave", rays=len(alive_idx))

compare("bounce1_octorig", jnp.asarray(o1), jnp.asarray(d1),
        jnp.asarray(tm1))
compare("bounce1_dir", jnp.asarray(o1), jnp.asarray(d1),
        jnp.asarray(tm1), sort_mode="dir")
