"""Round-3 probe M (CPU-only): shadow candidate populations per config.

The TPU tunnel is down; candidate-set statistics are platform-
independent, so compute them at full wave scale on CPU to predict each
shadow variant's MT work before the on-chip A/B:

  - conservative block unions (sum/mean/p99 n_cand, live blocks) for
    b64/b128 sorted(dir) and b128/b256 UNSORTED on the probe-F shadow
    distribution at 2^20 rays over the 82k-tri scene;
  - the nosort question is exactly here: how much do unions grow when
    blocks are consecutive lanes instead of dir-sorted? sum(n_cand) * S
    bounds the sweep work; the sort itself costs ~75ms/4M rays on-chip.

Usage: python scripts/probe_r3m_cpu.py
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
from path_tracer_ai_tpu.scene.scene import DEFAULT_LIGHTS

host = {}
scene, accel = _demo_scene(subdivisions=6, host_out=host)
emit(probe="scene", tris=int(scene.triangles.count),
     clusters=accel.num_clusters)

rng = np.random.default_rng(0)
N = 1 << 20
tv0 = np.asarray(host["tris"].v0)
ntri = tv0.shape[0]

nv = N // 4
ti = np.sort(rng.choice(ntri, nv))
pp = tv0[ti] + rng.standard_normal((nv, 3)).astype(np.float32) * 1e-3
lights = np.asarray([l[0] for l in DEFAULT_LIGHTS], np.float32)
osh = np.tile(pp, (4, 1))
lv = lights[:, None, :] - pp[None, :, :]
dist = np.linalg.norm(lv, axis=-1)
dsh = (lv / np.maximum(dist, 1e-30)[..., None]).reshape(-1, 3)
tsh = (dist - 1e-3).reshape(-1).astype(np.float32)
tsh[rng.random(tsh.shape[0]) < 0.3] = -1.0
osh_j, dsh_j, tsh_j = jnp.asarray(osh), jnp.asarray(dsh), jnp.asarray(tsh)


def stats(tag, bs, sort):
    t0 = time.perf_counter()
    o, d, tm = osh_j, dsh_j, tsh_j
    if sort:
        keys = traverse._sort_keys(accel, o, d, tm, mode="dir")
        perm = jnp.argsort(keys).astype(jnp.int32)
        packed = jnp.concatenate([o, d, tm[:, None]], axis=1)[perm]
        o, d, tm = packed[:, 0:3], packed[:, 3:6], packed[:, 6]
    nb = N // bs
    o_blk = o.reshape(nb, bs, 3)
    d_blk = d.reshape(nb, bs, 3)
    tm_blk = tm.reshape(nb, bs)
    _order, n_cand, _entry = traverse._block_candidates(
        accel, o_blk, d_blk, tm_blk)
    nc = np.asarray(n_cand)
    live = nc > 0
    na = int(live.sum())
    vals = np.sort(nc[live]) if na else np.zeros(1)
    emit(probe="shadow_pop", config=tag, block=bs, sorted=sort,
         live_blocks=na, total_blocks=nb,
         sum_cand=int(nc.sum()),
         mean=round(float(nc[live].mean()) if na else 0.0, 1),
         p50=int(vals[na // 2]) if na else 0,
         p99=int(vals[min(na - 1, int(na * 0.99))]) if na else 0,
         max=int(nc.max()),
         tests_per_live_ray=round(
             nc.sum() * accel.v0.shape[1] * bs
             / max((np.asarray(tsh) >= 0).sum(), 1), 0),
         wall_s=round(time.perf_counter() - t0, 1))


stats("b64_dir", 64, True)
stats("b128_dir", 128, True)
stats("b256_dir", 256, True)
stats("b64_nosort", 64, False)
stats("b128_nosort", 128, False)
stats("b256_nosort", 256, False)
