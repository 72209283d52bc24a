"""Round-2 probe N: on-chip shakeout of the fused Pallas tile sweep.

Compares pallas_ctiles.tile_sweep against the XLA dense sweep at the
real bounce-wave tile shape (64k tiles x 128 lanes x 128 tris), with
cluster-major (DMA-elision-friendly) and random tile_cid orders, and
validates exact agreement on-chip.

ONE TPU process. JSON lines to stdout.
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
def emit(**kw): print(json.dumps(kw), flush=True)
def log(*a): print(*a, file=sys.stderr, flush=True)

smoke = "--cpu" in sys.argv
import jax
if smoke:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
emit(probe="devices", platform=jax.devices()[0].platform)

from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel import pallas_ctiles as pc
from path_tracer_ai_tpu.accel.clusters import build_clusters
from path_tracer_ai_tpu.accel.traverse import _mt_sweep

scene, _ = _demo_scene(subdivisions=3 if smoke else 6)
accel = build_clusters(scene.triangles, cluster_size=128)
c = accel.num_clusters
nt = 64 if smoke else 1 << 16
t_lanes = 128
rng = np.random.default_rng(0)

# Rays: bounce-like (origins on surfaces, random dirs), some dead.
tv0 = np.asarray(scene.triangles.v0)
ti = rng.choice(tv0.shape[0], nt * t_lanes)
o = jnp.asarray(tv0[ti] + rng.standard_normal((nt * t_lanes, 3)).astype(np.float32) * 1e-3)
d = rng.standard_normal((nt * t_lanes, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
d = jnp.asarray(d)
tm = np.full(nt * t_lanes, np.inf, np.float32)
tm[:: 7] = -1.0
tm = jnp.asarray(tm)

# cluster-major cid (runs of ~nt/c) vs random; constant within each
# GROUP-tile run (the kernel's host contract)
from path_tracer_ai_tpu.accel.pallas_ctiles import GROUP
ngrp = nt // GROUP
cid_sorted = jnp.asarray(
    np.repeat(np.sort(rng.integers(0, c, ngrp)), GROUP), jnp.int32)
cid_rand = jnp.asarray(
    np.repeat(rng.integers(0, c, ngrp), GROUP), jnp.int32)

tri_pack = pc.pack_tris(accel)
rays_pack = pc.pack_rays_tiles(o, d, tm, t_lanes)

def timeit(fn):
    t0 = time.perf_counter(); out = fn(); jax.block_until_ready(out)
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3): out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 3, cs, out

tests = nt * t_lanes * accel.cluster_size

# XLA reference sweep at the same shape (chunked like _sweep_resolve).
ob = o.reshape(nt, t_lanes, 3); db = d.reshape(nt, t_lanes, 3)
tb = tm.reshape(nt, t_lanes)
import functools
@functools.partial(jax.jit, static_argnames=("tc",))
def xla_sweep(cid, tc=2048):
    nchunks = nt // tc
    def body(i, carry):
        t_acc, tri_acc = carry
        sl = jax.lax.dynamic_slice(cid, (i * tc,), (tc,))
        obc = jax.lax.dynamic_slice(ob, (i * tc, 0, 0), (tc, t_lanes, 3))
        dbc = jax.lax.dynamic_slice(db, (i * tc, 0, 0), (tc, t_lanes, 3))
        tbc = jax.lax.dynamic_slice(tb, (i * tc, 0), (tc, t_lanes))
        tt, ok = _mt_sweep(obc, dbc, accel.v0[sl], accel.e1[sl],
                           accel.e2[sl], 1e-3, tbc)
        tt = jnp.where(ok, tt, jnp.inf)
        ct = jnp.min(tt, axis=-1)
        cti = accel.tri_id[sl][:, None, :]
        trim = jnp.min(jnp.where(ok & (tt <= ct[..., None]), cti,
                                 np.int32(2**31 - 1)), axis=-1)
        return (jax.lax.dynamic_update_slice(t_acc, ct, (i * tc, 0)),
                jax.lax.dynamic_update_slice(tri_acc, trim, (i * tc, 0)))
    t0a = jnp.full((nt, t_lanes), jnp.inf)
    tr0 = jnp.full((nt, t_lanes), np.int32(2**31 - 1))
    return jax.lax.fori_loop(0, nchunks, body, (t0a, tr0))

tc = 16 if smoke else 2048
dt, cs, ref = timeit(lambda: xla_sweep(cid_sorted, tc=tc))
emit(probe="xla_sweep", cid="sorted", ms=round(dt * 1e3, 1),
     gtests=round(tests / dt / 1e9, 1), compile_s=round(cs, 1))

for tag, cid in [("sorted", cid_sorted), ("random", cid_rand)]:
    try:
        dt, cs, out = timeit(lambda: pc.tile_sweep(
            tri_pack, rays_pack, cid, interpret=smoke))
        emit(probe="pallas_sweep", cid=tag, ms=round(dt * 1e3, 1),
             gtests=round(tests / dt / 1e9, 1), compile_s=round(cs, 1))
        if tag == "sorted":
            t_ref, tri_ref = ref
            t_got, tri_got = out
            tmm = int(jnp.sum(~jnp.isclose(t_got, t_ref, rtol=1e-6,
                                           equal_nan=True)
                              & jnp.isfinite(t_ref)))
            trm = int(jnp.sum(tri_got != tri_ref))
            emit(probe="pallas_agree", t_mismatch=tmm, tri_mismatch=trm)
    except Exception as e:  # noqa: BLE001
        emit(probe="pallas_sweep", cid=tag, error=str(e)[:300])

log("probe N complete")
