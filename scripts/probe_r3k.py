"""Round-3 probe K: decompose the closest-wave outro (~89ms of 256ms).

The r3c stage split left the outro (unsort + overflow fallback +
finalize) as one opaque ~89ms block. This probe isolates its parts on a
bounce-like 2^20 wave so the fix is aimed, not guessed:

  1. prod closest_hit_ctiles total (Pallas sweep, S=256 accel) as the
     anchor, plus fallback_compact in {2^13 (prod), 2^11, 2^9} — if the
     static-size pairs fallback dominates, shrinking it shows directly.
  2. isolated outro pieces at wave scale: the packed _unsort scatter,
     the nonzero(size=k) compaction, and closest_hit_pairs at the
     compact sizes (the fallback body).
  3. the actual overflow population of the bounce distribution (blocks
     over cap=48, rays), to size the fallback to measurement.

Usage: python scripts/probe_r3k.py [--cpu]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def emit(**kw):
    print(json.dumps(kw), flush=True)


if os.path.exists("/tmp/pt_session_wrapup"):
    # Session wrap-up requested (the driver needs the TPU soon): this
    # probe is purely diagnostic and always runs last — skip it cleanly.
    emit(probe="probe_k_skipped", reason="session wrap-up requested")
    sys.exit(0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


smoke = "--cpu" in sys.argv

import jax

if smoke:
    jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001
    pass

import jax.numpy as jnp
import numpy as np

jnp.zeros(()).block_until_ready()
_ = np.asarray(jnp.ones((8,), jnp.float32))
emit(probe="init", platform=jax.devices()[0].platform)

from functools import partial

from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel import ctiles, pairs as pairs_mod, worklist
from path_tracer_ai_tpu.accel.clusters import build_clusters
from path_tracer_ai_tpu.core.types import RAY_TMIN

host = {}
scene, accel = _demo_scene(subdivisions=3 if smoke else 6, host_out=host)
accel_c = build_clusters(host["tris"], cluster_size=256)
emit(probe="scene", tris=int(scene.triangles.count),
     clusters_c=accel_c.num_clusters)

rng = np.random.default_rng(0)
N = 1 << 12 if smoke else 1 << 20
tv0 = np.asarray(host["tris"].v0)
ntri = tv0.shape[0]

# bounce-like wave: origins on surfaces, random dirs, 35% dead
ti = rng.choice(ntri, N)
ob = tv0[ti] + rng.standard_normal((N, 3)).astype(np.float32) * 1e-3
db = rng.standard_normal((N, 3)).astype(np.float32)
db /= np.linalg.norm(db, axis=1, keepdims=True)
tmb = np.full(N, np.inf, np.float32)
tmb[rng.random(N) < 0.35] = -1.0
ob, db, tmb = jnp.asarray(ob), jnp.asarray(db), jnp.asarray(tmb)
live = int(jnp.sum(tmb >= 0))


def timeit(fn, reps=3):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, cs, out


ckw = dict(cap=48, tile_chunk=2048, use_pallas=not smoke)

# ---- 1. whole-call anchor + fallback_compact sweep ---------------------
ref = None
for fc_log2 in (13, 11, 9):
    try:
        dt, cs, hit = timeit(lambda: ctiles.closest_hit_ctiles(
            accel_c, ob, db, RAY_TMIN, tmb,
            fallback_compact=1 << fc_log2, **ckw))
        row = dict(probe="closest_fc", fallback_compact=1 << fc_log2,
                   ms=round(dt * 1e3, 1),
                   mrays=round(live / dt / 1e6, 2), compile_s=round(cs, 1))
        if ref is None:
            ref = hit
        else:
            row["t_mismatch"] = int(jnp.sum(hit.t != ref.t))
        emit(**row)
    except Exception as e:  # noqa: BLE001
        emit(probe="closest_fc", fallback_compact=1 << fc_log2,
             error=str(e)[:300])

# ---- 1b. cap / tile_chunk sweeps on the same anchor ---------------------
for cap in (32, 64):
    try:
        dt, cs, hit = timeit(lambda: ctiles.closest_hit_ctiles(
            accel_c, ob, db, RAY_TMIN, tmb, cap=cap, tile_chunk=2048,
            use_pallas=not smoke, fallback_compact=1 << 13))
        emit(probe="closest_cap", cap=cap, ms=round(dt * 1e3, 1),
             mrays=round(live / dt / 1e6, 2), compile_s=round(cs, 1),
             t_mismatch=int(jnp.sum(hit.t != ref.t)) if ref is not None
             else None)
    except Exception as e:  # noqa: BLE001
        emit(probe="closest_cap", cap=cap, error=str(e)[:300])

for tc in (4096, 8192):
    try:
        dt, cs, hit = timeit(lambda: ctiles.closest_hit_ctiles(
            accel_c, ob, db, RAY_TMIN, tmb, cap=48, tile_chunk=tc,
            use_pallas=not smoke, fallback_compact=1 << 13))
        emit(probe="closest_tc", tile_chunk=tc, ms=round(dt * 1e3, 1),
             mrays=round(live / dt / 1e6, 2), compile_s=round(cs, 1),
             t_mismatch=int(jnp.sum(hit.t != ref.t)) if ref is not None
             else None)
    except Exception as e:  # noqa: BLE001
        emit(probe="closest_tc", tile_chunk=tc, error=str(e)[:300])

# ---- 2. isolated outro pieces ------------------------------------------
# 2a. packed unsort scatter at wave scale (3 payload cols, like closest)
perm = jnp.asarray(rng.permutation(N).astype(np.int32))
tcol = jnp.asarray(rng.random(N).astype(np.float32))
icol = jnp.asarray(rng.integers(0, ntri, N).astype(np.int32))
bcol = jnp.asarray(rng.random(N) < 0.01)


@jax.jit
def unsort_call(perm, a, b, c):
    return worklist._unsort((a, b, c), perm, N, N)


dt, cs, _ = timeit(lambda: unsort_call(perm, tcol, icol, bcol))
emit(probe="outro_unsort", ms=round(dt * 1e3, 1), compile_s=round(cs, 1))

# 2b. nonzero(size=k) compaction of a sparse overflow mask
mask = jnp.asarray(rng.random(N) < 0.002)
for k_log2 in (13, 11):
    k = 1 << k_log2

    @partial(jax.jit, static_argnames=("kk",))
    def nz_call(m, kk=k):
        return jnp.nonzero(m, size=kk, fill_value=N)[0]

    dt, cs, _ = timeit(lambda: nz_call(mask))
    emit(probe="outro_nonzero", size=k, ms=round(dt * 1e3, 1),
         compile_s=round(cs, 1))

# 2c. the fallback body: closest_hit_pairs at compact sizes
for k_log2 in (13, 11, 9):
    k = 1 << k_log2
    o_s, d_s, t_s = ob[:k], db[:k], tmb[:k]
    try:
        dt, cs, _ = timeit(lambda: pairs_mod.closest_hit_pairs(
            accel_c, o_s, d_s, RAY_TMIN, t_s, cap=64, pair_budget=12,
            fallback_block=64))
        emit(probe="outro_pairs", rays=k, ms=round(dt * 1e3, 1),
             compile_s=round(cs, 1))
    except Exception as e:  # noqa: BLE001
        emit(probe="outro_pairs", rays=k, error=str(e)[:300])

# ---- 3. actual overflow population at cap=48 ----------------------------
@jax.jit
def union_stats(o, d, tm):
    o_blk, d_blk, tm_blk, _perm, _npad = worklist._prepare_blocks(
        accel_c, o, d, tm, 8, True, "octorig")
    n_live = jnp.sum((tm >= 0.0).astype(jnp.int32))
    lb = -(-n_live // 8)
    cand, n_cand = ctiles._ray_masks(
        accel_c, o_blk, d_blk, tm_blk, RAY_TMIN, 1 << 11, live_blocks=lb)
    over = n_cand > 48
    alive = n_cand > 0
    ncs = jnp.sort(jnp.where(alive, n_cand, -1))
    na = jnp.sum(alive.astype(jnp.int32))
    nb_tot = n_cand.shape[0]

    def q(p):
        return ncs[jnp.clip(nb_tot - na + (na * p).astype(jnp.int32),
                            0, nb_tot - 1)]

    return (jnp.sum(over.astype(jnp.int32)), jnp.max(n_cand),
            q(0.5), q(0.9), q(0.99),
            jnp.sum(jnp.where(alive, n_cand, 0)) / jnp.maximum(na, 1))


nover, maxc, p50, p90, p99, mean_u = union_stats(ob, db, tmb)
emit(probe="overflow_pop", blocks_over_cap48=int(nover),
     rays_over=int(nover) * 8, max_union=int(maxc), p50=int(p50),
     p90=int(p90), p99=int(p99), mean=round(float(mean_u), 1))

# ---- 4. exact-cull stage decomposition (round-4 lever) ------------------
# Times the cull ALONE (post-sort, b128 shadow-like wave) so the on-chip
# ksup choice is aimed: conservative anchor, exact at ksup 8/16/24, the
# live-prefix bound, and the per-lane super stage in isolation. Every
# jitted wrapper takes the accel as an ARGUMENT (the closure-inlining
# hazard, scripts/probe_r4_bigscene.py).
from path_tracer_ai_tpu.accel import traverse
from path_tracer_ai_tpu.accel.kslots import _ray_slab

tms_np = np.random.default_rng(3).uniform(1.0, 10.0, N).astype(np.float32)
tms_np[np.asarray(tmb) < 0] = -1.0
tms = jnp.asarray(tms_np)
keys = traverse._sort_keys(accel, ob, db, tms, mode="dir")
perm_s = jnp.argsort(keys).astype(jnp.int32)
packed = jnp.concatenate([ob, db, tms[:, None]], axis=1)[perm_s]
bs_x = 128
nb_x = N // bs_x
o_bx = packed[:, 0:3].reshape(nb_x, bs_x, 3)
d_bx = packed[:, 3:6].reshape(nb_x, bs_x, 3)
t_bx = packed[:, 6].reshape(nb_x, bs_x)
lv_x = jnp.sum(jnp.any(t_bx >= 0.0, axis=1)).astype(jnp.int32)


@jax.jit
def cons_cull(acc, o_, d_, t_):
    return traverse._block_candidates(acc, o_, d_, t_)


@partial(jax.jit, static_argnames=("ksup", "bounded"))
def exact_cull_t(acc, o_, d_, t_, lv, ksup, bounded):
    return traverse._exact_block_candidates(
        acc, o_, d_, t_, RAY_TMIN, ksup=ksup,
        live_blocks=lv if bounded else None)


@jax.jit
def super_stage(acc, o_, d_, t_):
    of = o_.reshape(-1, 3)
    df = d_.reshape(-1, 3)
    tf = t_.reshape(-1)
    hi0 = jnp.where(tf >= 0.0, tf, -jnp.inf)
    lo0 = jnp.full(tf.shape, jnp.float32(RAY_TMIN))
    sup = _ray_slab(acc.sbmin, acc.sbmax, of, df, lo0, hi0)
    return jnp.sum(jnp.any(sup.reshape(t_.shape[0], t_.shape[1], -1),
                           axis=1), axis=1)


try:
    dt, cs, (_o, ncc, _e) = timeit(lambda: cons_cull(accel, o_bx, d_bx,
                                                     t_bx))
    emit(probe="cull_stage", stage="conservative", ms=round(dt * 1e3, 1),
         compile_s=round(cs, 1), sum_cand=int(jnp.sum(ncc)))
    for ksup in (8, 16, 24):
        dt, cs, (_o, nce, _e) = timeit(lambda: exact_cull_t(
            accel, o_bx, d_bx, t_bx, lv_x, ksup, False))
        emit(probe="cull_stage", stage=f"exact{ksup}",
             ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
             sum_cand=int(jnp.sum(nce)))
    dt, cs, (_o, nce, _e) = timeit(lambda: exact_cull_t(
        accel, o_bx, d_bx, t_bx, lv_x, 16, True))
    emit(probe="cull_stage", stage="exact16_liveprefix",
         ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
         sum_cand=int(jnp.sum(nce)), live_blocks=int(lv_x))
    dt, cs, nsup = timeit(lambda: super_stage(accel, o_bx, d_bx, t_bx))
    emit(probe="cull_stage", stage="super_only", ms=round(dt * 1e3, 1),
         compile_s=round(cs, 1), mean_sup=round(float(jnp.mean(
             jnp.where(nsup > 0, nsup, 0))), 1))
except Exception as e:  # noqa: BLE001
    emit(probe="cull_stage", error=str(e)[:300])

log("probe K complete")
