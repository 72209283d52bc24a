"""Round-4 big-scene probe: STAGE-BISECTED compiles, then escalating e2e.

Round 3's big-scene attempts (1.31M tris, 10241 clusters) failed in axon
REMOTE COMPILE: HTTP 500 at wave 2^20 and a >64-min hang at 2^18 (probe
r3h) — and the hang's cutoff preceded the 17h service outage, so this
probe must only run MANUALLY, after a session has already secured the
round's numbers, and must never be killed mid-compile.

Round-4 CPU diagnosis (scripts notes + /tmp probes, 2026-08-18):
- The production bounce executable at 10241 clusters is only ~1.9MB of
  HLO — program TEXT does not explode (the 107MB blowup round 3 feared
  is a probe-only artifact: jitting a closure over a concrete accel
  inlines the 47MB of triangle arrays as dense constants; production
  passes the accel as jit arguments).
- CPU compile time scales 30s -> 65s from 641 -> 10241 clusters, so the
  TPU-side failure is compile-TIME scaling in some stage, not I/O size.

This probe therefore compiles each worklist stage as its OWN small
program (accel as argument, never closed over), emitting a row BEFORE
each compile starts so a remote hang is attributable to a stage. Every
successful compile lands in the persistent cache, so the final e2e
attempts reuse them. Waves escalate 2^14 -> 2^16 -> 2^18 -> 2^20.

Usage: python scripts/probe_r4_bigscene.py [--cpu] [--max-wave LOG2]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def bench_wants_tpu():
    """The driver bench's stop-file (round-5): yield between steps.

    A remote-compile hang can't yield anything, but every boundary that
    CAN check, does — the probe never starts a new compile or e2e
    escalation once the driver has asked for the chip."""
    return os.path.exists(os.environ.get("PT_BENCH_STOPFILE",
                                         "/tmp/pt_bench_wants_tpu"))


smoke = "--cpu" in sys.argv
max_wave = 18
if "--max-wave" in sys.argv:
    max_wave = int(sys.argv[sys.argv.index("--max-wave") + 1])

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
t0 = time.perf_counter()
_ = np.asarray(jnp.ones((8,), jnp.float32))
emit(probe="init", platform=jax.devices()[0].platform,
     first_d2h_s=round(time.perf_counter() - t0, 1))

from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel import worklist
from path_tracer_ai_tpu.core.types import RAY_TMIN
from path_tracer_ai_tpu.engine import wavefront

host = {}
scene, accel = _demo_scene(subdivisions=4 if smoke else 8, host_out=host)
emit(probe="big_scene", tris=int(scene.triangles.count),
     clusters=accel.num_clusters, supers=accel.num_supers)

rng = np.random.default_rng(0)


def stage_compile(tag, make_lowered):
    """Emit BEFORE compiling (hang attribution), compile, emit result."""
    if bench_wants_tpu():
        emit(probe="stage_compile", stage=tag, status="skipped: stop-file")
        return False
    emit(probe="stage_compile", stage=tag, status="starting")
    try:
        t0 = time.perf_counter()
        low = make_lowered()
        t_low = time.perf_counter() - t0
        hlo_mb = round(len(low.as_text()) / 1e6, 1)
        t0 = time.perf_counter()
        low.compile()
        emit(probe="stage_compile", stage=tag, status="ok",
             lower_s=round(t_low, 1), hlo_mb=hlo_mb,
             compile_s=round(time.perf_counter() - t0, 1))
        return True
    except Exception as e:  # noqa: BLE001
        emit(probe="stage_compile", stage=tag, status="error",
             error=str(e)[:300])
        return False


def wave_args(n):
    o = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    d0 = rng.standard_normal((n, 3)).astype(np.float32)
    d = jnp.asarray(d0 / np.linalg.norm(d0, axis=1, keepdims=True))
    tm = jnp.full((n,), jnp.inf, jnp.float32)
    return o, d, tm


CKW = dict(wavefront.WORKLIST_CLOSEST_KW)
n0 = 1 << (14 if not smoke else 10)
o, d, tm = wave_args(n0)

# ---- stage bisection at the SMALLEST wave --------------------------------
block = 8


def prep():
    f = jax.jit(lambda a, oo, dd, tt: worklist._prepare_blocks(
        a, oo, dd, tt, block, True, "dir"))
    return f.lower(accel, o, d, tm)


stage_compile("prepare_blocks", prep)

o_blk = o.reshape(-1, block, 3)
d_blk = d.reshape(-1, block, 3)
tm_blk = tm.reshape(-1, block)


def build_wl():
    f = jax.jit(lambda a, ob, db, tb: worklist._build_worklist(
        a, ob, db, tb, RAY_TMIN, CKW.get("cap", 96), 4,
        CKW.get("item_budget", 8), 1 << 13, item_align=1024))
    return f.lower(accel, o_blk, d_blk, tm_blk)


stage_compile("build_worklist", build_wl)


def full_closest():
    f = jax.jit(lambda a, oo, dd, tt: worklist.closest_hit_worklist(
        a, oo, dd, RAY_TMIN, tt, **CKW))
    return f.lower(accel, o, d, tm)


stage_compile("closest_full", full_closest)


def full_anyhit():
    f = jax.jit(lambda a, oo, dd, tt: worklist.any_hit_worklist(
        a, oo, dd, RAY_TMIN, tt, **wavefront.WORKLIST_OCCLUDE_KW))
    return f.lower(accel, o, d, tm)


stage_compile("anyhit_full", full_anyhit)


def bounce_full():
    n = o.shape[0]
    beta = jnp.ones((n, 3), jnp.float32)
    rad = jnp.zeros((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    keys = jax.random.split(jax.random.key(0), n)
    bexe = wavefront._bounce_exe(64, False, "worklist")
    return bexe.lower(scene, accel, accel, o, d, beta, rad, alive, keys,
                      jnp.int32(1))


stage_compile("bounce_full", bounce_full)

# ---- escalating e2e -------------------------------------------------------
from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.scene.camera import default_camera

cam = default_camera()
W, H = (320, 180) if smoke else (1920, 1080)
settings = RenderSettings(width=W, height=H, samples_per_pixel=2,
                          max_bounces=5, seed=0)

e2e_rows = []
for wl2 in range(14, max_wave + 1, 2):
    if smoke and wl2 > 14:
        break
    if bench_wants_tpu():
        emit(probe="e2e_big", wave_log2=wl2, status="skipped: stop-file")
        break
    emit(probe="e2e_big", wave_log2=wl2, status="starting")
    try:
        t0 = time.perf_counter()
        wavefront.render(scene, cam, settings, accel=accel, block_size=64,
                         wave_size=1 << wl2, backend="worklist")
        warm = time.perf_counter() - t0
        stats = wavefront.RenderStats()
        t0 = time.perf_counter()
        img = wavefront.render(scene, cam, settings, accel=accel,
                               stats=stats, block_size=64,
                               wave_size=1 << wl2, backend="worklist")
        assert np.isfinite(img).all()
        row = dict(wave_log2=wl2, status="ok", warm_s=round(warm, 1),
                   mrays=round(stats.mrays_per_s, 2),
                   render_s=round(time.perf_counter() - t0, 1))
        e2e_rows.append(row)
        emit(probe="e2e_big", **row)
    except Exception as e:  # noqa: BLE001
        emit(probe="e2e_big", wave_log2=wl2, status="error",
             error=str(e)[:300])
        break

# Merge a summary row into the round artifact so RESULTS.md renders it
# (run_baselines.write_results_md handles a "bigscene" entry). TPU rows
# only — a CPU smoke must never write chip-speed claims.
if e2e_rows and not smoke:
    best = max(e2e_rows, key=lambda r: r["mrays"])
    rpath = "/root/repo/results/results_r5.json"
    try:
        res = {}
        if os.path.exists(rpath):
            with open(rpath) as f:
                res = json.load(f)
        res["bigscene"] = dict(
            tris=int(scene.triangles.count), clusters=accel.num_clusters,
            config=f"{W}x{H}@2spp/5b worklist backend",
            mrays=best["mrays"], wave_log2=best["wave_log2"],
            e2e=e2e_rows,
            summary=(f"renders on-chip at {best['mrays']} Mrays/s "
                     f"(1080p@2spp/5b, worklist backend, wave "
                     f"2^{best['wave_log2']}); >2048-cluster supercluster "
                     "routing validated on hardware"))
        with open(rpath, "w") as f:
            json.dump(res, f, indent=1)
        emit(probe="bigscene_merged", mrays=best["mrays"])
    except Exception as e:  # noqa: BLE001
        emit(probe="bigscene_merge_error", error=str(e)[:300])

emit(probe="bigscene_done")
