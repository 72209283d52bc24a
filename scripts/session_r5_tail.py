"""Round-5 TAIL session: the two sections the main r5 session lost.

The round-5 one-client session (`scripts/session_r5.py`) completed
probe -> adoption -> baselines but was cut off between the 4K increment
(landed 256 -> 288 spp) and the RR section. This tail session runs, in
one TPU client (tunnel hazard rules, CLAUDE.md), ordered so an
interruption costs the least-critical tail:

  1. rr_4k_speedup — the 16-bounce RR wall-clock A/B (VERDICT r4 task 5
     second half; the round artifact must carry the row).
  2. 4K progressive increment +96 spp (288 -> 384 of 1024, task 5 first
     half) via run_baselines with every other config skipped; each
     32-spp chunk checkpoints, and the loop yields at the next chunk
     boundary when the driver bench writes its stop-file.
  3. RESULTS.md regeneration from the merged artifact.

Usage: python scripts/session_r5_tail.py [--cpu]
"""
import json
import os
import runpy
import sys
import time

sys.path.insert(0, "/root/repo")

ARGS = list(sys.argv[1:])
smoke = "--cpu" in ARGS


def tlog(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


tlog("importing jax")
import jax  # noqa: E402

if smoke:
    jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001
    pass
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

tlog("creating backend (jax.devices)")
tlog(f"devices: {jax.devices()}")
tlog("first device op + first D2H pull")
_ = np.asarray(jnp.ones((8,), jnp.float32))
tlog("init complete")


def stopfile():
    return (os.path.exists("/tmp/pt_session_wrapup")
            or os.path.exists(os.environ.get(
                "PT_BENCH_STOPFILE", "/tmp/pt_bench_wants_tpu")))


# ---------------------------------------------------------------------------
# 1. Russian-roulette 4K speedup, merged into results_r5.json
# ---------------------------------------------------------------------------
try:
    from path_tracer_ai_tpu import benchmarks
    from path_tracer_ai_tpu.engine import wavefront

    cfg = benchmarks.get_configs(1.0)["4k"]
    if smoke:
        cfg = benchmarks.get_configs(1.0)["cpu-ref"]
    sc4, cam4 = benchmarks.build_config_scene(cfg)
    s_rr = cfg.settings.replace(samples_per_pixel=2, seed=9)
    if smoke:
        s_rr = s_rr.replace(width=64, height=36, max_bounces=16)
    walls = {}
    for rr in (0, 3):
        s = s_rr.replace(rr_start=rr)
        tlog(f"rr={rr} warmup")
        wavefront.render(sc4, cam4, s, wave_size=1 << 20,
                         block_size=64)  # warm
        stats = wavefront.RenderStats()
        t0 = time.perf_counter()
        img = wavefront.render(sc4, cam4, s, wave_size=1 << 20,
                               block_size=64, stats=stats)
        walls[rr] = (time.perf_counter() - t0,
                     stats.total_rays, float(np.asarray(img).mean()))
        tlog(f"rr={rr} wall {walls[rr][0]:.1f}s")
    row = dict(
        config=(f"{s_rr.width}x{s_rr.height}@2spp/"
                f"{s_rr.max_bounces}b"),
        wall_rr0_s=round(walls[0][0], 1),
        wall_rr3_s=round(walls[3][0], 1),
        speedup=round(walls[0][0] / walls[3][0], 3),
        rays_rr0=walls[0][1], rays_rr3=walls[3][1],
        mean_rr0=round(walls[0][2], 5), mean_rr3=round(walls[3][2], 5))
    emit(probe="rr_4k_speedup", **row)
    rpath = ("/root/repo/results/results_smoke.json" if smoke
             else "/root/repo/results/results_r5.json")
    res = {}
    if os.path.exists(rpath):
        with open(rpath) as f:
            res = json.load(f)
    res["rr_4k_speedup"] = row
    with open(rpath, "w") as f:
        json.dump(res, f, indent=1)
except Exception as e:  # noqa: BLE001
    emit(probe="rr_4k_speedup", error=str(e)[:300])

# ---------------------------------------------------------------------------
# 2. 4K progressive increment (288 -> 384) + RESULTS.md regeneration
# ---------------------------------------------------------------------------
if stopfile():
    emit(probe="tail_4k", status="skipped: stop-file present")
else:
    bargs = ["--spp-increment", "96",
             "--skip", "cpu-ref", "cornell", "dielectric", "gpu-parity",
             "evidence", "rmse1pct"]
    if smoke:
        bargs = ["--cpu", "--scale", "0.002",
                 "--skip", "cpu-ref", "cornell", "dielectric",
                 "gpu-parity", "evidence", "rmse1pct", "4k"]
    sys.argv = ["/root/repo/scripts/run_baselines.py"] + bargs
    t0 = time.perf_counter()
    try:
        runpy.run_path("/root/repo/scripts/run_baselines.py",
                       run_name="__main__")
        status = "ok"
    except SystemExit as e:
        status = f"exit {e.code}" if e.code else "ok"
    except Exception as e:  # noqa: BLE001
        status = f"error: {e}"[:300]
    emit(probe="tail_4k", status=status,
         wall_s=round(time.perf_counter() - t0, 1))

emit(probe="tail_done")
