"""Round-5 client D: big-scene escalation past the round-3 hang + 4K.

Session B proved the 1.31M-tri scene renders on-chip (waves 2^14/2^16 =
0.03/0.09 Mrays/s) and that per-wave fixed costs dominate (4x per wave
doubling). The round-3 blockers at 2^18 (remote-compile hang) and 2^20
(HTTP 500) predate the round-4 fix for probe-closure constant inlining —
those failures were plausibly the compiler chewing 107MB programs, and
the production path is 1.9MB. This session:

  1. big-scene e2e at waves 2^18 then 2^20 (emit BEFORE each warm so a
     hang is attributable; stage executables already sit in the
     persistent cache from session B). Expected ~4x per step if the
     compiles go through -> ~0.4/1.4 Mrays/s.
  2. exact-machinery adjudication at big-scene scale (VERDICT r4 weak
     #3 adopt-or-prune): wave-level shadow A/B on a synthetic big-scene
     shadow wave — production any_hit_worklist vs the 2-level exact-cull
     candidates (any_hit_packets exact_cull, any_hit_fused) whose
     standing justification is "big scenes, where conservative unions
     are 10-100x looser". Occlusion equality gates (exact either way).
  3. 4K progressive increments with the remaining session budget.

ONE TPU process; every section checks the driver-bench stop-file.
Usage: python scripts/session_r5d.py [--cpu] [--skip-bigscene]
                                     [--skip-4k] [--max-wave N]
                                     [--spp-increment N]
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


def stop_requested():
    return os.path.exists(os.environ.get(
        "PT_BENCH_STOPFILE", "/tmp/pt_bench_wants_tpu"))


tlog("importing jax")
import jax  # noqa: E402

if smoke:
    jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001
    pass
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

tlog(f"devices: {jax.devices()}")
t0 = time.perf_counter()
_ = np.asarray(jnp.ones((8,), jnp.float32))
emit(probe="init", platform=jax.devices()[0].platform,
     first_d2h_s=round(time.perf_counter() - t0, 1))

from __graft_entry__ import _demo_scene  # noqa: E402
from path_tracer_ai_tpu.core.types import RAY_TMIN  # noqa: E402
from path_tracer_ai_tpu.engine import wavefront  # noqa: E402

max_wave = 20
if "--max-wave" in ARGS:
    max_wave = int(ARGS[ARGS.index("--max-wave") + 1])

host = {}
scene, accel = _demo_scene(subdivisions=4 if smoke else 8, host_out=host)
emit(probe="big_scene", tris=int(scene.triangles.count),
     clusters=accel.num_clusters, supers=accel.num_supers)

# ---------------------------------------------------------------------------
# 1. e2e escalation 2^18 -> 2^20 (the round-3 blockers)
# ---------------------------------------------------------------------------
e2e_rows = []
if "--skip-bigscene" not in ARGS:
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.scene.camera import default_camera

    cam = default_camera()
    W, H = (320, 180) if smoke else (1920, 1080)
    settings = RenderSettings(width=W, height=H, samples_per_pixel=2,
                              max_bounces=5, seed=0)
    for wl2 in ([14] if smoke else range(18, max_wave + 1, 2)):
        if stop_requested():
            emit(probe="e2e_big", wave_log2=wl2, status="skipped: stop-file")
            break
        emit(probe="e2e_big", wave_log2=wl2, status="starting")
        try:
            t0 = time.perf_counter()
            wavefront.render(scene, cam, settings, accel=accel,
                             block_size=64, wave_size=1 << wl2,
                             backend="worklist")
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

    # Merge new rows into the round artifact's bigscene entry.
    if e2e_rows and not smoke:
        rpath = "/root/repo/results/results_r5.json"
        try:
            with open(rpath) as f:
                res = json.load(f)
            bs = res.get("bigscene", {})
            bs.setdefault("e2e", []).extend(e2e_rows)
            best = max(bs["e2e"], key=lambda r: r.get("mrays", 0))
            bs["mrays"] = best["mrays"]
            bs["wave_log2"] = best["wave_log2"]
            bs["summary"] = (
                f"renders on-chip at {best['mrays']} Mrays/s (1080p@2spp/"
                f"5b, worklist backend, wave 2^{best['wave_log2']}); "
                ">2048-cluster supercluster routing validated on hardware; "
                "round-3's 2^18 remote-compile hang does not reproduce at "
                "production argument passing"
                if best["wave_log2"] >= 18 else bs.get("summary", ""))
            res["bigscene"] = bs
            with open(rpath, "w") as f:
                json.dump(res, f, indent=1)
            emit(probe="bigscene_merged", mrays=best["mrays"],
                 wave_log2=best["wave_log2"])
        except Exception as e:  # noqa: BLE001
            emit(probe="bigscene_merge_error", error=str(e)[:300])

# ---------------------------------------------------------------------------
# 2. exact-machinery adjudication on big-scene shadow waves
# ---------------------------------------------------------------------------
if "--skip-bigscene" not in ARGS and not stop_requested():
    from path_tracer_ai_tpu.accel import traverse, worklist
    from path_tracer_ai_tpu.scene.scene import DEFAULT_LIGHTS

    rng = np.random.default_rng(0)
    N = 1 << (12 if smoke else 16)
    tv0 = np.asarray(host["tris"].v0)
    nvs = N // 4
    tis = np.sort(rng.choice(tv0.shape[0], nvs))
    ps = tv0[tis] + rng.standard_normal((nvs, 3)).astype(np.float32) * 1e-3
    lights = np.asarray([l[0] for l in DEFAULT_LIGHTS], np.float32)
    lvec = lights[:, None, :] - ps[None, :, :]
    dist = np.linalg.norm(lvec, axis=-1)
    osh = jnp.asarray(np.tile(ps, (4, 1)))
    dsh = jnp.asarray(
        (lvec / np.maximum(dist, 1e-30)[..., None]).reshape(-1, 3))
    tshn = (dist - 1e-3).reshape(-1).astype(np.float32)
    tshn[rng.random(tshn.shape[0]) < 0.3] = -1.0
    tsh = jnp.asarray(tshn)
    live_sh = int(jnp.sum(tsh >= 0))

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

    cases = [
        ("wl_prod", lambda: worklist.any_hit_worklist(
            accel, osh, dsh, RAY_TMIN, tsh, **wavefront.WORKLIST_OCCLUDE_KW)),
        ("packets_exact6", lambda: traverse.any_hit_packets(
            accel, osh, dsh, RAY_TMIN, tsh, block_size=64, group_size=2,
            exact_cull=6)),
    ]
    if not smoke:
        from path_tracer_ai_tpu.accel import pallas_anyhit

        cases.append(("fused_exact6", lambda: pallas_anyhit.any_hit_fused(
            accel, osh, dsh, RAY_TMIN, tsh, block_size=128, exact_cull=6)))
    ref = None
    for tag, fn in cases:
        if stop_requested():
            emit(probe="bigshadow", engine=tag, status="skipped: stop")
            break
        try:
            dt, cs, occ = timeit(fn)
            occ = jnp.asarray(occ)
            row = dict(probe="bigshadow", engine=tag,
                       ms=round(dt * 1e3, 1),
                       mrays=round(live_sh / dt / 1e6, 2),
                       compile_s=round(cs, 1))
            if ref is None:
                ref = occ
            else:
                row["occ_mismatch"] = int(jnp.sum(occ != ref))
            emit(**row)
        except Exception as e:  # noqa: BLE001
            emit(probe="bigshadow", engine=tag, error=str(e)[:300])

# ---------------------------------------------------------------------------
# 2.5 extended kernel ladder (transpose attribution + pre-transposed pack)
# ---------------------------------------------------------------------------
ladder_rows = {}
if not stop_requested():
    try:
        sys.path.insert(0, "/root/repo/scripts")
        import probe_r5_kernel

        ladder_rows = probe_r5_kernel.main(smoke=smoke) or {}
    except Exception as e:  # noqa: BLE001
        emit(probe="kernel_ladder", error=str(e)[:300])

# ---------------------------------------------------------------------------
# 2.6 GROUP=16 e2e A/B on the benchmark scene (bitwise gate) — session C's
#     ladder measured prod_g16 +3.9% wave-level, bitwise clean; the e2e
#     cost is _build_pairs' coarser per-cluster padding (16-tile runs).
# ---------------------------------------------------------------------------
if not smoke and not stop_requested():
    from path_tracer_ai_tpu.accel import pallas_ctiles
    from path_tracer_ai_tpu.accel.clusters import build_clusters
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.scene.camera import default_camera

    host_s = {}
    scene_s, accel_s = _demo_scene(subdivisions=6, host_out=host_s)
    accel_sc = build_clusters(host_s["tris"], cluster_size=256)
    cam = default_camera()
    settings = RenderSettings(width=1920, height=1080, samples_per_pixel=2,
                              max_bounces=5, seed=0)
    G0 = pallas_ctiles.GROUP
    CKW0 = dict(wavefront.CTILES_CLOSEST_KW)

    def e2e_g(tag, group, ckw=None):
        pallas_ctiles.GROUP = group
        wavefront.CTILES_CLOSEST_KW = dict(CKW0, **(ckw or {}))
        wavefront.clear_executable_caches()
        t0 = time.perf_counter()
        wavefront.render(scene_s, cam, settings, accel=accel_s,
                         block_size=64, wave_size=1 << 20, backend="hybrid",
                         accel_closest=accel_sc)
        warm_s = time.perf_counter() - t0
        best = None
        img = None
        for _ in range(2):
            stats = wavefront.RenderStats()
            t0 = time.perf_counter()
            img = wavefront.render(scene_s, cam, settings, accel=accel_s,
                                   stats=stats, block_size=64,
                                   wave_size=1 << 20, backend="hybrid",
                                   accel_closest=accel_sc)
            if best is None or stats.mrays_per_s > best:
                best = stats.mrays_per_s
        assert np.isfinite(img).all()
        emit(probe="e2e_group", config=tag, group=group,
             mrays=round(best, 2), warm_s=round(warm_s, 1))
        return best, img

    try:
        m8, img8 = e2e_g("prod_g8", 8)
        panel = [("g16", 16, None)]
        # packt e2e only if THIS session's ladder showed the kernel win
        # (>=3% vs prod at the same GROUP).
        if (ladder_rows.get("packt", 9e9)
                < ladder_rows.get("prod", 0) * 0.97):
            panel.append(("packt", 8, dict(pallas_pack_t=True)))
        if (ladder_rows.get("packt_g16", 9e9)
                < ladder_rows.get("prod", 0) * 0.97):
            panel.append(("packt_g16", 16, dict(pallas_pack_t=True)))
        for tag, group, ckw in panel:
            if stop_requested():
                emit(probe="e2e_group", config=tag, status="skipped: stop")
                break
            m_ch, img_ch = e2e_g(tag, group, ckw)
            identical = bool(np.array_equal(img8, img_ch))
            emit(probe="e2e_group_gate", identical=identical,
                 prod=round(m8, 2), challenger=round(m_ch, 2),
                 config=tag, wins=bool(identical and m_ch > m8))
    except Exception as e:  # noqa: BLE001
        emit(probe="e2e_group", error=str(e)[:300])
    finally:
        pallas_ctiles.GROUP = G0
        wavefront.CTILES_CLOSEST_KW = dict(CKW0)
        wavefront.clear_executable_caches()

# ---------------------------------------------------------------------------
# 3. 4K progressive increment (chunked, checkpointed, stop-file-aware)
# ---------------------------------------------------------------------------
if "--skip-4k" not in ARGS and not stop_requested():
    inc = "128"
    if "--spp-increment" in ARGS:
        inc = ARGS[ARGS.index("--spp-increment") + 1]
    bargs = ["--spp-increment", inc,
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
    emit(probe="session_d_4k", status=status,
         wall_s=round(time.perf_counter() - t0, 1))

emit(probe="session_d_done")
