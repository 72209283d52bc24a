"""Run the five BASELINE.json configs end-to-end; emit RESULTS.md + JSON.

ONE TPU process (tunnel hazard rules). Writes results/results_r5.json and
RESULTS.md at the repo root. All throughput rows are WARM: a same-shape
warmup render compiles every executable first and per-config compile time
is recorded separately (warm_s).

Methodology notes (BASELINE "RMSE vs CPU reference" <1% criterion):
- The oracle engine IS the CPU-reference semantics (SURVEY.md §2.10), but it
  is brute-force-exact: O(rays x triangles). On the 82k-triangle blob scene
  a >=512^2 full-spp oracle render is computationally infeasible (10^16 MT
  tests), so the criterion is evidenced in three mutually reinforcing ways:
  1. cornell (36 tris): TRUE oracle RMSE at the full 512x512/64spp spec,
     different seeds (two independent unbiased estimators; <1% iff the fast
     path matches the reference semantics within MC noise).
  2. blob scenes: SAME-SEED oracle-vs-wavefront agreement at a small config
     (identical RNG streams make MC noise cancel; any semantic difference
     shows up directly) plus the traversal-exactness test suite.
  3. cross-seed wavefront RMSE at 512x288 as the MC-noise yardstick.

Usage: python scripts/run_baselines.py [--skip SLOW_CONFIGS...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _orphaned_mid_chunk_spp(ck, prev_fp):
    """Stored spp of a checkpoint that matches prev_fp in everything BUT
    spp (a mid-chunk stamp from a killed session), else None."""
    from path_tracer_ai_tpu.io import checkpoint as ckpt_io

    stored = ckpt_io.peek_fingerprint(ck)
    if stored is None:
        return None
    return ckpt_io.compatible_spp(stored, prev_fp)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument("--scale", type=float, default=1.0,
                    help="global spp scale for smoke runs")
    ap.add_argument("--spp-increment", type=int, default=16,
                    help="4k progressive: samples added this session")
    ap.add_argument("--cpu", action="store_true",
                    help="smoke mode: force the CPU backend (NEVER run this "
                         "script against the TPU while another TPU client "
                         "is alive — tunnel wedge hazard, see CLAUDE.md)")
    ap.add_argument("--cpuref-pin", action="store_true",
                    help="run the ~1h cpu-ref literal-spec same-seed oracle "
                         "pin (opt-in; see the cpuref_spec_same_seed_pin "
                         "section)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    import numpy as np

    log(f"devices: {jax.devices()}")
    # Absorb the tunnel's one-time first-D2H setup cost (25-270s measured)
    # before any timed section.
    import jax.numpy as jnp

    t0 = time.perf_counter()
    _ = np.asarray(jnp.ones((8,), jnp.float32))
    log(f"first-D2H absorbed in {time.perf_counter() - t0:.1f}s")

    from path_tracer_ai_tpu import benchmarks
    from path_tracer_ai_tpu.engine import oracle, wavefront
    from path_tracer_ai_tpu.io import checkpoint as ckpt_io

    results = {}
    # Merge with a previous partial run (e.g. re-running the fast configs
    # warm after a methodology fix without repeating gpu-parity/4k) and
    # seed from the prior round's artifact (the 4k lineage lives there).
    # CPU smoke runs write to SEPARATE artifacts: a smoke must never
    # clobber RESULTS.md / results_r4.json with CPU-speed rows.
    prev = ("/root/repo/results/results_smoke.json" if args.cpu
            else "/root/repo/results/results_r5.json")
    results_md = ("/root/repo/RESULTS_smoke.md" if args.cpu
                  else "/root/repo/RESULTS.md")
    for seed_path in ("/root/repo/results/results_r3.json",
                      "/root/repo/results/results_r4.json", prev):
        if os.path.exists(seed_path):
            with open(seed_path) as f:
                results.update(json.load(f))

    def wrapup():
        """Session wrap-up control: when the round driver is about to need
        the TPU (or the wall clock is closing), touching either file makes
        the long tail sections (4k chunks past the next boundary, the ~1h
        cpuref pin) stop cleanly at the next checkpointable boundary.
        Checked at boundaries only — never interrupts a device call.
        The bench stop-file counts too (round-5 fix): the driver bench
        writes it when it wants the chip, and its supervisor only waits
        ~20 min — sessions must yield within that window, not be waited
        out (BENCH_r04.json rc=124 was a session starving the driver)."""
        return (os.path.exists("/tmp/pt_session_wrapup")
                or os.path.exists(os.environ.get(
                    "PT_BENCH_STOPFILE", "/tmp/pt_bench_wants_tpu")))

    def record(name, **kw):
        results[name] = kw
        log(f"[{name}] {kw}")
        # Write incrementally: a killed session (tool timeout, tunnel wedge)
        # must not lose completed configs — each costs minutes of TPU time.
        os.makedirs("/root/repo/results", exist_ok=True)
        with open(prev, "w") as f:
            json.dump(results, f, indent=1)

    # ---- the four non-4k configs at full spec -----------------------------
    for name in ["cpu-ref", "cornell", "dielectric", "gpu-parity"]:
        if name in args.skip:
            continue
        cfg = benchmarks.get_configs(args.scale)[name]
        scene, camera = benchmarks.build_config_scene(cfg)
        accel = None
        # Warmup pass: each config's wave shapes compile fresh executables
        # (and compaction buckets); keep one-time jit cost out of the
        # recorded Mrays.
        warm = cfg.settings.replace(
            seed=1, samples_per_pixel=min(cfg.settings.samples_per_pixel, 2)
        )
        t0 = time.perf_counter()
        wavefront.render(scene, camera, warm, wave_size=1 << 20,
                         block_size=64)
        warm_s = time.perf_counter() - t0
        log(f"[{name}] warmup {warm_s:.1f}s")
        stats = wavefront.RenderStats()
        t0 = time.perf_counter()
        img = wavefront.render(scene, camera, cfg.settings.replace(seed=1),
                               stats=stats, wave_size=1 << 20, block_size=64)
        wall = time.perf_counter() - t0
        assert np.isfinite(img).all()
        record(
            name, width=cfg.settings.width, height=cfg.settings.height,
            spp=cfg.settings.samples_per_pixel,
            bounces=cfg.settings.max_bounces,
            wall_s=round(wall, 1), warm_compile_s=round(warm_s, 1),
            timing="warm", mrays=round(stats.mrays_per_s, 2),
            total_mrays=round(stats.total_rays / 1e6, 1),
        )

        if name == "cornell":
            # TRUE oracle RMSE at full spec. Per-pixel RMSE at finite spp
            # is Monte-Carlo-noise-limited, so the criterion is the
            # oracle's OWN cross-seed noise floor (an unbiased fast path
            # sits AT the floor; semantic divergence sits above it) — the
            # same methodology as tests/test_benchmarks.py. The absolute
            # <1% reading applies in the spp->inf limit.
            t0 = time.perf_counter()
            img_o = oracle.render(scene, camera,
                                  cfg.settings.replace(seed=2))
            img_o2 = oracle.render(scene, camera,
                                   cfg.settings.replace(seed=3))
            r = benchmarks.rmse(img, img_o)
            floor = benchmarks.rmse(img_o2, img_o)
            record("cornell_rmse_vs_oracle", rmse_pct=round(100 * r, 3),
                   noise_floor_pct=round(100 * floor, 3),
                   criterion="<= oracle cross-seed noise floor",
                   passes=bool(r < floor * 1.05),
                   mean_rel_err_pct=round(
                       100 * abs(float(img.mean()) - float(img_o.mean()))
                       / max(float(img_o.mean()), 1e-9), 3),
                   oracle_wall_s=round(time.perf_counter() - t0, 1))
            # SAME-SEED pin at the LITERAL spec config (round-3 verdict
            # weak #5): identical RNG streams make MC noise cancel, so a
            # max-abs of ~float-summation-order proves the fast path IS
            # the reference semantics at 512x512@64spp itself — no noise-
            # floor argument needed. img_o above is seed=2; one more
            # wavefront render at seed=2 closes the pin.
            img_w2 = wavefront.render(scene, camera,
                                      cfg.settings.replace(seed=2),
                                      wave_size=1 << 20, block_size=64)
            d = np.abs(img_w2 - img_o)
            record("cornell_spec_same_seed_pin",
                   config="512x512@64spp/5b seed=2",
                   max_abs=float(d.max()), mean_abs=float(d.mean()),
                   rmse_pct=round(100 * benchmarks.rmse(img_w2, img_o), 4),
                   passes=bool(d.max() < 1e-4))

    # ---- blob-scene correctness evidence ----------------------------------
    if "evidence" not in args.skip:
        from path_tracer_ai_tpu.config import RenderSettings

        cfg = benchmarks.get_configs(1.0)["gpu-parity"]
        scene, camera = benchmarks.build_config_scene(cfg)

        # same-seed agreement at an oracle-feasible size
        s_small = RenderSettings(64, 36, 4, 5, seed=7)
        img_w = wavefront.render(scene, camera, s_small, wave_size=1 << 16,
                                 block_size=64)
        t0 = time.perf_counter()
        img_o = oracle.render(scene, camera, s_small, chunk_pixels=2304)
        diff = np.abs(img_w - img_o)
        record("blob_same_seed_agreement", config="64x36@4spp/5b",
               max_abs=float(diff.max()), mean_abs=float(diff.mean()),
               oracle_wall_s=round(time.perf_counter() - t0, 1))

        # cross-seed wavefront RMSE at 512x288 (the MC-noise yardstick)
        s_mid = RenderSettings(512, 288, 100, 5, seed=11)
        a = wavefront.render(scene, camera, s_mid, wave_size=1 << 20,
                             block_size=64)
        b = wavefront.render(scene, camera, s_mid.replace(seed=12),
                             wave_size=1 << 20, block_size=64)
        record("blob_cross_seed_rmse_512", config="512x288@100spp/5b",
               rmse_pct=round(100 * benchmarks.rmse(a, b), 3))

    # ---- cpu-ref literal-spec same-seed pin (round-3 verdict weak #5) -----
    # The 82k-tri brute-force oracle at the FULL 800x450@10spp spec costs
    # ~1h of device time (measured 8.6s at 64x36@4spp, x390 samples), so
    # this row is opt-in: run it once per round when the session budget
    # allows. Same-seed max-abs at the literal config — the strongest
    # possible reading of the "RMSE vs CPU reference" criterion.
    if args.cpuref_pin and "cpuref-pin" not in args.skip and wrapup():
        log("[cpuref-pin] SKIPPED: session wrap-up requested "
            "(/tmp/pt_session_wrapup)")
    elif args.cpuref_pin and "cpuref-pin" not in args.skip:
        from path_tracer_ai_tpu.config import RenderSettings

        cfg = benchmarks.get_configs(args.scale)["cpu-ref"]
        scene, camera = benchmarks.build_config_scene(cfg)
        s_pin = cfg.settings.replace(seed=5)
        img_w = wavefront.render(scene, camera, s_pin, wave_size=1 << 20,
                                 block_size=64)
        t0 = time.perf_counter()
        img_o = oracle.render(scene, camera, s_pin, spp_chunk=2)
        d = np.abs(img_w - img_o)
        record("cpuref_spec_same_seed_pin",
               config=f"{s_pin.width}x{s_pin.height}@"
                      f"{s_pin.samples_per_pixel}spp/{s_pin.max_bounces}b "
                      f"seed=5",
               max_abs=float(d.max()), mean_abs=float(d.mean()),
               rmse_pct=round(100 * benchmarks.rmse(img_w, img_o), 4),
               passes=bool(d.max() < 1e-4),
               oracle_wall_s=round(time.perf_counter() - t0, 1))

    # ---- the literal <1% RMSE row (BASELINE.md accuracy criterion) --------
    # Cross-seed RMSE between two unbiased estimators falls as 1/sqrt(spp):
    # the 64-spp cornell floor is ~14.1%, so ~32k spp puts the floor at
    # ~0.6% — below the 1% letter of the criterion. A true brute-force
    # oracle render at this spp is feasible because cornell is 36 triangles.
    if "rmse1pct" not in args.skip:
        from path_tracer_ai_tpu.config import RenderSettings
        from path_tracer_ai_tpu.scene.cornell import build_cornell_scene

        scene_c, cam_c = build_cornell_scene()
        spp_hi = max(4, int(32768 * args.scale))
        s_hi = RenderSettings(96, 96, spp_hi, 5, seed=21)
        t0 = time.perf_counter()
        img_w = wavefront.render(scene_c, cam_c, s_hi, wave_size=1 << 20,
                                 block_size=64)
        w_wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        # spp_chunk bounds each device execution to ~16s: the whole-spp
        # fori_loop at 32768spp is a multi-minute single execution, which
        # the axon tunnel's watchdog kills (observed: "TPU worker process
        # crashed" — and a 10-45min tunnel wedge).
        img_o = oracle.render(scene_c, cam_c, s_hi.replace(seed=22),
                              spp_chunk=2048)
        o_wall = time.perf_counter() - t0
        r = benchmarks.rmse(img_w, img_o)
        record("cornell_rmse_1pct",
               config=f"96x96@{spp_hi}spp/5b cross-seed",
               rmse_pct=round(100 * r, 3), passes=bool(r < 0.01),
               criterion="<1% RMSE vs CPU-reference oracle at equal spp",
               wavefront_wall_s=round(w_wall, 1),
               oracle_wall_s=round(o_wall, 1))

    # ---- 4k progressive: cumulative spp across SESSIONS ------------------
    if "4k" not in args.skip:
        cfg = benchmarks.get_configs(1.0)["4k"]
        scene, camera = benchmarks.build_config_scene(cfg)
        # Full spec is 1024 spp / 16 bounces; each baselines session adds
        # `--spp-increment` samples, resuming the PERSISTENT checkpoint, so
        # cumulative spp grows across rounds with a recorded lineage.
        ck = "/root/repo/results/ckpt_4k.npz"
        lineage = results.get("4k", {}).get("lineage", [])
        spp_done = int(results.get("4k", {}).get("spp_cumulative", 0))
        inc = max(1, int(args.spp_increment * args.scale))
        # The increment renders in 16-spp chunks, each recorded to the
        # results artifact as it lands: a wrap-up request or an
        # interruption costs at most one chunk, not the whole increment.
        # 16 (not 32) bounds the stop-file yield latency to ~13 min at
        # measured 4K rates — inside the driver-bench supervisor's
        # ~25-min wait (BENCH_r04 rc=124 was a session waiting it out).
        # The per-pass checkpoint (checkpoint_every=1) already pays the
        # D2H either way, so smaller chunks only add artifact writes.
        # Accumulation is identical either way (the checkpoint lineage
        # carries the exact next-sample cursor).
        chunk_spp = 16 if args.scale >= 1.0 else inc
        target = spp_done + inc
        while spp_done < target:
            if wrapup() and spp_done > 0:
                log(f"[4k] wrap-up requested at {spp_done}/{target} spp; "
                    "stopping at this chunk boundary")
                break
            spp_to = min(spp_done + chunk_spp, target)
            s4k = cfg.settings.replace(samples_per_pixel=spp_to, seed=3)
            fp_now = ckpt_io.fingerprint(s4k, scene.triangles.count, 3)
            if spp_done > 0 and os.path.exists(ck):
                # Rebind the stored accumulator to this chunk's target spp
                # (the fingerprint pins geometry/resolution/seed; spp
                # grows).
                prev_fp = ckpt_io.fingerprint(
                    s4k.replace(samples_per_pixel=spp_done),
                    scene.triangles.count, 3)
                loaded = ckpt_io.load(ck, prev_fp)
                if loaded is not None:
                    acc, cnt, next_s = loaded
                    ckpt_io.save(ck, acc, cnt, next_s, fp_now)
                elif (mid := _orphaned_mid_chunk_spp(ck, prev_fp)) \
                        and mid > spp_done:
                    # A previous session died INSIDE a chunk: the
                    # checkpoint is stamped with that chunk's target spp
                    # and resumes in-render (wavefront.render loads it
                    # via checkpoint_path when the fingerprint matches).
                    # Finish the orphaned chunk instead of restarting the
                    # accumulation (round-5 incident: a spp320 mid-chunk
                    # stamp orphaned a 288-spp lineage).
                    target = max(target, mid)
                    spp_to = mid
                    s4k = cfg.settings.replace(samples_per_pixel=mid,
                                               seed=3)
                    fp_now = ckpt_io.fingerprint(
                        s4k, scene.triangles.count, 3)
                    log(f"[4k] resuming orphaned mid-chunk checkpoint "
                        f"to {mid} spp (artifact was at {spp_done})")
                else:
                    # Bound the restart to the REQUESTED increment: without
                    # shrinking `target`, a lost checkpoint would silently
                    # re-render the entire prior accumulation (hours at 4K)
                    # instead of this session's chunk budget.
                    target = inc
                    log("[4k] WARNING: lineage checkpoint missing/stale; "
                        f"restarting accumulation at 0/{target} spp "
                        f"(~{(target + chunk_spp - 1) // chunk_spp} chunks "
                        "this session; prior lineage discarded)")
                    spp_done = 0
                    lineage = []
                    continue
            stats = wavefront.RenderStats()
            t0 = time.perf_counter()
            img = wavefront.render(scene, camera, s4k, stats=stats,
                                   wave_size=1 << 20, block_size=64,
                                   checkpoint_path=ck, checkpoint_every=1)
            wall = time.perf_counter() - t0
            assert np.isfinite(img).all()
            lineage = list(lineage) + [dict(
                spp_from=spp_done, spp_to=spp_to, wall_s=round(wall, 1),
                mrays=round(stats.mrays_per_s, 2),
            )]
            record("4k", width=3840, height=2160, spp=spp_to,
                   spp_cumulative=spp_to, spp_full_spec=1024,
                   bounces=s4k.max_bounces, timing="warm-resumed",
                   wall_s=round(wall, 1), mrays=round(stats.mrays_per_s, 2),
                   total_mrays=round(stats.total_rays / 1e6, 1),
                   lineage=lineage,
                   note="progressive accumulation across sessions via the "
                        "persistent checkpoint (results/ckpt_4k.npz); the "
                        "full-spec 1024spp run is the same loop continued; "
                        "multi-device tiling validated on the virtual mesh")
            spp_done = spp_to

    # ---- write artifacts ----------------------------------------------------
    os.makedirs("/root/repo/results", exist_ok=True)
    with open(prev, "w") as f:
        json.dump(results, f, indent=1)

    write_results_md(results, results_md)
    log("wrote " + results_md + " + " + prev)
    print(json.dumps(results))


def write_results_md(results, results_md):
    """Render RESULTS.md from the results artifact.

    Pure function of the JSON rows so a `--write-md-only` invocation (no
    device access) regenerates the doc after any artifact merge — the
    generated doc, not a hand edit, is the source of truth (r4 verdict
    weak #4: end-of-round docs must not lag the round's own data)."""
    lines = [
        "# RESULTS — BASELINE configs (round 5, v5e single chip)",
        "",
        "Produced by `scripts/run_baselines.py` (driven by",
        "`scripts/session_r5.py`: probe -> adoption -> baselines) in one",
        "TPU session; raw values in `results/results_r5.json`. All rows",
        "WARM (compile excluded; warm_compile_s in the JSON) at the",
        "round-5 adopted engine config. RMSE methodology: see the script",
        "docstring (brute-force oracle cost bounds what can be compared",
        "at full spec; three-way evidence instead).",
        "",
        "| config | spec | wall | Mrays/s | correctness evidence |",
        "|---|---|---|---|---|",
    ]
    for name in ["cpu-ref", "cornell", "dielectric", "gpu-parity", "4k"]:
        r = results.get(name)
        if not r:
            continue
        spec = f"{r['width']}x{r['height']} @ {r['spp']}spp/{r['bounces']}b"
        ev = ""
        # Lead correctness evidence with the same-seed literal-spec pins
        # (r4 verdict weak #6): MC noise cancels under identical RNG
        # streams, so a ~float-summation max-abs IS the criterion, with
        # no noise-floor argument needed.
        if name == "cornell" and "cornell_spec_same_seed_pin" in results:
            rr = results["cornell_spec_same_seed_pin"]
            ev = (f"same-seed spec pin max-abs {rr['max_abs']:.2e} "
                  f"(RMSE {rr['rmse_pct']}%)")
        elif name == "cornell" and "cornell_rmse_vs_oracle" in results:
            rr = results["cornell_rmse_vs_oracle"]
            ev = (f"oracle RMSE {rr['rmse_pct']}% vs noise floor "
                  f"{rr.get('noise_floor_pct', '?')}% "
                  f"(at floor: {rr['passes']})")
        elif name == "cpu-ref" and "cpuref_spec_same_seed_pin" in results:
            rr = results["cpuref_spec_same_seed_pin"]
            ev = f"same-seed spec pin max-abs {rr['max_abs']:.2e}"
        elif name == "4k":
            ev = (f"cumulative {r.get('spp_cumulative')}/1024 spp across "
                  f"{len(r.get('lineage', []))} sessions")
            if r.get("orphaned_spp"):
                ev += (f"; a prior {r['orphaned_spp']}-spp lineage was "
                       "orphaned by a mid-chunk kill (incident in JSON)")
        elif "blob_same_seed_agreement" in results:
            ag = results["blob_same_seed_agreement"]
            ev = f"same-seed oracle agreement max {ag['max_abs']:.2e}"
        lines.append(
            f"| {name} | {spec} | {r['wall_s']}s | {r['mrays']} | {ev} |"
        )
    if "e2e_adopted" in results:
        rr = results["e2e_adopted"]
        hist = rr.get("history", {})
        hist_s = ", ".join(f"{k}: {v}" for k, v in sorted(hist.items()))
        lines += ["",
                  f"**Headline e2e ({rr['spec']}):** **{rr['mrays']} "
                  f"Mrays/s** adopted config `{rr['config']}` vs "
                  f"production {rr['prod_mrays']} (images bitwise "
                  f"identical: {rr['image_identical']}; history "
                  f"{hist_s}). {rr.get('note', '')}"]
    for pin, label in (("cornell_spec_same_seed_pin", "cornell"),
                       ("cpuref_spec_same_seed_pin", "cpu-ref")):
        if pin in results:
            rr = results[pin]
            lines += ["",
                      f"**{label} literal-spec same-seed pin** "
                      f"({rr['config']}): wavefront-vs-oracle max-abs "
                      f"{rr['max_abs']:.2e}, RMSE {rr['rmse_pct']}% — "
                      f"passes: {rr['passes']}."]
    if "cornell_rmse_1pct" in results:
        rr = results["cornell_rmse_1pct"]
        lines += ["",
                  f"**<1% RMSE criterion (literal):** cornell "
                  f"{rr['config']}: wavefront-vs-oracle RMSE "
                  f"{rr['rmse_pct']}% — passes: {rr['passes']}."]
    if "blob_cross_seed_rmse_512" in results:
        rr = results["blob_cross_seed_rmse_512"]
        lines += ["",
                  f"Cross-seed wavefront RMSE ({rr['config']}): "
                  f"{rr['rmse_pct']}% — the MC-noise level at this spp."]
    if "rr_4k_speedup" in results:
        rr = results["rr_4k_speedup"]
        lines += ["",
                  f"**Russian roulette (opt-in `--rr 3`)** on the 16-bounce "
                  f"4K config ({rr['config']}): {rr['speedup']}x wall "
                  f"speedup ({rr['wall_rr0_s']}s -> {rr['wall_rr3_s']}s); "
                  "unbiasedness is CI-tested (tests/test_wavefront.py)."]
    if "mxu_adjudication" in results:
        rr = results["mxu_adjudication"]
        lines += ["",
                  f"**MXU intersector adjudication (on-chip):** verdict "
                  f"{rr['verdict'].upper()} — wl_vpu {rr['wl_vpu_mrays']} "
                  f"vs wl_mxu(highest) {rr['wl_mxu_highest_mrays']} "
                  f"Mrays/s. {rr.get('note', '')}"]
    if "bigscene" in results:
        rr = results["bigscene"]
        lines += ["",
                  f"**Big scene ({rr.get('tris', '?')} tris, "
                  f"{rr.get('clusters', '?')} clusters):** "
                  f"{rr.get('summary', json.dumps(rr))}"]
        steps = ", ".join(f"2^{e['wave_log2']}: {e['mrays']}"
                          for e in rr.get("e2e", [])
                          if e.get("status") == "ok")
        if steps:
            lines[-1] += f". Wave escalation (Mrays/s): {steps}."
        blk = rr.get("wave_2_20_blocker")
        if blk:
            lines[-1] += (f" Wave 2^20 blocker: {blk['status']} — "
                          f"`{blk['error']}`.")
    adjudications = [
        ("closest_stage_split_r5", "Closest-wave stage split",
         lambda rr: f"{rr['config']}: " + " | ".join(
             f"{k} {v}ms" for k, v in rr["delta_ms"].items())
         + f" (total {rr['total_ms']}ms). {rr.get('note', '')}"),
        ("shadow_stage_split_r5", "Shadow-wave stage split",
         lambda rr: f"{rr['config']}: " + " | ".join(
             f"{k} {v}ms" for k, v in rr["ms"].items())
         + f". {rr.get('note', '')}"),
        ("kernel_ladder_r5", "Kernel-throughput ladder",
         lambda rr: f"{rr['config']}: " + " | ".join(
             f"{k} {v['ms']}ms ({v['gtests_per_s']} Gtests/s)"
             for k, v in rr["variants"].items())
         + f". {rr.get('note', '')}"),
        ("pairs_retune_e2e_r5", "Pairs-stage retune (e2e)",
         lambda rr: f"{rr['spec']}: " + ", ".join(
             f"{k} {v}" for k, v in rr["mrays"].items())
         + f" Mrays/s — {rr['verdict']}"),
        ("group_e2e_r5", "DMA GROUP retune (e2e)",
         lambda rr: f"{rr['spec']}: " + ", ".join(
             f"{k} {v['mrays']}" for k, v in rr["mrays"].items())
         + f" Mrays/s — {rr['verdict']}"),
        ("bigshadow_exact_adjudication_r5", "Big-scene exact-cull shadow",
         lambda rr: f"{rr['config']}: {rr['verdict']}"),
    ]
    adj_lines = []
    for key, label, fmt in adjudications:
        if key in results:
            try:
                adj_lines.append(f"- **{label}** — {fmt(results[key])}")
            except (KeyError, TypeError):
                adj_lines.append(f"- **{label}** — see JSON `{key}`")
    if adj_lines:
        lines += ["", "## Round-5 on-chip adjudications", ""] + adj_lines
    with open(results_md, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    if "--write-md-only" in sys.argv:
        # Regenerate RESULTS.md from the existing artifact without any
        # device access (safe while a TPU client is alive).
        with open("/root/repo/results/results_r5.json") as f:
            write_results_md(json.load(f), "/root/repo/RESULTS.md")
        log("wrote RESULTS.md (md-only)")
    else:
        main()
