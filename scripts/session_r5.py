"""Round-5 one-client TPU session: probe -> adoption -> baselines -> RR.

One process bundles every round-5 on-chip measurement (tunnel hazard
rules, CLAUDE.md) and yields the chip promptly when the driver bench
writes its stop-file (run_baselines' wrapup + probe_r5's per-config
check — BENCH_r04 rc=124 was a session starving the driver):

  1. probe_r5 — closest-outro fallback_sorted A/B, MXU intersector rows
     (ceiling-plan data), e2e adjudication of occ_b128_g2 /
     closest_fbsorted / combo, all with bitwise gates.
  2. adoption — argmax-Mrays e2e config among image-identical candidates
     (scripts/adoption_r5.py, unit-tested); the winning toggles are
     applied IN-PROCESS so every later section measures the adopted
     engine, and persisted to results/adopted_r5.json for bench.py
     (deleted when the winners are promoted to committed defaults).
  3. run_baselines — the BASELINE configs warm at the adopted config,
     cornell literal-spec same-seed pin, and the 4K progressive
     increment +128 spp (256 -> 384 of 1024, VERDICT r4 task 5).
  4. rr_4k_speedup — the 16-bounce RR wall-clock A/B, merged into
     results/results_r5.json (task 5's second half).

Ordering puts the decision data first and the longest/least-critical
sections last, so an interruption costs the tail.

Usage: python scripts/session_r5.py [--cpu] [--skip-probes]
                                    [--skip-baselines]
"""
import io
import json
import runpy
import sys
import time

sys.path.insert(0, "/root/repo")


def tlog(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


# run_section REASSIGNS sys.argv for each child script — snapshot our own
# flags first and test only the snapshot from here on.
ARGS = list(sys.argv[1:])
smoke = "--cpu" in ARGS

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

tlog("creating backend (jax.devices)")
tlog(f"devices: {jax.devices()}")
tlog("first device op (jnp.zeros)")
jnp.zeros(()).block_until_ready()
tlog("first D2H pull")
_ = np.asarray(jnp.ones((8,), jnp.float32))
tlog("init complete")


class _Tee(io.TextIOBase):
    """Mirror child-script stdout to the real stdout AND a buffer so the
    adoption logic can parse the probe's JSON rows."""

    def __init__(self, real):
        self.real = real
        self.buf = []

    def write(self, s):
        self.real.write(s)
        self.buf.append(s)
        return len(s)

    def flush(self):
        self.real.flush()


def run_section(name, path, argv):
    """runpy a child script, capturing its stdout rows. Never raises."""
    sys.argv = [path] + argv
    tee = _Tee(sys.stdout)
    old = sys.stdout
    sys.stdout = tee
    t0 = time.perf_counter()
    try:
        runpy.run_path(path, run_name="__main__")
        status = "ok"
    except SystemExit as e:
        status = f"exit {e.code}" if e.code else "ok"
    except Exception as e:  # noqa: BLE001
        status = f"error: {e}"[:300]
    finally:
        sys.stdout = old
    emit(probe="section", name=name, status=status,
         wall_s=round(time.perf_counter() - t0, 1))
    rows = []
    for line in "".join(tee.buf).splitlines():
        try:
            rows.append(json.loads(line))
        except (json.JSONDecodeError, ValueError):
            pass
    return rows


# ---------------------------------------------------------------------------
# 1. probe r5 (outro lever + MXU rows + e2e adjudication)
# ---------------------------------------------------------------------------
rows = []
if "--skip-probes" not in ARGS:
    rows = run_section("probe_r5", "/root/repo/scripts/probe_r5.py",
                       (["--cpu"] if smoke else []))

# ---------------------------------------------------------------------------
# 2. adoption (scripts/adoption_r5.py decision, unit-tested)
# ---------------------------------------------------------------------------
sys.path.insert(0, "/root/repo/scripts")
from adoption_r5 import decide  # noqa: E402

adopted = None
if rows:
    from path_tracer_ai_tpu.engine import wavefront

    # Reset every toggle to the promoted production defaults before
    # applying the adoption (probe_r5's finally block already restores,
    # but never trust a child's cleanup for the round's numbers).
    PROD_OCC = dict(engine="packets", group_size=2)
    PROD_CKW = dict(cap=48, tile_chunk=2048, fallback_compact=1 << 13)
    wavefront.HYBRID_OCCLUDE_KW = dict(PROD_OCC)
    wavefront.CTILES_CLOSEST_KW = dict(PROD_CKW)
    wavefront.SHADOW_NOSORT_BOUNCE0 = True
    wavefront.CLOSEST_NOSORT_BOUNCE0 = True
    wavefront.HYBRID_CLOSEST_KW = dict(engine="ctiles")
    wavefront.HYBRID_CLOSEST_CLUSTER_SIZE = 256
    wavefront.clear_executable_caches()

    best, cand_rows = decide(rows)
    for c in cand_rows:
        emit(probe="adoption_candidate", **c)
    if best is not None:
        adopted = best
        _, tag, toggles = best
        if "occ" in toggles:
            wavefront.HYBRID_OCCLUDE_KW = dict(toggles["occ"])
        if "closest_kw_update" in toggles:
            wavefront.CTILES_CLOSEST_KW = dict(
                PROD_CKW, **toggles["closest_kw_update"])
        wavefront.clear_executable_caches()
        adopted_cfg = dict(
            config=tag, mrays=best[0],
            occ=wavefront.HYBRID_OCCLUDE_KW,
            closest_kw=wavefront.CTILES_CLOSEST_KW,
            closest_eng=wavefront.HYBRID_CLOSEST_KW,
            nosort_b0=wavefront.SHADOW_NOSORT_BOUNCE0,
            hybrid_closest_cluster_size=(
                wavefront.HYBRID_CLOSEST_CLUSTER_SIZE),
        )
        emit(probe="adopted", **adopted_cfg)
        if tag != "prod_r5":
            # Persist for bench.py until the winners are promoted to
            # committed defaults (then delete, per repo policy). A
            # prod_r5 win needs no artifact — the defaults ARE prod.
            import os

            os.makedirs("/root/repo/results", exist_ok=True)
            with open("/root/repo/results/adopted_r5.json", "w") as f:
                json.dump(adopted_cfg, f, indent=1)

# ---------------------------------------------------------------------------
# 3. baselines at the adopted config (+ cornell pin + 4K increment to 384)
# ---------------------------------------------------------------------------
if "--skip-baselines" not in ARGS:
    bargs = ["--spp-increment", "128",
             "--skip", "evidence", "rmse1pct"]
    if smoke:
        # Smoke must NOT touch the 4K lineage checkpoint or the slow
        # configs; it validates plumbing only.
        bargs = ["--cpu", "--scale", "0.002",
                 "--skip", "evidence", "rmse1pct", "4k",
                 "dielectric", "gpu-parity"]
    run_section("baselines", "/root/repo/scripts/run_baselines.py", bargs)

# ---------------------------------------------------------------------------
# 4. Russian-roulette 4K speedup, merged into results_r5.json
# ---------------------------------------------------------------------------
if "--skip-baselines" not in ARGS and not smoke:
    try:
        from path_tracer_ai_tpu import benchmarks
        from path_tracer_ai_tpu.engine import wavefront

        cfg = benchmarks.get_configs(1.0)["4k"]
        sc4, cam4 = benchmarks.build_config_scene(cfg)
        s_rr = cfg.settings.replace(samples_per_pixel=2, seed=9)
        walls = {}
        for rr in (0, 3):
            s = s_rr.replace(rr_start=rr)
            wavefront.render(sc4, cam4, s, wave_size=1 << 20,
                             block_size=64)  # warm
            stats = wavefront.RenderStats()
            t0 = time.perf_counter()
            img = wavefront.render(sc4, cam4, s, wave_size=1 << 20,
                                   block_size=64, stats=stats)
            walls[rr] = (time.perf_counter() - t0,
                         stats.total_rays, float(np.asarray(img).mean()))
        row = dict(
            config="3840x2160@2spp/16b",
            wall_rr0_s=round(walls[0][0], 1),
            wall_rr3_s=round(walls[3][0], 1),
            speedup=round(walls[0][0] / walls[3][0], 3),
            rays_rr0=walls[0][1], rays_rr3=walls[3][1],
            mean_rr0=round(walls[0][2], 5), mean_rr3=round(walls[3][2], 5))
        emit(probe="rr_4k_speedup", **row)
        # merge into the round artifact (VERDICT r4 task 5: results_r5
        # must carry an rr row, not just a stdout line)
        import os

        rpath = "/root/repo/results/results_r5.json"
        res = {}
        if os.path.exists(rpath):
            with open(rpath) as f:
                res = json.load(f)
        res["rr_4k_speedup"] = row
        with open(rpath, "w") as f:
            json.dump(res, f, indent=1)
    except Exception as e:  # noqa: BLE001
        emit(probe="rr_4k_speedup", error=str(e)[:300])

emit(probe="session_done",
     adopted=None if adopted is None else adopted[1])
