"""Round-4 one-client TPU session: probes -> ADOPTION -> baselines -> 4K.

Designed to run UNATTENDED from the outage retry loop (scripts/
retry_loop.sh) the moment the axon service recovers: it bundles every
round-4 on-chip measurement into one process (tunnel hazard rules) and
applies the documented adoption procedure (docs/R3_SESSION_NOTES.md)
automatically, so a recovery at 3am still produces a complete round:

  1. probe J — wave-level + e2e A/Bs of every pending lever (fused
     shadow cascade variants, fused closest cascade, sub_skip, NOSORT
     toggles) with bitwise-identity gates.
  2. adoption — argmax-Mrays e2e config among those whose images are
     bit-identical to production AND whose wave-level rows show zero
     mismatch; the winning toggles are applied IN-PROCESS so every later
     section measures the adopted engine. (The repo defaults are
     committed from this output afterwards.)
  3. run_baselines — the five BASELINE configs warm, the literal-spec
     same-seed pins (cornell always; cpu-ref's ~1h oracle pin last), and
     the 4K progressive increment (+64 spp via the persistent
     checkpoint).
  4. probe K — outro decomposition / cap sweeps (diagnostic; last).

Ordering puts the decision data first and the longest/least-critical
sections last, so an interruption costs the tail.

Usage: python scripts/session_r4.py [--cpu] [--skip-probes]
                                    [--skip-baselines] [--skip-cpuref-pin]
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
# 1. probe J (all pending levers, with identity gates)
# ---------------------------------------------------------------------------
rows = []
if "--skip-probes" not in ARGS:
    rows = run_section("probe_j", "/root/repo/scripts/probe_r3j.py",
                       (["--cpu"] if smoke else []))

# ---------------------------------------------------------------------------
# 2. adoption (docs/R3_SESSION_NOTES.md decision procedure, automated —
# the pure decision lives in scripts/adoption_r4.py and is unit-tested)
# ---------------------------------------------------------------------------
sys.path.insert(0, "/root/repo/scripts")
from adoption_r4 import OCC_PROD, decide  # noqa: E402

adopted = None
if rows:
    # probe J's e2e section leaves HYBRID_OCCLUDE_KW at its LAST measured
    # config; reset every toggle to the production default before applying
    # the adoption so un-adopted levers measure at prod settings.
    from path_tracer_ai_tpu.engine import wavefront as _wf

    _wf.HYBRID_OCCLUDE_KW = dict(OCC_PROD)
    _wf.SHADOW_NOSORT_BOUNCE0 = False
    _wf.CLOSEST_NOSORT_BOUNCE0 = False
    _wf.HYBRID_CLOSEST_KW = dict(engine="ctiles")
    _wf.HYBRID_CLOSEST_CLUSTER_SIZE = 256
    _wf.clear_executable_caches()

    best, cand_rows = decide(rows)
    for c in cand_rows:
        emit(probe="adoption_candidate", **c)
    if best is not None:
        adopted = best
        from path_tracer_ai_tpu.engine import wavefront

        _, tag, toggles = best
        if "occ" in toggles:
            wavefront.HYBRID_OCCLUDE_KW = toggles["occ"]
        if toggles.get("nosort_b0"):
            wavefront.SHADOW_NOSORT_BOUNCE0 = True
            wavefront.CLOSEST_NOSORT_BOUNCE0 = True
        if toggles.get("closest_sub"):
            wavefront.CTILES_CLOSEST_KW = dict(
                wavefront.CTILES_CLOSEST_KW, sub_skip=True)
        if "closest_eng" in toggles:
            wavefront.HYBRID_CLOSEST_KW = toggles["closest_eng"]
            # The fused closest cascade runs on the BASE accel — no dual
            # S=256 build needed.
            wavefront.HYBRID_CLOSEST_CLUSTER_SIZE = None
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
        # Persist for bench.py: an unattended recovery session can land
        # while nobody is around to promote the winners into committed
        # defaults; the bench applies this artifact so the driver-run
        # headline measures the adopted engine. Deleted when the defaults
        # are committed.
        import os

        os.makedirs("/root/repo/results", exist_ok=True)
        with open("/root/repo/results/adopted_r4.json", "w") as f:
            json.dump(adopted_cfg, f, indent=1)

# ---------------------------------------------------------------------------
# 3. baselines at the adopted config (+ literal-spec pins + 4K increment)
# ---------------------------------------------------------------------------
if "--skip-baselines" not in ARGS:
    # 4K increment 192: lineage is at 64/1024 cumulative and the round-3
    # verdict's bar is >=256; per-pass checkpointing makes an interruption
    # cost one pass, not the increment. evidence/rmse1pct rows are
    # engine-independent accuracy artifacts recorded in round 3.
    bargs = ["--spp-increment", "192",
             "--skip", "evidence", "rmse1pct"]
    if smoke:
        # Smoke must NOT touch the 4K lineage checkpoint or the slow
        # configs; it validates plumbing only.
        bargs = ["--cpu", "--scale", "0.002",
                 "--skip", "evidence", "rmse1pct", "4k",
                 "dielectric", "gpu-parity"]
    run_section("baselines", "/root/repo/scripts/run_baselines.py", bargs)

    if "--skip-cpuref-pin" not in ARGS and not smoke:
        # The ~1h cpu-ref literal-spec oracle pin, alone and last.
        run_section("cpuref_pin", "/root/repo/scripts/run_baselines.py",
                    ["--cpuref-pin", "--skip", "cpu-ref", "cornell",
                     "dielectric", "gpu-parity", "evidence", "rmse1pct",
                     "4k"])

# ---------------------------------------------------------------------------
# 3b. Russian-roulette 4K speedup (verdict #7's measurement half: the
# unbiasedness statistical test is CI; this quantifies the win on the
# 16-bounce config). Separate settings from the lineage checkpoint (rr
# changes the image, so it must never touch the no-RR accumulation).
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
        emit(probe="rr_4k_speedup",
             config="3840x2160@2spp/16b",
             wall_rr0_s=round(walls[0][0], 1),
             wall_rr3_s=round(walls[3][0], 1),
             speedup=round(walls[0][0] / walls[3][0], 3),
             rays_rr0=walls[0][1], rays_rr3=walls[3][1],
             mean_rr0=round(walls[0][2], 5), mean_rr3=round(walls[3][2], 5))
    except Exception as e:  # noqa: BLE001
        emit(probe="rr_4k_speedup", error=str(e)[:300])

# ---------------------------------------------------------------------------
# 4. probe K (diagnostic sweeps; least critical, runs last)
# ---------------------------------------------------------------------------
if "--skip-probes" not in ARGS and not smoke:
    run_section("probe_k", "/root/repo/scripts/probe_r3k.py", [])

emit(probe="session_done",
     adopted=None if adopted is None else adopted[1])
