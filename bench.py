"""Benchmark harness: prints ONE JSON line with the headline metric.

Metric: Mrays/s on one chip rendering the GPU-parity-class config
(1920x1080, 5 bounces — BASELINE.json config 4) on the procedural
IronMan-stand-in scene (~82k triangles; the real asset is not shipped by the
reference). vs_baseline is the ratio against the BASELINE.md north-star
target of 100 Mrays/s/chip on v5e.

Rays counted = live closest-hit rays + live shadow rays actually traced
(engine.tracer stats), NOT padded/dead lanes.

Usage: python bench.py [--spp N] [--width W] [--height H] [--quick]
Extra diagnostics go to stderr; stdout carries exactly one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Signatures of a recoverable TPU-service outage (NOT code bugs): the axon
# backend failing to initialize. Round 3 lost its driver bench to exactly
# this — one UNAVAILABLE throw at the first device touch, no retry
# (VERDICT.md weak #1; outage pattern in docs/R3_SESSION_NOTES.md).
_OUTAGE_MARKERS = (
    "Unable to initialize backend 'axon'",
    "UNAVAILABLE: TPU backend setup/compile error",
    "DEADLINE_EXCEEDED",
)


# Prefix-style substrings: b"session_r5" covers session_r5.py /
# session_r5b.py / session_r5_tail.py. run_baselines / the big-scene probe
# are TPU clients in their own right when driven directly.
_SESSION_MARKERS = (b"session_r5", b"session_r4.py", b"session_r3jk.py",
                    b"run_baselines.py", b"probe_r4_bigscene.py",
                    b"probe_r5")


def _session_client_running(markers=_SESSION_MARKERS) -> bool:
    """A measurement-session TPU client (the outage retry loop's attempt)
    is alive: the bench must NOT start a second client next to it (two
    concurrent clients wedge the tunnel; CLAUDE.md). Detected by scanning
    /proc cmdlines — never by pgrep/pkill patterns. `markers` is
    overridable (env PT_BENCH_SESSION_MARKERS, comma-separated) so tests
    can watch a dummy process without colliding with a live session."""
    env_markers = os.environ.get("PT_BENCH_SESSION_MARKERS")
    if env_markers:
        markers = tuple(m.encode() for m in env_markers.split(","))
    try:
        import glob

        for p in glob.glob("/proc/[0-9]*/cmdline"):
            try:
                with open(p, "rb") as f:
                    cmd = f.read().replace(b"\0", b" ")
            except OSError:
                continue
            if any(m in cmd for m in markers):
                return True
    except Exception:  # noqa: BLE001 - detection is best-effort
        pass
    return False


ADOPTED_PATH = "/root/repo/results/adopted_r5.json"


def apply_adoption(wavefront, path=None):
    """Mutate `wavefront`'s tuning globals from an adoption artifact and
    return the parsed artifact (None if no artifact exists). Promotion
    invariant (tested in tests/test_utils.py): applying an artifact that
    encodes the committed defaults must be an exact no-op, so promoting a
    session's winners into wavefront.py cannot drift from what the session
    measured. Callers that already rendered must clear_executable_caches()
    — the globals are read at trace time and are not part of any jit key."""
    path = path or ADOPTED_PATH
    if not os.path.exists(path):
        return None
    with open(path) as f:
        ad = json.load(f)
    wavefront.HYBRID_OCCLUDE_KW = ad.get("occ", wavefront.HYBRID_OCCLUDE_KW)
    wavefront.CTILES_CLOSEST_KW = ad.get(
        "closest_kw", wavefront.CTILES_CLOSEST_KW)
    wavefront.HYBRID_CLOSEST_KW = ad.get(
        "closest_eng", wavefront.HYBRID_CLOSEST_KW)
    wavefront.SHADOW_NOSORT_BOUNCE0 = bool(
        ad.get("nosort_b0", wavefront.SHADOW_NOSORT_BOUNCE0))
    wavefront.CLOSEST_NOSORT_BOUNCE0 = bool(
        ad.get("nosort_b0", wavefront.CLOSEST_NOSORT_BOUNCE0))
    wavefront.HYBRID_CLOSEST_CLUSTER_SIZE = ad.get(
        "hybrid_closest_cluster_size", wavefront.HYBRID_CLOSEST_CLUSTER_SIZE)
    return ad


def _supervise(argv) -> int:
    """Run the bench as a retried subprocess: each attempt is its own TPU
    client that exits cleanly on its own (never killed mid-init — killing a
    client mid-init wedges the tunnel for 10-45+ min). Retry ONLY on the
    known outage signature, with quiet gaps, for up to ~45 min total.

    PT_BENCH_INNER_CMD / PT_BENCH_RETRY_SLEEP / PT_BENCH_DEADLINE_S exist
    so tests can exercise this logic without starting TPU clients.
    """
    retry_sleep = float(os.environ.get("PT_BENCH_RETRY_SLEEP", 300))
    deadline = time.monotonic() + float(
        os.environ.get("PT_BENCH_DEADLINE_S", 45 * 60))
    inner_cmd = os.environ.get("PT_BENCH_INNER_CMD")
    # Stand down the outage retry loop (its session_r3jk shim exits with
    # output when this file exists, which stops the loop) and wait out any
    # session client already mid-flight — never two TPU clients at once.
    # A live RECOVERED session can run 3-4h and produces the round's
    # numbers; waiting is strictly better than colliding with it.
    # Skipped under the PT_BENCH_INNER_CMD test hook: tests must not write
    # the real stop-file and stand down a live outage retry loop.
    if inner_cmd is None or os.environ.get("PT_BENCH_FORCE_STANDDOWN"):
        stopfile = os.environ.get(
            "PT_BENCH_STOPFILE", "/tmp/pt_bench_wants_tpu")
        try:
            with open(stopfile, "w") as f:
                f.write(str(os.getpid()))
        except OSError:
            pass
        # 25 min default (round-5 fix): sessions now checkpoint-and-exit
        # promptly when they see the stop-file, so a long wait is never
        # needed — and the round-4 6h default starved the driver bench
        # (BENCH_r04.json rc=124) by waiting out a 3-4h session inside a
        # ~50-min driver window. If a legacy session ignores the stop-file,
        # giving up after 25 min and failing fast beats a silent rc=124
        # (the longest non-interruptible session unit is the ~23-min cpuref
        # oracle pin; checkpointable 4K chunks are ~19 min).
        session_wait = time.monotonic() + float(
            os.environ.get("PT_BENCH_SESSION_WAIT_S", 25 * 60))
        poll_s = float(os.environ.get("PT_BENCH_SESSION_POLL_S", 60))
        waited = False
        while _session_client_running() and time.monotonic() < session_wait:
            if not waited:
                log("[bench supervisor] a measurement-session TPU client is "
                    "running; waiting for it (one client at a time)")
                waited = True
            time.sleep(poll_s)
        if _session_client_running():
            # NEVER fall through to a second concurrent TPU client (two at
            # once wedges the tunnel for 10-45+ min, CLAUDE.md): report and
            # fail fast instead.
            log("[bench supervisor] session client still alive after the "
                "wait window; refusing to start a second TPU client")
            return 1
        # Unconditional inter-client gap: another client (a session, or the
        # driver's __graft_entry__ check) may have exited moments before the
        # first poll, and the tunnel sometimes wedges when a new client
        # starts right after another exits (CLAUDE.md: >=3 min between
        # clients). The gap cannot be keyed on having observed a client.
        gap_s = float(os.environ.get("PT_BENCH_CLIENT_GAP_S", 180))
        log(f"[bench supervisor] {gap_s:.0f}s inter-client gap before "
            "starting the TPU client")
        time.sleep(gap_s)
        if waited:
            deadline = time.monotonic() + float(
                os.environ.get("PT_BENCH_DEADLINE_S", 45 * 60))

    attempt = 0
    while True:
        attempt += 1
        log(f"[bench supervisor] attempt {attempt}")
        cmd = (
            [sys.executable, "-c", inner_cmd] if inner_cmd
            else [sys.executable, os.path.abspath(__file__), "--_inner",
                  *argv]
        )
        try:
            # Ceiling well above both the normal bench (~15 min incl.
            # compile + one-time first-D2H) and the outage's explicit
            # UNAVAILABLE throw (~30 min): only a genuine wedge hits it.
            proc = subprocess.run(
                cmd, stdout=subprocess.PIPE, stderr=None, timeout=50 * 60,
            )
        except subprocess.TimeoutExpired as e:
            # A hung client means a wedged tunnel; killing it is the
            # documented response, and retrying into a wedge never helps —
            # report and stop.
            out = (e.stdout or b"").decode()
            sys.stdout.write(out)
            log("[bench supervisor] attempt hung past 50 min (tunnel "
                "wedge); giving up")
            return 1
        out = proc.stdout.decode()
        if proc.returncode == 0:
            sys.stdout.write(out)
            sys.stdout.flush()
            return 0
        # stderr already streamed through; decide from the child's stdout
        # tail (the inner run prints outage markers there before exiting).
        is_outage = any(m in out for m in _OUTAGE_MARKERS)
        if not is_outage or time.monotonic() > deadline:
            sys.stdout.write(out)
            log(f"[bench supervisor] giving up (outage={is_outage}, "
                f"rc={proc.returncode})")
            return proc.returncode or 1
        log("[bench supervisor] TPU outage signature; clean-exit retry "
            f"after {retry_sleep:.0f}s quiet")
        time.sleep(retry_sleep)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--subdiv", type=int, default=6)  # 20*4^6 = 81920 tris
    ap.add_argument("--quick", action="store_true", help="tiny config for smoke")
    ap.add_argument("--backend", default=None,
                    help="traversal backend override (worklist/packets/pairs)")
    ap.add_argument("--cluster-size", type=int, default=128)
    ap.add_argument("--_inner", action="store_true",
                    help=argparse.SUPPRESS)  # one supervised attempt
    args = ap.parse_args()
    if not args._inner:
        sys.exit(_supervise(sys.argv[1:]))
    if args.quick:
        args.width, args.height, args.spp, args.subdiv = 320, 180, 2, 3

    import jax

    # Persistent compilation cache: cuts warmup on re-runs in the same
    # container (the r02 bench spent 327s compiling; executables are keyed
    # by program, so identical configs hit the cache across processes).
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001 - older jax: cache is best-effort
        log(f"compilation cache unavailable: {e}")

    import numpy as np

    # Force backend/tunnel init NOW so its cost is not mis-attributed to
    # the scene/accel build (r02 reported "150.2s build"; the same build is
    # <1s on CPU — the timer was absorbing TPU client + tunnel startup).
    t0 = time.perf_counter()
    import jax.numpy as jnp

    try:
        jnp.zeros(()).block_until_ready()
    except RuntimeError as e:
        # Outage signature goes to STDOUT so the supervisor can classify
        # the failure; exit cleanly (a clean exit never wedges the tunnel).
        print(f"backend init failed: {e}", flush=True)
        sys.exit(2)
    log(f"devices: {jax.devices()} (backend init {time.perf_counter() - t0:.1f}s)")

    from path_tracer_ai_tpu.accel.clusters import build_clusters
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.camera import default_camera

    # Apply the adoption artifact, if one exists (written by a measurement
    # session when an unattended on-chip A/B picked new engine toggles not
    # yet promoted to committed defaults — round-4 winners were promoted
    # into wavefront.py in round 5 and that artifact deleted, per policy).
    ad = apply_adoption(wavefront)
    if ad is not None:
        log(f"applied adoption artifact: {ad.get('config')} "
            f"(session-measured {ad.get('mrays')} Mrays/s)")

    sys.path.insert(0, ".")
    from __graft_entry__ import _demo_scene

    t0 = time.perf_counter()
    timings = {}
    host = {}
    scene, accel = _demo_scene(subdivisions=args.subdiv, timings=timings,
                               host_out=host)
    if args.cluster_size != 128:
        accel = build_clusters(host["tris"], cluster_size=args.cluster_size)
    # Build the hybrid closest-path accel from the HOST arrays too, so no
    # device->host pull happens before rendering (the tunnel's first-D2H
    # setup measured 25-270s; it now lands in the warmup's image pull).
    accel_c = None
    s_cl = wavefront.HYBRID_CLOSEST_CLUSTER_SIZE
    if s_cl is not None and s_cl != accel.cluster_size:
        accel_c = build_clusters(host["tris"], cluster_size=s_cl)
    log(
        f"scene: {scene.triangles.count} tris, accel {accel.num_clusters}x"
        f"{accel.cluster_size} ({time.perf_counter() - t0:.2f}s build; "
        + " ".join(f"{k}={v:.2f}" for k, v in timings.items()) + ")"
    )

    # Compiled-mode (non-interpret) Pallas exactness pin: the production
    # closest path runs the fused Pallas tile sweep on TPU; assert its
    # compiled output is BITWISE equal to the XLA sweep on a bounce-like
    # wave, every bench session (CI only covers interpret mode).
    pallas_exact = None
    if jax.default_backend() == "tpu" and not args.quick:
        from path_tracer_ai_tpu.accel import ctiles
        from path_tracer_ai_tpu.core.types import RAY_TMIN

        rng = np.random.default_rng(0)
        nv = 1 << 13
        tv0 = np.asarray(host["tris"].v0)
        ti = rng.choice(tv0.shape[0], nv)
        o = jnp.asarray(tv0[ti] + rng.standard_normal((nv, 3)).astype(np.float32) * 1e-3)
        dn = rng.standard_normal((nv, 3)).astype(np.float32)
        d = jnp.asarray(dn / np.linalg.norm(dn, axis=1, keepdims=True))
        tm = jnp.full((nv,), np.inf, jnp.float32)
        acc = accel_c if accel_c is not None else accel
        t0 = time.perf_counter()
        hx = ctiles.closest_hit_ctiles(acc, o, d, RAY_TMIN, tm, use_pallas=False)
        hp = ctiles.closest_hit_ctiles(acc, o, d, RAY_TMIN, tm, use_pallas=True)
        jax.block_until_ready((hx, hp))
        tx = np.asarray(hx.t).view(np.int32)
        tp = np.asarray(hp.t).view(np.int32)
        closest_exact = bool(
            np.array_equal(tx, tp)
            and np.array_equal(np.asarray(hx.tri), np.asarray(hp.tri))
            and np.array_equal(np.asarray(hx.hit), np.asarray(hp.hit))
        )
        pallas_exact = closest_exact
        log(f"pallas compiled-mode exactness ({nv} rays): {pallas_exact} "
            f"({time.perf_counter() - t0:.1f}s)")
        # Same pin for the fused any-hit shadow cascade, when adopted.
        if wavefront.HYBRID_OCCLUDE_KW.get("engine") == "packets_fused":
            from path_tracer_ai_tpu.accel import pallas_anyhit, traverse

            okw = wavefront.HYBRID_OCCLUDE_KW
            tm_sh = jnp.asarray(
                np.where(np.random.default_rng(1).random(nv) < 0.3, -1.0,
                         8.0).astype(np.float32))
            t0 = time.perf_counter()
            ax = traverse.any_hit_packets(accel, o, d, RAY_TMIN, tm_sh,
                                          block_size=64, group_size=2)
            af = pallas_anyhit.any_hit_fused(
                accel, o, d, RAY_TMIN, tm_sh,
                block_size=okw.get("block_size", 128),
                early_skip=okw.get("early_skip", False),
                sub_skip=okw.get("sub_skip", False),
                exact_cull=okw.get("exact_cull", 0))
            jax.block_until_ready((ax, af))
            anyhit_exact = bool(np.array_equal(np.asarray(ax),
                                               np.asarray(af)))
            log(f"fused any-hit compiled-mode exactness ({nv} rays): "
                f"{anyhit_exact} ({time.perf_counter() - t0:.1f}s)")
            pallas_exact = pallas_exact and anyhit_exact
            if not anyhit_exact:
                log("WARNING: fused any-hit diverged — benching the XLA "
                    "cascade shadow")
                wavefront.HYBRID_OCCLUDE_KW = dict(engine="packets",
                                                   group_size=2)
        # Same pin for the fused closest cascade, when adopted.
        if wavefront.HYBRID_CLOSEST_KW.get("engine") == "cascade_fused":
            from path_tracer_ai_tpu.accel import pallas_closest

            cckw = {k: v for k, v in wavefront.HYBRID_CLOSEST_KW.items()
                    if k != "engine"}
            t0 = time.perf_counter()
            hc = pallas_closest.closest_hit_fused(accel, o, d, RAY_TMIN,
                                                  tm, **cckw)
            jax.block_until_ready(hc)
            cascade_exact = bool(
                np.array_equal(np.asarray(hc.t).view(np.int32), tx)
                and np.array_equal(np.asarray(hc.tri), np.asarray(hx.tri))
            )
            log(f"fused closest-cascade compiled-mode exactness ({nv} "
                f"rays): {cascade_exact} ({time.perf_counter() - t0:.1f}s)")
            pallas_exact = pallas_exact and cascade_exact
            if not cascade_exact:
                log("WARNING: fused closest cascade diverged — benching "
                    "the ctiles closest path")
                wavefront.HYBRID_CLOSEST_KW = dict(engine="ctiles")
        if not closest_exact:
            # Divergence is a real bug (images must stay bit-identical
            # across sweeps) — but the headline bench must still produce a
            # number, so demote the closest path to the XLA sweep and
            # surface the failure in the JSON line instead of dying.
            log("WARNING: Pallas sweep diverged — benching the XLA sweep")
            wavefront.CTILES_CLOSEST_KW = dict(wavefront.CTILES_CLOSEST_KW,
                                               use_pallas=False)

    camera = default_camera()
    settings = RenderSettings(
        width=args.width, height=args.height, samples_per_pixel=args.spp,
        max_bounces=args.bounces, seed=0,
    )

    # Warmup/compile pass with IDENTICAL settings: live-lane compaction
    # compiles one bounce executable per power-of-2 bucket size, and bucket
    # sizes depend on per-sample live counts — an identical warmup render
    # guarantees every executable the timed pass needs is already cached.
    warm = settings.replace(samples_per_pixel=min(args.spp, 2))
    t0 = time.perf_counter()
    wavefront.render(scene, camera, warm, accel=accel, block_size=64,
                     wave_size=1 << 20, backend=args.backend,
                     accel_closest=accel_c)
    log(f"warmup (compile) pass: {time.perf_counter() - t0:.1f}s")

    stats = wavefront.RenderStats()
    t0 = time.perf_counter()
    img = wavefront.render(scene, camera, settings, accel=accel, stats=stats,
                           block_size=64, wave_size=1 << 20,
                           backend=args.backend, accel_closest=accel_c)
    wall = time.perf_counter() - t0
    log(
        f"render {args.width}x{args.height}@{args.spp}spp/{args.bounces}b: "
        f"{wall:.2f}s, {stats.total_rays/1e6:.1f}M rays, "
        f"{stats.mrays_per_s:.2f} Mrays/s"
    )
    assert np.isfinite(img).all()

    result = {
        "metric": "Mrays/s/chip (1080p procedural IronMan-class scene, wavefront engine)",
        "value": round(stats.mrays_per_s, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(stats.mrays_per_s / 100.0, 4),
    }
    if pallas_exact is not None:
        result["pallas_compiled_exact"] = pallas_exact
    print(json.dumps(result))


if __name__ == "__main__":
    main()
