"""Round-5 client B: pair_split adjudication, then the big-scene probe.

ONE TPU process (tunnel rules, CLAUDE.md), ordered so the highest-risk
section runs LAST:

  1. union histogram — per-block candidate-union percentiles on the real
     production wave shape (decides whether the pair_split tail budget
     nb//8 is safe, and documents the distribution the 41ms pairs stage
     pays cap=48 for).
  2. pair_split wave A/B — production ctiles Pallas tile sweep vs
     pair_split at H in {12, 16} on a 2^20 closest wave (same synthetic
     wave construction as probe_r5 so rows are comparable). Gate: exact
     t/tri equality (the split only reorders pairs within a cluster; the
     resolve is an order-independent lexicographic (t, tri) min).
  3. pair_split e2e A/B — 1080p@2spp/5b hybrid render, prod defaults vs
     the best wave-level H. Gate: bitwise image identity.
  4. big-scene stage-bisect + escalating e2e (probe_r4_bigscene,
     --max-wave 16 — 2^18 hung a round-3 remote compile; never kill this
     section mid-compile).

Every section checks the driver-bench stop-file first and yields.

Usage: python scripts/session_r5b.py [--cpu] [--skip-bigscene]
                                     [--skip-split]
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
jnp.zeros(()).block_until_ready()
t0 = time.perf_counter()
_ = np.asarray(jnp.ones((8,), jnp.float32))
emit(probe="init", platform=jax.devices()[0].platform,
     first_d2h_s=round(time.perf_counter() - t0, 1))

from __graft_entry__ import _demo_scene  # noqa: E402
from path_tracer_ai_tpu.accel import ctiles  # noqa: E402
from path_tracer_ai_tpu.accel.clusters import build_clusters  # noqa: E402
from path_tracer_ai_tpu.core.types import RAY_TMIN  # noqa: E402
from path_tracer_ai_tpu.engine import wavefront  # noqa: E402

host = {}
scene, accel = _demo_scene(subdivisions=3 if smoke else 6, host_out=host)
accel_c = build_clusters(host["tris"], cluster_size=256)
emit(probe="scene", tris=int(scene.triangles.count),
     clusters=accel.num_clusters, clusters_c=accel_c.num_clusters)

rng = np.random.default_rng(0)
N = 1 << 12 if smoke else 1 << 20
tv0 = np.asarray(host["tris"].v0)
ntri = tv0.shape[0]

# probe_r5's closest-wave construction (comparable rows): 30% dead lanes,
# origins jittered off triangle surfaces, isotropic directions.
nv = N // 4
ti = np.sort(rng.choice(ntri, nv))
pp = tv0[ti] + rng.standard_normal((nv, 3)).astype(np.float32) * 1e-3
dcl = rng.standard_normal((N, 3)).astype(np.float32)
dcl /= np.linalg.norm(dcl, axis=1, keepdims=True)
ocl = np.tile(pp, (4, 1)) + 1e-3 * dcl
tcl = np.full(N, np.inf, np.float32)
tcl[rng.random(N) < 0.3] = -1.0
ocl_j, dcl_j, tcl_j = jnp.asarray(ocl), jnp.asarray(dcl), jnp.asarray(tcl)
live_cl = int(jnp.sum(tcl_j >= 0))


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


# ---------------------------------------------------------------------------
# 1. union-size histogram on the production wave shape
# ---------------------------------------------------------------------------
if not stop_requested():
    try:
        from path_tracer_ai_tpu.accel.worklist import _prepare_blocks

        @jax.jit
        def union_sizes(acc, o, d, t):
            ob, db, tb, _, _ = _prepare_blocks(acc, o, d, t, 8, True,
                                               "octorig")
            _, n_cand = ctiles._ray_masks(acc, ob, db, tb, RAY_TMIN,
                                          1 << 11)
            return n_cand

        nc = np.asarray(union_sizes(accel_c, ocl_j, dcl_j, tcl_j))
        nb = nc.shape[0]
        livec = nc[nc > 0]
        emit(probe="union_hist", nb=int(nb), live_blocks=int(livec.size),
             mean=round(float(livec.mean()), 2),
             p50=int(np.percentile(livec, 50)),
             p90=int(np.percentile(livec, 90)),
             p99=int(np.percentile(livec, 99)),
             max=int(livec.max()),
             frac_gt8=round(float((nc > 8).mean()), 4),
             frac_gt12=round(float((nc > 12).mean()), 4),
             frac_gt16=round(float((nc > 16).mean()), 4),
             tail_budget=nb // 8)
    except Exception as e:  # noqa: BLE001
        emit(probe="union_hist", error=str(e)[:300])

# ---------------------------------------------------------------------------
# 2. pair_split wave-level A/B (production Pallas tile sweep)
# ---------------------------------------------------------------------------
best_h = None
if "--skip-split" not in ARGS and not stop_requested():
    ckw_base = dict(wavefront.CTILES_CLOSEST_KW)
    pkw = dict(use_pallas=not smoke, interpret=smoke)
    ref = None
    rows = {}
    for tag, kw in [("prod", {}), ("split8", dict(pair_split=8)),
                    ("split12", dict(pair_split=12)),
                    ("split16", dict(pair_split=16))]:
        if stop_requested():
            emit(probe="pair_split_wave", engine=tag,
                 status="skipped: stop-file")
            break
        try:
            dt, cs, hit = timeit(lambda: ctiles.closest_hit_ctiles(
                accel_c, ocl_j, dcl_j, RAY_TMIN, tcl_j,
                **ckw_base, **pkw, **kw))
            row = dict(probe="pair_split_wave", engine=tag,
                       ms=round(dt * 1e3, 1),
                       mrays=round(live_cl / dt / 1e6, 2),
                       compile_s=round(cs, 1))
            if ref is None:
                ref = hit
            else:
                row["mismatch_t"] = int(jnp.sum(hit.t != ref.t))
                row["mismatch_tri"] = int(jnp.sum(hit.tri != ref.tri))
                if row["mismatch_t"] == 0 and row["mismatch_tri"] == 0:
                    rows[tag] = dt
            emit(**row)
        except Exception as e:  # noqa: BLE001
            emit(probe="pair_split_wave", engine=tag, error=str(e)[:300])
    if rows:
        best_tag = min(rows, key=rows.get)
        best_h = int(best_tag.replace("split", ""))
        emit(probe="pair_split_wave_best", engine=best_tag,
             ms=round(rows[best_tag] * 1e3, 1))

# ---------------------------------------------------------------------------
# 3. pair_split e2e A/B (only if a split config won wave-level cleanly)
# ---------------------------------------------------------------------------
if best_h is not None and not smoke and not stop_requested():
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.scene.camera import default_camera

    cam = default_camera()
    settings = RenderSettings(width=1920, height=1080, samples_per_pixel=2,
                              max_bounces=5, seed=0)
    wave = 1 << 20
    CKW0 = dict(wavefront.CTILES_CLOSEST_KW)

    def e2e(tag, ckw):
        wavefront.CTILES_CLOSEST_KW = dict(ckw)
        wavefront.clear_executable_caches()
        t0 = time.perf_counter()
        wavefront.render(scene, cam, settings, accel=accel, block_size=64,
                         wave_size=wave, backend="hybrid",
                         accel_closest=accel_c)
        warm_s = time.perf_counter() - t0
        best = None
        img = None
        for _ in range(2):
            stats = wavefront.RenderStats()
            t0 = time.perf_counter()
            img = wavefront.render(scene, cam, settings, accel=accel,
                                   stats=stats, block_size=64,
                                   wave_size=wave, backend="hybrid",
                                   accel_closest=accel_c)
            if best is None or stats.mrays_per_s > best[0]:
                best = (stats.mrays_per_s, time.perf_counter() - t0)
        assert np.isfinite(img).all()
        emit(probe="e2e_split", config=tag, mrays=round(best[0], 2),
             warm_s=round(warm_s, 1), render_s=round(best[1], 1))
        return best[0], img

    try:
        m_prod, img_a = e2e("prod_r5", CKW0)
        m_split, img_b = e2e(f"pair_split{best_h}",
                             dict(CKW0, pair_split=best_h))
        identical = bool(np.array_equal(img_a, img_b))
        emit(probe="e2e_split_gate", identical=identical,
             prod=round(m_prod, 2), split=round(m_split, 2),
             h=best_h, wins=bool(identical and m_split > m_prod))
    except Exception as e:  # noqa: BLE001
        emit(probe="e2e_split", error=str(e)[:300])
    finally:
        wavefront.CTILES_CLOSEST_KW = dict(CKW0)
        wavefront.clear_executable_caches()

# ---------------------------------------------------------------------------
# 4. big-scene stage-bisect + escalating e2e (HANG RISK — last)
# ---------------------------------------------------------------------------
if "--skip-bigscene" not in ARGS and not stop_requested():
    argv = ["/root/repo/scripts/probe_r4_bigscene.py", "--max-wave", "16"]
    if smoke:
        argv.append("--cpu")
    sys.argv = argv
    t0 = time.perf_counter()
    try:
        runpy.run_path(argv[0], run_name="__main__")
        status = "ok"
    except SystemExit as e:
        status = f"exit {e.code}" if e.code else "ok"
    except Exception as e:  # noqa: BLE001
        status = f"error: {e}"[:300]
    emit(probe="bigscene_section", status=status,
         wall_s=round(time.perf_counter() - t0, 1))

emit(probe="session_b_done")
