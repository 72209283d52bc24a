"""Round-5 probe: closest-wave outro levers + MXU row + e2e adjudication.

VERDICT r4 tasks 2 & 3 in one client:

  1. closest wave-level A/B (2^20 rays, S=256 accel, Pallas tile sweep —
     the production closest path): prod vs fallback_sorted (overflow
     completed in the SORTED domain before the unsort, so the packed
     unsort carries (t, tri) instead of (t, tri, over) — probe K measured
     the 3-col unsort at ~50.8 ms/2^20 wave, so the expected win is
     ~1/3 of that plus the pre-slice overflow select). Bitwise gate.
  2. MXU intersector rows for the ceiling plan (first on-chip
     measurement): worklist closest with the elementwise VPU sweep vs
     accel.mxu's matmul decomposition at HIGHEST and HIGH precision.
     NOT gated — the MXU path rounds differently by contract (opt-in,
     docs/ARCHITECTURE.md ceiling plan); rows record mismatch counts and
     max |dt|/t so the plan's tolerance contract is grounded in data.
  3. e2e 1080p@2spp/5b hybrid vs the promoted round-4 production
     (packets g2 + bounce-0 nosort): occ xla_b128_g2 (wave-level +3% in
     r4, adjudicated e2e here) | closest fallback_sorted |
     combo | fallback_compact right-size (4096). Image bitwise gates;
     the adoption decision is scripts/adoption_r5.py.

Honors the bench stop-file between e2e configs (the driver bench must
never be starved — BENCH_r04 rc=124 lesson).

Usage: python scripts/probe_r5.py [--cpu] [--no-e2e]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def stop_requested():
    return os.path.exists(os.environ.get(
        "PT_BENCH_STOPFILE", "/tmp/pt_bench_wants_tpu"))


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
t0 = time.perf_counter()
_ = np.asarray(jnp.ones((8,), jnp.float32))
emit(probe="init", platform=jax.devices()[0].platform,
     first_d2h_s=round(time.perf_counter() - t0, 1))

from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel import ctiles, worklist
from path_tracer_ai_tpu.accel.clusters import build_clusters
from path_tracer_ai_tpu.core.types import RAY_TMIN

host = {}
scene, accel = _demo_scene(subdivisions=3 if smoke else 6, host_out=host)
accel_c = build_clusters(host["tris"], cluster_size=256)
emit(probe="scene", tris=int(scene.triangles.count),
     clusters=accel.num_clusters)

rng = np.random.default_rng(0)
N = 1 << 12 if smoke else 1 << 20
tv0 = np.asarray(host["tris"].v0)
ntri = tv0.shape[0]


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


# ---- 1. closest outro A/B (production path: ctiles Pallas tile sweep) ----
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
ckw_base = dict(cap=48, tile_chunk=2048, fallback_compact=1 << 13)
ref_cl = None


def closest_case(tag, acc=accel_c, probe="closest_outro", **kw):
    global ref_cl
    try:
        dt, cs, hit = timeit(lambda: ctiles.closest_hit_ctiles(
            acc, ocl_j, dcl_j, RAY_TMIN, tcl_j, **ckw_base, **kw))
        row = dict(probe=probe, engine=tag, ms=round(dt * 1e3, 1),
                   mrays=round(live_cl / dt / 1e6, 2),
                   compile_s=round(cs, 1))
        if ref_cl is None:
            ref_cl = hit
        else:
            row["mismatch_t"] = int(jnp.sum(hit.t != ref_cl.t))
            row["mismatch_tri"] = int(jnp.sum(hit.tri != ref_cl.tri))
        emit(**row)
        return hit
    except Exception as e:  # noqa: BLE001
        emit(probe=probe, engine=tag, error=str(e)[:300])
        return None


pkw = dict(use_pallas=True, interpret=smoke)
closest_case("pallas_prod", **pkw)
closest_case("pallas_fbsorted", fallback_sorted=True, **pkw)
# tight-cap control: force a real overflow population through both outro
# paths on chip (production cap=48 rarely overflows, which would make the
# fbsorted row trivially identical)
ckw_tight = dict(ckw_base, cap=16)
try:
    dt0, _, h0 = timeit(lambda: ctiles.closest_hit_ctiles(
        accel_c, ocl_j, dcl_j, RAY_TMIN, tcl_j,
        **dict(ckw_tight, **pkw)))
    dt1, _, h1 = timeit(lambda: ctiles.closest_hit_ctiles(
        accel_c, ocl_j, dcl_j, RAY_TMIN, tcl_j,
        **dict(ckw_tight, fallback_sorted=True, **pkw)))
    emit(probe="closest_outro_cap16", ms_prod=round(dt0 * 1e3, 1),
         ms_fbsorted=round(dt1 * 1e3, 1),
         mismatch_t=int(jnp.sum(h0.t != h1.t)),
         mismatch_tri=int(jnp.sum(h0.tri != h1.tri)))
except Exception as e:  # noqa: BLE001
    emit(probe="closest_outro_cap16", error=str(e)[:300])
log("closest outro section complete")

# ---- 2. MXU intersector rows (ceiling plan, base accel) ------------------
ref_wl = None


def wl_case(tag, **kw):
    global ref_wl
    try:
        dt, cs, hit = timeit(lambda: worklist.closest_hit_worklist(
            accel, ocl_j, dcl_j, RAY_TMIN, tcl_j, **kw))
        row = dict(probe="closest_mxu", engine=tag, ms=round(dt * 1e3, 1),
                   mrays=round(live_cl / dt / 1e6, 2),
                   compile_s=round(cs, 1))
        if ref_wl is None:
            ref_wl = hit
        else:
            live = np.asarray(tcl_j >= 0)
            t0v = np.asarray(ref_wl.t)[live]
            t1v = np.asarray(hit.t)[live]
            both = np.isfinite(t0v) & np.isfinite(t1v)
            rel = (np.abs(t1v[both] - t0v[both])
                   / np.maximum(np.abs(t0v[both]), 1e-30))
            row["mismatch_t"] = int((t0v != t1v).sum())
            row["mismatch_tri"] = int(
                (np.asarray(ref_wl.tri)[live] != np.asarray(hit.tri)[live])
                .sum())
            row["hit_disagree"] = int(
                (np.isfinite(t0v) != np.isfinite(t1v)).sum())
            row["max_rel_dt"] = float(rel.max()) if both.any() else 0.0
        emit(**row)
    except Exception as e:  # noqa: BLE001
        emit(probe="closest_mxu", engine=tag, error=str(e)[:300])


wl_case("wl_vpu")
wl_case("wl_mxu_highest", intersector="mxu:highest")
wl_case("wl_mxu_high", intersector="mxu:high")
if not smoke:
    wl_case("wl_mxu_default", intersector="mxu:default")
log("mxu section complete")

# ---- 3. e2e adoption A/B --------------------------------------------------
if "--no-e2e" not in sys.argv and not smoke:
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.camera import default_camera

    cam = default_camera()
    settings = RenderSettings(width=1920, height=1080, samples_per_pixel=2,
                              max_bounces=5, seed=0)
    wave = 1 << 20
    # snapshot the promoted production defaults (restored between configs)
    OCC0 = dict(wavefront.HYBRID_OCCLUDE_KW)
    CKW0 = dict(wavefront.CTILES_CLOSEST_KW)

    def e2e(tag, occ_kw=None, closest_kw=None):
        wavefront.HYBRID_OCCLUDE_KW = dict(occ_kw or OCC0)
        wavefront.CTILES_CLOSEST_KW = dict(closest_kw or CKW0)
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
        emit(probe="e2e", config=tag, mrays=round(best[0], 2),
             warm_s=round(warm_s, 1), render_s=round(best[1], 1))
        return img

    try:
        img_a = e2e("prod_r5")
        cases = [
            ("occ_b128_g2", "e2e_same_image_b128_g2",
             dict(engine="packets", group_size=2, block_size=128), None),
            ("closest_fbsorted", "e2e_same_image_fbsorted",
             None, dict(CKW0, fallback_sorted=True)),
            ("combo_b128_fbsorted", "e2e_same_image_combo",
             dict(engine="packets", group_size=2, block_size=128),
             dict(CKW0, fallback_sorted=True)),
            ("closest_fbsorted_fc12", "e2e_same_image_fbsorted_fc12",
             None, dict(CKW0, fallback_sorted=True,
                        fallback_compact=1 << 12)),
        ]
        for tag, gate, occ_kw, ckw in cases:
            if stop_requested():
                emit(probe="e2e_stopped", before=tag,
                     reason="bench stop-file present")
                break
            img_b = e2e(tag, occ_kw=occ_kw, closest_kw=ckw)
            emit(probe=gate,
                 identical=bool(np.array_equal(img_a, img_b)))
    except Exception as e:  # noqa: BLE001
        emit(probe="e2e", error=str(e)[:300])
    finally:
        wavefront.HYBRID_OCCLUDE_KW = dict(OCC0)
        wavefront.CTILES_CLOSEST_KW = dict(CKW0)
        wavefront.clear_executable_caches()

log("probe r5 complete")
