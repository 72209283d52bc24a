"""Round-3 probe E: big-scene routing — 1.3M-triangle blob (subdiv 8).

VERDICT task 4: default_backend() routes >2048-cluster scenes to the
worklist, which measured 0.67 Mrays/s e2e in round 2; ctiles now has the
2-level per-ray cull (levels=2 auto past 2048 clusters). Measure, on the
1.3M-tri scene (10k clusters at S=128):
  1. closest wave-level: worklist vs ctiles-2level (xla/pallas).
  2. shadow wave-level: packets (the big-scene cascade) sorted/unsorted.
  3. e2e 1080p@2spp/5b: worklist backend vs hybrid (2-level ctiles
     closest + packet shadow) — the routing decision, recorded.
--cpu for smoke.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def emit(**kw):
    print(json.dumps(kw), flush=True)


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

from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel import ctiles, traverse, worklist
from path_tracer_ai_tpu.accel.clusters import build_clusters
from path_tracer_ai_tpu.core.types import RAY_TMIN

t0 = time.perf_counter()
scene, accel = _demo_scene(subdivisions=4 if smoke else 8)
emit(probe="scene", tris=int(scene.triangles.count),
     clusters=accel.num_clusters, build_s=round(time.perf_counter() - t0, 1))

rng = np.random.default_rng(0)
N = 1 << 12 if smoke else 1 << 20
tv0 = np.asarray(scene.triangles.v0)
ntri = tv0.shape[0]


def bounce_wave(n, dead_frac=0.35):
    ti = rng.choice(ntri, n)
    o = tv0[ti] + rng.standard_normal((n, 3)).astype(np.float32) * 1e-3
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tm = np.full(n, np.inf, np.float32)
    tm[rng.random(n) < dead_frac] = -1.0
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm)


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


ow, dw, tw = bounce_wave(N)
live_b = int(jnp.sum(tw >= 0))

KW = dict(cap=48, tile_chunk=256 if smoke else 2048,
          fallback_compact=1 << 13)
ipkw = dict(interpret=True) if smoke else {}

# ---- 1. closest wave-level ----
dt, cs, hw = timeit(lambda: worklist.closest_hit_worklist(
    accel, ow, dw, RAY_TMIN, tw, cap=96, item_budget=8))
emit(probe="closest_big", engine="worklist", ms=round(dt * 1e3, 1),
     mrays=round(live_b / dt / 1e6, 2), compile_s=round(cs, 1))

for tag, kw in [("ct2l_xla", dict(KW)),
                ("ct2l_pallas", dict(KW, use_pallas=True, **ipkw))]:
    try:
        dt, cs, out = timeit(lambda: ctiles.closest_hit_ctiles(
            accel, ow, dw, RAY_TMIN, tw, levels=2, super_cap=48, **kw))
        emit(probe="closest_big", engine=tag, ms=round(dt * 1e3, 1),
             mrays=round(live_b / dt / 1e6, 2), compile_s=round(cs, 1))
        emit(probe="exact_big", engine=tag,
             tri_mismatch=int(jnp.sum(out.tri != hw.tri)),
             hit_mismatch=int(jnp.sum(out.hit != hw.hit)))
    except Exception as e:  # noqa: BLE001
        emit(probe="closest_big", engine=tag, error=str(e)[:300])

# ---- 2b. small-scene shadow cascade block-size sweep (shadow is 55-60%
# of bounce time; tighter per-block unions at b=8/16 light-major could cut
# cascade tests ~3x at the price of a wider cull) ----
if "--shadow-sweep" in sys.argv or not smoke:
    scene_s, accel_s = _demo_scene(subdivisions=3 if smoke else 6)
    accel_s = build_clusters(scene_s.triangles, cluster_size=128)
    tv0s = np.asarray(scene_s.triangles.v0)
    from path_tracer_ai_tpu.scene.scene import DEFAULT_LIGHTS

    nv = (N // 4)
    ti = np.sort(rng.choice(tv0s.shape[0], nv))
    pp = tv0s[ti] + rng.standard_normal((nv, 3)).astype(np.float32) * 1e-3
    lights = np.asarray([l[0] for l in DEFAULT_LIGHTS], np.float32)
    osh = np.tile(pp, (4, 1))
    lv = lights[:, None, :] - pp[None, :, :]
    dist = np.linalg.norm(lv, axis=-1)
    dsh = (lv / np.maximum(dist, 1e-30)[..., None]).reshape(-1, 3)
    tsh = (dist - 1e-3).reshape(-1).astype(np.float32)
    tsh[rng.random(tsh.shape[0]) < 0.3] = -1.0
    osh, dsh, tsh = jnp.asarray(osh), jnp.asarray(dsh), jnp.asarray(tsh)
    live_sh = int(jnp.sum(tsh >= 0))
    for bs, gs in [(64, 8), (32, 4), (16, 4), (16, 2), (8, 4), (8, 2)]:
        try:
            dt, cs, _ = timeit(lambda: traverse.any_hit_packets(
                accel_s, osh, dsh, RAY_TMIN, tsh, block_size=bs,
                group_size=gs))
            emit(probe="shadow5", engine=f"b{bs}_g{gs}",
                 ms=round(dt * 1e3, 1), mrays=round(live_sh / dt / 1e6, 2),
                 compile_s=round(cs, 1))
        except Exception as e:  # noqa: BLE001
            emit(probe="shadow5", engine=f"b{bs}_g{gs}", error=str(e)[:200])

log("wave section complete")
if "--no-e2e" in sys.argv:
    sys.exit(0)

# ---- 3. e2e routing decision ----
from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.engine import wavefront
from path_tracer_ai_tpu.scene.camera import default_camera

cam = default_camera()
W, H = (320, 180) if smoke else (1920, 1080)
settings = RenderSettings(width=W, height=H, samples_per_pixel=2,
                          max_bounces=5, seed=0)


def e2e(tag, backend, closest_kw=None, occ_kw=None):
    if closest_kw is not None:
        wavefront.CTILES_CLOSEST_KW = closest_kw
    if occ_kw is not None:
        wavefront.HYBRID_OCCLUDE_KW = occ_kw
    wavefront.clear_executable_caches()
    t0 = time.perf_counter()
    wavefront.render(scene, cam, settings, accel=accel, block_size=64,
                     wave_size=1 << (14 if smoke else 20), backend=backend)
    warm_s = time.perf_counter() - t0
    stats = wavefront.RenderStats()
    t0 = time.perf_counter()
    img = wavefront.render(scene, cam, settings, accel=accel, stats=stats,
                           block_size=64,
                           wave_size=1 << (14 if smoke else 20),
                           backend=backend)
    assert np.isfinite(img).all()
    emit(probe="e2e_big", config=tag, mrays=round(stats.mrays_per_s, 2),
         warm_s=round(warm_s, 1), render_s=round(time.perf_counter() - t0, 1))
    return img


img_w = e2e("worklist", "worklist")
img_h = e2e("hybrid_2level", "hybrid",
            closest_kw=dict(KW, levels=2, super_cap=48,
                            use_pallas=not smoke, **ipkw),
            occ_kw=dict(engine="packets", group_size=2))
emit(probe="e2e_big_same_image", identical=bool(np.array_equal(img_w, img_h)))
log("probe E complete")
