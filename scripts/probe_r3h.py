"""Round-3 probe H: big-scene routing retry at smaller wave sizes.

Probe G's big-scene section (1.31M tris, 10241 clusters) died in REMOTE
COMPILE on both candidate backends at wave 2^20 (`tpu_compile_helper
subprocess exit code 1`, HTTP 500) — a TPU-compiler-internal failure, not
a trace error. Hypothesis: executable/buffer scale (the worklist tables
are [2^20, cap=96] i32 ~= 400MB; several such live at once). This probe
retries the VERDICT-task-4 routing A/B at wave 2^18 (tables shrink 4x),
escalating to 2^19 only if 2^18 compiles and renders.

Usage: python scripts/probe_r3h.py [--cpu] [--wave N_LOG2]
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
wave_log2 = 18
if "--wave" in sys.argv:
    wave_log2 = int(sys.argv[sys.argv.index("--wave") + 1])

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
from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.engine import wavefront
from path_tracer_ai_tpu.scene.camera import default_camera

cam = default_camera()
W, H = (320, 180) if smoke else (1920, 1080)
settings = RenderSettings(width=W, height=H, samples_per_pixel=2,
                          max_bounces=5, seed=0)
wave = 1 << (14 if smoke else wave_log2)
ipkw = dict(use_pallas=False) if smoke else {}

host_b = {}
t0 = time.perf_counter()
scene_b, accel_b = _demo_scene(subdivisions=4 if smoke else 8,
                               host_out=host_b)
emit(probe="big_scene", tris=int(scene_b.triangles.count),
     clusters=accel_b.num_clusters,
     build_s=round(time.perf_counter() - t0, 1), wave_log2=wave_log2)


def e2e_big(tag, backend, occ_kw=None, closest_kw=None, wv=wave):
    if occ_kw is not None:
        wavefront.HYBRID_OCCLUDE_KW = occ_kw
    if closest_kw is not None:
        wavefront.CTILES_CLOSEST_KW = closest_kw
    wavefront.clear_executable_caches()
    t0 = time.perf_counter()
    wavefront.render(scene_b, cam, settings, accel=accel_b,
                     block_size=64, wave_size=wv, backend=backend)
    warm_s = time.perf_counter() - t0
    stats = wavefront.RenderStats()
    t0 = time.perf_counter()
    img = wavefront.render(scene_b, cam, settings, accel=accel_b,
                           stats=stats, block_size=64, wave_size=wv,
                           backend=backend)
    assert np.isfinite(img).all()
    emit(probe="e2e_big", config=tag, wave_log2=int(np.log2(wv)),
         mrays=round(stats.mrays_per_s, 2), warm_s=round(warm_s, 1),
         render_s=round(time.perf_counter() - t0, 1))
    return img


img_w = None
try:
    img_w = e2e_big("worklist", "worklist")
except Exception as e:  # noqa: BLE001
    emit(probe="e2e_big", config="worklist", error=str(e)[:200])
try:
    img_h = e2e_big(
        "hybrid_2level", "hybrid",
        occ_kw=dict(engine="packets", group_size=2),
        closest_kw=dict(cap=48, tile_chunk=2048,
                        fallback_compact=1 << 13, levels=2,
                        super_cap=48, **ipkw))
    if img_w is not None:
        emit(probe="e2e_big_same_image",
             identical=bool(np.array_equal(img_w, img_h)))
except Exception as e:  # noqa: BLE001
    emit(probe="e2e_big", config="hybrid_2level", error=str(e)[:200])

# Escalate to 2^19 only if both 2^18 executables compiled (bigger waves
# amortize the ~2.7ms dispatch latency — worth one extra data point).
if img_w is not None and not smoke and wave_log2 == 18:
    try:
        e2e_big("worklist_w19", "worklist", wv=1 << 19)
    except Exception as e:  # noqa: BLE001
        emit(probe="e2e_big", config="worklist_w19", error=str(e)[:200])

log("probe H complete")
