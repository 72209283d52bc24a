"""Round-3 probe G: shadow g2 adoption A/B + big-scene routing (task 4).

Probe F (TPU) settled the wave-level questions: b64_g2 shadow wins +8%
(6.75 vs 6.24 Mrays/s), small blocks collapse on TPU (b16 3.4, and OOM at
in-render wave sizes), the S=64 shadow accel loses, and the compiled
Pallas closest sweep is bitwise-exact and fastest (255.7 vs 301.8 ms).
Probe F died compiling the (moot) b16 e2e config before the e2e g2 A/B
and the big-scene section — this probe finishes those two:

  1. e2e 1080p@2spp/5b hybrid: shadow g8 (default) vs g2, same session,
     images must be bit-identical.
  2. big scene (subdiv 8, 1.3M tris): e2e worklist (current >2048-cluster
     route) vs hybrid with 2-level ctiles cull — the routing decision
     VERDICT task 4 asks to record.

Usage: python scripts/probe_r3g.py [--cpu] [--no-big] [--no-e2e]
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
t0 = time.perf_counter()
_ = np.asarray(jnp.ones((8,), jnp.float32))
emit(probe="init", platform=jax.devices()[0].platform,
     first_d2h_s=round(time.perf_counter() - t0, 1))

from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel.clusters import build_clusters
from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.engine import wavefront
from path_tracer_ai_tpu.scene.camera import default_camera

cam = default_camera()
W, H = (320, 180) if smoke else (1920, 1080)
settings = RenderSettings(width=W, height=H, samples_per_pixel=2,
                          max_bounces=5, seed=0)
wave = 1 << (14 if smoke else 20)
ipkw = dict(use_pallas=False) if smoke else {}

# ---- 1. e2e shadow group-size adoption A/B ----------------------------
if "--no-e2e" not in sys.argv:
    host = {}
    scene, accel = _demo_scene(subdivisions=3 if smoke else 6,
                               host_out=host)
    accel_c = build_clusters(host["tris"], cluster_size=256)
    emit(probe="scene", tris=int(scene.triangles.count),
         clusters=accel.num_clusters)

    def e2e(tag, occ_kw):
        wavefront.HYBRID_OCCLUDE_KW = occ_kw
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

    img_a = e2e("shadow_g8", dict(engine="packets"))
    img_b = e2e("shadow_g2", dict(engine="packets", group_size=2))
    emit(probe="e2e_same_image",
         identical=bool(np.array_equal(img_a, img_b)))
    log("e2e section complete")

# ---- 2. big-scene routing (VERDICT task 4) ----------------------------
if "--no-big" not in sys.argv:
    host_b = {}
    t0 = time.perf_counter()
    scene_b, accel_b = _demo_scene(subdivisions=4 if smoke else 8,
                                   host_out=host_b)
    emit(probe="big_scene", tris=int(scene_b.triangles.count),
         clusters=accel_b.num_clusters,
         build_s=round(time.perf_counter() - t0, 1))

    def e2e_big(tag, backend, occ_kw=None, closest_kw=None):
        if occ_kw is not None:
            wavefront.HYBRID_OCCLUDE_KW = occ_kw
        if closest_kw is not None:
            wavefront.CTILES_CLOSEST_KW = closest_kw
        wavefront.clear_executable_caches()
        t0 = time.perf_counter()
        wavefront.render(scene_b, cam, settings, accel=accel_b,
                         block_size=64, wave_size=wave, backend=backend)
        warm_s = time.perf_counter() - t0
        stats = wavefront.RenderStats()
        t0 = time.perf_counter()
        img = wavefront.render(scene_b, cam, settings, accel=accel_b,
                               stats=stats, block_size=64, wave_size=wave,
                               backend=backend)
        assert np.isfinite(img).all()
        emit(probe="e2e_big", config=tag,
             mrays=round(stats.mrays_per_s, 2), warm_s=round(warm_s, 1),
             render_s=round(time.perf_counter() - t0, 1))
        return img

    try:
        img_w = e2e_big("worklist", "worklist")
    except Exception as e:  # noqa: BLE001
        emit(probe="e2e_big", config="worklist", error=str(e)[:200])
        img_w = None
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
    log("big-scene section complete")

log("probe G complete")
