"""Round-3 probe L: big-scene routing A/B, compile-failure workarounds.

Probes G/H hit an axon remote-compile scaling failure on the 1.31M-tri /
10241-cluster scene (HTTP 500 at wave 2^20, >64-min hang at 2^18). The
CPU backend compiles and bit-matches, so the engine is sound; the axon
compiler chokes somewhere that scales with cluster count x wave size.
This probe shrinks both: wave 2^16, and a second accel at S=256 (5121
clusters) — if either compiles, VERDICT task 4 finally gets its
measured big-scene e2e number.

Usage: python scripts/probe_r3l.py [--cpu]
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
from path_tracer_ai_tpu.accel.clusters import build_clusters
from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.engine import wavefront
from path_tracer_ai_tpu.scene.camera import default_camera

cam = default_camera()
W, H = (320, 180) if smoke else (1920, 1080)
settings = RenderSettings(width=W, height=H, samples_per_pixel=2,
                          max_bounces=5, seed=0)
wave = 1 << (12 if smoke else 16)

host_b = {}
t0 = time.perf_counter()
scene_b, accel_b = _demo_scene(subdivisions=4 if smoke else 8,
                               host_out=host_b)
accel_b256 = build_clusters(host_b["tris"], cluster_size=256)
emit(probe="big_scene", tris=int(scene_b.triangles.count),
     clusters_s128=accel_b.num_clusters, clusters_s256=accel_b256.num_clusters,
     build_s=round(time.perf_counter() - t0, 1))

ipkw = dict(use_pallas=False) if smoke else {}


def e2e_big(tag, backend, accel, occ_kw=None, closest_kw=None, timeout_note=""):
    if occ_kw is not None:
        wavefront.HYBRID_OCCLUDE_KW = occ_kw
    if closest_kw is not None:
        wavefront.CTILES_CLOSEST_KW = closest_kw
    wavefront.clear_executable_caches()
    t0 = time.perf_counter()
    wavefront.render(scene_b, cam, settings, accel=accel,
                     block_size=64, wave_size=wave, backend=backend)
    warm_s = time.perf_counter() - t0
    stats = wavefront.RenderStats()
    t0 = time.perf_counter()
    img = wavefront.render(scene_b, cam, settings, accel=accel,
                           stats=stats, block_size=64, wave_size=wave,
                           backend=backend)
    assert np.isfinite(img).all()
    emit(probe="e2e_big", config=tag, wave=wave,
         mrays=round(stats.mrays_per_s, 2), warm_s=round(warm_s, 1),
         render_s=round(time.perf_counter() - t0, 1))
    return img


img_w = None
try:
    img_w = e2e_big("worklist_s128_w16", "worklist", accel_b)
except Exception as e:  # noqa: BLE001
    emit(probe="e2e_big", config="worklist_s128_w16", error=str(e)[:250])

try:
    img_h = e2e_big(
        "hybrid2l_s256_w16", "hybrid", accel_b256,
        occ_kw=dict(engine="packets", group_size=2),
        closest_kw=dict(cap=48, tile_chunk=2048, fallback_compact=1 << 13,
                        levels=2, super_cap=48, **ipkw))
    if img_w is not None:
        emit(probe="e2e_big_same_image",
             identical=bool(np.array_equal(img_w, img_h)))
except Exception as e:  # noqa: BLE001
    emit(probe="e2e_big", config="hybrid2l_s256_w16", error=str(e)[:250])

# Fused cascade engines (probes P/Q): a far SIMPLER XLA program than
# worklist/ctiles (no giant scatter tables) — it may compile where the
# others hit the axon remote-compile failure, and the sub-slab gating
# keeps kernel MT near per-ray-exact at any cluster count.
try:
    wavefront.HYBRID_CLOSEST_KW = dict(engine="cascade_fused",
                                       **(dict(interpret=True)
                                          if smoke else {}))
    img_c = e2e_big(
        "cascade_s128_w16", "hybrid", accel_b,
        occ_kw=dict(engine="packets_fused", early_skip=True, sub_skip=True,
                    **(dict(interpret=True) if smoke else {})))
    if img_w is not None:
        # CPU smoke caveat (debug_ulp.py): XLA CPU contracts FMAs
        # per-fusion-context, so the interpret-mode kernels' t drifts
        # 1 ulp vs the XLA pipelines on ~1.5% of rays (hit/tri
        # identical). Exact identity is the TPU criterion; on CPU,
        # allclose is the meaningful check.
        emit(probe="e2e_big_same_image_cascade",
             identical=bool(np.array_equal(img_w, img_c)),
             allclose=bool(np.allclose(img_w, img_c, rtol=1e-4,
                                       atol=1e-6)))
except Exception as e:  # noqa: BLE001
    emit(probe="e2e_big", config="cascade_s128_w16", error=str(e)[:250])
finally:
    wavefront.HYBRID_CLOSEST_KW = dict(engine="ctiles")

log("probe L complete")
