"""Round-3 probe I: re-A/B ctiles-as-shadow now that the fused Pallas
sweep is production (lever 5, docs/ARCHITECTURE.md).

The round-2 measurement that benched ctiles-as-shadow (2.5-4.4 vs the
cascade's 5.5 Mrays/s wave-level) predates three upgrades that cut the
ctiles pipeline's sweep+resolve cost: the fused Pallas tile sweep
(255.7 vs 301.8 ms closest-wave), dir-major sort modes, and the
right-sized overflow fallback. Occlusion needs no scatter-min resolve
(OR per ray) and no tMax shrink ordering, so the sweep win transfers
whole. This probe re-runs the e2e A/B with the CURRENT machinery:

  1. baseline: hybrid with packets-g2 shadow (production, 3.19 Mrays/s)
  2. hybrid with ctiles shadow (use_pallas, cap=48 defaults)
  3. hybrid with ctiles shadow, cap=32 (shadow candidate sets are
     smaller than closest: t_max is the light distance)

Images must be bit-identical across all variants (occlusion is exact).

Usage: python scripts/probe_r3i.py [--cpu]
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
on_tpu = not smoke

host = {}
scene, accel = _demo_scene(subdivisions=3 if smoke else 6, host_out=host)
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


img_base = e2e("shadow_packets_g2", dict(engine="packets", group_size=2))
imgs = {}
for tag, okw in [
    ("shadow_ctiles_p48",
     dict(engine="ctiles", use_pallas=on_tpu, cap=48, tile_chunk=2048,
          fallback_compact=1 << 13)),
    ("shadow_ctiles_p32",
     dict(engine="ctiles", use_pallas=on_tpu, cap=32, tile_chunk=2048,
          fallback_compact=1 << 13)),
]:
    try:
        imgs[tag] = e2e(tag, okw)
        emit(probe="same_image", config=tag,
             identical=bool(np.array_equal(img_base, imgs[tag])))
    except Exception as e:  # noqa: BLE001
        emit(probe="e2e", config=tag, error=str(e)[:200])

log("probe I complete")
