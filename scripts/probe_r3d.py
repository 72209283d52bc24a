"""Round-3 probe D: adoption run — slots resolve + S-256 closest + shadow
sort variants; sets the round's production defaults.

Measures (ONE TPU process):
  1. closest (two-pass scatter-min resolve, the probe-C winner) at S=128
     vs S=256, XLA vs Pallas.
  2. outro decomposition: sweep-stage vs full call, plus a no-sort run.
  3. shadow packet-cascade variants: sorted vs UNSORTED (shadow waves are
     light-major coherent already; r2 measured sort=False 1.4x on the
     worklist) x group {2, 8}.
  4. shadow stage split: _block_candidates (cull+extract) alone.
  5. e2e: dual-accel hybrid (S=128 shadow + S=256 closest, pallas,
     packets-g2) vs the r2 baseline config, same session.
--cpu for smoke.
"""
import functools
import json
import logging
import sys
import time

sys.path.insert(0, "/root/repo")

logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(levelname)s %(name)s: %(message)s")


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
_ = np.asarray(jnp.ones((8,), jnp.float32))  # absorb first-D2H setup cost
emit(probe="init", platform=jax.devices()[0].platform)

from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel import ctiles, traverse
from path_tracer_ai_tpu.accel.clusters import build_clusters
from path_tracer_ai_tpu.accel.traverse import _block_candidates, _sort_keys
from path_tracer_ai_tpu.core.types import RAY_TMIN

scene, accel = _demo_scene(subdivisions=3 if smoke else 6)
accel = build_clusters(scene.triangles, cluster_size=128)
accel256 = build_clusters(scene.triangles, cluster_size=256)

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


def shadow_wave(n_vertices, dead_frac=0.3):
    from path_tracer_ai_tpu.scene.scene import DEFAULT_LIGHTS

    ti = np.sort(rng.choice(ntri, n_vertices))
    p = tv0[ti] + rng.standard_normal((n_vertices, 3)).astype(np.float32) * 1e-3
    lights = np.asarray([l[0] for l in DEFAULT_LIGHTS], np.float32)
    o = np.tile(p, (4, 1))
    lv = lights[:, None, :] - p[None, :, :]
    dist = np.linalg.norm(lv, axis=-1)
    d = (lv / np.maximum(dist, 1e-30)[..., None]).reshape(-1, 3)
    tm = (dist - 1e-3).reshape(-1).astype(np.float32)
    tm[rng.random(tm.shape[0]) < dead_frac] = -1.0
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
osh, dsh, tsh = shadow_wave(N // 4)
live_b = int(jnp.sum(tw >= 0))
live_sh = int(jnp.sum(tsh >= 0))

TC = 256 if smoke else 2048
KW = dict(cap=48, tile_chunk=TC, fallback_compact=1 << 13)
ipkw = dict(interpret=True) if smoke else {}

# ---- 1. closest matrix ----
hx = None
for acc_tag, acc in [("s128", accel), ("s256", accel256)]:
    for eng, kw in [("xla", dict(KW)),
                    ("pallas", dict(KW, use_pallas=True, **ipkw))]:
        dt, cs, out = timeit(lambda: ctiles.closest_hit_ctiles(
            acc, ow, dw, RAY_TMIN, tw, **kw))
        emit(probe="closest4", engine=f"{eng}_{acc_tag}",
             ms=round(dt * 1e3, 1), mrays=round(live_b / dt / 1e6, 2),
             compile_s=round(cs, 1))
        if hx is None:
            hx = out
        else:
            emit(probe="exact4", engine=f"{eng}_{acc_tag}",
                 tri_mismatch=int(jnp.sum(out.tri != hx.tri)),
                 hit_mismatch=int(jnp.sum(out.hit != hx.hit)))

# no-sort closest (bounce waves in-render arrive previous-sorted)
dt, cs, _ = timeit(lambda: ctiles.closest_hit_ctiles(
    accel256, ow, dw, RAY_TMIN, tw, sort=False, use_pallas=not smoke,
    **ipkw, **KW))
emit(probe="closest4", engine="pallas_s256_nosort", ms=round(dt * 1e3, 1),
     mrays=round(live_b / dt / 1e6, 2), compile_s=round(cs, 1))

# ---- 3/4. shadow variants + stage split ----
for tag, kw in [
    ("sorted_g8", dict(block_size=64, group_size=8)),
    ("sorted_g2", dict(block_size=64, group_size=2)),
    ("nosort_g8", dict(block_size=64, group_size=8, sort=False)),
    ("nosort_g2", dict(block_size=64, group_size=2, sort=False)),
    ("nosort_g2_b128", dict(block_size=128, group_size=2, sort=False)),
]:
    dt, cs, _ = timeit(lambda: traverse.any_hit_packets(
        accel, osh, dsh, RAY_TMIN, tsh, **kw))
    emit(probe="shadow4", engine=tag, ms=round(dt * 1e3, 1),
         mrays=round(live_sh / dt / 1e6, 2), compile_s=round(cs, 1))

# shadow stage split: sort alone; block-candidates alone (sorted path)
nsh = osh.shape[0]


@jax.jit
def _shadow_sort(o, d, tm):
    keys = _sort_keys(accel, o, d, tm)
    perm = jnp.argsort(keys).astype(jnp.int32)
    return o[perm].sum() + d[perm].sum() + tm[perm].sum()


dt, cs, _ = timeit(lambda: _shadow_sort(osh, dsh, tsh))
emit(probe="shadow_stage", stage="sort+permute", ms=round(dt * 1e3, 1))


@jax.jit
def _shadow_cand(o, d, tm):
    nb = nsh // 64
    ob = o.reshape(nb, 64, 3)
    db = d.reshape(nb, 64, 3)
    tb = tm.reshape(nb, 64)
    order, n_cand, _e = _block_candidates(accel, ob, db, tb)
    return jnp.sum(order) + jnp.sum(n_cand)


dt, cs, _ = timeit(lambda: _shadow_cand(osh, dsh, tsh))
emit(probe="shadow_stage", stage="block_candidates(unsorted)",
     ms=round(dt * 1e3, 1), compile_s=round(cs, 1))

log("wave section complete")
if "--no-e2e" in sys.argv:
    sys.exit(0)

# ---- 5. e2e ----
from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.engine import wavefront
from path_tracer_ai_tpu.scene.camera import default_camera

cam = default_camera()
W, H = (320, 180) if smoke else (1920, 1080)
settings = RenderSettings(width=W, height=H, samples_per_pixel=2,
                          max_bounces=5, seed=0)


def e2e(tag, closest_kw, occ_kw, closest_s=None, timed_bounces=False):
    wavefront.CTILES_CLOSEST_KW = closest_kw
    wavefront.HYBRID_OCCLUDE_KW = occ_kw
    wavefront.HYBRID_CLOSEST_CLUSTER_SIZE = closest_s
    wavefront.clear_executable_caches()
    t0 = time.perf_counter()
    wavefront.render(scene, cam, settings, accel=accel, block_size=64,
                     wave_size=1 << (14 if smoke else 20), backend="hybrid")
    warm_s = time.perf_counter() - t0
    stats = wavefront.RenderStats()
    t0 = time.perf_counter()
    img = wavefront.render(scene, cam, settings, accel=accel, stats=stats,
                           block_size=64,
                           wave_size=1 << (14 if smoke else 20),
                           backend="hybrid")
    assert np.isfinite(img).all()
    emit(probe="e2e", config=tag, mrays=round(stats.mrays_per_s, 2),
         warm_s=round(warm_s, 1), render_s=round(time.perf_counter() - t0, 1))
    if timed_bounces:
        log(f"=== per-bounce timing: {tag} ===")
        wavefront._BOUNCE_TIMING = True
        try:
            wavefront.render(scene, cam, settings, accel=accel,
                             block_size=64,
                             wave_size=1 << (14 if smoke else 20),
                             backend="hybrid")
        finally:
            wavefront._BOUNCE_TIMING = False
    return img


base_closest = dict(KW)
pal_closest = dict(KW, use_pallas=not smoke, **ipkw)
img_a = e2e("r2_baseline", base_closest, dict(engine="packets"))
img_b = e2e("dualaccel_pallas_g2", pal_closest,
            dict(engine="packets", group_size=2),
            closest_s=256, timed_bounces=not smoke)
emit(probe="e2e_same_image", identical=bool(np.array_equal(img_a, img_b)))
log("probe D complete")
