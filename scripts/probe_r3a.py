"""Round-3 probe A: the fused Pallas tile sweep INTEGRATED into ctiles.

One TPU process. Measures, in order:
  1. backend-init / scene-build / accel-build attribution (the r02 bench
     reported "150.2s accel build" — on CPU the same build is <1s, so the
     timer was absorbing TPU client+tunnel init; pin that down).
  2. COMPILED exactness: closest+any_hit ctiles use_pallas=True vs the XLA
     ctiles path, bitwise, on realistic waves (VERDICT weak #5).
  3. Closest-wave timing: XLA vs Pallas on primary-like and bounce-like
     2^20 waves, tile_chunk in {1024, 2048, 4096}.
  4. Shadow-wave timing: packet cascade (current production) vs ctiles
     XLA vs ctiles Pallas, light-major sorted and unsorted.
  5. E2E 1080p@2spp/5b: current hybrid baseline (same-session), then
     hybrid with the winning closest/shadow configs from 3-4.

JSON lines to stdout; progress to stderr.  --cpu for a smoke run.
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


smoke = "--cpu" in sys.argv

t0 = time.perf_counter()
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

jnp.zeros(()).block_until_ready()  # force backend/tunnel init NOW
t_init = time.perf_counter() - t0
emit(probe="init", platform=jax.devices()[0].platform,
     backend_init_s=round(t_init, 2))

from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel import ctiles
from path_tracer_ai_tpu.accel import traverse
from path_tracer_ai_tpu.accel.clusters import build_clusters
from path_tracer_ai_tpu.core.types import RAY_TMIN

# ---- 1. build attribution ----
t0 = time.perf_counter()
scene, accel = _demo_scene(subdivisions=3 if smoke else 6)
t_scene = time.perf_counter() - t0
t0 = time.perf_counter()
accel = build_clusters(scene.triangles, cluster_size=128)
t_accel = time.perf_counter() - t0
emit(probe="build", scene_s=round(t_scene, 2), accel_s=round(t_accel, 2),
     tris=int(scene.triangles.count), clusters=accel.num_clusters)

# ---- synthetic waves (the r2 probe recipe: representative of renders) ----
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


def primary_wave(n):
    from path_tracer_ai_tpu.scene.camera import default_camera, get_rays

    cam = default_camera()
    u = jnp.asarray(rng.random(n, dtype=np.float32))
    v = jnp.asarray(rng.random(n, dtype=np.float32))
    o, d = get_rays(cam, u, v, 16.0 / 9.0)
    return o, d, jnp.full((n,), jnp.inf, jnp.float32)


def shadow_wave(n_vertices, dead_frac=0.3):
    """Light-major: 4 consecutive segments, one per light, each
    pixel-ordered — the layout direct_lighting emits."""
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
op, dp, tp_ = primary_wave(N)
osh, dsh, tsh = shadow_wave(N // 4)

CLOSEST_KW = dict(cap=48, tile_chunk=256 if smoke else 2048,
                  fallback_compact=1 << 13)
ipkw = dict(interpret=True) if smoke else {}

# ---- 2. compiled exactness ----
log("exactness…")
hx = ctiles.closest_hit_ctiles(accel, ow, dw, RAY_TMIN, tw, **CLOSEST_KW)
hp = ctiles.closest_hit_ctiles(accel, ow, dw, RAY_TMIN, tw,
                               use_pallas=True, **ipkw, **CLOSEST_KW)
jax.block_until_ready((hx, hp))
# t may differ by FMA-contraction ulps in the catastrophic-cancellation
# region near t_min (measured on CPU interpret: abs ~5e-8 at t~3e-3, tri
# ids identical); report bitwise + ulp-level stats, abort only if the
# DISCRETE outputs (hit mask, tri id, occlusion) disagree.
t_bitwise = int(jnp.sum(~(jnp.equal(hp.t, hx.t)
                          | (jnp.isnan(hp.t) & jnp.isnan(hx.t)))))
both_fin = jnp.isfinite(hp.t) & jnp.isfinite(hx.t)
absdiff = jnp.where(both_fin, jnp.abs(hp.t - hx.t), 0.0)
t_mm = int(jnp.sum(~(jnp.isclose(hp.t, hx.t, rtol=1e-6, atol=1e-6)
                     | (jnp.isinf(hp.t) & jnp.isinf(hx.t)))))
tri_mm = int(jnp.sum(hp.tri != hx.tri))
hit_mm = int(jnp.sum(hp.hit != hx.hit))
emit(probe="exact_closest", n=N, t_not_bitwise=t_bitwise,
     t_beyond_ulp=t_mm, max_abs_diff=float(jnp.max(absdiff)),
     tri_mismatch=tri_mm, hit_mismatch=hit_mm)

ax = ctiles.any_hit_ctiles(accel, osh, dsh, RAY_TMIN, tsh, sort=False,
                           **CLOSEST_KW)
ap = ctiles.any_hit_ctiles(accel, osh, dsh, RAY_TMIN, tsh, sort=False,
                           use_pallas=True, **ipkw, **CLOSEST_KW)
jax.block_until_ready((ax, ap))
occ_mm = int(jnp.sum(ax != ap))
emit(probe="exact_anyhit", n=int(osh.shape[0]), occ_mismatch=occ_mm)
if t_mm or tri_mm or hit_mm or occ_mm:
    log("EXACTNESS FAILURE (discrete outputs disagree) — aborting")
    sys.exit(1)

# ---- 3. closest-wave timing ----
for tag, (o, d, tm) in [("bounce", (ow, dw, tw)), ("primary", (op, dp, tp_))]:
    kw = dict(CLOSEST_KW)
    dt, cs, _ = timeit(lambda: ctiles.closest_hit_ctiles(
        accel, o, d, RAY_TMIN, tm, **kw))
    live = int(jnp.sum(tm >= 0))
    emit(probe="closest", wave=tag, engine="xla", ms=round(dt * 1e3, 1),
         mrays=round(live / dt / 1e6, 2), compile_s=round(cs, 1))
    for tc in ([256] if smoke else [1024, 2048, 4096]):
        kw = dict(CLOSEST_KW, tile_chunk=tc)
        dt, cs, _ = timeit(lambda: ctiles.closest_hit_ctiles(
            accel, o, d, RAY_TMIN, tm, use_pallas=True, **ipkw, **kw))
        emit(probe="closest", wave=tag, engine=f"pallas_tc{tc}",
             ms=round(dt * 1e3, 1), mrays=round(live / dt / 1e6, 2),
             compile_s=round(cs, 1))

# ---- 4. shadow-wave timing ----
live_sh = int(jnp.sum(tsh >= 0))
dt, cs, _ = timeit(lambda: traverse.any_hit_packets(
    accel, osh, dsh, RAY_TMIN, tsh, block_size=64))
emit(probe="shadow", engine="packets64", ms=round(dt * 1e3, 1),
     mrays=round(live_sh / dt / 1e6, 2), compile_s=round(cs, 1))

shadow_cfgs = [
    ("ct_xla_nosort", dict(sort=False)),
    ("ct_pal_nosort", dict(sort=False, use_pallas=True)),
    ("ct_pal_dir", dict(sort=True, sort_mode="dir", use_pallas=True)),
    ("ct_pal_octorig", dict(sort=True, sort_mode="octorig", use_pallas=True)),
]
for tag, kw in shadow_cfgs:
    kw = dict(CLOSEST_KW, **kw, **(ipkw if kw.get("use_pallas") else {}))
    try:
        dt, cs, _ = timeit(lambda: ctiles.any_hit_ctiles(
            accel, osh, dsh, RAY_TMIN, tsh, **kw))
        emit(probe="shadow", engine=tag, ms=round(dt * 1e3, 1),
             mrays=round(live_sh / dt / 1e6, 2), compile_s=round(cs, 1))
    except Exception as e:  # noqa: BLE001
        emit(probe="shadow", engine=tag, error=str(e)[:300])

log("probe A wave section complete")

if "--no-e2e" in sys.argv:
    sys.exit(0)

# ---- 5. e2e renders ----
from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.engine import wavefront
from path_tracer_ai_tpu.scene.camera import default_camera

cam = default_camera()
W, H = (320, 180) if smoke else (1920, 1080)
settings = RenderSettings(width=W, height=H, samples_per_pixel=2,
                          max_bounces=5, seed=0)


def e2e(tag, closest_kw, occ_kw):
    wavefront.CTILES_CLOSEST_KW = closest_kw
    wavefront.HYBRID_OCCLUDE_KW = occ_kw
    wavefront.clear_executable_caches()
    t0 = time.perf_counter()
    wavefront.render(scene, cam, settings, accel=accel, block_size=64,
                     wave_size=1 << (14 if smoke else 20), backend="hybrid")
    warm_s = time.perf_counter() - t0
    stats = wavefront.RenderStats()
    t0 = time.perf_counter()
    img = wavefront.render(scene, cam, settings, accel=accel, stats=stats,
                           block_size=64, wave_size=1 << (14 if smoke else 20),
                           backend="hybrid")
    assert np.isfinite(img).all()
    emit(probe="e2e", config=tag, mrays=round(stats.mrays_per_s, 2),
         warm_s=round(warm_s, 1), render_s=round(time.perf_counter() - t0, 1),
         rays_m=round(stats.total_rays / 1e6, 1))
    return img


base_closest = dict(cap=48, tile_chunk=2048, fallback_compact=1 << 13)
pal_closest = dict(base_closest, use_pallas=True, **ipkw)
img_a = e2e("baseline_r2", base_closest, dict(engine="packets"))
img_b = e2e("pallas_closest", pal_closest, dict(engine="packets"))
emit(probe="e2e_same_image_ab", identical=bool(np.array_equal(img_a, img_b)))
img_c = e2e("pallas_closest_ctshadow",
            pal_closest,
            dict(engine="ctiles", sort=False, use_pallas=True,
                 cap=48, tile_chunk=2048, fallback_compact=1 << 13, **ipkw))
emit(probe="e2e_same_image_ac", identical=bool(np.array_equal(img_a, img_c)))
log("probe A complete")
