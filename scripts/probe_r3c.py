"""Round-3 probe C: scatter-set resolve + first-D2H hypothesis + in-render
per-bounce timing (with logging actually configured this time).

Measures:
  1. First device->host pull cost (tiny then large) — probe B attributed
     the 84-151s "accel build" to build_clusters' np.asarray D2H.
  2. Stage decomposition incl. the full-call outro (unsort/fallback).
  3. closest XLA vs Pallas with the block-major scatter-SET resolve.
  4. Shadow any-hit ctiles with the new resolve; packets g2 confirmation.
  5. e2e hybrid: XLA vs Pallas closest x packets-g2 shadow, with blocking
     per-bounce timing logged for the diagnostic passes.

ONE TPU process. --cpu for smoke.
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
emit(probe="init", platform=jax.devices()[0].platform)

# ---- 1. first-D2H cost ----
t0 = time.perf_counter()
_ = np.asarray(jnp.ones((8,), jnp.float32))
d2h_tiny = time.perf_counter() - t0
t0 = time.perf_counter()
_ = np.asarray(jnp.ones((1 << 18, 3), jnp.float32))
d2h_1mb = time.perf_counter() - t0
t0 = time.perf_counter()
_ = np.asarray(jnp.ones((1 << 22,), jnp.float32))
d2h_16mb = time.perf_counter() - t0
emit(probe="d2h", tiny_s=round(d2h_tiny, 3), mb3_s=round(d2h_1mb, 3),
     mb16_s=round(d2h_16mb, 3))

from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel import ctiles, traverse
from path_tracer_ai_tpu.accel import worklist
from path_tracer_ai_tpu.accel.clusters import build_clusters
from path_tracer_ai_tpu.core.types import RAY_TMIN

tdemo = {}
scene, accel = _demo_scene(subdivisions=3 if smoke else 6, timings=tdemo)
emit(probe="build", **{k: round(v, 2) for k, v in tdemo.items()})
accel = build_clusters(scene.triangles, cluster_size=128)

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

CAP = 48
TC = 256 if smoke else 2048
RC = 1 << 8 if smoke else 1 << 11
BLOCK = 8
KW = dict(cap=CAP, tile_chunk=TC, fallback_compact=1 << 13)
ipkw = dict(interpret=True) if smoke else {}

# ---- 2. stage decomposition incl full outro ----


def _stages(o, d, tm_in, upto):
    t_max = jnp.where(tm_in >= 0, tm_in, -1.0)
    o_blk, d_blk, tm_blk, perm, npad = worklist._prepare_blocks(
        accel, o, d, t_max, BLOCK, True, "octorig"
    )
    if upto == "prepare":
        return o_blk.sum() + d_blk.sum() + tm_blk.sum()
    n_live = jnp.sum((t_max >= 0.0).astype(jnp.int32))
    live_blocks = -(-n_live // BLOCK)
    cand, n_cand = ctiles._ray_masks(
        accel, o_blk, d_blk, tm_blk, RAY_TMIN, RC, live_blocks=live_blocks
    )
    if upto == "cull":
        return jnp.sum(cand) + jnp.sum(n_cand)
    order, n_cand, over = ctiles._extract_order_flat(
        accel, cand, n_cand, CAP, live_blocks=live_blocks, row_chunk=RC
    )
    if upto == "extract":
        return jnp.sum(order) + jnp.sum(n_cand) + jnp.sum(over)
    pairs = ctiles._build_pairs(accel, order, n_cand, over, CAP, 16, TC,
                                tile_group=1)
    if upto == "pairs":
        return (jnp.sum(pairs["slot_pair"]) + jnp.sum(pairs["slot_cid"])
                + pairs["n_slots"])
    blk_res = ctiles._sweep_resolve(
        accel, pairs, o_blk, d_blk, tm_blk, RAY_TMIN, CAP, 16, TC, True
    )
    return sum(jnp.sum(a) for a in blk_res)


prev = 0.0
for upto in ["prepare", "cull", "extract", "pairs", "sweep"]:
    fn = jax.jit(functools.partial(_stages, upto=upto))
    dt, cs, _ = timeit(lambda: fn(ow, dw, tw))
    emit(probe="stage", upto=upto, ms=round(dt * 1e3, 1),
         delta_ms=round((dt - prev) * 1e3, 1), compile_s=round(cs, 1))
    prev = dt

# full call (adds unsort + overflow fallback + hit finalize = "outro")
dt, cs, hx = timeit(lambda: ctiles.closest_hit_ctiles(
    accel, ow, dw, RAY_TMIN, tw, **KW))
emit(probe="stage", upto="full_xla", ms=round(dt * 1e3, 1),
     delta_ms=round(dt * 1e3 - prev * 1e3, 1), compile_s=round(cs, 1))
emit(probe="closest3", engine="xla_setres", ms=round(dt * 1e3, 1),
     mrays=round(live_b / dt / 1e6, 2))

dt, cs, hp = timeit(lambda: ctiles.closest_hit_ctiles(
    accel, ow, dw, RAY_TMIN, tw, use_pallas=True, **ipkw, **KW))
emit(probe="closest3", engine="pallas_setres", ms=round(dt * 1e3, 1),
     mrays=round(live_b / dt / 1e6, 2), compile_s=round(cs, 1))
emit(probe="exact3",
     t_not_bitwise=int(jnp.sum(~(jnp.equal(hp.t, hx.t)
                                 | (jnp.isnan(hp.t) & jnp.isnan(hx.t))))),
     tri_mismatch=int(jnp.sum(hp.tri != hx.tri)),
     hit_mismatch=int(jnp.sum(hp.hit != hx.hit)))

# ---- 3b. cluster_size=256: halves every row count (pairs, scatter rows,
# cull width, sort keys) at ~1.4x dense-test cost — the row-granularity
# tax (7ns/row) is the governing cost, so this may dominate tuning. ----
if not smoke:
    accel256 = build_clusters(scene.triangles, cluster_size=256)
    for tag, kw in [("xla_s256", dict(KW)),
                    ("pallas_s256", dict(KW, use_pallas=True))]:
        dt, cs, out = timeit(lambda: ctiles.closest_hit_ctiles(
            accel256, ow, dw, RAY_TMIN, tw, **kw))
        emit(probe="closest3", engine=tag, ms=round(dt * 1e3, 1),
             mrays=round(live_b / dt / 1e6, 2), compile_s=round(cs, 1))
        mm = int(jnp.sum(out.tri != hx.tri))
        emit(probe="exact_s256", engine=tag, tri_mismatch=mm)
    # shadow at S=256 through the packet cascade
    dt, cs, _ = timeit(lambda: traverse.any_hit_packets(
        accel256, osh, dsh, RAY_TMIN, tsh, block_size=64, group_size=2))
    emit(probe="shadow3", engine="packets256_b64_g2", ms=round(dt * 1e3, 1),
         mrays=round(live_sh / dt / 1e6, 2))

# ---- 4. shadow: ctiles new resolve + packets g2 ----
dt, cs, _ = timeit(lambda: traverse.any_hit_packets(
    accel, osh, dsh, RAY_TMIN, tsh, block_size=64, group_size=2))
emit(probe="shadow3", engine="packets_b64_g2", ms=round(dt * 1e3, 1),
     mrays=round(live_sh / dt / 1e6, 2))
for tag, kw in [("ct_xla_nosort", dict(sort=False)),
                ("ct_pal_nosort", dict(sort=False, use_pallas=True, **ipkw))]:
    dt, cs, _ = timeit(lambda: ctiles.any_hit_ctiles(
        accel, osh, dsh, RAY_TMIN, tsh, **KW, **kw))
    emit(probe="shadow3", engine=tag, ms=round(dt * 1e3, 1),
         mrays=round(live_sh / dt / 1e6, 2), compile_s=round(cs, 1))

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


def e2e(tag, closest_kw, occ_kw, timed_bounces=False, use_accel=None):
    acc_ = accel if use_accel is None else use_accel
    wavefront.CTILES_CLOSEST_KW = closest_kw
    wavefront.HYBRID_OCCLUDE_KW = occ_kw
    wavefront.clear_executable_caches()
    t0 = time.perf_counter()
    wavefront.render(scene, cam, settings, accel=acc_, block_size=64,
                     wave_size=1 << (14 if smoke else 20), backend="hybrid")
    warm_s = time.perf_counter() - t0
    stats = wavefront.RenderStats()
    t0 = time.perf_counter()
    img = wavefront.render(scene, cam, settings, accel=acc_, stats=stats,
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
            wavefront.render(scene, cam, settings, accel=acc_,
                             block_size=64,
                             wave_size=1 << (14 if smoke else 20),
                             backend="hybrid")
        finally:
            wavefront._BOUNCE_TIMING = False
    return img


xla_closest = dict(KW)
pal_closest = dict(KW, use_pallas=True, **ipkw)
shadow_g2 = dict(engine="packets", group_size=2)
img_x = e2e("setres_xla_packetg2", xla_closest, shadow_g2,
            timed_bounces=not smoke)
img_a = e2e("setres_pallas_packetg2", pal_closest, shadow_g2,
            timed_bounces=not smoke)
emit(probe="e2e_same_image", identical=bool(np.array_equal(img_x, img_a)))
if not smoke:
    img_s = e2e("setres_xla_s256_packetg2", xla_closest, shadow_g2,
                use_accel=accel256)
    emit(probe="e2e_same_image_s256",
         identical=bool(np.array_equal(img_x, img_s)))
log("probe C complete")
