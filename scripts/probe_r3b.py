"""Round-3 probe B: stage decomposition + shadow-cascade variants.

After probe A showed the integrated Pallas sweep nets only ~10% (the
per-slot index machinery dominates), this probe:
  1. times each ctiles-closest stage on a bounce wave (sort/prepare,
     cull, extract, pair build incl. the new slot tables, sweep+resolve)
     by diffing cumulative jitted prefixes;
  2. re-times closest XLA vs Pallas with the slot_pair tables (replacing
     3 gathers/slot/pass with table slices);
  3. sweeps shadow configs: packet-cascade group_size {2,4,8} x
     block_size {64,128}, and the worklist shadow with a RIGHT-SIZED
     compact fallback (round-2's collapse cause);
  4. e2e hybrid with the best wave-level combo.

ONE TPU process; JSON lines to stdout. --cpu for smoke.
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

from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel import ctiles, traverse, worklist
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

# ---- 1. stage decomposition (ctiles closest, bounce wave) ----
CAP = 48
TC = 256 if smoke else 2048
RC = 1 << 8 if smoke else 1 << 11
BLOCK = 8


def _stages(o, d, tm_in, upto):
    t_max = jnp.broadcast_to(jnp.asarray(jnp.inf, jnp.float32), (o.shape[0],))
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

# ---- 2. closest with slot tables: XLA vs pallas ----
KW = dict(cap=CAP, tile_chunk=TC, fallback_compact=1 << 13)
ipkw = dict(interpret=True) if smoke else {}
hx = hp = None
for tag, kw in [("xla_slots", dict(KW)),
                ("pallas_slots", dict(KW, use_pallas=True, **ipkw))]:
    dt, cs, out = timeit(lambda: ctiles.closest_hit_ctiles(
        accel, ow, dw, RAY_TMIN, tw, **kw))
    emit(probe="closest2", engine=tag, ms=round(dt * 1e3, 1),
         mrays=round(live_b / dt / 1e6, 2), compile_s=round(cs, 1))
    if tag == "xla_slots":
        hx = out
    else:
        hp = out
emit(probe="exact2",
     t_not_bitwise=int(jnp.sum(~(jnp.equal(hp.t, hx.t)
                                 | (jnp.isnan(hp.t) & jnp.isnan(hx.t))))),
     tri_mismatch=int(jnp.sum(hp.tri != hx.tri)))

# ---- 3. shadow variants ----
for bs, gs in [(64, 8), (64, 4), (64, 2), (128, 8), (128, 4), (256, 8)]:
    dt, cs, _ = timeit(lambda: traverse.any_hit_packets(
        accel, osh, dsh, RAY_TMIN, tsh, block_size=bs, group_size=gs))
    emit(probe="shadow2", engine=f"packets_b{bs}_g{gs}",
         ms=round(dt * 1e3, 1), mrays=round(live_sh / dt / 1e6, 2),
         compile_s=round(cs, 1))

for tag, kw in [
    ("wl_nosort_fc13", dict(sort=False, fallback_compact=1 << 13)),
    ("wl_nosort_fc13_g4", dict(sort=False, fallback_compact=1 << 13,
                               group=4)),
]:
    dt, cs, _ = timeit(lambda: worklist.any_hit_worklist(
        accel, osh, dsh, RAY_TMIN, tsh, **kw))
    emit(probe="shadow2", engine=tag, ms=round(dt * 1e3, 1),
         mrays=round(live_sh / dt / 1e6, 2), compile_s=round(cs, 1))

log("wave section complete")
if "--no-e2e" in sys.argv:
    sys.exit(0)

# ---- 4. e2e with best combo ----
from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.engine import wavefront
from path_tracer_ai_tpu.scene.camera import default_camera

cam = default_camera()
W, H = (320, 180) if smoke else (1920, 1080)
settings = RenderSettings(width=W, height=H, samples_per_pixel=2,
                          max_bounces=5, seed=0)


def e2e(tag, closest_kw, occ_kw, block_size=64, timed_bounces=False):
    wavefront.CTILES_CLOSEST_KW = closest_kw
    wavefront.HYBRID_OCCLUDE_KW = occ_kw
    wavefront.clear_executable_caches()
    t0 = time.perf_counter()
    wavefront.render(scene, cam, settings, accel=accel, block_size=block_size,
                     wave_size=1 << (14 if smoke else 20), backend="hybrid")
    warm_s = time.perf_counter() - t0
    stats = wavefront.RenderStats()
    t0 = time.perf_counter()
    img = wavefront.render(scene, cam, settings, accel=accel, stats=stats,
                           block_size=block_size,
                           wave_size=1 << (14 if smoke else 20),
                           backend="hybrid")
    assert np.isfinite(img).all()
    emit(probe="e2e", config=tag, mrays=round(stats.mrays_per_s, 2),
         warm_s=round(warm_s, 1), render_s=round(time.perf_counter() - t0, 1))
    if timed_bounces:
        # Diagnostic pass: per-bounce wall times to stderr (blocking).
        log(f"=== per-bounce timing: {tag} ===")
        wavefront._BOUNCE_TIMING = True
        try:
            wavefront.render(scene, cam, settings, accel=accel,
                             block_size=block_size,
                             wave_size=1 << (14 if smoke else 20),
                             backend="hybrid")
        finally:
            wavefront._BOUNCE_TIMING = False
    return img


xla_closest = dict(cap=48, tile_chunk=TC, fallback_compact=1 << 13)
pal_closest = dict(xla_closest, use_pallas=True, **ipkw)
img_x = e2e("slots_xla_packetshadow", xla_closest, dict(engine="packets"),
            timed_bounces=not smoke)
img_a = e2e("slots_pallas_packetshadow", pal_closest, dict(engine="packets"),
            timed_bounces=not smoke)
emit(probe="e2e_same_image_xa", identical=bool(np.array_equal(img_x, img_a)))
img_b = e2e("slots_xla_wlshadow", xla_closest,
            dict(engine="worklist", sort=False, fallback_compact=1 << 13))
emit(probe="e2e_same_image_xb", identical=bool(np.array_equal(img_x, img_b)))
log("probe B complete")
