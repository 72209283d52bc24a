"""Round-3 probe F: shadow cascade tuning + packed permute validation + big-scene routing.

ONE TPU process (tunnel hazard rules, CLAUDE.md). Sections:
  1. shadow wave A/B over (block_size, group_size, sort_mode) on the base
     S=128 accel, plus the best config on a dedicated S=64 shadow accel —
     shadow is 55-60% of bounce time; probe E's CPU sweep showed b16_g2
     1.6x over the b64_g8 default.
  2. closest bounce wave with the packed prepare/unsort (this session's
     code change) vs the recorded r3d numbers — plus an XLA anchor for
     same-session cross-checks.
  3. e2e 1080p@2spp/5b: current defaults vs best-shadow-adopted, images
     must stay bit-identical.
  4. big scene (subdiv 8, 1.3M tris): e2e worklist vs hybrid-2level —
     the routing decision VERDICT task 4 asks to record.

Usage: python scripts/probe_r3f.py [--cpu] [--no-big] [--no-e2e]
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
from path_tracer_ai_tpu.accel import ctiles, traverse
from path_tracer_ai_tpu.accel.clusters import build_clusters
from path_tracer_ai_tpu.core.types import RAY_TMIN
from path_tracer_ai_tpu.scene.scene import DEFAULT_LIGHTS

host = {}
scene, accel = _demo_scene(subdivisions=3 if smoke else 6, host_out=host)
accel_c = build_clusters(host["tris"], cluster_size=256)
accel_s64 = build_clusters(host["tris"], cluster_size=64)
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


# ---- 1. shadow wave A/B (same distribution as probe r3d's shadow4) ----
nv = N // 4
ti = np.sort(rng.choice(ntri, nv))
pp = tv0[ti] + rng.standard_normal((nv, 3)).astype(np.float32) * 1e-3
lights = np.asarray([l[0] for l in DEFAULT_LIGHTS], np.float32)
osh = np.tile(pp, (4, 1))
lv = lights[:, None, :] - pp[None, :, :]
dist = np.linalg.norm(lv, axis=-1)
dsh = (lv / np.maximum(dist, 1e-30)[..., None]).reshape(-1, 3)
tsh = (dist - 1e-3).reshape(-1).astype(np.float32)
tsh[rng.random(tsh.shape[0]) < 0.3] = -1.0
osh, dsh, tsh = jnp.asarray(osh), jnp.asarray(dsh), jnp.asarray(tsh)
live_sh = int(jnp.sum(tsh >= 0))

ref_occ = None
for bs, gs, mode in [(64, 8, "dir"), (64, 2, "dir"), (32, 2, "dir"),
                     (16, 2, "dir"), (16, 4, "dir"), (16, 2, "octorig"),
                     (32, 2, "octorig")]:
    try:
        dt, cs, occ = timeit(lambda: traverse.any_hit_packets(
            accel, osh, dsh, RAY_TMIN, tsh, block_size=bs, group_size=gs,
            sort_mode=mode))
        emit(probe="shadow6", engine=f"b{bs}_g{gs}_{mode}",
             ms=round(dt * 1e3, 1), mrays=round(live_sh / dt / 1e6, 2),
             compile_s=round(cs, 1))
        if ref_occ is None:
            ref_occ = occ
        else:
            emit(probe="shadow6_exact", engine=f"b{bs}_g{gs}_{mode}",
                 mismatch=int(jnp.sum(occ != ref_occ)))
    except Exception as e:  # noqa: BLE001
        emit(probe="shadow6", engine=f"b{bs}_g{gs}_{mode}",
             error=str(e)[:200])

# best small-block config on the dedicated S=64 shadow accel
for bs, gs, mode in [(64, 8, "dir"), (16, 2, "dir")]:
    try:
        dt, cs, occ = timeit(lambda: traverse.any_hit_packets(
            accel_s64, osh, dsh, RAY_TMIN, tsh, block_size=bs,
            group_size=gs, sort_mode=mode))
        emit(probe="shadow6_s64", engine=f"b{bs}_g{gs}_{mode}",
             ms=round(dt * 1e3, 1), mrays=round(live_sh / dt / 1e6, 2),
             compile_s=round(cs, 1))
        emit(probe="shadow6_s64_exact", engine=f"b{bs}_g{gs}_{mode}",
             mismatch=int(jnp.sum(occ != ref_occ)))
    except Exception as e:  # noqa: BLE001
        emit(probe="shadow6_s64", engine=f"b{bs}_g{gs}_{mode}",
             error=str(e)[:200])

log("shadow section complete")

# ---- 2. closest bounce wave with packed prepare/unsort ----
ti = rng.choice(ntri, N)
ob = tv0[ti] + rng.standard_normal((N, 3)).astype(np.float32) * 1e-3
db = rng.standard_normal((N, 3)).astype(np.float32)
db /= np.linalg.norm(db, axis=1, keepdims=True)
tmb = np.full(N, np.inf, np.float32)
tmb[rng.random(N) < 0.35] = -1.0
ob, db, tmb = jnp.asarray(ob), jnp.asarray(db), jnp.asarray(tmb)
live_b = int(jnp.sum(tmb >= 0))

KW = dict(cap=48, tile_chunk=256 if smoke else 2048,
          fallback_compact=1 << 13)
ipkw = dict(interpret=True) if smoke else {}

hx = None
for tag, acc, kw in [
    ("xla_s256_packed", accel_c, dict(KW)),
    ("pallas_s256_packed", accel_c, dict(KW, use_pallas=True, **ipkw)),
]:
    dt, cs, out = timeit(lambda: ctiles.closest_hit_ctiles(
        acc, ob, db, RAY_TMIN, tmb, **kw))
    emit(probe="closest6", engine=tag, ms=round(dt * 1e3, 1),
         mrays=round(live_b / dt / 1e6, 2), compile_s=round(cs, 1))
    if hx is None:
        hx = out
    else:
        emit(probe="closest6_exact", engine=tag,
             t_not_bitwise=int(jnp.sum(
                 jax.lax.bitcast_convert_type(out.t, jnp.int32)
                 != jax.lax.bitcast_convert_type(hx.t, jnp.int32))),
             tri_mismatch=int(jnp.sum(out.tri != hx.tri)))

log("closest section complete")

# ---- 3. e2e adoption A/B ----
if "--no-e2e" not in sys.argv:
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.camera import default_camera

    cam = default_camera()
    W, H = (320, 180) if smoke else (1920, 1080)
    settings = RenderSettings(width=W, height=H, samples_per_pixel=2,
                              max_bounces=5, seed=0)
    wave = 1 << (14 if smoke else 20)

    def e2e(tag, occ_kw=None, accel_cl=accel_c):
        if occ_kw is not None:
            wavefront.HYBRID_OCCLUDE_KW = occ_kw
        wavefront.clear_executable_caches()
        t0 = time.perf_counter()
        wavefront.render(scene, cam, settings, accel=accel, block_size=64,
                         wave_size=wave, backend="hybrid",
                         accel_closest=accel_cl)
        warm_s = time.perf_counter() - t0
        stats = wavefront.RenderStats()
        t0 = time.perf_counter()
        img = wavefront.render(scene, cam, settings, accel=accel,
                               stats=stats, block_size=64, wave_size=wave,
                               backend="hybrid", accel_closest=accel_cl)
        assert np.isfinite(img).all()
        emit(probe="e2e", config=tag, mrays=round(stats.mrays_per_s, 2),
             warm_s=round(warm_s, 1),
             render_s=round(time.perf_counter() - t0, 1))
        return img

    img_a = e2e("packed_defaults",
                occ_kw=dict(engine="packets"))
    img_b = e2e("packed_shadow_b16g2",
                occ_kw=dict(engine="packets", block_size=16, group_size=2))
    emit(probe="e2e_same_image", identical=bool(np.array_equal(img_a, img_b)))
    log("e2e section complete")

# ---- 4. big-scene routing (VERDICT task 4) ----
if "--no-big" not in sys.argv:
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.camera import default_camera

    host_b = {}
    t0 = time.perf_counter()
    scene_b, accel_b = _demo_scene(subdivisions=4 if smoke else 8,
                                   host_out=host_b)
    emit(probe="big_scene", tris=int(scene_b.triangles.count),
         clusters=accel_b.num_clusters,
         build_s=round(time.perf_counter() - t0, 1))

    cam = default_camera()
    W, H = (320, 180) if smoke else (1920, 1080)
    settings = RenderSettings(width=W, height=H, samples_per_pixel=2,
                              max_bounces=5, seed=0)
    wave = 1 << (14 if smoke else 20)

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
        emit(probe="e2e_big", config=tag, mrays=round(stats.mrays_per_s, 2),
             warm_s=round(warm_s, 1),
             render_s=round(time.perf_counter() - t0, 1))
        return img

    img_w = e2e_big("worklist", "worklist")
    img_h = e2e_big(
        "hybrid_2level", "hybrid",
        occ_kw=dict(engine="packets", block_size=16, group_size=2),
        closest_kw=dict(KW, levels=2, super_cap=48,
                        use_pallas=not smoke, **ipkw))
    emit(probe="e2e_big_same_image",
         identical=bool(np.array_equal(img_w, img_h)))
    log("big-scene section complete")

log("probe F complete")
