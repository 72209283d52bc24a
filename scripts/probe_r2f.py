"""Round-2 probe F: ctiles v2 (flat pairs + scatter resolve) on-chip.

v1 stage split (probe E): sort 36 | masks 30 | tables 283 | sweep 245 |
resolve 442 = ~1036ms per 2^20 bounce wave. v2 removes the i_cap index
gathers (flat pair domain) and the gather-based resolve (chunked row
scatter-min, measured 59ms/3.2M rows). Expected bounce ~350-400ms.

Also: lane-major shadow waves (block=4 = one lane's 4 same-origin rays),
e2e render, and bench.py-equivalent number with the winning config.

ONE TPU process. JSON lines to stdout.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(probe_name, **kw):
    print(json.dumps({"probe": probe_name, **kw}), flush=True)


def timeit(fn, *args, reps=3, **kw):
    import jax

    t0 = time.perf_counter()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, compile_s


def lane_major_shadow(scene, n_lanes, seed=1, dead_frac=0.45):
    """Shadow wave as the engine actually emits it under lane_major: each
    lane's 4 rays (one per light) consecutive; ~dead_frac of (lane, light)
    pairs inactive (t_max = -1)."""
    import numpy as np
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    tv0 = np.asarray(scene.triangles.v0)
    tv1 = np.asarray(scene.triangles.v1)
    tv2 = np.asarray(scene.triangles.v2)
    ti = rng.choice(tv0.shape[0], n_lanes)
    b1 = rng.random((n_lanes, 1), dtype=np.float32)
    b2 = rng.random((n_lanes, 1), dtype=np.float32) * (1 - b1)
    pos = tv0[ti] + b1 * (tv1[ti] - tv0[ti]) + b2 * (tv2[ti] - tv0[ti])

    lp = np.asarray(scene.lights.position)          # [4, 3]
    nl = lp.shape[0]
    lvec = lp[None, :, :] - pos[:, None, :]         # [N, 4, 3]
    dist = np.linalg.norm(lvec, axis=2, keepdims=True)
    sd = (lvec / np.maximum(dist, 1e-9)).astype(np.float32)
    so = np.broadcast_to(pos[:, None, :] + 1e-3, sd.shape)
    tm = (dist[..., 0] - 1e-3).astype(np.float32)
    dead = rng.random((n_lanes, nl)) < dead_frac
    tm = np.where(dead, -1.0, tm).astype(np.float32)
    return (jnp.asarray(so.reshape(-1, 3)), jnp.asarray(sd.reshape(-1, 3)),
            jnp.asarray(tm.reshape(-1)))


def main():
    smoke = "--cpu" in sys.argv
    import jax

    if smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    emit("devices", platform=jax.devices()[0].platform)

    from functools import partial

    from __graft_entry__ import _demo_scene
    from path_tracer_ai_tpu.accel import ctiles
    from path_tracer_ai_tpu.accel.clusters import build_clusters
    from path_tracer_ai_tpu.accel.worklist import _prepare_blocks
    from scripts.perf_probe_r2 import make_waves

    scene, _ = _demo_scene(subdivisions=3 if smoke else 6)
    accel = build_clusters(scene.triangles, cluster_size=128)
    n = 1 << (14 if smoke else 20)
    waves = make_waves(scene, n)
    o, d, tm = waves["bounce"]

    cap = 8 if smoke else 48
    tb = 4 if smoke else 16
    tc = 4 if smoke else 256
    rc = 1 << (6 if smoke else 11)

    # --- stage split (bounce, cap=48) ---------------------------------------
    @partial(jax.jit, static_argnames=("block", "sort_mode"))
    def s0_prepare(o_, d_, tm_, block, sort_mode):
        return _prepare_blocks(accel, o_, d_, tm_, block, True, sort_mode)[:3]

    @partial(jax.jit, static_argnames=("row_chunk",))
    def s1_masks(ob, db, tb_, row_chunk):
        return ctiles._ray_masks(accel, ob, db, tb_, 1e-3, row_chunk)

    @partial(jax.jit, static_argnames=("cap", "tile_blocks", "tile_chunk"))
    def s2_pairs(cand, n_cand, cap, tile_blocks, tile_chunk):
        return ctiles._build_pairs(accel, cand, n_cand, cap, tile_blocks,
                                   tile_chunk)

    @partial(jax.jit,
             static_argnames=("cap", "tile_blocks", "tile_chunk",
                              "want_tri"))
    def s3_sweep(pairs, ob, db, tb_, cap, tile_blocks, tile_chunk, want_tri):
        return ctiles._sweep_resolve(accel, pairs, ob, db, tb_, 1e-3,
                                     cap, tile_blocks, tile_chunk, want_tri)

    ob, db, tbk = jax.block_until_ready(s0_prepare(o, d, tm, 8, "dir"))
    dt, _ = timeit(s0_prepare, o, d, tm, 8, "dir")
    emit("stage", name="s0_sort", ms=round(dt * 1e3, 1))

    cand, n_cand = jax.block_until_ready(s1_masks(ob, db, tbk, rc))
    dt, _ = timeit(s1_masks, ob, db, tbk, rc)
    emit("stage", name="s1_masks", ms=round(dt * 1e3, 1))

    pairs = jax.block_until_ready(
        s2_pairs(cand, n_cand, cap, tb, tc))
    dt, cs = timeit(s2_pairs, cand, n_cand, cap, tb, tc)
    emit("stage", name="s2_pairs", ms=round(dt * 1e3, 1),
         compile_s=round(cs, 1))

    for tc2 in [tc] + ([] if smoke else [1024, 2048]):
        p2 = jax.block_until_ready(s2_pairs(cand, n_cand, cap, tb, tc2))
        dt, cs = timeit(s3_sweep, p2, ob, db, tbk, cap, tb, tc2, True)
        emit("stage", name=f"s3_sweep_resolve_tc{tc2}",
             ms=round(dt * 1e3, 1), compile_s=round(cs, 1))

    # --- full waves ----------------------------------------------------------
    best = None
    for tag, kw in ([("b8/c48/tc1024", dict(cap=48, tile_chunk=1024)),
                     ("b8/c64/tc1024", dict(cap=64, tile_chunk=1024)),
                     ("b8/c48/tc2048", dict(cap=48, tile_chunk=2048))]
                    if not smoke else
                    [("smoke", dict(cap=8, tile_blocks=4, tile_chunk=4))]):
        dt, cs = timeit(lambda: ctiles.closest_hit_ctiles(
            accel, o, d, 1e-3, tm, **kw))
        emit("ctiles_bounce", tag=tag, ms=round(dt * 1e3, 1),
             mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))
        if best is None or dt < best[1]:
            best = (tag, dt, kw)
    bkw = best[2]
    log(f"best bounce: {best[0]}")

    po, pd, ptm = waves["primary"]
    dt, cs = timeit(lambda: ctiles.closest_hit_ctiles(
        accel, po, pd, 1e-3, ptm, **bkw))
    emit("ctiles_primary", tag=best[0], ms=round(dt * 1e3, 1),
         mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))

    # --- lane-major shadow ---------------------------------------------------
    n_lanes = n // 4
    so4, sd4, stm4 = lane_major_shadow(scene, n_lanes)
    live_rays = int((np.asarray(stm4) >= 0).sum())
    for tag, kw in ([("lane4/c24", dict(block=4, cap=24, sort=False)),
                     ("lane4/c32/tc1024",
                      dict(block=4, cap=32, sort=False, tile_chunk=1024))]
                    if not smoke else
                    [("smoke", dict(block=4, cap=8, tile_blocks=4,
                                    tile_chunk=4, sort=False))]):
        dt, cs = timeit(lambda: ctiles.any_hit_ctiles(
            accel, so4, sd4, 1e-3, stm4, **kw))
        emit("ctiles_shadow_lane", tag=tag, ms=round(dt * 1e3, 1),
             mrays_live=round(live_rays / dt / 1e6, 2),
             mrays_total=round(n / dt / 1e6, 2), compile_s=round(cs, 1))

    # --- e2e render + headline ----------------------------------------------
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.camera import default_camera

    camera = default_camera()
    if smoke:
        settings = RenderSettings(width=128, height=72, samples_per_pixel=2,
                                  max_bounces=5, seed=0)
        wavefront.CTILES_CLOSEST_KW = dict(cap=8, tile_blocks=4,
                                           tile_chunk=4)
        wavefront.CTILES_OCCLUDE_KW = dict(lane_major=True, block=4, cap=8,
                                           tile_blocks=4, tile_chunk=4,
                                           sort=False)
    else:
        settings = RenderSettings(width=1920, height=1080,
                                  samples_per_pixel=2, max_bounces=5, seed=0)
        wavefront.CTILES_CLOSEST_KW = bkw
        wavefront.CTILES_OCCLUDE_KW = dict(lane_major=True, block=4, cap=24,
                                           sort=False,
                                           tile_chunk=bkw.get("tile_chunk",
                                                              1024))
    wavefront.clear_executable_caches()
    t0 = time.perf_counter()
    warm = settings.replace(samples_per_pixel=1)
    wavefront.render(scene, camera, warm, accel=accel, block_size=64,
                     wave_size=1 << 20, backend="ctiles")
    log(f"[ctiles] warmup {time.perf_counter() - t0:.1f}s")
    stats = wavefront.RenderStats()
    t0 = time.perf_counter()
    img = wavefront.render(scene, camera, settings, accel=accel,
                           stats=stats, block_size=64, wave_size=1 << 20,
                           backend="ctiles")
    wall = time.perf_counter() - t0
    assert np.isfinite(img).all()
    emit("render", backend="ctiles", wall_s=round(wall, 2),
         mrays=round(stats.mrays_per_s, 3),
         total_mrays=round(stats.total_rays / 1e6, 1))

    # pool scheduler (regeneration): traversal now scales with live lanes
    if not smoke:
        stats = wavefront.RenderStats()
        t0 = time.perf_counter()
        img = wavefront.render(scene, camera, settings, accel=accel,
                               stats=stats, block_size=64,
                               wave_size=1 << 20, backend="ctiles",
                               scheduler="pool")
        wall = time.perf_counter() - t0
        assert np.isfinite(img).all()
        emit("render", backend="ctiles", scheduler="pool",
             wall_s=round(wall, 2), mrays=round(stats.mrays_per_s, 3),
             total_mrays=round(stats.total_rays / 1e6, 1))

    log("probe F complete")


if __name__ == "__main__":
    main()
