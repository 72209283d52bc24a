"""Round-2 probe J: why is in-render ctiles closest ~2x its synthetic rate?

Host-stepped bounces let us capture the REAL depth-1 wave (state after
bounce 0 of a 1080p render) and iso-measure the closest path + its stage
split on it, next to the synthetic bounce wave (455ms known). Then tests
targeted fixes on whatever stage diverges.

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
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.camera import default_camera

    scene, _ = _demo_scene(subdivisions=3 if smoke else 6)
    accel = build_clusters(scene.triangles, cluster_size=128)
    camera = default_camera()

    # --- capture the real depth-1..3 closest waves --------------------------
    w, h = (128, 72) if smoke else (1920, 1080)
    npix = w * h
    pix_chunk = min(npix, 1 << 20)
    sc = 1
    lanes_padded = -(-(pix_chunk * sc) // 64) * 64
    xs = np.arange(pix_chunk, dtype=np.int32) % w
    ys = np.arange(pix_chunk, dtype=np.int32) // w
    gen_statics = dict(w=w, h=h, sc=sc, pix_chunk=pix_chunk,
                       lanes_padded=lanes_padded, aspect=16.0 / 9.0)
    base_key = jax.random.key(np.uint32(0))
    o, d, keys, lane_s = jax.block_until_ready(
        wavefront._wave_gen_exe(**gen_statics)(
            camera, base_key, jnp.asarray(xs), jnp.asarray(ys), 0))
    n = o.shape[0]
    beta = jnp.ones((n, 3), jnp.float32)
    radiance = jnp.zeros((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    bounce = wavefront._bounce_exe(64, False, "hybrid")
    real_waves = {}
    for depth in range(3):
        out = jax.block_until_ready(bounce(
            scene, accel, o, d, beta, radiance, alive, keys,
            jnp.int32(depth)))
        o, d, beta, radiance, alive, _, _ = out
        tm = jnp.where(alive, jnp.inf, -1.0)
        real_waves[depth + 1] = (o, d, tm, int(jnp.sum(alive)))

    ckw = (dict(cap=8, tile_blocks=4, tile_chunk=8) if smoke
           else dict(cap=48, tile_chunk=2048))

    # --- iso closest on real waves ------------------------------------------
    for depth, (ro, rd, rtm, nlive) in real_waves.items():
        dt, cs = timeit(lambda: ctiles.closest_hit_ctiles(
            accel, ro, rd, 1e-3, rtm, **ckw))
        emit("real_closest", depth=depth, live=nlive,
             ms=round(dt * 1e3, 1),
             mrays_live=round(nlive / dt / 1e6, 2), compile_s=round(cs, 1))

    # --- stage split on the real depth-1 wave -------------------------------
    ro, rd, rtm, nlive = real_waves[1]

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

    rc = 1 << (6 if smoke else 11)
    tbl = ckw.get("tile_blocks", 16)
    ob, db, tbk = jax.block_until_ready(
        s0_prepare(ro, rd, rtm, 8, "octorig"))
    dt, _ = timeit(s0_prepare, ro, rd, rtm, 8, "octorig")
    emit("stage", name="s0_sort", ms=round(dt * 1e3, 1))
    cand, n_cand = jax.block_until_ready(s1_masks(ob, db, tbk, rc))
    dt, _ = timeit(s1_masks, ob, db, tbk, rc)
    emit("stage", name="s1_masks", ms=round(dt * 1e3, 1))
    sum_pairs = int(jnp.sum(jnp.where(n_cand > ckw["cap"], 0, n_cand)))
    emit("pairstat", sum_pairs=sum_pairs, live=nlive,
         overflow_blocks=int(jnp.sum(n_cand > ckw["cap"])))
    pr = jax.block_until_ready(
        s2_pairs(cand, n_cand, ckw["cap"], tbl, ckw["tile_chunk"]))
    dt, _ = timeit(s2_pairs, cand, n_cand, ckw["cap"], tbl,
                   ckw["tile_chunk"])
    emit("stage", name="s2_pairs", ms=round(dt * 1e3, 1))
    dt, cs = timeit(s3_sweep, pr, ob, db, tbk, ckw["cap"], tbl,
                    ckw["tile_chunk"], True)
    emit("stage", name="s3_sweep_resolve", ms=round(dt * 1e3, 1),
         compile_s=round(cs, 1))

    # --- cornell oracle noise floor (contextualizes RESULTS.md's 14.2%) -----
    if not smoke:
        from path_tracer_ai_tpu import benchmarks
        from path_tracer_ai_tpu.engine import oracle

        ccfg = benchmarks.get_configs(1.0)["cornell"]
        cscene, ccam = benchmarks.build_config_scene(ccfg)
        oa = oracle.render(cscene, ccam, ccfg.settings.replace(seed=2))
        ob2 = oracle.render(cscene, ccam, ccfg.settings.replace(seed=3))
        emit("cornell_noise_floor",
             floor_pct=round(100 * benchmarks.rmse(oa, ob2), 3),
             mean_rel_pct=round(
                 100 * abs(float(oa.mean()) - float(ob2.mean()))
                 / max(float(ob2.mean()), 1e-9), 3))

    # --- e2e + headline with live-prefix culling ----------------------------
    from path_tracer_ai_tpu.config import RenderSettings

    if smoke:
        settings = RenderSettings(width=128, height=72, samples_per_pixel=2,
                                  max_bounces=5, seed=0)
        wavefront.CTILES_CLOSEST_KW = ckw
    else:
        settings = RenderSettings(width=1920, height=1080,
                                  samples_per_pixel=2, max_bounces=5, seed=0)
    wavefront.clear_executable_caches()
    t0 = time.perf_counter()
    warm = settings.replace(samples_per_pixel=1)
    wavefront.render(scene, camera, warm, accel=accel, block_size=64,
                     wave_size=1 << 20)
    log(f"[default e2e] warmup {time.perf_counter() - t0:.1f}s")
    stats = wavefront.RenderStats()
    t0 = time.perf_counter()
    img = wavefront.render(scene, camera, settings, accel=accel,
                           stats=stats, block_size=64, wave_size=1 << 20)
    wall = time.perf_counter() - t0
    assert np.isfinite(img).all()
    emit("render", tag="default/liveprefix", wall_s=round(wall, 2),
         mrays=round(stats.mrays_per_s, 3),
         total_mrays=round(stats.total_rays / 1e6, 1))

    log("probe J complete")


if __name__ == "__main__":
    main()
