"""Round-2 probe I: host-stepped scheduler e2e + ctiles shadow + headline.

Probe H (fused scheduler): hybrid (ctiles closest + packet shadow) e2e
2.21 Mrays/s. This probe measures the HOST-STEPPED scheduler (committed
after H), per-bounce wall times, the never-measured ctiles-v2 light-major
shadow (its per-ray unions are tiny — cap 48 >> p99 18 — so it has no
fallback cliff), and the bench.py headline with the final config.

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

    from __graft_entry__ import _demo_scene
    from path_tracer_ai_tpu.accel import ctiles
    from path_tracer_ai_tpu.accel.clusters import build_clusters
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.camera import default_camera
    from scripts.perf_probe_r2 import make_waves

    scene, _ = _demo_scene(subdivisions=3 if smoke else 6)
    accel = build_clusters(scene.triangles, cluster_size=128)
    camera = default_camera()
    n = 1 << (14 if smoke else 20)
    waves = make_waves(scene, n)

    # --- 1. ctiles v2 light-major shadow (synthetic) ------------------------
    so, sd, stm = waves["shadow"]
    for tag, kw in ([("c48/tc2048", dict(cap=48, tile_chunk=2048))]
                    if not smoke else
                    [("smoke", dict(cap=8, tile_blocks=4, tile_chunk=8))]):
        dt, cs = timeit(lambda: ctiles.any_hit_ctiles(
            accel, so, sd, 1e-3, stm, **kw))
        emit("ctiles_shadow_lm", tag=tag, ms=round(dt * 1e3, 1),
             mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))

    # --- 2. e2e renders: hybrid (pkt shadow) and hybrid (ctiles shadow) -----
    if smoke:
        settings = RenderSettings(width=128, height=72, samples_per_pixel=2,
                                  max_bounces=5, seed=0)
        wavefront.CTILES_CLOSEST_KW = dict(cap=8, tile_blocks=4,
                                           tile_chunk=8)
    else:
        settings = RenderSettings(width=1920, height=1080,
                                  samples_per_pixel=2, max_bounces=5, seed=0)

    def e2e(tag, backend="hybrid"):
        wavefront.clear_executable_caches()
        t0 = time.perf_counter()
        warm = settings.replace(samples_per_pixel=1)
        wavefront.render(scene, camera, warm, accel=accel, block_size=64,
                         wave_size=1 << 20, backend=backend)
        log(f"[{tag}] warmup {time.perf_counter() - t0:.1f}s")
        stats = wavefront.RenderStats()
        t0 = time.perf_counter()
        img = wavefront.render(scene, camera, settings, accel=accel,
                               stats=stats, block_size=64,
                               wave_size=1 << 20, backend=backend)
        wall = time.perf_counter() - t0
        assert np.isfinite(img).all()
        emit("render", tag=tag, wall_s=round(wall, 2),
             mrays=round(stats.mrays_per_s, 3),
             total_mrays=round(stats.total_rays / 1e6, 1))
        return stats.mrays_per_s

    r_pkt = e2e("hybrid/pktshadow")

    # per-bounce timing of one real wave (host-stepped scheduler exposes it)
    if not smoke:
        import math

        w, h, spp = settings.width, settings.height, 1
        npix = w * h
        pix_chunk = min(npix, 1 << 20)
        sc = 1
        lanes_padded = -(-(pix_chunk * sc) // 64) * 64
        xs = np.arange(pix_chunk, dtype=np.int32) % w
        ys = np.arange(pix_chunk, dtype=np.int32) // w
        gen_statics = dict(w=w, h=h, sc=sc, pix_chunk=pix_chunk,
                           lanes_padded=lanes_padded,
                           aspect=16.0 / 9.0)
        base_key = jax.random.key(np.uint32(0))
        o, d, keys, lane_s = jax.block_until_ready(
            wavefront._wave_gen_exe(**gen_statics)(
                camera, base_key, jnp.asarray(xs), jnp.asarray(ys), 0))
        nlane = o.shape[0]
        beta = jnp.ones((nlane, 3), jnp.float32)
        radiance = jnp.zeros((nlane, 3), jnp.float32)
        alive = jnp.ones((nlane,), bool)
        bounce = wavefront._bounce_exe(64, False, "hybrid")
        for depth in range(5):
            t0 = time.perf_counter()
            out = bounce(scene, accel, o, d, beta, radiance, alive, keys,
                         jnp.int32(depth))
            out = jax.block_until_ready(out)
            o, d, beta, radiance, alive, nc_i, ns_i = out
            emit("bounce_time", depth=depth,
                 ms=round((time.perf_counter() - t0) * 1e3, 1),
                 live=int(jnp.sum(alive)), nc=int(nc_i), ns=int(ns_i))

    # ctiles shadow e2e variant
    wavefront.HYBRID_OCCLUDE_KW = dict(engine="ctiles")
    orig_backend = wavefront.packet_backend

    def with_ctiles_shadow(accel_, block_size, use_pallas=False,
                           backend=None):
        closest, _ = orig_backend(accel_, block_size, backend="hybrid")
        ckw = (dict(cap=8, tile_blocks=4, tile_chunk=8) if smoke
               else dict(cap=48, tile_chunk=2048))

        def occlude(o_, d_, t_max):
            return ctiles.any_hit_ctiles(accel_, o_, d_, 1e-3, t_max,
                                         **ckw)

        return closest, occlude

    wavefront.packet_backend = with_ctiles_shadow
    try:
        r_ct = e2e("hybrid/ctilesshadow", backend="hybrid")
    finally:
        wavefront.packet_backend = orig_backend
        wavefront.HYBRID_OCCLUDE_KW = dict(engine="packets")

    # --- 3. bench headline (exactly what the driver runs) -------------------
    if not smoke:
        wavefront.clear_executable_caches()
        stats = wavefront.RenderStats()
        t0 = time.perf_counter()
        wavefront.render(scene, camera, settings.replace(seed=1),
                         stats=stats, block_size=64, wave_size=1 << 20)
        emit("bench_headline", mrays=round(stats.mrays_per_s, 3),
             wall_s=round(time.perf_counter() - t0, 2),
             note="default backend, warm from prior compiles? separate jit "
                  "keys -> cold; value is conservative")

    log("probe I complete")


if __name__ == "__main__":
    main()
