"""Round-2 probe G: final backend decision + headline measurements.

From probe F (ctiles v2): bounce 2.3 Mrays/s (c48/tc2048), primary 4.9;
lane-major ctiles shadow loses to the light-major worklist (its
conservative cull is tight when consecutive lanes share a light). The
production mix is therefore hybrid = ctiles closest + unsorted worklist
occlusion with a fallback_compact that covers in-render shadow overflow.

Measures: sweep tc asymptote, hybrid e2e (wave + pool schedulers), and
the 1.3M-triangle scene (worklist 2-level) — then the bench headline.

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
    from path_tracer_ai_tpu.accel import ctiles, worklist
    from path_tracer_ai_tpu.accel.clusters import build_clusters
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.camera import default_camera
    from scripts.perf_probe_r2 import make_waves

    scene, _ = _demo_scene(subdivisions=3 if smoke else 6)
    accel = build_clusters(scene.triangles, cluster_size=128)
    n = 1 << (14 if smoke else 20)
    waves = make_waves(scene, n)
    o, d, tm = waves["bounce"]

    # --- 1. sweep tc asymptote ----------------------------------------------
    for tc in ([8] if smoke else [4096, 8192]):
        kw = dict(cap=8 if smoke else 48, tile_chunk=tc)
        if smoke:
            kw["tile_blocks"] = 4
        dt, cs = timeit(lambda: ctiles.closest_hit_ctiles(
            accel, o, d, 1e-3, tm, **kw))
        emit("ctiles_bounce", tag=f"c48/tc{tc}", ms=round(dt * 1e3, 1),
             mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))

    # --- 2. shadow: light-major worklist (engine path) ----------------------
    so, sd, stm = waves["shadow"]
    for tag, kw in [("wl/nosort", dict(sort=False,
                                       fallback_compact=1 << 19))]:
        dt, cs = timeit(lambda: worklist.any_hit_worklist(
            accel, so, sd, 1e-3, stm, **kw))
        emit("shadow", tag=tag, ms=round(dt * 1e3, 1),
             mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))

    # --- 3. e2e hybrid: wave + pool schedulers ------------------------------
    camera = default_camera()
    if smoke:
        settings = RenderSettings(width=128, height=72, samples_per_pixel=2,
                                  max_bounces=5, seed=0)
        wavefront.CTILES_CLOSEST_KW = dict(cap=8, tile_blocks=4,
                                           tile_chunk=8)
    else:
        settings = RenderSettings(width=1920, height=1080,
                                  samples_per_pixel=2, max_bounces=5, seed=0)

    for scheduler in ["wave", "pool"]:
        t0 = time.perf_counter()
        warm = settings.replace(samples_per_pixel=1)
        wavefront.render(scene, camera, warm, accel=accel, block_size=64,
                         wave_size=1 << 20, backend="hybrid",
                         scheduler=scheduler)
        log(f"[hybrid/{scheduler}] warmup {time.perf_counter() - t0:.1f}s")
        stats = wavefront.RenderStats()
        t0 = time.perf_counter()
        img = wavefront.render(scene, camera, settings, accel=accel,
                               stats=stats, block_size=64,
                               wave_size=1 << 20, backend="hybrid",
                               scheduler=scheduler)
        wall = time.perf_counter() - t0
        assert np.isfinite(img).all()
        emit("render", backend="hybrid", scheduler=scheduler,
             wall_s=round(wall, 2), mrays=round(stats.mrays_per_s, 3),
             total_mrays=round(stats.total_rays / 1e6, 1))

    # --- 4. 1.3M-triangle scene (worklist 2-level routing) ------------------
    if not smoke:
        t0 = time.perf_counter()
        big_scene, _ = _demo_scene(subdivisions=8)
        big_accel = build_clusters(big_scene.triangles, cluster_size=128)
        emit("bigscene", tris=int(big_scene.triangles.count),
             clusters=big_accel.num_clusters,
             build_s=round(time.perf_counter() - t0, 1))
        s_big = RenderSettings(width=960, height=540, samples_per_pixel=1,
                               max_bounces=5, seed=0)
        t0 = time.perf_counter()
        wavefront.render(big_scene, camera, s_big, accel=big_accel,
                         block_size=64, wave_size=1 << 19)
        log(f"[1.3M warmup] {time.perf_counter() - t0:.1f}s")
        stats = wavefront.RenderStats()
        t0 = time.perf_counter()
        img = wavefront.render(big_scene, camera, s_big, accel=big_accel,
                               stats=stats, block_size=64,
                               wave_size=1 << 19)
        wall = time.perf_counter() - t0
        assert np.isfinite(img).all()
        emit("render_1p3M", wall_s=round(wall, 2),
             mrays=round(stats.mrays_per_s, 3),
             total_mrays=round(stats.total_rays / 1e6, 1))

    log("probe G complete")


if __name__ == "__main__":
    main()
