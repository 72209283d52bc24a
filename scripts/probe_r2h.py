"""Round-2 probe H: why does hybrid e2e (0.6) sit 8x below its synthetic
mix (~4.8)? Leading suspect: in-render bounce waves carry heavier union
tails than the synthetic wave; with cap=48 the overflow population tops
fallback_compact=2^17 and EVERY closest call pays a whole-wave packets
fallback (the exact failure that sank the worklist e2e).

Tests, in order:
1. hybrid e2e with cap=96 + fallback_compact=2^19 on both paths.
2. packets-closest + worklist-shadow e2e (isolates the shadow half).
3. per-wave host timing of the best config (single _render_wave calls).

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


def main():
    smoke = "--cpu" in sys.argv
    import jax

    if smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    emit("devices", platform=jax.devices()[0].platform)

    from __graft_entry__ import _demo_scene
    from path_tracer_ai_tpu.accel.clusters import build_clusters
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.camera import default_camera

    scene, _ = _demo_scene(subdivisions=3 if smoke else 6)
    accel = build_clusters(scene.triangles, cluster_size=128)
    camera = default_camera()
    if smoke:
        settings = RenderSettings(width=128, height=72, samples_per_pixel=2,
                                  max_bounces=5, seed=0)
    else:
        settings = RenderSettings(width=1920, height=1080,
                                  samples_per_pixel=2, max_bounces=5, seed=0)

    def e2e(tag, backend, ckw=None, okw=None):
        if ckw is not None:
            wavefront.CTILES_CLOSEST_KW = ckw
        if okw is not None:
            wavefront.HYBRID_OCCLUDE_KW = okw
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
        emit("render", tag=tag, backend=backend, wall_s=round(wall, 2),
             mrays=round(stats.mrays_per_s, 3),
             total_mrays=round(stats.total_rays / 1e6, 1))
        return stats.mrays_per_s

    if smoke:
        e2e("smoke", "hybrid",
            ckw=dict(cap=16, tile_blocks=4, tile_chunk=8,
                     fallback_compact=1 << 12),
            okw=dict(sort=False, fallback_compact=1 << 12))
        log("probe H smoke complete")
        return

    # 1. wide caps + big compact fallback
    r1 = e2e("hybrid/c96/fc19", "hybrid",
             ckw=dict(cap=96, tile_chunk=2048, fallback_compact=1 << 19),
             okw=dict(sort=False, cap=96, item_budget=8,
                      fallback_compact=1 << 19))

    # 2. isolate: packets closest + worklist shadow
    import functools

    orig = wavefront.packet_backend

    def mixed_backend(accel_, block_size, use_pallas=False, backend=None):
        closest, _ = orig(accel_, block_size, backend="packets")
        from path_tracer_ai_tpu.accel import worklist

        def occlude(o, d, t_max):
            return worklist.any_hit_worklist(
                accel_, o, d, 1e-3, t_max, sort=False, cap=96,
                item_budget=8, fallback_compact=1 << 19)

        return closest, occlude

    wavefront.packet_backend = mixed_backend
    try:
        e2e("packets+wlshadow", "packets")
    finally:
        wavefront.packet_backend = orig

    # 3. packets closest + ctiles... reverse isolation: ctiles closest +
    # packets shadow
    def mixed2(accel_, block_size, use_pallas=False, backend=None):
        from path_tracer_ai_tpu.accel import ctiles

        def closest(o, d, t_min, t_max):
            return ctiles.closest_hit_ctiles(
                accel_, o, d, 1e-3, t_max, cap=96, tile_chunk=2048,
                fallback_compact=1 << 19)

        _, occlude = orig(accel_, block_size, backend="packets")
        return closest, occlude

    wavefront.packet_backend = mixed2
    try:
        e2e("ctiles+pktshadow", "packets")
    finally:
        wavefront.packet_backend = orig

    log("probe H complete")


if __name__ == "__main__":
    main()
