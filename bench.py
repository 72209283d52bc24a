"""Benchmark harness: prints ONE JSON line with the headline metric.

Metric: Mrays/s on one chip rendering the GPU-parity-class config
(1920x1080, 5 bounces — BASELINE.json config 4) on the procedural
IronMan-stand-in scene (~82k triangles; the real asset is not shipped by the
reference). vs_baseline is the ratio against the BASELINE.md north-star
target of 100 Mrays/s/chip on v5e.

Rays counted = live closest-hit rays + live shadow rays actually traced
(engine.tracer stats), NOT padded/dead lanes.

Usage: python bench.py [--spp N] [--width W] [--height H] [--quick]
Extra diagnostics go to stderr; stdout carries exactly one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--subdiv", type=int, default=6)  # 20*4^6 = 81920 tris
    ap.add_argument("--quick", action="store_true", help="tiny config for smoke")
    ap.add_argument("--backend", default=None,
                    help="traversal backend override (worklist/packets/pairs)")
    ap.add_argument("--cluster-size", type=int, default=128)
    args = ap.parse_args()
    if args.quick:
        args.width, args.height, args.spp, args.subdiv = 320, 180, 2, 3

    import jax

    log(f"devices: {jax.devices()}")

    import numpy as np

    from path_tracer_ai_tpu.accel.clusters import build_clusters
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.camera import default_camera

    sys.path.insert(0, ".")
    from __graft_entry__ import _demo_scene

    t0 = time.perf_counter()
    scene, accel = _demo_scene(subdivisions=args.subdiv)
    if args.cluster_size != 128:
        from path_tracer_ai_tpu.accel.clusters import build_clusters

        accel = build_clusters(scene.triangles, cluster_size=args.cluster_size)
    log(
        f"scene: {scene.triangles.count} tris, accel {accel.num_clusters}x"
        f"{accel.cluster_size} ({time.perf_counter() - t0:.2f}s build)"
    )

    camera = default_camera()
    settings = RenderSettings(
        width=args.width, height=args.height, samples_per_pixel=args.spp,
        max_bounces=args.bounces, seed=0,
    )

    # Warmup/compile pass with IDENTICAL settings: live-lane compaction
    # compiles one bounce executable per power-of-2 bucket size, and bucket
    # sizes depend on per-sample live counts — an identical warmup render
    # guarantees every executable the timed pass needs is already cached.
    warm = settings.replace(samples_per_pixel=min(args.spp, 2))
    t0 = time.perf_counter()
    wavefront.render(scene, camera, warm, accel=accel, block_size=64,
                     wave_size=1 << 20, backend=args.backend)
    log(f"warmup (compile) pass: {time.perf_counter() - t0:.1f}s")

    stats = wavefront.RenderStats()
    t0 = time.perf_counter()
    img = wavefront.render(scene, camera, settings, accel=accel, stats=stats,
                           block_size=64, wave_size=1 << 20,
                           backend=args.backend)
    wall = time.perf_counter() - t0
    log(
        f"render {args.width}x{args.height}@{args.spp}spp/{args.bounces}b: "
        f"{wall:.2f}s, {stats.total_rays/1e6:.1f}M rays, "
        f"{stats.mrays_per_s:.2f} Mrays/s"
    )
    assert np.isfinite(img).all()

    result = {
        "metric": "Mrays/s/chip (1080p procedural IronMan-class scene, wavefront engine)",
        "value": round(stats.mrays_per_s, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(stats.mrays_per_s / 100.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
