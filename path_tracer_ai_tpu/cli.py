"""CLI driver (mirrors src/main.cpp:10-126).

Exposes the reference's exact 8 flags with identical defaults
(main.cpp:15-24):

    -m/--mode cpu|gpu|tpu   (default gpu; "gpu" and "tpu" both select the
                             accelerated wavefront engine — the TPU plays the
                             reference's GPU role)
    -w/--width 800   -h/--height 450   -s/--samples 100   -b/--bounces 5
    -g/--gamma 2.2   -i/--input IronMan/IronMan.obj   -o/--output output.png

Mode dispatch and the accelerated->oracle automatic fallback mirror
main.cpp:54-117 (GPU failure -> CPU rerun). Extensions (all optional, off by
default): --seed, --aspect, --dielectric, --checkpoint/--checkpoint-every for
progressive resume, --tile-devices for multi-chip runs.
"""

from __future__ import annotations

import argparse
import sys
import time

from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.utils.logging import configure_cli_logging, get_logger

log = get_logger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="path-tracer",
        description="TPU-accelerated path tracer (JAX/XLA/Pallas)",
        add_help=False,  # reference uses -h for height (main.cpp:18)
    )
    p.add_argument("-m", "--mode", default="gpu", choices=["cpu", "gpu", "tpu"],
                   help="Rendering mode (cpu = oracle engine, gpu/tpu = wavefront engine)")
    p.add_argument("-w", "--width", type=int, default=800, help="Image width")
    p.add_argument("-h", "--height", type=int, default=450, help="Image height")
    p.add_argument("-s", "--samples", type=int, default=100, help="Samples per pixel")
    p.add_argument("-b", "--bounces", type=int, default=5, help="Maximum ray bounces")
    p.add_argument("-g", "--gamma", type=float, default=2.2, help="Gamma correction value")
    p.add_argument("-i", "--input", default="IronMan/IronMan.obj", help="Input OBJ file path")
    p.add_argument("-o", "--output", default="output.png", help="Output image file path")
    p.add_argument("--help", action="help", help="Print help")
    # --- extensions beyond the reference CLI -------------------------------
    p.add_argument("--seed", type=int, default=0,
                   help="RNG seed (reference is entropy-seeded; pass -1 for that)")
    p.add_argument("--aspect", default="fixed", choices=["fixed", "true"],
                   help="fixed = reference 16:9 camera quirk (default), true = real aspect")
    p.add_argument("--dielectric", action="store_true",
                   help="enable dielectric materials from MTL (glass/illum 7/d<1)")
    p.add_argument("--rr", type=int, default=0, metavar="N",
                   help="Russian roulette from bounce N (unbiased "
                        "throughput-proportional termination; 0 = off, "
                        "matching the reference's fixed-depth cutoff)")
    p.add_argument("--checkpoint", default=None,
                   help="progressive checkpoint file for save/resume")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="checkpoint every N sample-passes (0 = only at end)")
    p.add_argument("--tile-devices", type=int, default=0,
                   help="shard the framebuffer across N devices (0 = single device)")
    p.add_argument("--scheduler", default="wave", choices=["wave", "pool"],
                   help="wavefront scheduler: bounded-depth waves or "
                        "persistent pool with on-device ray regeneration")
    p.add_argument("--backend", default=None,
                   choices=["packets", "worklist", "pairs", "hybrid",
                            "kslots", "ctiles", "perray", "pallas"],
                   help="traversal backend (default: measured best)")
    p.add_argument("--validate", action="store_true",
                   help="audit the final image for NaN/Inf/sentinel pixels")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the render into DIR")
    return p


def main(argv=None) -> int:
    # Platform override via OUR env var: this image's sitecustomize pins
    # JAX_PLATFORMS to the TPU plugin before user code runs, so the standard
    # env var cannot select the CPU backend. jax.config still can, as long
    # as we set it before first device use (PT_PLATFORM=cpu|tpu|axon).
    import os

    plat = os.environ.get("PT_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", "cpu" if plat == "cpu" else plat)

    configure_cli_logging()
    args = build_parser().parse_args(argv)

    settings = RenderSettings(
        width=args.width,
        height=args.height,
        samples_per_pixel=args.samples,
        max_bounces=args.bounces,
        gamma=args.gamma,
        aspect_mode=args.aspect,
        seed=None if args.seed == -1 else args.seed,
        rr_start=args.rr,
    )

    from path_tracer_ai_tpu.scene.camera import default_camera
    from path_tracer_ai_tpu.scene.scene import build_scene
    from path_tracer_ai_tpu.io.image import save_image

    try:
        scene = build_scene(args.input, enable_dielectrics=args.dielectric)
    except (OSError, ValueError) as e:
        log.error("Failed to load model: %s (%s)", args.input, e)
        return 1

    camera = default_camera()

    profile_ctx = None
    if args.profile:
        from path_tracer_ai_tpu.utils.profiling import trace

        profile_ctx = trace(args.profile)
        profile_ctx.__enter__()

    start = time.perf_counter()
    if args.mode == "cpu":
        from path_tracer_ai_tpu.engine import oracle

        image = oracle.render(scene, camera, settings, show_progress=True)
    else:
        # Accelerated path with automatic oracle fallback (main.cpp:98-113).
        try:
            from path_tracer_ai_tpu.engine import wavefront

            image = wavefront.render(
                scene,
                camera,
                settings,
                checkpoint_path=args.checkpoint,
                checkpoint_every=args.checkpoint_every,
                tile_devices=args.tile_devices or None,
                scheduler=args.scheduler,
                backend=args.backend,
            )
        except Exception as e:  # noqa: BLE001 — mirror whole-pipeline fallback
            log.error("Accelerated rendering failed: %s", e)
            log.error("Falling back to oracle (CPU-semantics) rendering...")
            from path_tracer_ai_tpu.engine import oracle

            image = oracle.render(scene, camera, settings, show_progress=True)
    elapsed = time.perf_counter() - start
    log.info("Rendering completed in %.3f seconds", elapsed)

    if profile_ctx is not None:
        profile_ctx.__exit__(None, None, None)
    if args.validate:
        from path_tracer_ai_tpu.utils.debug import validate_image

        audit = validate_image(image)
        log.info("Image audit: %s", audit)

    save_image(args.output, image, settings.gamma)
    return 0


if __name__ == "__main__":
    sys.exit(main())
