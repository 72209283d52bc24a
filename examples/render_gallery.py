"""Render a small gallery of the BASELINE configs (scaled down).

Produces PNGs under docs/renders/ as visual artifacts:
  python examples/render_gallery.py [--scale 0.1] [--outdir docs/renders]

Full-size runs of the same configs go through path_tracer_ai_tpu.benchmarks.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.1,
                    help="resolution + spp scale factor")
    ap.add_argument("--outdir", default="docs/renders")
    ap.add_argument("--subdiv", type=int, default=4,
                    help="blob subdivisions (4 = 5120 tris, 6 = 82k)")
    ap.add_argument("--configs", nargs="*",
                    default=["cornell", "cpu-ref", "dielectric"])
    args = ap.parse_args()

    from path_tracer_ai_tpu import benchmarks
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.io.image import save_image
    from path_tracer_ai_tpu.utils.debug import validate_image
    from path_tracer_ai_tpu.utils.logging import configure_cli_logging

    configure_cli_logging()
    os.makedirs(args.outdir, exist_ok=True)

    for name in args.configs:
        cfg = benchmarks.get_configs(scale=args.scale)[name]
        w = max(64, int(cfg.settings.width * args.scale))
        h = max(36, int(cfg.settings.height * args.scale))
        settings = cfg.settings.replace(width=w, height=h)
        scene, camera = benchmarks.build_config_scene(cfg, subdivisions=args.subdiv)
        t0 = time.perf_counter()
        img = wavefront.render(scene, camera, settings)
        audit = validate_image(img)
        out = os.path.join(args.outdir, f"{name}.png")
        save_image(out, img, settings.gamma)
        print(f"[{name}] {w}x{h}@{settings.samples_per_pixel}spp "
              f"in {time.perf_counter()-t0:.1f}s -> {out} "
              f"(finite={audit.finite}, magenta={audit.n_magenta})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
