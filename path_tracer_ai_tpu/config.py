"""Render configuration.

Mirrors the reference's two Settings structs and CLI defaults:
- `Renderer::Settings` (reference include/renderer.hpp:16-29): 800x450, 10 spp,
  3 bounces, gamma 2.2 — struct defaults, overridden by the CLI in practice.
- CLI defaults (reference src/main.cpp:15-24): gpu mode, 800x450, 100 spp,
  5 bounces, gamma 2.2, IronMan/IronMan.obj, output.png. CLI defaults win.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Settings shared by all engines (oracle and wavefront).

    Defaults follow the reference CLI (src/main.cpp:15-24), not the
    Renderer::Settings struct, because the CLI always overrides the struct.
    """

    width: int = 800
    height: int = 450
    samples_per_pixel: int = 100
    max_bounces: int = 5
    gamma: float = 2.2

    # --- extensions beyond the reference (default to reference behavior) ---
    # The reference CPU camera hardcodes a 16:9 viewport regardless of the
    # actual resolution (camera.hpp:22). "fixed" reproduces that; "true" uses
    # width/height like the (buggy) GPU path intended (optix_kernels.cu:72-85).
    aspect_mode: str = "fixed"  # "fixed" (16:9, reference CPU) | "true"
    # RNG seed. The reference seeds from std::random_device (non-reproducible);
    # we default to a fixed seed so renders are reproducible, pass None for
    # entropy-seeded behavior.
    seed: int | None = 0
    # Russian roulette (opt-in extension; the reference has NONE —
    # renderer.hpp:129-250 uses a fixed-depth cutoff only, and rr_start=0
    # preserves that quirk bit-exactly). rr_start=N >= 1 applies unbiased
    # throughput-proportional termination to every path continuation
    # leaving a vertex of depth >= N: survive with p = clamp(max(beta),
    # rr floor, 1), then beta /= p. Cuts deep-bounce work (the 16-bounce 4K
    # config) at identical expected radiance.
    rr_start: int = 0

    def aspect_ratio(self) -> float:
        if self.aspect_mode == "fixed":
            return 16.0 / 9.0
        return float(self.width) / float(self.height)

    def replace(self, **kw) -> "RenderSettings":
        return dataclasses.replace(self, **kw)


# Struct defaults of the reference CPU renderer, kept for API parity
# (include/renderer.hpp:23-28). Use RenderSettings() for CLI-equivalent runs.
RENDERER_STRUCT_DEFAULTS = RenderSettings(
    width=800, height=450, samples_per_pixel=10, max_bounces=3, gamma=2.2
)
