"""Image finalization: clamp -> gamma -> 8-bit -> PNG.

Mirrors Renderer::saveImage (src/renderer.cpp:5-21) exactly:
clamp(c, 0, 1) ** (1/gamma), * 255, truncating cast to uint8. Row 0 of the
framebuffer becomes the TOP PNG row — which, combined with the camera's
v-up viewport mapping, yields the reference's vertically-flipped output
convention (SURVEY.md §3.5). We reproduce it so images are pixel-comparable.
"""

from __future__ import annotations

import numpy as np

from path_tracer_ai_tpu.io.png import write_png
from path_tracer_ai_tpu.utils.logging import get_logger

log = get_logger(__name__)


def tonemap_to_u8(image: np.ndarray, gamma: float) -> np.ndarray:
    """[H,W,3] linear float -> [H,W,3] uint8 (renderer.cpp:9-16)."""
    img = np.clip(np.asarray(image, np.float32), 0.0, 1.0)
    img = np.power(img, 1.0 / gamma)
    return (img * 255.0).astype(np.uint8)  # truncating, like static_cast


def save_image(path: str, image: np.ndarray, gamma: float) -> None:
    write_png(path, tonemap_to_u8(image, gamma))
    log.info("Image saved as: %s", path)
