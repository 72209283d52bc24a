"""Pinhole camera (mirrors Camera, reference include/camera.hpp:7-44).

The basis construction and ray generation reproduce the reference exactly,
including its quirk: the CPU camera hardcodes a 16:9 viewport regardless of
the actual image resolution (camera.hpp:22). RenderSettings.aspect_mode
controls whether we reproduce that ("fixed", default) or use the true aspect.

Vectorized: get_rays takes [..., ] u/v arrays and returns [..., 3] origins and
directions, so the whole pixel grid is generated in one fused XLA op.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from path_tracer_ai_tpu.core import vec


class Camera(NamedTuple):
    position: jnp.ndarray  # [3]
    forward: jnp.ndarray   # [3]
    right: jnp.ndarray     # [3]
    up: jnp.ndarray        # [3]
    fov_deg: jnp.ndarray   # [] scalar


def make_camera(position, target, up, fov_deg) -> Camera:
    """Basis construction mirroring camera.hpp:9-16 (numpy, host-side)."""
    position = np.asarray(position, dtype=np.float32)
    target = np.asarray(target, dtype=np.float32)
    up = np.asarray(up, dtype=np.float32)

    forward = target - position
    forward = forward / np.linalg.norm(forward)
    upn = up / np.linalg.norm(up)
    right = np.cross(forward, upn)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, forward)  # NOT renormalized (camera.hpp:15)

    return Camera(
        position=jnp.asarray(position),
        forward=jnp.asarray(forward),
        right=jnp.asarray(right),
        up=jnp.asarray(true_up),
        fov_deg=jnp.asarray(np.float32(fov_deg)),
    )


def default_camera() -> Camera:
    """The hardcoded camera of the reference CLI (src/main.cpp:46-51)."""
    return make_camera(
        position=(0.0, 2.0, 5.0),
        target=(0.0, 1.8, 0.0),
        up=(0.0, 1.0, 0.0),
        fov_deg=45.0,
    )


def get_rays(camera: Camera, u: jnp.ndarray, v: jnp.ndarray, aspect: float):
    """Generate normalized camera rays (camera.hpp:18-29).

    u, v: [...] viewport coordinates in [0, 1] (v increases UP the viewport,
    matching the reference; see SURVEY.md §3.5 on the vertical-flip
    convention). Returns (origins [..., 3], directions [..., 3]).
    """
    theta = camera.fov_deg * (math.pi / 180.0)
    h = jnp.tan(theta / 2.0)
    viewport_height = 2.0 * h
    viewport_width = viewport_height * aspect

    horizontal = viewport_width * camera.right
    vertical = viewport_height * camera.up
    lower_left = -horizontal / 2.0 - vertical / 2.0 + camera.forward

    d = lower_left + u[..., None] * horizontal + v[..., None] * vertical
    directions = vec.normalize(d)
    origins = jnp.broadcast_to(camera.position, directions.shape)
    return origins, directions


def pixel_uv(x, y, width: int, height: int):
    """Deterministic part of the pixel->viewport mapping (renderer.hpp:63-64).

    The reference divides by (dim - 1), not dim. Jitter is added by the caller
    before calling get_rays.
    """
    u = x / (width - 1)
    v = y / (height - 1)
    return u, v
