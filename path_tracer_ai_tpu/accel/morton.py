"""Morton (Z-order) codes, host (numpy) and device (jnp) variants.

Used two ways:
- host: ordering triangles into spatially-local clusters at build time
  (the TPU-native replacement for the reference's median-split BVH,
  bvh.hpp:44-72 — see accel.clusters)
- device: per-wave ray sort keys in the wavefront engine (coherence
  restoration, the TPU analog of GPU ray binning)
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _part1by2_np(x: np.ndarray) -> np.ndarray:
    """Spread 10 bits to every 3rd bit (numpy uint32)."""
    x = x.astype(np.uint32) & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton3d_np(points: np.ndarray, bmin: np.ndarray, bmax: np.ndarray, bits: int = 10):
    """30-bit Morton codes for [N,3] points within [bmin, bmax]."""
    extent = np.maximum(bmax - bmin, 1e-12)
    q = np.clip((points - bmin) / extent, 0.0, 1.0 - 1e-7)
    scale = float(1 << bits)
    cells = np.minimum((q * scale).astype(np.uint32), (1 << bits) - 1)
    return (
        (_part1by2_np(cells[:, 0]) << 2)
        | (_part1by2_np(cells[:, 1]) << 1)
        | _part1by2_np(cells[:, 2])
    )


def _part1by2_jnp(x):
    x = x.astype(jnp.uint32) & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton3d(points, bmin, bmax, bits: int = 9):
    """Device Morton codes ([..., 3] points -> uint32), up to 10 bits/axis."""
    extent = jnp.maximum(bmax - bmin, 1e-12)
    q = jnp.clip((points - bmin) / extent, 0.0, 1.0 - 1e-7)
    cells = jnp.minimum(
        (q * float(1 << bits)).astype(jnp.uint32), (1 << bits) - 1
    )
    return (
        (_part1by2_jnp(cells[..., 0]) << 2)
        | (_part1by2_jnp(cells[..., 1]) << 1)
        | _part1by2_jnp(cells[..., 2])
    )
