"""Device buffer utilities (the CUDABuffer role, SURVEY.md §2.13).

The reference wraps cudaMalloc/cudaMemcpy in an RAII template with size
checking and logging (cuda_utils.hpp:56-92, cuda_utils.inl:10-112). Under
JAX the runtime owns allocation/lifetime, so the equivalent surface is a
thin, observable layer over device placement:

- upload / download with dtype+size accounting
- scene_to_device: one-call placement of a SceneData with a size report
- device_memory_stats: live/peak bytes where the backend exposes them
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp

from path_tracer_ai_tpu.utils.logging import get_logger

log = get_logger(__name__)


def nbytes_of(tree: Any) -> int:
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype")
    )


def upload(array: np.ndarray, device=None) -> jnp.ndarray:
    """Host -> device (cudaMemcpyHostToDevice analog)."""
    return jax.device_put(jnp.asarray(array), device)


def download(array: jnp.ndarray) -> np.ndarray:
    """Device -> host, synchronized (cudaMemcpyDeviceToHost analog)."""
    return np.asarray(jax.block_until_ready(array))


def scene_to_device(scene, device=None):
    """Place a SceneData on `device`, logging the upload size (the
    uploadScene stats analog, optix_renderer.cu:383-418)."""
    placed = jax.device_put(scene, device)
    log.info(
        "Scene uploaded: %d triangles, %.2f MB device memory",
        scene.triangles.count, nbytes_of(scene) / 1e6,
    )
    return placed


def device_memory_stats(device=None) -> Dict[str, int]:
    dev = device or jax.devices()[0]
    stats = {}
    try:
        raw = dev.memory_stats() or {}
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if k in raw:
                stats[k] = int(raw[k])
    except Exception:  # noqa: BLE001 — not all backends expose stats
        pass
    return stats
