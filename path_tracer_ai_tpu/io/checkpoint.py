"""Progressive-render checkpointing (save/resume).

The reference renders one-shot and writes the framebuffer once at the end
(renderer.cpp:5-21); it cannot resume. For the 4K/1024spp progressive
BASELINE config we persist the radiance accumulator + valid-sample counts +
next sample index after each full-image sample pass, keyed by a settings
fingerprint so stale checkpoints are never silently reused.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from path_tracer_ai_tpu.utils.logging import get_logger

log = get_logger(__name__)


def fingerprint(settings, n_triangles: int, seed: int) -> str:
    fp = (
        f"v1|{settings.width}x{settings.height}|spp{settings.samples_per_pixel}"
        f"|b{settings.max_bounces}|a{settings.aspect_mode}|t{n_triangles}|s{seed}"
    )
    # Appended only when enabled so pre-existing (rr-less) checkpoint
    # lineages — e.g. the long-running 4K accumulation — stay resumable.
    rr = getattr(settings, "rr_start", 0)
    if rr:
        fp += f"|rr{rr}"
    return fp


def save(path: str, acc: np.ndarray, cnt: np.ndarray, next_sample: int,
         fp: str) -> None:
    tmp = path + ".tmp"
    np.savez_compressed(
        tmp if tmp.endswith(".npz") else tmp,
        acc=acc, cnt=cnt, next_sample=np.int64(next_sample),
        fingerprint=np.bytes_(fp.encode()),
    )
    # numpy appends .npz to names without it
    actual_tmp = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(actual_tmp, path)
    log.info("Checkpoint saved: %s (next sample %d)", path, next_sample)


def peek_fingerprint(path: str) -> Optional[str]:
    """Read only a checkpoint's stored fingerprint (no array data)."""
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            return bytes(z["fingerprint"]).decode()
    except (OSError, KeyError, ValueError) as e:
        log.warning("Failed to peek checkpoint %s: %s", path, e)
        return None


def compatible_spp(stored_fp: str, like_fp: str) -> Optional[int]:
    """If stored_fp differs from like_fp ONLY in the sppN field, return
    stored_fp's spp (else None).

    A session killed mid-chunk leaves the checkpoint stamped with the
    CHUNK-TARGET spp (wavefront.render saves under the fingerprint of the
    render it is performing), not the last chunk boundary the results
    artifact recorded. Such a checkpoint is directly resumable by
    re-rendering to the stored spp — discarding it restarts the whole
    accumulation (this orphaned a 288-spp 4K lineage in round 5)."""
    a, b = stored_fp.split("|"), like_fp.split("|")
    if len(a) != len(b):
        return None
    spp = None
    for x, y in zip(a, b):
        if x == y:
            continue
        if x.startswith("spp") and y.startswith("spp"):
            try:
                spp = int(x[3:])
            except ValueError:
                return None
        else:
            return None
    return spp


def load(path: str, fp: str) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            stored = bytes(z["fingerprint"]).decode()
            if stored != fp:
                log.warning(
                    "Checkpoint %s has mismatched settings (%s != %s); ignoring",
                    path, stored, fp,
                )
                return None
            return (
                np.asarray(z["acc"], np.float32),
                np.asarray(z["cnt"], np.int32),
                int(z["next_sample"]),
            )
    except (OSError, KeyError, ValueError) as e:
        log.warning("Failed to load checkpoint %s: %s", path, e)
        return None
