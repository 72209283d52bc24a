"""Triangle-cluster acceleration structure (the TPU-native BVH).

Role: replaces the reference's pointer-based median-split BVH
(bvh.hpp:12-117) and the OptiX GAS (optix_renderer.cu:233-353). A
pointer-chasing, per-ray-divergent tree walk is hostile to TPU vector
memory (SURVEY.md §7 "Hard parts"); instead we build a flat two-phase
structure designed for dense vector math:

1. Triangles are Morton-sorted by centroid so consecutive triangles are
   spatially local, then grouped into fixed-size clusters of S triangles
   (padded with degenerate triangles that can never be hit).
2. Each cluster gets an AABB. Traversal (engine.wavefront) culls whole
   RAY BLOCKS against all cluster AABBs with a conservative interval slab
   test (packet frustum culling), then intersects surviving
   (block, cluster) pairs with dense [block, S] Möller–Trumbore sweeps on
   the VPU.

The build is host-side numpy (scene is static per render; build time is off
the critical path — SURVEY.md §7.4). A C++ native builder with the same
output layout can be slotted in via accel.native.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from path_tracer_ai_tpu.accel.morton import morton3d_np
from path_tracer_ai_tpu.core.types import TrianglesSoA


class ClusterAccel(NamedTuple):
    """Flat device arrays; C clusters of S triangle slots each, grouped into
    superclusters of `super_size` consecutive clusters (a 2-level hierarchy:
    the traversal culls supercluster AABBs first, then only the children of
    surviving supers — the role of BVH descent, bvh.hpp:74-116, flattened to
    two fixed levels so every stage stays dense vector math)."""

    bmin: jnp.ndarray    # [C, 3] cluster AABB min
    bmax: jnp.ndarray    # [C, 3] cluster AABB max
    v0: jnp.ndarray      # [C, S, 3] triangle base vertex
    e1: jnp.ndarray      # [C, S, 3] edge v1-v0
    e2: jnp.ndarray      # [C, S, 3] edge v2-v0
    tri_id: jnp.ndarray  # [C, S] int32 global triangle index (-1 = padding)
    scene_min: jnp.ndarray  # [3] scene bounds (for ray sort keys)
    scene_max: jnp.ndarray  # [3]
    sbmin: jnp.ndarray   # [Cs, 3] supercluster AABB min
    sbmax: jnp.ndarray   # [Cs, 3] supercluster AABB max
    # [Cs, super_size, 3] child AABBs padded to full supers, grouped per
    # super so one gather row is a whole super's children (contiguous —
    # 12-byte-row gathers were measured ~15x slower). Padding slots hold
    # inverted boxes (min > max) that fail every slab test.
    cbmin: jnp.ndarray
    cbmax: jnp.ndarray

    @property
    def num_clusters(self) -> int:
        return self.bmin.shape[0]

    @property
    def cluster_size(self) -> int:
        return self.v0.shape[1]

    @property
    def num_supers(self) -> int:
        return self.sbmin.shape[0]

    @property
    def super_size(self) -> int:
        return self.cbmin.shape[1]


def _median_split_order(centers: np.ndarray, cluster_size: int) -> np.ndarray:
    """Recursive median split on the longest axis, cluster-size aligned.

    Unlike a Morton sort (whose fixed-size runs become long thin "snakes"
    with loose AABBs), this partitions space top-down — the same strategy as
    the reference BVH build (bvh.hpp:44-72, nth_element on maxExtentAxis) —
    but stops at `cluster_size` leaves and emits a flat ordering, so every
    cluster is a spatially compact box. Split points are rounded to
    multiples of cluster_size so all clusters except the last are full.
    """
    s = cluster_size
    out = []
    stack = [np.arange(centers.shape[0], dtype=np.int64)]
    while stack:
        idx = stack.pop()
        if idx.size <= s:
            out.append(idx)
            continue
        c = centers[idx]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        half = ((idx.size // 2 + s - 1) // s) * s
        half = min(max(half, s), idx.size - 1)
        part = np.argpartition(c[:, axis], half - 1)
        # push right first so the left half is processed (emitted) first
        stack.append(idx[part[half:]])
        stack.append(idx[part[:half]])
    return np.concatenate(out)


def build_clusters(
    tris: TrianglesSoA,
    cluster_size: int = 128,
    method: str = "split",
    super_size: int = 16,
) -> ClusterAccel:
    """Order triangles spatially and pack into fixed-size clusters.

    method: "split" (median-split partition — compact cluster AABBs, the
    production default) or "morton" (Morton-code sort — cheaper build, but
    fixed-size runs along the curve make long loose boxes that inflate
    per-ray candidate counts; kept for comparison).
    """
    import time as _time

    t0 = _time.perf_counter()
    v0 = np.asarray(tris.v0, np.float32)
    v1 = np.asarray(tris.v1, np.float32)
    v2 = np.asarray(tris.v2, np.float32)
    d2h_s = _time.perf_counter() - t0
    if d2h_s > 1.0:
        # The axon tunnel's FIRST device->host pull in a process has been
        # measured at 84-151s (subsequent pulls are ~0.1s); surface it so
        # build timers aren't misread as accel-build cost.
        from path_tracer_ai_tpu.utils.logging import get_logger

        get_logger(__name__).warning(
            "device->host triangle pull took %.1fs (tunnel first-transfer "
            "cost, not accel build)", d2h_s,
        )
    t = v0.shape[0]
    if t == 0:
        raise ValueError("cannot build acceleration structure over 0 triangles")

    order = None
    if method == "split":
        centers = (v0 + v1 + v2) / 3.0
        try:  # native C++ builder (same split structure), Python fallback
            from path_tracer_ai_tpu.accel.native import native_split_order

            order = native_split_order(centers, cluster_size)
        except Exception:  # noqa: BLE001
            order = None
        if order is None:
            order = _median_split_order(centers, cluster_size)
    else:
        try:  # native C++ builder (same ordering contract), Python fallback
            from path_tracer_ai_tpu.accel.native import native_morton_order

            order = native_morton_order(v0, v1, v2)
        except Exception:  # noqa: BLE001
            order = None
        if order is None:
            centers = (v0 + v1 + v2) / 3.0
            cmin = centers.min(axis=0)
            cmax = centers.max(axis=0)
            order = np.argsort(morton3d_np(centers, cmin, cmax), kind="stable")
    order = order.astype(np.int64)

    s = cluster_size
    c = -(-t // s)
    pad = c * s - t

    def pack(a, fill=0.0):
        a = a[order]
        if pad:
            a = np.concatenate([a, np.full((pad,) + a.shape[1:], fill, a.dtype)])
        return a.reshape(c, s, *a.shape[1:])

    pv0 = pack(v0)
    pv1 = pack(v1)
    pv2 = pack(v2)
    tri_id = order.astype(np.int32)
    if pad:
        tri_id = np.concatenate([tri_id, np.full(pad, -1, np.int32)])
    tri_id = tri_id.reshape(c, s)

    # Padding triangles are all-zero -> zero-area -> MT determinant 0 -> no hit,
    # but they must not inflate cluster AABBs: mask them out of the bounds.
    valid = (tri_id >= 0)[..., None]  # [C, S, 1]
    big = np.float32(np.finfo(np.float32).max)
    lo = np.where(valid, np.minimum(np.minimum(pv0, pv1), pv2), big)
    hi = np.where(valid, np.maximum(np.maximum(pv0, pv1), pv2), -big)
    bmin = lo.min(axis=1)
    bmax = hi.max(axis=1)

    scene_min = np.minimum(np.minimum(v0, v1), v2).min(axis=0)
    scene_max = np.maximum(np.maximum(v0, v1), v2).max(axis=0)

    # Supercluster level: groups of `super_size` consecutive clusters (the
    # split/Morton order makes consecutive clusters spatially local). Child
    # AABB slots past C are inverted boxes (min > max): the slab test can
    # never pass them, so padding is inert without masking.
    g = super_size
    cs = -(-c // g)
    big = np.float32(3.0e37)
    cbmin = np.full((cs * g, 3), big, np.float32)
    cbmax = np.full((cs * g, 3), -big, np.float32)
    cbmin[:c] = bmin
    cbmax[:c] = bmax
    cbmin = cbmin.reshape(cs, g, 3)
    cbmax = cbmax.reshape(cs, g, 3)
    sbmin = cbmin.min(axis=1)
    sbmax = cbmax.max(axis=1)

    return ClusterAccel(
        bmin=jnp.asarray(bmin),
        bmax=jnp.asarray(bmax),
        v0=jnp.asarray(pv0),
        e1=jnp.asarray(pv1 - pv0),
        e2=jnp.asarray(pv2 - pv0),
        tri_id=jnp.asarray(tri_id),
        scene_min=jnp.asarray(scene_min.astype(np.float32)),
        scene_max=jnp.asarray(scene_max.astype(np.float32)),
        sbmin=jnp.asarray(sbmin),
        sbmax=jnp.asarray(sbmax),
        cbmin=jnp.asarray(cbmin),
        cbmax=jnp.asarray(cbmax),
    )
