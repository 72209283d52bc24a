"""Wavefront engine: the accelerated render path (the reference GPU role).

Architecture (SURVEY.md §7, BASELINE.md north star): instead of the
reference's per-pixel recursive OptiX megakernel (optix_kernels.cu:49-124),
rays are processed in fixed-size SoA WAVES that stay on device for the whole
bounce loop — zero host round-trips per bounce:

  generate wave -> [bounce loop: sort -> cull -> sweep -> shade] -> accumulate

- traversal: packet cluster traversal (accel.traverse) with per-wave ray
  sorting for coherence
- shading: the exact reference semantics (engine.shading, shared with the
  oracle engine by construction)
- scheduling: sample-chunk outer loop x pixel-chunk inner loop; every
  full-image sample pass is a progressive accumulation step that can be
  checkpointed and resumed (SURVEY.md §5 checkpoint/resume; the reference
  has none — one-shot render only)
- multi-chip: `tile_devices` routes to parallel.mesh (framebuffer tiles
  sharded over a jax Mesh; the reference is single-device)

Radiance semantics are identical to the oracle; the only differences are
traversal backend and scheduling, which the accel-vs-brute-force equality
tests pin down.
"""

from __future__ import annotations

import math
import os
import time
import functools
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from path_tracer_ai_tpu.accel.clusters import ClusterAccel, build_clusters
from path_tracer_ai_tpu.accel import traverse
from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.core.types import RAY_TMIN, SceneData
from path_tracer_ai_tpu.engine import tracer
from path_tracer_ai_tpu.engine.oracle import MAGENTA, _fold_all
from path_tracer_ai_tpu.io import checkpoint as ckpt_io
from path_tracer_ai_tpu.scene.camera import Camera, get_rays
from path_tracer_ai_tpu.utils.logging import get_logger, render_banner

log = get_logger(__name__)

# PT_BOUNCE_TIMING=1: block + log wall time per bounce step (diagnosis only —
# blocking defeats dispatch pipelining, so never enable for benchmarks).
_BOUNCE_TIMING = os.environ.get("PT_BOUNCE_TIMING") == "1"

# worklist-backend tuning (module-level so perf probes can retune without
# editing code; values are static jit args, so changing them recompiles).
# Measured v5e round 2: dir-major sort cuts bounce-wave overflow 5x vs
# origin-major (28k vs 143k rays past cap=96) and tables to 39ms/2^20.
WORKLIST_CLOSEST_KW = dict(cap=96, item_budget=8)
WORKLIST_OCCLUDE_KW = dict(sort=False)
# Big-scene shadow routing (the worklist backend is the >2048-cluster
# default). "worklist" = unsorted any_hit_worklist (production through
# round 4); "packets_exact" = the 2-level exact-cull packet cascade, the
# standing big-scene candidate (conservative unions are 10-100x looser at
# 1M+ tris; probe_r4_exact_shadow measured 5-10x fewer candidates/block).
# Session D (round 5) adjudicates this on-chip on 1.31M-tri shadow waves —
# flip the default only on a measured win. Occlusion is exact either way,
# so images are bit-identical across the two routes (tests enforce).
WORKLIST_OCCLUDE_ENGINE = "worklist"
WORKLIST_OCCLUDE_PACKETS_KW = dict(block_size=64, group_size=2,
                                   exact_cull=6)
# group_size=2: probe r3f measured b64_g2 +8% on bare shadow waves (6.75 vs
# 6.24 Mrays/s) and probe r3g confirmed e2e +6% (3.19 vs 3.00 Mrays/s,
# same-session A/B, images bit-identical). Smaller retirement groups let
# finished 2-ray groups exit the cascade earlier than g8's 8-ray granules.
HYBRID_OCCLUDE_KW = dict(engine="packets", group_size=2)
# Probe N (CPU, full scale): bounce-0 shadow waves in natural pixel-order
# lane layout have block unions EQUAL to dir-sorted ones (4653 vs 4637
# candidate-tris/ray) — the coherence sort buys nothing there and its
# sort+unsort row movement can be skipped. Bounce >= 1 origins are
# diffuse-scattered and MUST stay sorted (unsorted: 91.7k vs 12.4k).
# ADOPTED round 4 (session attempt 50, on-chip e2e A/B shadow_g2_nosort_b0:
# 3.46 vs 3.28 Mrays/s production, images bit-identical).
SHADOW_NOSORT_BOUNCE0 = True
# Same finding for bounce-0 CLOSEST waves (measured: identical b8 union
# populations, sum 300688 both ways at 960x540): primary rays in pixel
# order need no octorig sort — skipping drops the prepare argsort+gather
# and the outro unsort scatter from the primary wave. Adopted with the
# shadow flag (the winning r4 config toggles both; see adoption_r4 log).
CLOSEST_NOSORT_BOUNCE0 = True
KSLOTS_CLOSEST_KW = dict(k_supers=6, k_clusters=12)
KSLOTS_OCCLUDE_KW = dict(k_supers=6, k_clusters=8)
# fallback_compact SMALL: the compact overflow fallback costs its STATIC
# size every wave it runs (probe J: 2^17 cost ~360ms for 19 overflow
# blocks). cap=48 >> p99 union, so overflow populations are tiny.
# ADOPTED round 5 (probe_r5 e2e A/B, same-session, images bit-identical):
# fallback_sorted=True completes overflow in the SORTED domain before the
# unsort (one fewer unsort column) and fallback_compact 4096 halves the
# static fallback cost — closest_fbsorted_fc12 3.45 vs prod 3.39 Mrays/s
# (plain fbsorted at fc 8192: 3.35 — the fc right-size carries the win).
CTILES_CLOSEST_KW = dict(cap=48, tile_chunk=2048, fallback_compact=1 << 12,
                         fallback_sorted=True)
# Closest waves and shadow waves want DIFFERENT cluster sizes (probes
# r3c/r3d: S=256 closest is 385 -> 303ms XLA / 256ms Pallas — halved row
# counts beat the extra dense tests — while the packet-cascade shadow is
# +28% at S=256). render() builds the second accel at this size FROM THE
# ORIGINAL TRIANGLES (so e1/e2 stay bit-identical to the oracle's) and
# the hybrid backend routes closest waves through it.
HYBRID_CLOSEST_CLUSTER_SIZE: Optional[int] = 256
# lane_major: shadow waves arrive with each lane's 4 same-origin rays
# consecutive; block=4 makes one block per lane (shared-origin union cull).
CTILES_OCCLUDE_KW = dict(lane_major=True, block=4, sort=False)
# Closest-wave engine for the hybrid backend: "ctiles" (round-3 prod) or
# "cascade_fused" (pallas_closest — probe Q: the fused closest cascade
# deletes the pair-domain scheduling and runs on the BASE accel; opt-in
# until the on-chip A/B lands in probe J's closest_cascade rows).
HYBRID_CLOSEST_KW = dict(engine="ctiles")


def clear_executable_caches():
    """Drop cached render executables (needed after retuning the KW dicts
    above, which are read at trace time and are NOT part of any jit key)."""
    _wave_exe.cache_clear()
    _pool_exe.cache_clear()
    _bounce_exe.cache_clear()
    _wave_gen_exe.cache_clear()
    _wave_accum_exe.cache_clear()
    _compact_exe.cache_clear()
    jax.clear_caches()


def packet_backend(
    accel: ClusterAccel,
    block_size: int = 256,
    use_pallas: bool = False,
    interpret: bool = False,
    backend: Optional[str] = None,
    accel_closest: Optional[ClusterAccel] = None,
    occlude_sort: Optional[bool] = None,
    closest_sort: Optional[bool] = None,
):
    """Traversal backend over the cluster structure.

    backend selects the traversal architecture (default_backend() picks the
    measured full-render winner):
    - "packets": conservative block-cull cascade (accel.traverse) — the
      round-1 path, also every other backend's last-resort fallback.
    - "worklist": block-major flat work items (accel.worklist), heavy tail
      completed per-ray via pair tiles.
    - "kslots": per-ray K-slot traversal (accel.kslots) — per-ray exact
      candidates via 2-level descent + popcount-bitmask extraction, ONE
      dense [rows, K*S] sweep; no blocks, no sort, no scatter.
    - "ctiles": cluster-major tiles (accel.ctiles) — per-ray-exact OR-union
      culling, items transposed cluster-major so each tile's 128 rays share
      one gathered cluster.
    - "pairs": cluster-major exact pair tiles (accel.pairs) — per-ray exact
      candidate work, dense [tile, S] sweeps.
    - "hybrid": pairs for closest waves, unsorted worklist for the
      light-major shadow waves.
    - "perray": per-ray cascade experiment (traverse.*_perray).
    - "pallas": fused Pallas sweep kernels (accel.pallas_sweep).
    Legacy flags: use_pallas=True -> "pallas"; block_size == 1 -> "perray".
    """
    if backend is None:
        if use_pallas:
            backend = "pallas"
        elif block_size == 1:
            backend = "perray"
        else:
            backend = default_backend(accel)

    if backend == "pairs":
        from path_tracer_ai_tpu.accel import pairs

        def closest(o, d, t_min, t_max):
            return pairs.closest_hit_pairs(accel, o, d, RAY_TMIN, t_max)

        def occlude(o, d, t_max):
            return pairs.any_hit_pairs(accel, o, d, RAY_TMIN, t_max)

        return closest, occlude

    if backend == "kslots":
        from path_tracer_ai_tpu.accel import kslots

        def closest(o, d, t_min, t_max):
            return kslots.closest_hit_kslots(
                accel, o, d, RAY_TMIN, t_max, **KSLOTS_CLOSEST_KW
            )

        def occlude(o, d, t_max):
            return kslots.any_hit_kslots(
                accel, o, d, RAY_TMIN, t_max, **KSLOTS_OCCLUDE_KW
            )

        return closest, occlude

    if backend == "ctiles":
        from path_tracer_ai_tpu.accel import ctiles

        def closest(o, d, t_min, t_max):
            return ctiles.closest_hit_ctiles(
                accel, o, d, RAY_TMIN, t_max, **CTILES_CLOSEST_KW
            )

        okw = dict(CTILES_OCCLUDE_KW)
        lane_major = okw.pop("lane_major", True)

        def occlude(o, d, t_max):
            return ctiles.any_hit_ctiles(
                accel, o, d, RAY_TMIN, t_max, **okw
            )

        # Shadow waves arrive lane-major: each lane's 4 same-origin rays
        # form one block, so the union cull is per-lane shadow reuse
        # (the light-major layout cannot express it). Requires the occlude
        # block size == light count (4 per reference spec, scene.hpp:55-80).
        occlude.lane_major = lane_major

        return closest, occlude

    if backend == "hybrid":
        # Per-wave-type winners (v5e probes, round 2): closest waves via
        # ctiles (per-ray-exact OR-union culling: bounce 2.3 vs worklist
        # 2.0 Mrays/s, primary 4.9 vs 3.6); shadow waves are light-major
        # coherent — consecutive lanes share a light and neighbor pixels —
        # so the worklist's conservative block cull is tight there and its
        # unsorted path wins (6.3 Mrays/s synthetic). fallback_compact
        # must cover the in-render shadow overflow population (~4.7% of a
        # 4x-wave; the 2^17 default forced whole-wave fallbacks — the
        # round-2 worklist e2e regression).
        from path_tracer_ai_tpu.accel import ctiles, worklist

        accel_cl = accel_closest if accel_closest is not None else accel
        closest_eng = HYBRID_CLOSEST_KW.get("engine", "ctiles")
        cckw = {k: v for k, v in HYBRID_CLOSEST_KW.items() if k != "engine"}
        if closest_eng == "cascade_fused" and (
            jax.default_backend() == "tpu" or cckw.get("interpret", False)
        ):
            # Fused Pallas closest cascade (pallas_closest, probe Q): the
            # packet cascade's structure with the sweep + sub-slab-gated
            # (t, tri) accumulation in one kernel per iteration — no pair
            # domain at all. Runs on the BASE accel (no dual build). TPU
            # only — CPU (tests) routes to ctiles below, bit-identical
            # because every backend is exact.
            from path_tracer_ai_tpu.accel import pallas_closest

            if closest_sort is not None:
                cckw["sort"] = closest_sort

            def closest(o, d, t_min, t_max):
                return pallas_closest.closest_hit_fused(
                    accel, o, d, RAY_TMIN, t_max, **cckw
                )
        else:
            # The fused Pallas tile sweep is the production closest sweep
            # on TPU (probe r3d: 256 vs 303ms XLA at S=256; bitwise-
            # identical output). CPU (tests) keeps the XLA sweep — Mosaic
            # does not lower there and interpret mode is opt-in.
            ckw = dict(CTILES_CLOSEST_KW)
            if "use_pallas" not in ckw:
                ckw["use_pallas"] = jax.default_backend() == "tpu"
            if closest_sort is not None:
                ckw["sort"] = closest_sort

            def closest(o, d, t_min, t_max):
                return ctiles.closest_hit_ctiles(
                    accel_cl, o, d, RAY_TMIN, t_max, **ckw
                )

        hybrid_eng = HYBRID_OCCLUDE_KW.get("engine")
        okw = {k: v for k, v in HYBRID_OCCLUDE_KW.items() if k != "engine"}
        if hybrid_eng == "packets":
            # In-render shadow waves overflow the worklist's conservative
            # cap on ~5% of rays, and its compact fallback costs its STATIC
            # size every wave (the e2e cliff measured in round 2). The
            # packet cascade has no such cliff. okw may override
            # block_size/group_size (probe r3b: g2 measured +11% on
            # shadow waves vs the g8 default).
            pkw = dict(block_size=okw.get("block_size", block_size),
                       group_size=okw.get("group_size", 8),
                       sort_mode=okw.get("sort_mode", "dir"),
                       exact_cull=okw.get("exact_cull", 0),
                       sort=okw.get("sort", True)
                       if occlude_sort is None else occlude_sort)

            def occlude(o, d, t_max):
                return traverse.any_hit_packets(
                    accel, o, d, RAY_TMIN, t_max, **pkw
                )
        elif hybrid_eng == "packets_fused":
            # Fused Pallas any-hit cascade (pallas_anyhit): the packet
            # cascade's structure with the sweep body in one kernel per
            # iteration (cluster DMA via scalar-prefetch index maps). TPU
            # only — CPU (tests) routes to the XLA cascade, bit-identical
            # because occlusion is exact under any blocking.
            fkw = dict(block_size=okw.get("block_size", 128),
                       sort_mode=okw.get("sort_mode", "dir"),
                       early_skip=okw.get("early_skip", False),
                       sub_skip=okw.get("sub_skip", False),
                       exact_cull=okw.get("exact_cull", 0),
                       sort=okw.get("sort", True)
                       if occlude_sort is None else occlude_sort)
            if jax.default_backend() == "tpu" or okw.get("interpret", False):
                from path_tracer_ai_tpu.accel import pallas_anyhit

                fkw["interpret"] = okw.get("interpret", False)

                def occlude(o, d, t_max):
                    return pallas_anyhit.any_hit_fused(
                        accel, o, d, RAY_TMIN, t_max, **fkw
                    )
            else:

                def occlude(o, d, t_max):
                    return traverse.any_hit_packets(
                        accel, o, d, RAY_TMIN, t_max,
                        block_size=64, group_size=2,
                    )
        elif hybrid_eng == "ctiles":
            # Per-ray-exact OR-union shadow path (round-3 lever: shadows
            # are ~80% of traced rays); right-sized fallback per the
            # round-2 lesson. okw may carry lane_major (consumed below)
            # and use_pallas for the fused tile sweep.
            lane_major = okw.pop("lane_major", False)

            def occlude(o, d, t_max):
                return ctiles.any_hit_ctiles(
                    accel, o, d, RAY_TMIN, t_max, **okw
                )

            occlude.lane_major = lane_major
        else:

            def occlude(o, d, t_max):
                return worklist.any_hit_worklist(
                    accel, o, d, RAY_TMIN, t_max, **okw
                )

        return closest, occlude

    if backend == "worklist":
        from path_tracer_ai_tpu.accel import worklist

        # Module-level so perf probes can retune without editing code.
        # cap=96: incoherent bounce blocks routinely union 60-90 candidate
        # clusters; cap is buffer only (sweep work tracks true counts) and
        # keeps them off the fallback, which completes the heavy tail via
        # per-ray pair tiles (worklist._overflow_fallback).

        def closest(o, d, t_min, t_max):
            return worklist.closest_hit_worklist(
                accel, o, d, RAY_TMIN, t_max, **WORKLIST_CLOSEST_KW
            )

        if WORKLIST_OCCLUDE_ENGINE == "packets_exact":
            def occlude(o, d, t_max):
                return traverse.any_hit_packets(
                    accel, o, d, RAY_TMIN, t_max,
                    **WORKLIST_OCCLUDE_PACKETS_KW)
        else:
            def occlude(o, d, t_max):
                # Shadow waves arrive light-major (direct_lighting):
                # consecutive lanes share a light and neighbor pixels —
                # already coherent. Measured on v5e: sort=False is 1.4x
                # faster on these waves.
                return worklist.any_hit_worklist(
                    accel, o, d, RAY_TMIN, t_max, **WORKLIST_OCCLUDE_KW)

        return closest, occlude

    if backend == "pallas":
        from path_tracer_ai_tpu.accel import pallas_sweep

        slab = pallas_sweep.build_slab_table(accel)

        def closest(o, d, t_min, t_max):
            return pallas_sweep.closest_hit_pallas(
                accel, slab, o, d, RAY_TMIN, t_max,
                block_size=block_size, interpret=interpret,
            )

        def occlude(o, d, t_max):
            return pallas_sweep.any_hit_pallas(
                accel, slab, o, d, RAY_TMIN, t_max,
                block_size=block_size, interpret=interpret,
            )

        return closest, occlude

    if backend == "perray":
        # Per-ray exact candidate lists (no blocking). Measured on v5e: the
        # per-ray candidate counts are ~25x smaller than block unions, but
        # scheduling overhead (cascade iterations over chunked [64k] rows)
        # swamps the saved arithmetic — a full wave runs ~26x SLOWER than the
        # packet path (51.5s vs 2.0s). Kept as an opt-in experiment and as
        # the candidate-extraction machinery for a future pair-tile design;
        # see docs/ARCHITECTURE.md. The cascade's temporary buffers scale
        # ~21 KB/ray, so big waves are processed in fixed-size chunks.
        chunk = 1 << 16

        def _chunked(fn, o, d, t_max, n_out):
            n = o.shape[0]
            if n <= chunk:
                return fn(o, d, t_max)
            pad = (-n) % chunk
            o2 = jnp.pad(o, ((0, pad), (0, 0)))
            d2 = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
            t2 = jnp.pad(jnp.broadcast_to(t_max, (n,)), (0, pad),
                         constant_values=-1.0)
            nch = (n + pad) // chunk
            out = jax.lax.map(
                fn_tuple(fn),
                (o2.reshape(nch, chunk, 3), d2.reshape(nch, chunk, 3),
                 t2.reshape(nch, chunk)),
            )
            return tuple(a.reshape(-1)[:n] for a in out)

        def fn_tuple(fn):
            def g(args):
                oo, dd, tt = args
                return fn(oo, dd, tt)
            return g

        def closest(o, d, t_min, t_max):
            def core(oo, dd, tt):
                h = traverse.closest_hit_perray(accel, oo, dd, RAY_TMIN, tt)
                return (h.t, h.tri)
            t, tri = _chunked(core, o, d,
                              jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                               (o.shape[0],)),
                              2)
            return traverse.PacketHit(hit=jnp.isfinite(t), t=t, tri=tri)

        def occlude(o, d, t_max):
            def core(oo, dd, tt):
                return (traverse.any_hit_perray(accel, oo, dd, RAY_TMIN, tt),)
            (occ,) = _chunked(core, o, d,
                              jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                               (o.shape[0],)),
                              1)
            return occ

        return closest, occlude

    def closest(o, d, t_min, t_max):
        return traverse.closest_hit_packets(
            accel, o, d, t_min, t_max, block_size=block_size
        )

    def occlude(o, d, t_max):
        return traverse.any_hit_packets(
            accel, o, d, RAY_TMIN, t_max, block_size=block_size
        )

    return closest, occlude


def default_backend(accel: Optional[ClusterAccel] = None) -> str:
    """Production traversal backend, chosen by full-render measurement.

    Scale routing: ctiles' per-ray-exact cull materializes [rays, C]
    masks in chunks, which stops paying past a few thousand clusters;
    big scenes route to the 2-level worklist (supercluster descent).

    v5e, 82k-tri scene, 1080p@2spp/5b (probes round 2): hybrid (ctiles v2
    closest + packet-cascade shadow) 2.76 Mrays/s (with live-prefix
    culling and right-sized overflow fallbacks) vs packets 1.74 vs
    worklist 0.67 (its shadow fallback cliff) vs ctiles-everywhere 1.08.
    See docs/ARCHITECTURE.md for the decomposition.
    """
    if accel is not None and accel.num_clusters > 2048:
        return "worklist"
    return "hybrid"


def default_use_pallas() -> bool:
    """Backend default for the traversal kernels.

    Both backends are compiled-verified and agree exactly on v5e. The XLA
    cascade currently wins on wall-clock (1.56s vs 2.45s per 131k-lane wave
    on the 82k-tri scene): the Pallas kernels' per-cluster-visit overhead
    (~5us: DMA wait + loop bookkeeping on small [R,S] tiles) exceeds XLA's
    pipelined dense-sweep cost. Multi-cluster DMA batching is the known fix
    (docs/ARCHITECTURE.md); until it lands, default to XLA and let callers
    opt in with use_pallas=True.
    """
    return False


@functools.lru_cache(maxsize=None)
def _wave_exe(**statics):
    """One jit object per static configuration (keyed by the lru cache).

    A single shared jit with static_argnames hits a jax-0.9 executable-cache
    collision on multi-device hosts when different `backend` values keep
    different operand subsets (each backend reads a different subset of the
    accel arrays, so kept_var_idx differs: "supplied 32 buffers but compiled
    program expected 35"). Separate jit objects per static key sidestep it
    and preserve cross-render executable caching.
    """
    return jax.jit(functools.partial(_render_wave_impl, **statics))


@functools.lru_cache(maxsize=None)
def _bounce_exe(block_size, use_pallas, backend, occlude_sort=None,
                closest_sort=None, rr_start=0):
    """One bounce-step executable per traversal config (see _wave_exe).

    The bounce loop runs at HOST level (render drives one jit call per
    bounce): measured on v5e round 2, nesting the traversal pipelines'
    chunk loops inside an XLA while bounce loop cost ~3x wall-clock vs
    the same pipelines as top-level programs, while a dispatch is ~2.7ms
    — irrelevant against 100ms+ waves. Host stepping also reuses ONE
    executable across bounces, waves, and sample passes (depth is a
    traced scalar), and gives per-bounce timing for free.

    occlude_sort: per-bounce shadow-sort override (SHADOW_NOSORT_BOUNCE0
    compiles ONE extra executable for depth 0; bounce 0 always runs at
    the full-wave bucket, so this costs a single trace).
    """

    def one_bounce(scene, accel, accel_c, o, d, beta, radiance, alive,
                   keys, depth):
        closest, occlude = packet_backend(
            accel, block_size, use_pallas=use_pallas, backend=backend,
            accel_closest=accel_c, occlude_sort=occlude_sort,
            closest_sort=closest_sort,
        )
        return tracer.bounce_step(
            scene, closest, occlude, o, d, beta, radiance, alive, keys,
            depth, rr_start=rr_start,
        )

    return jax.jit(one_bounce)


@functools.lru_cache(maxsize=None)
def _compact_exe(bucket):
    """Gather live lanes into a `bucket`-sized wave (padding slots dead)."""

    def compact(o, d, beta, radiance, keys, idx, n_live):
        gi = jnp.minimum(idx, o.shape[0] - 1)
        live = jnp.arange(bucket, dtype=jnp.int32) < n_live
        return (
            o[gi],
            jnp.where(live[:, None], d[gi], 1.0),
            beta[gi],
            radiance[gi],
            jax.tree.map(lambda a: a[gi], keys),
            live,
        )

    return jax.jit(compact)


@jax.jit
def _scatter_back(radiance_full, radiance_c, idx):
    return radiance_full.at[idx].set(radiance_c, mode="drop")


# Compaction trigger: recompact when the live count fits in half the
# current bucket. A finer {2^k, 3*2^(k-1)} ladder with a 3/4 trigger was
# measured NEUTRAL on wall-clock (2.74 vs 2.76 Mrays/s e2e) while adding
# +160s of bucket-executable compiles to warmup — pow2 stays. Floor keeps
# tail-bounce buckets from compiling tiny one-off programs.
COMPACT_MIN_BUCKET = 1 << 16


def _compact_bucket(n_live: int) -> int:
    """Smallest power-of-2 bucket >= max(n_live, floor)."""
    n = max(n_live, COMPACT_MIN_BUCKET)
    return 1 << max(n - 1, 1).bit_length()


def _render_wave(
    scene, accel, camera, base_key, xs, ys, s0, spp, accel_c=None, **statics
):
    max_bounces = statics["max_bounces"]
    block_size = statics["block_size"]
    use_pallas = statics.get("use_pallas", False)
    backend = statics.get("backend", None)
    rr_start = statics.get("rr_start", 0)

    gen_statics = {
        k: v for k, v in statics.items()
        if k in ("w", "h", "sc", "pix_chunk", "lanes_padded", "aspect")
    }
    o, d, keys, lane_s = _wave_gen_exe(**gen_statics)(
        camera, base_key, xs, ys, s0
    )

    n = o.shape[0]
    beta = jnp.ones((n, 3), jnp.float32)
    radiance = jnp.zeros((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    bounce = _bounce_exe(block_size, use_pallas, backend, rr_start=rr_start)
    bounce0 = (
        _bounce_exe(
            block_size, use_pallas, backend,
            occlude_sort=False if SHADOW_NOSORT_BOUNCE0 else None,
            closest_sort=False if CLOSEST_NOSORT_BOUNCE0 else None,
            rr_start=rr_start,
        )
        if (SHADOW_NOSORT_BOUNCE0 or CLOSEST_NOSORT_BOUNCE0) else bounce
    )
    if accel_c is None:
        accel_c = accel
    ncs, nss = [], []

    # LIVE-LANE COMPACTION (the wavefront "compact" stage, SURVEY §7.5):
    # paths die fast on open scenes (measured live fractions 100/62/35/21/
    # 13% by bounce at 1080p), yet every stage of a static-shaped wave
    # costs its FULL size. Host-stepped bounces make real compaction
    # possible: when the live count fits in half the current wave, gather
    # live lanes into a power-of-2 bucket and scatter radiance back at
    # the end. One bounce executable exists per bucket size and is reused
    # across bounces, waves, and passes. RNG streams are keyed by (lane
    # key, depth, purpose) only, so compaction cannot change any sample
    # (the reproducibility invariant; tests enforce bit-identity).
    full_radiance = None     # [n] radiance snapshot once compacted
    full_idx = None          # compact lane -> original lane (sentinel n)
    for depth in range(max_bounces):
        if depth > 0:
            n_live = int(jnp.sum(alive))
            cur = o.shape[0]
            bucket = _compact_bucket(n_live)
            if n_live > 0 and bucket <= cur // 2:
                idx = jnp.nonzero(
                    alive, size=bucket, fill_value=cur
                )[0].astype(jnp.int32)
                if full_radiance is None:
                    full_radiance = radiance
                    full_idx = idx
                else:
                    # Flush finished lanes' finals, then compose maps.
                    full_radiance = _scatter_back(
                        full_radiance, radiance, full_idx
                    )
                    full_idx = jnp.where(
                        idx < cur,
                        full_idx[jnp.minimum(idx, cur - 1)],
                        full_radiance.shape[0],
                    ).astype(jnp.int32)
                o, d, beta, radiance, keys, alive = _compact_exe(bucket)(
                    o, d, beta, radiance, keys, idx, jnp.int32(n_live)
                )
        if _BOUNCE_TIMING:
            jax.block_until_ready((o, d, beta, radiance))
            t_b = time.perf_counter()
        o, d, beta, radiance, alive, nc_i, ns_i = (
            bounce0 if depth == 0 else bounce
        )(
            scene, accel, accel_c, o, d, beta, radiance, alive, keys,
            jnp.int32(depth),
        )
        if _BOUNCE_TIMING:
            jax.block_until_ready((o, d, beta, radiance))
            log.info("bounce %d: %d lanes, %.1f ms", depth, o.shape[0],
                     (time.perf_counter() - t_b) * 1e3)
        ncs.append(nc_i)
        nss.append(ns_i)

    if full_radiance is not None:
        radiance = _scatter_back(full_radiance, radiance, full_idx)

    acc, cnt = _wave_accum_exe(**gen_statics)(radiance, lane_s, spp)
    # Summing the tiny per-bounce counters is free once acc is realized.
    nc = sum(int(x) for x in jax.device_get(ncs))
    ns = sum(int(x) for x in jax.device_get(nss))
    return acc, cnt, jnp.int32(nc), jnp.int32(ns)


@functools.lru_cache(maxsize=None)
def _wave_gen_exe(**statics):
    return jax.jit(functools.partial(_wave_gen_impl, **statics))


def _wave_gen_impl(
    camera, base_key, xs, ys, s0,
    *, w, h, sc, pix_chunk, lanes_padded, aspect,
):
    """Camera rays + per-lane RNG streams for one wave."""
    n_lanes = pix_chunk * sc

    pix_idx = (ys * w + xs).astype(jnp.int32)              # [P]
    lane_pix = jnp.repeat(pix_idx, sc)                     # [P*sc]
    lane_x = jnp.repeat(xs, sc)
    lane_y = jnp.repeat(ys, sc)
    lane_s = jnp.tile(jnp.arange(sc, dtype=jnp.int32), pix_chunk) + s0

    pad = lanes_padded - n_lanes
    if pad:
        lane_pix = jnp.pad(lane_pix, (0, pad))
        lane_x = jnp.pad(lane_x, (0, pad))
        lane_y = jnp.pad(lane_y, (0, pad))
        lane_s = jnp.pad(lane_s, (0, pad))

    keys = jax.vmap(lambda p, s: _fold_all(base_key, p, s))(lane_pix, lane_s)
    kj = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, 0)
    jitter = jax.vmap(lambda k: jax.random.uniform(k, (2,)))(kj)
    u = (lane_x.astype(jnp.float32) + jitter[:, 0]) / (w - 1)
    v = (lane_y.astype(jnp.float32) + jitter[:, 1]) / (h - 1)
    o, d = get_rays(camera, u, v, aspect)
    return o, d, keys, lane_s


@functools.lru_cache(maxsize=None)
def _wave_accum_exe(**statics):
    return jax.jit(functools.partial(_wave_accum_impl, **statics))


def _wave_accum_impl(
    radiance, lane_s, spp,
    *, w, h, sc, pix_chunk, lanes_padded, aspect,
):
    """Per-pixel accumulation with the whole-sample isValidColor filter
    (renderer.hpp:69-73)."""
    n_lanes = pix_chunk * sc
    valid = jnp.all(jnp.isfinite(radiance), axis=-1)
    radiance = radiance[:n_lanes]
    valid = valid[:n_lanes]
    r = radiance.reshape(pix_chunk, sc, 3)
    vl = valid.reshape(pix_chunk, sc)
    # Drop samples beyond the requested spp (tail pass when spp % sc != 0).
    vl = vl & (lane_s[:n_lanes].reshape(pix_chunk, sc) < spp)
    acc = jnp.sum(jnp.where(vl[..., None], r, 0.0), axis=1)  # [P, 3]
    cnt = jnp.sum(vl.astype(jnp.int32), axis=1)              # [P]
    return acc, cnt


def _render_wave_impl(
    scene, accel, camera, base_key, xs, ys, s0, spp,
    *, w, h, sc, pix_chunk, lanes_padded, block_size, max_bounces, aspect,
    use_pallas=False, backend=None, rr_start=0,
):
    """Fully-fused single-program wave (kept for the multichip/sharded
    paths, which jit whole shards; the single-device scheduler drives
    bounces from the host via _render_wave — see _bounce_exe)."""
    closest, occlude = packet_backend(
        accel, block_size, use_pallas=use_pallas, backend=backend
    )
    n_lanes = pix_chunk * sc
    o, d, keys, lane_s = _wave_gen_impl(
        camera, base_key, xs, ys, s0,
        w=w, h=h, sc=sc, pix_chunk=pix_chunk, lanes_padded=lanes_padded,
        aspect=aspect,
    )
    radiance, valid, (nc, ns) = tracer.trace_paths(
        scene, o, d, keys, max_bounces, closest, occlude, rr_start=rr_start
    )
    r = radiance[:n_lanes].reshape(pix_chunk, sc, 3)
    vl = valid[:n_lanes].reshape(pix_chunk, sc)
    vl = vl & (lane_s[:n_lanes].reshape(pix_chunk, sc) < spp)
    acc = jnp.sum(jnp.where(vl[..., None], r, 0.0), axis=1)  # [P, 3]
    cnt = jnp.sum(vl.astype(jnp.int32), axis=1)              # [P]
    return acc, cnt, nc, ns


@functools.lru_cache(maxsize=None)
def _pool_exe(**statics):
    """Per-static-key jit object; see _wave_exe for why not static_argnames."""
    return jax.jit(functools.partial(_render_pool_impl, **statics))


def _render_pool(scene, accel, camera, base_key, xs, ys, s_start, spp,
                 **statics):
    return _pool_exe(**statics)(
        scene, accel, camera, base_key, xs, ys, s_start, spp
    )


def _render_pool_impl(
    scene, accel, camera, base_key, xs, ys, s_start, spp,
    *, w, h, pix_chunk, pool_size, block_size, max_bounces, aspect,
    use_pallas=False, backend=None, rr_start=0,
):
    """Persistent-pool scheduler: ray compaction by REGENERATION.

    The BASELINE north star's wavefront compaction, TPU-style: instead of
    physically compacting surviving rays (dynamic shapes), a fixed pool of
    `pool_size` lanes keeps every lane busy — when a path dies (miss or
    depth cutoff) its radiance is scatter-accumulated into the framebuffer
    and the lane is immediately re-armed with the next (pixel, sample)
    camera ray, entirely on device inside one while_loop.

    Radiance is IDENTICAL to the wave scheduler (_render_wave): RNG streams
    depend only on (pixel, sample, bounce, purpose), never on scheduling.
    Emission order is sample-major (all pixels at sample s before s+1) so
    refilled lanes stay camera-coherent for the packet traversal.
    """
    closest, occlude = packet_backend(
        accel, block_size, use_pallas=use_pallas, backend=backend
    )
    p = pix_chunk
    n_l = pool_size
    # Resume support: emission starts at sample s_start (samples < s_start
    # are already in the loaded accumulators — re-rendering them would
    # double-count). Both s_start and spp are traced scalars.
    total = p * (spp - s_start)

    pix_global_all = (ys * w + xs).astype(jnp.int32)  # [P]

    def emit(eids):
        """Camera rays + streams for emission indices [L] (sample-major)."""
        pl_ = eids % p                    # chunk-local pixel slot
        s = s_start + eids // p           # global sample index
        pg = pix_global_all[pl_]
        keys = jax.vmap(lambda a, b: _fold_all(base_key, a, b))(pg, s)
        kj = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, 0)
        jitter = jax.vmap(lambda k: jax.random.uniform(k, (2,)))(kj)
        u = (xs[pl_].astype(jnp.float32) + jitter[:, 0]) / (w - 1)
        v = (ys[pl_].astype(jnp.float32) + jitter[:, 1]) / (h - 1)
        o, d = get_rays(camera, u, v, aspect)
        return o, d, jax.random.key_data(keys), pl_, s

    def cond(st):
        e, alive = st[0], st[5]
        return (e < total) | jnp.any(alive)

    def body(st):
        (e, o, d, beta, rad, alive, kd, p_lane, depth, acc, cnt, nc, ns) = st

        # ---- refill dead lanes with the next emissions ----
        dead = ~alive
        rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
        eid = e + rank
        take = dead & (eid < total)
        o_n, d_n, kd_n, pl_n, _s_n = emit(jnp.minimum(eid, total - 1))
        tk = take[:, None]
        o = jnp.where(tk, o_n, o)
        d = jnp.where(tk, d_n, d)
        beta = jnp.where(tk, 1.0, beta)
        rad = jnp.where(tk, 0.0, rad)
        kd = jnp.where(tk, kd_n, kd)
        p_lane = jnp.where(take, pl_n, p_lane)
        depth = jnp.where(take, 0, depth)
        alive = alive | take
        e = e + jnp.sum(take.astype(jnp.int32))

        # ---- one shading vertex for the whole pool ----
        keys = jax.random.wrap_key_data(kd)
        alive_pre = alive
        o, d, beta, rad, alive, dnc, dns = tracer.bounce_step(
            scene, closest, occlude, o, d, beta, rad, alive, keys, depth,
            rr_start=rr_start,
        )
        depth = depth + alive_pre.astype(jnp.int32)

        # ---- retire finished paths into the framebuffer ----
        died_miss = alive_pre & ~alive
        exhausted = alive & (depth >= max_bounces)
        finish = died_miss | exhausted
        alive = alive & ~exhausted
        valid = finish & jnp.all(jnp.isfinite(rad), axis=-1)
        acc = acc.at[p_lane].add(jnp.where(valid[:, None], rad, 0.0),
                                 mode="drop")
        cnt = cnt.at[p_lane].add(valid.astype(jnp.int32), mode="drop")
        return (e, o, d, beta, rad, alive, kd, p_lane, depth, acc, cnt,
                nc + dnc, ns + dns)

    kd0 = jax.random.key_data(jax.random.split(base_key, n_l))
    st = (
        jnp.int32(0),
        jnp.zeros((n_l, 3), jnp.float32),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n_l, 3)),
        jnp.ones((n_l, 3), jnp.float32),
        jnp.zeros((n_l, 3), jnp.float32),
        jnp.zeros((n_l,), bool),
        kd0,
        jnp.zeros((n_l,), jnp.int32),
        jnp.zeros((n_l,), jnp.int32),
        jnp.zeros((p, 3), jnp.float32),
        jnp.zeros((p,), jnp.int32),
        jnp.int32(0),
        jnp.int32(0),
    )
    out = jax.lax.while_loop(cond, body, st)
    acc, cnt, nc, ns = out[9], out[10], out[11], out[12]
    return acc, cnt, nc, ns


class RenderStats:
    """Per-render counters (rays traced, wall time) for the Mrays/s metric."""

    def __init__(self):
        self.closest_rays = 0
        self.shadow_rays = 0
        self.seconds = 0.0

    @property
    def total_rays(self) -> int:
        return self.closest_rays + self.shadow_rays

    @property
    def mrays_per_s(self) -> float:
        return self.total_rays / self.seconds / 1e6 if self.seconds > 0 else 0.0


def render(
    scene: SceneData,
    camera: Camera,
    settings: RenderSettings,
    accel: Optional[ClusterAccel] = None,
    wave_size: int = 1 << 20,
    block_size: int = 64,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    tile_devices: Optional[int] = None,
    show_progress: bool = False,
    stats: Optional[RenderStats] = None,
    use_pallas: Optional[bool] = None,
    scheduler: str = "wave",
    backend: Optional[str] = None,
    accel_closest: Optional[ClusterAccel] = None,
) -> np.ndarray:
    """Full-frame wavefront render -> linear [H, W, 3] float32.

    scheduler: "wave" (bounded-depth waves; supports per-pass progressive
    checkpointing) or "pool" (persistent pool with on-device regeneration —
    the compaction architecture; checkpoints only between pixel chunks).
    """
    if tile_devices:
        from path_tracer_ai_tpu.parallel.mesh import render_tiled

        if scheduler != "wave":
            # The pool scheduler's on-device regeneration has no sharded
            # variant (its bucket choice is per-chunk host feedback, which
            # would need a cross-shard max every regeneration step); do not
            # silently substitute a different architecture.
            raise ValueError(
                "tile_devices supports only scheduler='wave' "
                f"(requested {scheduler!r})"
            )
        if settings.seed is None:
            # Entropy-seed exactly like the single-device path below (the
            # sharded path treats seed=None as 0 otherwise).
            settings = settings.replace(
                seed=int.from_bytes(np.random.bytes(4), "little")
            )
        return render_tiled(
            scene, camera, settings, n_devices=tile_devices,
            accel=accel, block_size=block_size, backend=backend,
            checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
            stats=stats, accel_closest=accel_closest,
        )

    w, h, spp = settings.width, settings.height, settings.samples_per_pixel
    aspect = settings.aspect_ratio()
    render_banner(log, settings)

    if accel is None:
        t0 = time.perf_counter()
        accel = build_clusters(scene.triangles)
        log.info(
            "Built cluster accel: %d clusters x %d slots (%.3fs)",
            accel.num_clusters, accel.cluster_size, time.perf_counter() - t0,
        )

    seed = settings.seed
    if seed is None:
        seed = int.from_bytes(np.random.bytes(4), "little")
    base_key = jax.random.key(np.uint32(seed))

    npix = w * h
    # Pixel chunk: whole waves of full pixels; sc samples per lane-pass.
    pix_chunk = min(npix, wave_size)
    sc = max(1, wave_size // pix_chunk)
    sc = min(sc, spp)
    n_lanes = pix_chunk * sc
    # Pad lanes to traversal block granularity.
    lanes_padded = -(-n_lanes // block_size) * block_size

    if use_pallas is None:
        use_pallas = default_use_pallas()

    # Dual-accel hybrid: closest waves at a different cluster size
    # (HYBRID_CLOSEST_CLUSTER_SIZE), built from the ORIGINAL triangles so
    # edge vectors stay bit-identical to the oracle's.
    accel_c = accel_closest
    eff_backend = backend if backend is not None else default_backend(accel)
    if (
        accel_c is None
        and eff_backend == "hybrid"
        and HYBRID_CLOSEST_CLUSTER_SIZE is not None
        and HYBRID_CLOSEST_CLUSTER_SIZE != accel.cluster_size
    ):
        t0 = time.perf_counter()
        accel_c = build_clusters(
            scene.triangles, cluster_size=HYBRID_CLOSEST_CLUSTER_SIZE
        )
        log.info(
            "Built closest-path accel: %d clusters x %d slots (%.3fs)",
            accel_c.num_clusters, accel_c.cluster_size,
            time.perf_counter() - t0,
        )

    def render_wave(xs, ys, s0):
        return _render_wave(
            scene, accel, camera, base_key, xs, ys, s0, spp,
            accel_c=accel_c,
            w=w, h=h, sc=sc, pix_chunk=pix_chunk,
            lanes_padded=lanes_padded, block_size=block_size,
            max_bounces=settings.max_bounces, aspect=aspect,
            use_pallas=use_pallas, backend=backend,
            rr_start=settings.rr_start,
        )

    ys_all, xs_all = np.mgrid[0:h, 0:w]
    xs_flat = xs_all.reshape(-1).astype(np.int32)
    ys_flat = ys_all.reshape(-1).astype(np.int32)
    # Upload pixel coordinates ONCE (padded to whole chunks); per-wave
    # device slices replace the old per-wave 8MB host->device pushes
    # (the tunnel's transfer paths are ~12-30 MB/s).
    npad_pix = math.ceil(npix / pix_chunk) * pix_chunk
    xs_dev_all = jnp.asarray(np.pad(xs_flat, (0, npad_pix - npix)))
    ys_dev_all = jnp.asarray(np.pad(ys_flat, (0, npad_pix - npix)))

    # Resume from checkpoint if present. Accumulators live ON DEVICE and
    # are pulled to the host only at checkpoints and at the end: the axon
    # tunnel's device->host path measured ~12 MB/s, so the old per-wave
    # [pix_chunk] pulls cost ~1s each — a large fraction of a 2spp render.
    acc = np.zeros((npix, 3), np.float32)
    cnt = np.zeros((npix,), np.int32)
    s_start = 0
    fingerprint = ckpt_io.fingerprint(settings, scene.triangles.count, seed)
    if checkpoint_path:
        loaded = ckpt_io.load(checkpoint_path, fingerprint)
        if loaded is not None:
            acc, cnt, s_start = loaded
            log.info("Resuming from checkpoint at sample %d/%d", s_start, spp)
    acc_dev = jnp.asarray(acc)
    cnt_dev = jnp.asarray(cnt)

    if stats is None:
        stats = RenderStats()
    t_start = time.perf_counter()

    n_pix_chunks = math.ceil(npix / pix_chunk)

    if scheduler == "pool":
        if s_start < spp:
            for ci in range(n_pix_chunks):
                lo = ci * pix_chunk
                hi = min(lo + pix_chunk, npix)
                xs = xs_dev_all[lo:lo + pix_chunk]
                ys = ys_dev_all[lo:lo + pix_chunk]
                # padded pixel slots hold coordinate 0; their samples are
                # wasted work only, and the accumulators are cropped below.
                a, c, nc, ns = _render_pool(
                    scene, accel, camera, base_key,
                    xs, ys, s_start, spp,
                    w=w, h=h, pix_chunk=pix_chunk, pool_size=lanes_padded,
                    block_size=block_size, max_bounces=settings.max_bounces,
                    aspect=aspect, use_pallas=use_pallas, backend=backend,
                    rr_start=settings.rr_start,
                )
                acc_dev = acc_dev.at[lo:hi].add(a[: hi - lo])
                cnt_dev = cnt_dev.at[lo:hi].add(c[: hi - lo])
                stats.closest_rays += int(nc)
                stats.shadow_rays += int(ns)
                if show_progress:
                    log.info("Rendering progress: %d%% (pool)",
                             ((ci + 1) * 100) // n_pix_chunks)
            acc = np.asarray(acc_dev)
            cnt = np.asarray(cnt_dev)
            if checkpoint_path:
                ckpt_io.save(checkpoint_path, acc, cnt, spp, fingerprint)
        stats.seconds += time.perf_counter() - t_start
        log.info(
            "Traced %.2fM rays (%.2fM closest + %.2fM shadow) at %.1f Mrays/s",
            stats.total_rays / 1e6, stats.closest_rays / 1e6,
            stats.shadow_rays / 1e6, stats.mrays_per_s,
        )
        safe_cnt = np.maximum(cnt, 1)[:, None].astype(np.float32)
        img = acc / safe_cnt
        img = np.where((cnt > 0)[:, None], img, MAGENTA[None, :])
        return img.reshape(h, w, 3)

    passes_done = 0
    for s0 in range(s_start, spp, sc):
        for ci in range(n_pix_chunks):
            lo = ci * pix_chunk
            hi = min(lo + pix_chunk, npix)
            a, c, nc, ns = render_wave(
                xs_dev_all[lo:lo + pix_chunk],
                ys_dev_all[lo:lo + pix_chunk], s0)
            acc_dev = acc_dev.at[lo:hi].add(a[: hi - lo])
            cnt_dev = cnt_dev.at[lo:hi].add(c[: hi - lo])
            stats.closest_rays += int(nc)
            stats.shadow_rays += int(ns)
        passes_done += 1
        if show_progress:
            pct = min(100, ((s0 + sc) * 100) // spp)
            log.info("Rendering progress: %d%% (%d/%d samples)", pct, min(s0 + sc, spp), spp)
        if checkpoint_path and (
            (checkpoint_every and passes_done % checkpoint_every == 0)
            or s0 + sc >= spp
        ):
            acc = np.asarray(acc_dev)
            cnt = np.asarray(cnt_dev)
            ckpt_io.save(checkpoint_path, acc, cnt, s0 + sc, fingerprint)

    acc = np.asarray(acc_dev)
    cnt = np.asarray(cnt_dev)
    stats.seconds += time.perf_counter() - t_start
    log.info(
        "Traced %.2fM rays (%.2fM closest + %.2fM shadow) at %.1f Mrays/s",
        stats.total_rays / 1e6, stats.closest_rays / 1e6,
        stats.shadow_rays / 1e6, stats.mrays_per_s,
    )

    safe_cnt = np.maximum(cnt, 1)[:, None].astype(np.float32)
    img = acc / safe_cnt
    img = np.where((cnt > 0)[:, None], img, MAGENTA[None, :])
    return img.reshape(h, w, 3)
