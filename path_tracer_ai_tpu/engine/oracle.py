"""Oracle engine: the reference CPU renderer's semantics in pure JAX.

This is the `--mode cpu` equivalent and the correctness ground truth for all
fast paths (BASELINE.md: "RMSE vs CPU reference"). It transcribes
Renderer::render + tracePath (renderer.hpp:40-301) into batch form:

- OpenMP scanline fan-out (renderer.hpp:52-53)  -> pixel-chunk batches
- per-pixel spp loop (renderer.hpp:62-73)        -> lax.fori_loop over samples
- recursive tracePath                            -> throughput iteration over
  bounces (see engine.shading for the term-by-term derivation)
- brute-force-exact Scene::intersect             -> engine.intersect scans
- invalid-sample filtering + magenta debug pixels (renderer.hpp:75-79)
  reproduced via per-sample finiteness masks

Architecture notes (TPU): every chunk is one fused XLA program; the bounce
loop is a lax.fori_loop with masked lanes (no per-lane control flow); RNG is
counter-based per (pixel, sample, bounce, purpose) — reproducible and
sharding-invariant, unlike the reference's std::random_device seeding.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.core import sampling
from path_tracer_ai_tpu.core.types import SceneData
from path_tracer_ai_tpu.engine import tracer
from path_tracer_ai_tpu.scene.camera import Camera, get_rays
from path_tracer_ai_tpu.utils.logging import get_logger, render_banner

log = get_logger(__name__)

MAGENTA = np.asarray([1.0, 0.0, 1.0], np.float32)  # invalid-pixel sentinel


def _fold_all(base_key, *vals):
    k = base_key
    for v in vals:
        k = jax.random.fold_in(k, v)
    return k


def trace_paths(
    scene: SceneData,
    origins: jnp.ndarray,     # [N,3]
    directions: jnp.ndarray,  # [N,3]
    keys,                     # [N] key array (one stream per lane)
    max_bounces: int,
    tri_chunk: int = 512,
    rr_start: int = 0,
):
    """Iterative tracePath over a lane batch with the exact brute-force
    traversal backend. Returns (radiance [N,3], valid [N])."""
    closest, occlude = tracer.brute_force_backend(scene, tri_chunk)
    radiance, valid, _stats = tracer.trace_paths(
        scene, origins, directions, keys, max_bounces, closest, occlude,
        rr_start=rr_start,
    )
    return radiance, valid


def render(
    scene: SceneData,
    camera: Camera,
    settings: RenderSettings,
    chunk_pixels: int = 16384,
    tri_chunk: int = 512,
    show_progress: bool = False,
    spp_chunk: int = 0,
) -> np.ndarray:
    """Full-frame render; returns linear-radiance image [H, W, 3] float32.

    Gamma correction happens at save time (io.image), matching the reference
    split between Renderer::render and Renderer::saveImage.

    spp_chunk > 0 bounds each DEVICE EXECUTION to that many samples per
    pixel chunk (the whole-spp fori_loop otherwise runs as ONE execution;
    at high spp that is a multi-minute device program, which the axon
    tunnel's watchdog kills — observed as "TPU worker process crashed" at
    96x96@32768spp). Per-sample math is identical; only the f32
    accumulation grouping changes (partial sums per block), so same-seed
    agreement holds to float-summation order, as across wave sizes.
    """
    w, h, spp = settings.width, settings.height, settings.samples_per_pixel
    aspect = settings.aspect_ratio()
    render_banner(log, settings)

    seed = settings.seed
    if seed is None:
        seed = int.from_bytes(np.random.bytes(4), "little")
    base_key = jax.random.key(np.uint32(seed))

    @partial(jax.jit, donate_argnums=())
    def render_chunk(xs, ys, s_lo, s_hi):
        pix_idx = ys * w + xs
        n = xs.shape[0]

        def sample_body(s, carry):
            acc, cnt = carry
            keys = jax.vmap(
                lambda p: _fold_all(base_key, p, s)
            )(pix_idx)
            kj = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
                keys, sampling.TAG_PIXEL_JITTER
            )
            jitter = jax.vmap(lambda k: jax.random.uniform(k, (2,)))(kj)
            u = (xs.astype(jnp.float32) + jitter[:, 0]) / (w - 1)
            v = (ys.astype(jnp.float32) + jitter[:, 1]) / (h - 1)
            o, d = get_rays(camera, u, v, aspect)
            radiance, valid = trace_paths(
                scene, o, d, keys, settings.max_bounces, tri_chunk=tri_chunk,
                rr_start=settings.rr_start,
            )
            acc = acc + jnp.where(valid[..., None], radiance, 0.0)
            cnt = cnt + valid.astype(jnp.int32)
            return acc, cnt

        acc0 = jnp.zeros((n, 3), jnp.float32)
        cnt0 = jnp.zeros((n,), jnp.int32)
        # Dynamic bounds: one executable serves every sample block.
        return jax.lax.fori_loop(s_lo, s_hi, sample_body, (acc0, cnt0))

    ys_all, xs_all = np.mgrid[0:h, 0:w]
    xs_flat = xs_all.reshape(-1).astype(np.int32)
    ys_flat = ys_all.reshape(-1).astype(np.int32)
    npix = w * h
    chunk = min(chunk_pixels, npix)

    acc = np.zeros((npix, 3), np.float32)
    cnt = np.zeros((npix,), np.int32)
    n_chunks = math.ceil(npix / chunk)
    for ci in range(n_chunks):
        lo = ci * chunk
        hi = min(lo + chunk, npix)
        xs = np.zeros((chunk,), np.int32)
        ys = np.zeros((chunk,), np.int32)
        xs[: hi - lo] = xs_flat[lo:hi]
        ys[: hi - lo] = ys_flat[lo:hi]
        xs_d, ys_d = jnp.asarray(xs), jnp.asarray(ys)
        sc = spp if spp_chunk <= 0 else min(spp_chunk, spp)
        a = c = None
        for s_lo in range(0, spp, sc):
            ab, cb = render_chunk(xs_d, ys_d, jnp.int32(s_lo),
                                  jnp.int32(min(s_lo + sc, spp)))
            a = ab if a is None else a + ab
            c = cb if c is None else c + cb
        acc[lo:hi] = np.asarray(a)[: hi - lo]
        cnt[lo:hi] = np.asarray(c)[: hi - lo]
        if show_progress:
            pct = (hi * 100) // npix
            log.info("Rendering progress: %d%% (%d/%d pixels)", pct, hi, npix)

    # Average valid samples; magenta where no sample was valid
    # (renderer.hpp:75-79).
    safe_cnt = np.maximum(cnt, 1)[:, None].astype(np.float32)
    img = acc / safe_cnt
    img = np.where((cnt > 0)[:, None], img, MAGENTA[None, :])
    return img.reshape(h, w, 3)
