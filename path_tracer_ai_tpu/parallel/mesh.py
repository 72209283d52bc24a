"""Multi-chip rendering over a jax.sharding.Mesh.

The reference has NO multi-device story (SURVEY.md §2 "Multi-chip: absent");
this is the TPU-native scale-out layer it lacks:

- mesh axis "tiles":   the framebuffer's pixel space is sharded — each
  device renders a disjoint block of pixels. Scene, materials, lights and
  the cluster accel are replicated (they are small relative to HBM; the
  sample space is what scales). This is the layout recommendation of
  SURVEY.md §2 "Distributed communication backend".
- mesh axis "samples": samples-per-pixel are strided across devices; the
  per-device partial accumulators are combined with a `psum` over ICI.

Both axes compose: a (T, S) mesh renders npix/T pixels x spp/S samples per
device and all-reduces over the sample axis only. Determinism: RNG streams
are keyed by (pixel, global sample index), so any mesh shape produces the
same sample set as a single chip — images agree to float-summation order.

Multi-host note: jax.distributed + the same Mesh spanning hosts works
unchanged (scene arrays are broadcast once over DCN at upload; all render
traffic is ICI psum).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from path_tracer_ai_tpu.accel.clusters import ClusterAccel, build_clusters
from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.core.types import SceneData
from path_tracer_ai_tpu.engine import tracer
from path_tracer_ai_tpu.engine.oracle import MAGENTA, _fold_all
from path_tracer_ai_tpu.engine.wavefront import packet_backend
from path_tracer_ai_tpu.scene.camera import Camera, get_rays
from path_tracer_ai_tpu.utils.logging import get_logger

log = get_logger(__name__)


def make_mesh(n_tile: int, n_sample: int = 1, devices=None) -> Mesh:
    devs = np.asarray(devices if devices is not None else jax.devices())
    need = n_tile * n_sample
    if devs.size < need:
        raise ValueError(f"need {need} devices, have {devs.size}")
    return Mesh(devs[:need].reshape(n_tile, n_sample), ("tiles", "samples"))


def render_sharded(
    scene: SceneData,
    camera: Camera,
    settings: RenderSettings,
    mesh: Mesh,
    accel: Optional[ClusterAccel] = None,
    block_size: int = 256,
    pix_chunk: int = 1 << 16,
) -> np.ndarray:
    """Render with pixels sharded over "tiles" and spp over "samples"."""
    w, h, spp = settings.width, settings.height, settings.samples_per_pixel
    aspect = settings.aspect_ratio()
    n_tile = mesh.shape["tiles"]
    n_samp = mesh.shape["samples"]

    if accel is None:
        accel = build_clusters(scene.triangles)

    seed = settings.seed if settings.seed is not None else 0
    base_key = jax.random.key(np.uint32(seed))
    closest, occlude = packet_backend(accel, block_size)

    npix = w * h
    # Per-device pixel block, padded to a whole number of pix_chunk waves
    # and to traversal block granularity.
    p_loc = -(-npix // n_tile)
    chunk = min(pix_chunk, p_loc)
    chunk = -(-chunk // block_size) * block_size
    p_loc = -(-p_loc // chunk) * chunk
    n_chunks = p_loc // chunk
    spp_loc = -(-spp // n_samp)  # samples per device (strided by n_samp)

    ys_all, xs_all = np.mgrid[0:h, 0:w]
    xs_flat = np.zeros((n_tile * p_loc,), np.int32)
    ys_flat = np.zeros((n_tile * p_loc,), np.int32)
    pix_valid = np.zeros((n_tile * p_loc,), bool)
    xs_flat[:npix] = xs_all.reshape(-1)
    ys_flat[:npix] = ys_all.reshape(-1)
    pix_valid[:npix] = True
    xs_dev = xs_flat.reshape(n_tile, p_loc)
    ys_dev = ys_flat.reshape(n_tile, p_loc)
    # Which sample-stride offset this device owns: one per "samples" slot.
    s_off = np.arange(n_samp, dtype=np.int32).reshape(1, n_samp)
    s_off = np.broadcast_to(s_off, (n_tile, n_samp)).reshape(n_tile * n_samp)

    def local_render(xs, ys, s_offset):
        # xs, ys: [1, p_loc] local pixel block; s_offset: [1] local stride.
        xs = xs.reshape(n_chunks, chunk)
        ys = ys.reshape(n_chunks, chunk)
        s_offset = s_offset[0]

        def do_chunk(carry, xy):
            cx, cy = xy
            pix_idx = (cy * w + cx).astype(jnp.int32)

            def do_sample(j, ac):
                acc, cnt = ac
                s = s_offset + j * n_samp  # global sample index
                keys = jax.vmap(lambda p: _fold_all(base_key, p, s))(pix_idx)
                kj = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, 0)
                jitter = jax.vmap(lambda k: jax.random.uniform(k, (2,)))(kj)
                u = (cx.astype(jnp.float32) + jitter[:, 0]) / (w - 1)
                v = (cy.astype(jnp.float32) + jitter[:, 1]) / (h - 1)
                o, d = get_rays(camera, u, v, aspect)
                radiance, valid, _ = tracer.trace_paths(
                    scene, o, d, keys, settings.max_bounces, closest, occlude
                )
                valid = valid & (s < spp)  # drop strided tail beyond spp
                acc = acc + jnp.where(valid[:, None], radiance, 0.0)
                cnt = cnt + valid.astype(jnp.int32)
                return acc, cnt

            acc0 = jnp.zeros((chunk, 3), jnp.float32)
            cnt0 = jnp.zeros((chunk,), jnp.int32)
            acc, cnt = jax.lax.fori_loop(0, spp_loc, do_sample, (acc0, cnt0))
            return carry, (acc, cnt)

        _, (accs, cnts) = jax.lax.scan(do_chunk, 0, (xs, ys))
        acc = accs.reshape(p_loc, 3)
        cnt = cnts.reshape(p_loc)
        # Combine the sample shards over ICI (the reference never needed a
        # collective; this is the psum of SURVEY.md §2's TPU plan).
        acc = jax.lax.psum(acc, "samples")
        cnt = jax.lax.psum(cnt, "samples")
        return acc[None], cnt[None]

    fn = shard_map(
        local_render,
        mesh=mesh,
        in_specs=(P("tiles"), P("tiles"), P(("tiles", "samples"))),
        out_specs=(P("tiles"), P("tiles")),
        check_vma=False,
    )
    acc, cnt = jax.jit(fn)(
        jnp.asarray(xs_dev), jnp.asarray(ys_dev), jnp.asarray(s_off)
    )
    acc = np.asarray(acc).reshape(n_tile * p_loc, 3)[:npix]
    cnt = np.asarray(cnt).reshape(n_tile * p_loc)[:npix]

    safe = np.maximum(cnt, 1)[:, None].astype(np.float32)
    img = acc / safe
    img = np.where((cnt > 0)[:, None], img, MAGENTA[None, :])
    return img.reshape(h, w, 3)


def render_tiled(
    scene: SceneData,
    camera: Camera,
    settings: RenderSettings,
    n_devices: Optional[int] = None,
    **kw,
) -> np.ndarray:
    """Convenience wrapper: pure tile sharding over the first N devices."""
    n = n_devices or len(jax.devices())
    n = min(n, len(jax.devices()))
    mesh = make_mesh(n, 1)
    log.info("Rendering on %d-device mesh (tiles=%d, samples=1)", n, n)
    return render_sharded(scene, camera, settings, mesh, **kw)
