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
                    scene, o, d, keys, settings.max_bounces, closest,
                    occlude, rr_start=settings.rr_start,
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


# ---------------------------------------------------------------------------
# Host-stepped sharded scheduler (the single-chip architecture over a mesh)
# ---------------------------------------------------------------------------
#
# render_sharded (above) jits ONE fused program per shard — simple and
# correct, but it lacks the single-chip engine's measured wins: host-stepped
# bounces (one executable per bounce, reused across waves/passes, ~3x over
# nesting the traversal chunk loops inside an XLA while), live-lane
# compaction (live fractions fall 100->13% over 5 bounces), per-bounce ray
# stats, and per-pass checkpointing. This scheduler brings all four to the
# mesh: wave state lives in [n_tile, n_samp, L, ...] arrays sharded over
# both axes, every step is a shard_map'd executable (traversal needs no
# communication — scene/accel are replicated; only the final accumulate
# psums over "samples"), and the compaction bucket is chosen on the host
# from the max per-shard live count so all shards keep identical (SPMD)
# shapes. RNG streams are keyed by (pixel, global sample, bounce, purpose),
# so images bit-match the single chip up to float summation order.

_MESH_EXE_CACHE: dict = {}


def _mexe(cfg, pins, name: str, builder):
    """Executable cache keyed on the FULL closed-over configuration.

    cfg must encode everything the built executables close over (scene/
    camera/accel identity, seed, chunking, spp, backend, mesh) — a
    (id(mesh), name) key silently returned stale executables when the same
    mesh rendered a different scene/seed (round-3 advisor finding). `pins`
    holds strong references to every object whose id() appears in cfg, so
    CPython id reuse after GC can never alias two distinct configs.
    """
    key = (cfg, name)
    if key not in _MESH_EXE_CACHE:
        _MESH_EXE_CACHE[key] = (builder(), pins)
    return _MESH_EXE_CACHE[key][0]


def clear_mesh_caches():
    _MESH_EXE_CACHE.clear()


def render_sharded_wavefront(
    scene: SceneData,
    camera: Camera,
    settings: RenderSettings,
    mesh: Mesh,
    accel: Optional[ClusterAccel] = None,
    block_size: int = 64,
    pix_chunk: int = 1 << 16,
    backend: Optional[str] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    stats=None,
    compact_min_bucket: int = 1 << 14,
    accel_closest=None,
) -> np.ndarray:
    """Host-stepped wavefront render over a (tiles, samples) mesh."""
    from functools import partial

    from path_tracer_ai_tpu.engine.oracle import _fold_all as fold_all
    from path_tracer_ai_tpu.io import checkpoint as ckpt_io

    w, h, spp = settings.width, settings.height, settings.samples_per_pixel
    aspect = settings.aspect_ratio()
    n_tile = mesh.shape["tiles"]
    n_samp = mesh.shape["samples"]

    if accel is None:
        accel = build_clusters(scene.triangles)
    seed = settings.seed if settings.seed is not None else 0
    base_key_data = jax.random.key_data(jax.random.key(np.uint32(seed)))
    closest, occlude = packet_backend(accel, block_size, backend=backend,
                                      accel_closest=accel_closest)

    npix = w * h
    p_loc = -(-npix // n_tile)
    chunk = min(pix_chunk, p_loc)
    chunk = -(-chunk // block_size) * block_size
    p_loc = -(-p_loc // chunk) * chunk
    n_chunks = p_loc // chunk
    spp_loc = -(-spp // n_samp)

    ys_all, xs_all = np.mgrid[0:h, 0:w]
    xs_flat = np.zeros((n_tile * p_loc,), np.int32)
    ys_flat = np.zeros((n_tile * p_loc,), np.int32)
    xs_flat[:npix] = xs_all.reshape(-1)
    ys_flat[:npix] = ys_all.reshape(-1)
    xs_dev = xs_flat.reshape(n_tile, p_loc)
    ys_dev = ys_flat.reshape(n_tile, p_loc)

    lane_axes = P("tiles", "samples")

    def smap(fn, in_specs, out_specs):
        return jax.jit(shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        ))

    def gen_exe():
        def gen(xs, ys, j):
            # xs/ys [1, 1, chunk]; per-shard global sample index from the
            # mesh coordinate (strided sample sharding).
            s_off = jax.lax.axis_index("samples")
            s = j + s_off  # j is pass_index * n_samp
            base_key = jax.random.wrap_key_data(base_key_data)
            pix = (ys * w + xs).reshape(-1).astype(jnp.int32)
            keys = jax.vmap(lambda p: fold_all(base_key, p, s))(pix)
            kj = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, 0)
            jitter = jax.vmap(lambda k: jax.random.uniform(k, (2,)))(kj)
            u = (xs.reshape(-1).astype(jnp.float32) + jitter[:, 0]) / (w - 1)
            v = (ys.reshape(-1).astype(jnp.float32) + jitter[:, 1]) / (h - 1)
            o, d = get_rays(camera, u, v, aspect)
            valid_s = s < spp  # strided tail beyond spp renders dead
            alive = jnp.broadcast_to(valid_s, (chunk,))
            kd = jax.random.key_data(keys)
            return (o[None, None], d[None, None], kd[None, None],
                    alive[None, None], jnp.asarray(s)[None, None])

        return smap(
            gen, (lane_axes, lane_axes, P()),
            (lane_axes, lane_axes, lane_axes, lane_axes, lane_axes),
        )

    def bounce_exe():
        def bounce(o, d, beta, rad, alive, kd, depth):
            keys = jax.random.wrap_key_data(kd[0, 0])
            out = tracer.bounce_step(
                scene, closest, occlude, o[0, 0], d[0, 0], beta[0, 0],
                rad[0, 0], alive[0, 0], keys, depth,
                rr_start=settings.rr_start,
            )
            o2, d2, b2, r2, a2, nc, ns = out
            return (o2[None, None], d2[None, None], b2[None, None],
                    r2[None, None], a2[None, None], nc[None, None],
                    ns[None, None])

        specs = (lane_axes,) * 6 + (P(),)
        return smap(bounce, specs, (lane_axes,) * 7)

    def live_exe():
        return smap(
            lambda alive: jnp.sum(alive[0, 0]).astype(jnp.int32)[None, None],
            (lane_axes,), lane_axes,
        )

    def compact_exe(bucket):
        def compact(o, d, beta, rad, kd, alive):
            cur = o.shape[2]
            a = alive[0, 0]
            n_live = jnp.sum(a.astype(jnp.int32))
            idx = jnp.nonzero(a, size=bucket, fill_value=cur)[0].astype(
                jnp.int32)
            gi = jnp.minimum(idx, cur - 1)
            live = jnp.arange(bucket, dtype=jnp.int32) < n_live
            return (
                o[0, 0][gi][None, None],
                jnp.where(live[:, None], d[0, 0][gi], 1.0)[None, None],
                beta[0, 0][gi][None, None],
                rad[0, 0][gi][None, None],
                kd[0, 0][gi][None, None],
                live[None, None],
                idx[None, None],
            )

        return smap(compact, (lane_axes,) * 6, (lane_axes,) * 7)

    def scatter_exe():
        def scat(full_rad, rad, idx):
            out = full_rad[0, 0].at[idx[0, 0]].set(rad[0, 0], mode="drop")
            return out[None, None]

        return smap(scat, (lane_axes,) * 3, lane_axes)

    def compose_exe():
        def compose(full_idx, idx, cur_arr):
            # Sentinel must be >= the ORIGINAL wave width so the final
            # scatter into full_rad (chunk lanes) drops it.
            fi = full_idx[0, 0]
            ix = idx[0, 0]
            c = cur_arr[0, 0]
            out = jnp.where(
                ix < c, fi[jnp.minimum(ix, fi.shape[0] - 1)], chunk
            ).astype(jnp.int32)
            return out[None, None]

        return smap(compose, (lane_axes,) * 3, lane_axes)

    def accum_exe():
        def accum(rad, s_arr):
            # per-shard accumulate + psum over the samples axis
            r = rad[0, 0]
            valid = jnp.all(jnp.isfinite(r), axis=-1) & (s_arr[0, 0] < spp)
            acc = jnp.where(valid[:, None], r, 0.0)
            cnt = valid.astype(jnp.int32)
            acc = jax.lax.psum(acc, "samples")
            cnt = jax.lax.psum(cnt, "samples")
            return acc[None], cnt[None]

        return smap(accum, (lane_axes,) * 2, (P("tiles"), P("tiles")))

    pins = (mesh, scene, accel, accel_closest)
    # Camera is keyed by VALUE (5 tiny arrays): callers rebuild identical
    # cameras per call and must still hit the executable cache.
    cam_key = tuple(np.asarray(x).tobytes() for x in camera)
    cfg = (tuple(id(p) for p in pins), cam_key, seed, w, h, spp, chunk,
           block_size, backend, settings.rr_start)
    gen = _mexe(cfg, pins, "gen", gen_exe)
    bounce = _mexe(cfg, pins, "bounce", bounce_exe)
    live_counts = _mexe(cfg, pins, "live", live_exe)
    scatter_back = _mexe(cfg, pins, "scatter", scatter_exe)
    compose = _mexe(cfg, pins, "compose", compose_exe)
    accum = _mexe(cfg, pins, "accum", accum_exe)

    # Device-side accumulators in the padded per-tile layout; pulled to
    # the host only at checkpoints and at the end (the tunnel D2H path is
    # slow — see engine.wavefront.render).
    acc = np.zeros((npix, 3), np.float32)
    cnt = np.zeros((npix,), np.int32)
    fingerprint = ckpt_io.fingerprint(settings, scene.triangles.count, seed)
    j_start = 0
    if checkpoint_path:
        loaded = ckpt_io.load(checkpoint_path, fingerprint)
        if loaded is not None:
            acc, cnt, s_done = loaded
            if s_done % n_samp != 0:
                # A checkpoint mid-pass for THIS mesh shape (e.g. written
                # by the single-device scheduler) cannot resume here:
                # flooring j_start would re-render samples already in the
                # accumulator and double-count them (round-3 advisor
                # finding). The sample set is identical across mesh shapes
                # (strided keying), only the pass granularity differs.
                raise ValueError(
                    f"checkpoint at {s_done} samples is not a multiple of "
                    f"the mesh's samples axis ({n_samp}); resume it on a "
                    f"mesh whose samples axis divides {s_done}, or finish "
                    f"the pass on the scheduler that wrote it"
                )
            j_start = s_done // n_samp
            log.info("Resuming sharded render at sample %d/%d", s_done, spp)

    def to_padded(x, fill=0):
        out = np.zeros((n_tile * p_loc,) + x.shape[1:], x.dtype)
        out[:npix] = x
        return jnp.asarray(out.reshape(n_tile, p_loc, *x.shape[1:]))

    acc_dev = to_padded(acc)          # [n_tile, p_loc, 3]
    cnt_dev = to_padded(cnt)

    def pull():
        a = np.asarray(acc_dev).reshape(n_tile * p_loc, 3)[:npix]
        c = np.asarray(cnt_dev).reshape(n_tile * p_loc)[:npix]
        return a, c

    import time as _time

    t_start = _time.perf_counter()
    passes_done = 0
    for j in range(j_start, spp_loc):
        for ci in range(n_chunks):
            xs = jnp.asarray(xs_dev[:, ci * chunk:(ci + 1) * chunk])[:, None]
            ys = jnp.asarray(ys_dev[:, ci * chunk:(ci + 1) * chunk])[:, None]
            xs = jnp.broadcast_to(xs, (n_tile, n_samp, chunk))
            ys = jnp.broadcast_to(ys, (n_tile, n_samp, chunk))
            o, d, kd, alive, s_arr = gen(xs, ys, jnp.int32(j * n_samp))
            beta = jnp.ones((n_tile, n_samp, chunk, 3), jnp.float32)
            rad = jnp.zeros((n_tile, n_samp, chunk, 3), jnp.float32)
            full_rad = None
            full_idx = None
            ncs = nss = 0
            for depth in range(settings.max_bounces):
                if depth > 0:
                    lv = np.asarray(live_counts(alive))
                    max_live = int(lv.max())
                    cur = o.shape[2]
                    bucket = max(max_live, compact_min_bucket)
                    bucket = 1 << max(bucket - 1, 1).bit_length()
                    if max_live > 0 and bucket <= cur // 2:
                        cexe = _mexe(cfg, pins, f"compact{bucket}",
                                     lambda b=bucket: compact_exe(b))
                        o, d, beta, rad_c, kd, alive, idx = cexe(
                            o, d, beta, rad, kd, alive)
                        if full_rad is None:
                            full_rad = rad
                            full_idx = idx
                        else:
                            full_rad = scatter_back(full_rad, rad, full_idx)
                            cur_arr = jnp.broadcast_to(
                                jnp.int32(cur), (n_tile, n_samp, 1)
                            )
                            full_idx = compose(full_idx, idx, cur_arr)
                        rad = rad_c
                o, d, beta, rad, alive, nc, ns = bounce(
                    o, d, beta, rad, alive, kd, jnp.int32(depth)
                )
                ncs += int(np.asarray(nc).sum())
                nss += int(np.asarray(ns).sum())
            if full_rad is not None:
                rad = scatter_back(full_rad, rad, full_idx)
            a, c = accum(rad, s_arr)
            lo = ci * chunk
            acc_dev = acc_dev.at[:, lo:lo + chunk].add(a)
            cnt_dev = cnt_dev.at[:, lo:lo + chunk].add(c)
            if stats is not None:
                stats.closest_rays += ncs
                stats.shadow_rays += nss
        passes_done += 1
        if checkpoint_path and (
            (checkpoint_every and passes_done % checkpoint_every == 0)
            or j + 1 >= spp_loc
        ):
            acc, cnt = pull()
            ckpt_io.save(checkpoint_path, acc, cnt,
                         (j + 1) * n_samp, fingerprint)
    acc, cnt = pull()
    if stats is not None:
        stats.seconds += _time.perf_counter() - t_start

    safe = np.maximum(cnt, 1)[:, None].astype(np.float32)
    img = acc / safe
    img = np.where((cnt > 0)[:, None], img, MAGENTA[None, :])
    return img.reshape(h, w, 3)


def render_tiled(
    scene: SceneData,
    camera: Camera,
    settings: RenderSettings,
    n_devices: Optional[int] = None,
    scheduler: str = "wave",
    **kw,
) -> np.ndarray:
    """Convenience wrapper: pure tile sharding over the first N devices."""
    n = n_devices or len(jax.devices())
    n = min(n, len(jax.devices()))
    mesh = make_mesh(n, 1)
    log.info("Rendering on %d-device mesh (tiles=%d, samples=1)", n, n)
    if scheduler == "wave":
        return render_sharded_wavefront(scene, camera, settings, mesh, **kw)
    dropped = [
        k for k in ("accel_closest", "backend", "checkpoint_path",
                    "checkpoint_every", "stats")
        if kw.pop(k, None) not in (None, 0)
    ]
    if dropped:
        raise ValueError(
            "scheduler='fused' supports only the base render surface; "
            f"got {dropped} — use scheduler='wave' "
            "(render_sharded_wavefront) for those"
        )
    return render_sharded(scene, camera, settings, mesh, **kw)
