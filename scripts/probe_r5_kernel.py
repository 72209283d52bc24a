"""Kernel-throughput ladder: is the Pallas tile sweep at the VPU floor?

The ceiling plan treats dense MT at 27.5-32.9 Gtests/s as the cap, but a
FLOP count says otherwise: ~35-40 VPU ops/test against the v5e VPU's
multi-Tflop peak puts the arithmetic ceiling at roughly 2-3x the measured
rate. This ladder attributes the gap on REAL kernel shapes (S=256 pack,
GROUP consecutive same-cluster tiles, T=128 lanes):

  dma_floor  — DMA + transpose + trivial store, no MT: the pipeline floor.
  mt_only    — the MT chain with best-t output only (no tri-id resolve
               tail): isolates the ~15-op compare/select/min tail of the
               production kernel. Arithmetic identical to production, so
               its best-t stays bitwise.
  prod       — pallas_ctiles.tile_sweep as shipped (t + tri resolve).
  prod_g16/32— production body at GROUP in {16, 32} (amortizes the
               per-step [16,S] transpose and grid overhead over more
               tiles; same arithmetic, bitwise output).

Every variant's Gtests/s is tests = nt * T * S over mean wall time; the
mt_only/prod delta is the resolve-tail cost and the dma_floor row bounds
what a "free-MT" kernel could do. Interpret-mode CPU smoke checks
exactness of every variant against the XLA reference sweep.

Run standalone (`python scripts/probe_r5_kernel.py [--cpu]`) or via
runpy from a session script (emits JSON lines like every probe).
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main(smoke=False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from __graft_entry__ import _demo_scene
    from path_tracer_ai_tpu.accel import pallas_ctiles as pc
    from path_tracer_ai_tpu.accel.clusters import build_clusters

    host = {}
    scene, _ = _demo_scene(subdivisions=3 if smoke else 6, host_out=host)
    accel_c = build_clusters(host["tris"], cluster_size=256)
    tri_pack = pc.pack_tris(accel_c)
    c = accel_c.num_clusters
    s = int(tri_pack.shape[2])
    T = 128

    # Production-shaped microbench wave: every tile live, tile cids drawn
    # in GROUP-constant runs like _build_pairs emits them (consecutive
    # same-cid steps exercise the DMA elision exactly as production does).
    rng = np.random.default_rng(7)
    nt = 1 << (6 if smoke else 14)                      # tiles
    n = nt * T
    tv0 = np.asarray(host["tris"].v0)
    ti = rng.choice(tv0.shape[0], n)
    o = tv0[ti] + rng.standard_normal((n, 3)).astype(np.float32) * 1e-3
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.full((n,), np.inf, np.float32)
    rays_pack = pc.pack_rays_tiles(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax), T)
    base_runs = rng.integers(0, c, nt // 8)
    tile_cid = jnp.asarray(np.repeat(base_runs, 8).astype(np.int32))
    tests = nt * T * s

    def timeit(fn, reps=5):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        cs = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps, cs, out

    ipkw = dict(interpret=True) if smoke else {}

    def ladder_call(kernel_body, group, n_out=2, tri_block=(1, 16, None)):
        """pallas_call wrapper mirroring tile_sweep's grid/spec layout."""
        tb = tuple(s if x is None else x for x in tri_block)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt // group,),
            in_specs=[
                pl.BlockSpec((group, 8, T), lambda i, cid: (i, 0, 0)),
                pl.BlockSpec(tb, lambda i, cid: (cid[i * group], 0, 0)),
            ],
            out_specs=[pl.BlockSpec((group, T), lambda i, cid: (i, 0))
                       ] * n_out,
        )
        out_shape = [jax.ShapeDtypeStruct((nt, T), jnp.float32),
                     jax.ShapeDtypeStruct((nt, T), jnp.int32)][:n_out]
        return pl.pallas_call(
            functools.partial(kernel_body, group=group),
            grid_spec=grid_spec, out_shape=out_shape,
            **ipkw,
        )

    def dma_floor_kernel(cid_ref, rays_ref, tri_ref, t_out_ref, *, group):
        del cid_ref
        trit = tri_ref[0].T                               # [S, 16]
        col = jnp.max(trit[:, 0:1])                       # consume the DMA
        for g in range(group):
            t_out_ref[g, :] = rays_ref[g][6, :] + col

    def dma_floor_notr_kernel(cid_ref, rays_ref, tri_ref, t_out_ref,
                              *, group):
        # Same floor WITHOUT the [16,S]->[S,16] transpose: the delta vs
        # dma_floor attributes the per-step transpose cost.
        del cid_ref
        col = jnp.max(tri_ref[0][0:1, :])
        for g in range(group):
            t_out_ref[g, :] = rays_ref[g][6, :] + col

    def mt_only_kernel(cid_ref, rays_ref, tri_ref, t_out_ref, *, group):
        del cid_ref
        trit = tri_ref[0].T
        for g in range(group):
            rays = rays_ref[g]
            ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
            dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
            tmax_r, tmin_r = rays[6:7, :], rays[7:8, :]
            best, _tri = pc._mt_rows(trit, ox, oy, oz, dx, dy, dz,
                                     tmin_r, tmax_r)
            t_out_ref[g, :] = best[0]

    def prod_kernel_g(cid_ref, rays_ref, tri_ref, t_out_ref, tri_out_ref,
                      *, group):
        pc._sweep_kernel(cid_ref, rays_ref, tri_ref, t_out_ref,
                         tri_out_ref, group=group)

    def packt_kernel(cid_ref, rays_ref, tri_ref, t_out_ref, tri_out_ref,
                     *, group):
        # Pre-transposed [C, S, 16] pack: the kernel consumes trit
        # DIRECTLY (no per-step [16,S]->[S,16] transpose). Identical MT
        # arithmetic on identical values -> bitwise vs production.
        del cid_ref
        trit = tri_ref[0]                                 # [S, 16]
        for g in range(group):
            rays = rays_ref[g]
            ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
            dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
            tmax_r, tmin_r = rays[6:7, :], rays[7:8, :]
            best, trik = pc._mt_rows(trit, ox, oy, oz, dx, dy, dz,
                                     tmin_r, tmax_r)
            t_out_ref[g, :] = best[0]
            tri_out_ref[g, :] = trik[0]

    def dual_kernel(cid_ref, rays_ref, tri_a, tri_b, t_out_ref,
                    tri_out_ref, *, group):
        # TWO cluster blocks per grid step (separate BlockSpecs): halves
        # the step count without coarsening the pair-table padding
        # granularity (each half is still a GROUP=8 run). If the 37%
        # kernel floor is per-STEP overhead, this claws back half of it.
        del cid_ref
        for half, tri_ref in ((0, tri_a), (1, tri_b)):
            trit = tri_ref[0].T
            for g in range(group):
                gg = half * group + g
                rays = rays_ref[gg]
                ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
                dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
                tmax_r, tmin_r = rays[6:7, :], rays[7:8, :]
                best, trik = pc._mt_rows(trit, ox, oy, oz, dx, dy, dz,
                                         tmin_r, tmax_r)
                t_out_ref[gg, :] = best[0]
                tri_out_ref[gg, :] = trik[0]

    def dual_call(group=8):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt // (2 * group),),
            in_specs=[
                pl.BlockSpec((2 * group, 8, T), lambda i, cid: (i, 0, 0)),
                pl.BlockSpec((1, 16, s),
                             lambda i, cid: (cid[i * 2 * group], 0, 0)),
                pl.BlockSpec((1, 16, s),
                             lambda i, cid: (cid[i * 2 * group + group],
                                             0, 0)),
            ],
            out_specs=[pl.BlockSpec((2 * group, T),
                                    lambda i, cid: (i, 0))] * 2,
        )
        return pl.pallas_call(
            functools.partial(dual_kernel, group=group),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((nt, T), jnp.float32),
                       jax.ShapeDtypeStruct((nt, T), jnp.int32)],
            **ipkw,
        )

    tri_pack_t = jnp.swapaxes(tri_pack, 1, 2)             # [C, S, 16]
    rows = {}
    ref_t = ref_tri = None
    ladder = [
        ("dma_floor", dma_floor_kernel, 8, 1),
        ("dma_floor_notr", dma_floor_notr_kernel, 8, 1),
        ("mt_only", mt_only_kernel, 8, 1),
        ("prod", prod_kernel_g, 8, 2),
        ("prod_g16", prod_kernel_g, 16, 2),
        ("prod_g32", prod_kernel_g, 32, 2),
        ("packt", packt_kernel, 8, 2),
        ("packt_g16", packt_kernel, 16, 2),
    ]
    for tag, body, group, n_out in ladder:
        if nt % group:
            continue
        # GROUP>8 needs cid constant per GROUP-run; base_runs gives 8-runs,
        # so coarsen for the bigger groups (same DMA-elision structure).
        cid = tile_cid
        if group > 8:
            cid_np = np.asarray(tile_cid).reshape(-1, group)
            cid = jnp.asarray(np.repeat(cid_np[:, 0], group))
        is_packt = tag.startswith("packt")
        try:
            fn = ladder_call(body, group, n_out,
                             tri_block=(1, None, 16) if is_packt
                             else (1, 16, None))
            pack = tri_pack_t if is_packt else tri_pack
            dt, cs, out = timeit(lambda: fn(cid, rays_pack, pack))
            gtests = tests / dt / 1e9
            rows[tag] = (dt, out, cid)
            emit(probe="kernel_ladder", variant=tag, ms=round(dt * 1e3, 2),
                 gtests_per_s=round(gtests, 1), compile_s=round(cs, 1))
            if tag == "prod":
                ref_t, ref_tri = out
        except Exception as e:  # noqa: BLE001
            emit(probe="kernel_ladder", variant=tag, error=str(e)[:300])

    try:
        fn = dual_call(8)
        dt, cs, out = timeit(lambda: fn(tile_cid, rays_pack,
                                        tri_pack, tri_pack))
        rows["dual8"] = (dt, out, tile_cid)
        emit(probe="kernel_ladder", variant="dual8",
             ms=round(dt * 1e3, 2),
             gtests_per_s=round(tests / dt / 1e9, 1),
             compile_s=round(cs, 1))
    except Exception as e:  # noqa: BLE001
        emit(probe="kernel_ladder", variant="dual8", error=str(e)[:300])

    # Exactness gates (vs the shipped kernel at the same cids):
    # mt_only's best-t must be bitwise (identical arithmetic); the wider
    # groups and the pre-transposed pack must match t AND tri bitwise.
    if ref_t is not None:
        if "mt_only" in rows:
            (t_mt,) = rows["mt_only"][1]
            emit(probe="kernel_ladder_gate", variant="mt_only",
                 t_mismatch=int(jnp.sum(
                     ~(jnp.equal(t_mt, ref_t)
                       | (jnp.isinf(t_mt) & jnp.isinf(ref_t))))))
        for tag in ("prod_g16", "prod_g32", "packt", "packt_g16", "dual8"):
            if tag not in rows:
                continue
            _, (tg, trig), cid_g = rows[tag]
            if cid_g is tile_cid:
                t8, tri8 = ref_t, ref_tri
            else:
                # Re-run prod at the coarsened cids for an apples gate.
                fn = ladder_call(prod_kernel_g, 8, 2)
                t8, tri8 = fn(cid_g, rays_pack, tri_pack)
            emit(probe="kernel_ladder_gate", variant=tag,
                 t_mismatch=int(jnp.sum(~jnp.equal(tg, t8))),
                 tri_mismatch=int(jnp.sum(trig != tri8)))

    return {tag: v[0] for tag, v in rows.items()}


if __name__ == "__main__":
    smoke = "--cpu" in sys.argv
    import jax

    if smoke:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    main(smoke=smoke)
