"""MXU intersector probe: precision x speed x agreement, on the real chip.

The mxu intersector's einsum runs on the systolic array, whose native
multiply is bfloat16; jax's DEFAULT precision therefore rounds ray/triangle
features to 8 mantissa bits. This probe measures, per precision setting:
- raw einsum throughput at the sweep's shapes (tests/s),
- end-to-end worklist closest-hit time on a real bounce wave,
- disagreement vs the exact elementwise sweep (hit flips, t errors).

ONE TPU process (tunnel hazard rules). JSON lines to stdout.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def timeit(fn, *args, reps=3, **kw):
    import jax

    t0 = time.perf_counter()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, compile_s


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    emit("devices", platform=jax.devices()[0].platform)

    from __graft_entry__ import _demo_scene
    from path_tracer_ai_tpu.accel import mxu, worklist
    from path_tracer_ai_tpu.accel.clusters import build_clusters
    from scripts.perf_probe_r2 import make_waves

    scene, _ = _demo_scene(subdivisions=6)
    accel = build_clusters(scene.triangles, cluster_size=128)
    n = 1 << 20
    waves = make_waves(scene, n)
    o, d, tm = waves["bounce"]

    # --- STAGE DECOMPOSITION of the worklist closest on the bounce wave -----
    # End-to-end bounce closest is ~800ms while tables (58ms) + estimated
    # sweep (~95ms) explain ~155ms; find where the rest lives by timing each
    # stage as its own jit (sort / tables / sweep / resolve / fallback).
    import functools

    for block, group, cap, item_budget, item_chunk, sm in [
        (8, 8, 96, 6, 1024, "origin"),
        (8, 8, 96, 6, 1024, "dir"),
    ]:
        prep = jax.jit(functools.partial(
            worklist._prepare_blocks, accel, block=block, sort=True,
            sort_mode=sm))
        dt_sort, _ = timeit(lambda: prep(o, d, tm)[:3])
        ob_, db_, tb_, _, _ = prep(o, d, tm)

        build = jax.jit(functools.partial(
            worklist._build_worklist, accel, t_min=1e-3, cap=cap,
            group=group, item_budget=item_budget, row_chunk=1 << 13,
            item_align=item_chunk))
        dt_tab, _ = timeit(build, ob_, db_, tb_)
        wl = jax.block_until_ready(build(ob_, db_, tb_))
        n_over = int(np.asarray(wl.overflow).sum()) * block
        n_items = int(wl.n_items)

        sweep = jax.jit(functools.partial(
            worklist._sweep_items, accel, t_min=1e-3, group=group,
            item_chunk=item_chunk, want_tri=True))
        dt_sweep, _ = timeit(sweep, wl, ob_, db_, tb_)
        t_items, tri_items = sweep(wl, ob_, db_, tb_)

        def resolve(wl, t_items, tri_items):
            n_groups = wl.order_g.shape[1]
            i_cap = wl.item_block.shape[0]
            rows = (wl.ibase[:, None]
                    + jnp.arange(n_groups, dtype=jnp.int32)[None, :])
            m = -(-wl.n_cand // group)
            row_live = (jnp.arange(n_groups, dtype=jnp.int32)[None, :]
                        < m[:, None])
            rowsc = jnp.minimum(rows, i_cap - 1)
            tk = jnp.where(row_live[..., None], t_items[rowsc], jnp.inf)
            best_t = jnp.min(tk, axis=1)
            trik = jnp.where(
                row_live[..., None] & (tk <= best_t[:, None, :]),
                tri_items[rowsc], jnp.int32(2**31 - 1))
            return best_t, jnp.min(trik, axis=1)

        dt_res, _ = timeit(jax.jit(resolve), wl, t_items, tri_items)
        emit("stages", block=block, group=group, cap=cap, sort_mode=sm,
             sort_ms=round(dt_sort * 1e3, 1),
             tables_ms=round(dt_tab * 1e3, 1),
             sweep_ms=round(dt_sweep * 1e3, 1),
             resolve_ms=round(dt_res * 1e3, 1),
             n_items=n_items, overflow_rays=n_over)

    # raw dense MT sweep throughput at the worklist's [ic, B, K] shapes
    from path_tracer_ai_tpu.accel.traverse import _mt_sweep as _mts

    rng0 = np.random.default_rng(3)
    for ic_, b_, k_ in [(1024, 8, 1024), (4096, 8, 1024), (256, 64, 512),
                        (256, 128, 512), (512, 8, 128)]:
        ob = jnp.asarray(rng0.standard_normal((ic_, b_, 3)), jnp.float32)
        db = jnp.asarray(rng0.standard_normal((ic_, b_, 3)), jnp.float32)
        tb = jnp.full((ic_, b_), 1e9, jnp.float32)
        cv0 = jnp.asarray(rng0.standard_normal((ic_, k_, 3)), jnp.float32)
        ce1 = jnp.asarray(rng0.standard_normal((ic_, k_, 3)), jnp.float32)
        ce2 = jnp.asarray(rng0.standard_normal((ic_, k_, 3)), jnp.float32)
        f = jax.jit(lambda o_, d_, a, b2, c2, t_: _mts(o_, d_, a, b2, c2,
                                                       1e-3, t_))
        dt, _ = timeit(f, ob, db, cv0, ce1, ce2, tb)
        emit("mt_shape", ic=ic_, b=b_, k=k_, ms=round(dt * 1e3, 2),
             gtests=round(ic_ * b_ * k_ / dt / 1e9, 1))

    # gather micro: cluster slab gathers at sweep scale
    cid = jnp.asarray(rng0.integers(0, accel.num_clusters, (4096, 8)),
                      jnp.int32)
    f = jax.jit(lambda c: (accel.v0[c], accel.e1[c], accel.e2[c]))
    dt, _ = timeit(f, cid)
    emit("slab_gather", rows=4096, g=8,
         ms=round(dt * 1e3, 2),
         gbps=round(4096 * 8 * 128 * 9 * 4 / dt / 1e9, 1))

    # --- raw einsum micro at sweep shapes ------------------------------------
    rng = np.random.default_rng(0)
    i_, b_, k_ = 256, 128, 512 * 4
    gf = jnp.asarray(rng.standard_normal((i_, b_, 10)), jnp.float32)
    wg = jnp.asarray(rng.standard_normal((i_, 10, k_, 4)), jnp.float32)
    for prec in ["default", "high", "highest"]:
        p = {
            "default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }[prec]
        f = jax.jit(lambda a, w, p=p: jnp.einsum(
            "ibf,ifkq->ibkq", a, w,
            preferred_element_type=jnp.float32, precision=p))
        dt, cs = timeit(f, gf, wg)
        tests = i_ * b_ * k_  # 4 outputs per test share one feature row
        flops = tests * 4 * 2 * 10
        emit("einsum", precision=prec, ms=round(dt * 1e3, 2),
             gtests=round(tests / dt / 1e9, 1),
             tflops=round(flops / dt / 1e12, 2), compile_s=round(cs, 1))

    # VPU reference: same test count through the elementwise sweep
    from path_tracer_ai_tpu.accel.traverse import _mt_sweep

    ob = jnp.asarray(rng.standard_normal((i_, b_, 3)), jnp.float32)
    db = jnp.asarray(rng.standard_normal((i_, b_, 3)), jnp.float32)
    tb = jnp.full((i_, b_), 1e9, jnp.float32)
    cv0 = jnp.asarray(rng.standard_normal((i_, k_, 3)), jnp.float32)
    ce1 = jnp.asarray(rng.standard_normal((i_, k_, 3)), jnp.float32)
    ce2 = jnp.asarray(rng.standard_normal((i_, k_, 3)), jnp.float32)
    f = jax.jit(lambda *a: _mt_sweep(*a, 1e-3, tb))
    dt, cs = timeit(f, ob, db, cv0, ce1, ce2)
    emit("vpu_sweep", ms=round(dt * 1e3, 2),
         gtests=round(i_ * b_ * k_ / dt / 1e9, 1), compile_s=round(cs, 1))

    # --- end-to-end worklist closest on the bounce wave ----------------------
    # exact baseline at small and large block
    ref = None
    configs = [
        dict(name="exact_b8", intersector="exact", block=8, group=8,
             item_budget=6, item_chunk=1024, cap=96),
        dict(name="exact_b64", intersector="exact", block=64, group=4,
             item_budget=40, item_chunk=512, cap=160),
        dict(name="mxu_hst_b64", intersector="mxu", block=64, group=4,
             item_budget=40, item_chunk=512, cap=160),
        dict(name="mxu_hi_b64", intersector="mxu:high", block=64, group=4,
             item_budget=40, item_chunk=512, cap=160),
        dict(name="mxu_def_b64", intersector="mxu:default", block=64,
             group=4, item_budget=40, item_chunk=512, cap=160),
        dict(name="mxu_hst_b128", intersector="mxu", block=128, group=4,
             item_budget=64, item_chunk=256, cap=256),
        dict(name="mxu_hi_b128", intersector="mxu:high", block=128, group=4,
             item_budget=64, item_chunk=256, cap=256),
        dict(name="mxu_hi_b32", intersector="mxu:high", block=32, group=8,
             item_budget=24, item_chunk=1024, cap=128),
    ]
    for cfg in configs:
        name = cfg.pop("name")
        try:
            dt, cs = timeit(
                lambda: worklist.closest_hit_worklist(accel, o, d, 1e-3, tm,
                                                      **cfg)
            )
            hit = worklist.closest_hit_worklist(accel, o, d, 1e-3, tm, **cfg)
            hit = jax.block_until_ready(hit)
            row = dict(ms=round(dt * 1e3, 1), mrays=round(n / dt / 1e6, 2),
                       compile_s=round(cs, 1))
            if name == "exact_b8":
                ref = hit
            if ref is not None and name != "exact_b8":
                flips = int(jnp.sum(hit.hit != ref.hit))
                both = np.asarray(hit.hit & ref.hit)
                tri_mismatch = int(np.sum(
                    (np.asarray(hit.tri) != np.asarray(ref.tri)) & both))
                dt_err = np.abs(np.asarray(hit.t) - np.asarray(ref.t))
                dt_err = dt_err[both & np.isfinite(np.asarray(ref.t))]
                row.update(
                    hit_flips=flips, tri_mismatch=tri_mismatch,
                    t_err_max=float(dt_err.max()) if dt_err.size else 0.0,
                )
            emit("wl", name=name, **row)
        except Exception as e:  # noqa: BLE001
            emit("wl", name=name, error=str(e)[:300])

    # --- shadow-wave tuning: block size x sort x chunk -----------------------
    # Shadow occlusion is ~4N lanes per bounce (4 lights), so its table
    # costs dominate the frame; light-major layout is already coherent, so
    # bigger blocks should cut table rows ~linearly with modest union growth.
    so, sd, stm = waves["shadow"]
    for cfg in [
        dict(block=8, group=4, cap=64, item_budget=6, item_chunk=1024),
        dict(block=8, group=8, cap=64, item_budget=6, item_chunk=4096),
        dict(block=16, group=8, cap=96, item_budget=5, item_chunk=4096),
        dict(block=32, group=8, cap=128, item_budget=4, item_chunk=2048),
        dict(block=32, group=16, cap=128, item_budget=4, item_chunk=2048),
        dict(block=64, group=16, cap=160, item_budget=3, item_chunk=1024),
    ]:
        for sort in ([False] if cfg["block"] <= 16 else [False, True]):
            try:
                dt, cs = timeit(
                    lambda: worklist.any_hit_worklist(
                        accel, so, sd, 1e-3, stm, sort=sort, **cfg)
                )
                # candidate stats at this block size
                ob_, db_, tb_, _, _ = worklist._prepare_blocks(
                    accel, so, sd, stm, cfg["block"], sort)
                wl = worklist._build_worklist(
                    accel, ob_, db_, tb_, 1e-3, cfg["cap"], cfg["group"],
                    cfg["item_budget"], 1 << 13, cfg["item_chunk"])
                bc = np.asarray(jax.block_until_ready(wl).n_cand)
                emit("shadow_grid", **cfg, sort=sort,
                     ms=round(dt * 1e3, 1), mrays=round(n / dt / 1e6, 2),
                     cand_mean=round(float(bc.mean()), 1),
                     overflow=round(float(np.asarray(wl.overflow).mean()), 4),
                     compile_s=round(cs, 1))
            except Exception as e:  # noqa: BLE001
                emit("shadow_grid", **cfg, sort=sort, error=str(e)[:200])

    # closest bounce wave at the engine's config but bigger item_chunk
    for cfg in [
        dict(block=8, group=8, cap=96, item_budget=8, item_chunk=1024),
        dict(block=8, group=8, cap=96, item_budget=8, item_chunk=4096),
        dict(block=8, group=8, cap=96, item_budget=8, item_chunk=4096,
             levels=2),
        dict(block=16, group=8, cap=128, item_budget=6, item_chunk=4096),
    ]:
        try:
            dt, cs = timeit(
                lambda: worklist.closest_hit_worklist(accel, o, d, 1e-3, tm,
                                                      **cfg)
            )
            emit("closest_grid", **cfg, ms=round(dt * 1e3, 1),
                 mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))
        except Exception as e:  # noqa: BLE001
            emit("closest_grid", **cfg, error=str(e)[:200])

    log("mxu probe complete")


if __name__ == "__main__":
    main()
