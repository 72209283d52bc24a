"""Round-2 probe E: ctiles stage split + stage-level tuning.

Probe D: ctiles bounce ~1000ms vs a ~450ms bottom-up model — find the
pathological stage. Stages are iso-jitted so each can be timed:
  S1 masks    — per-ray slab + block OR        (measured 62ms standalone)
  S2 tables   — extract + item/slot index math (incl. argsort)
  S3 sweep    — tile gathers + dense MT + per-item reduce
  S4 resolve  — per-block min + unsort
Then e2e with whatever config wins.

ONE TPU process. JSON lines to stdout.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(probe_name, **kw):
    print(json.dumps({"probe": probe_name, **kw}), flush=True)


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
    smoke = "--cpu" in sys.argv
    import jax

    if smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    emit("devices", platform=jax.devices()[0].platform)

    from functools import partial

    from __graft_entry__ import _demo_scene
    from path_tracer_ai_tpu.accel import ctiles
    from path_tracer_ai_tpu.accel.clusters import build_clusters
    from path_tracer_ai_tpu.accel.worklist import _prepare_blocks
    from scripts.perf_probe_r2 import make_waves

    scene, _ = _demo_scene(subdivisions=3 if smoke else 6)
    accel = build_clusters(scene.triangles, cluster_size=128)
    n = 1 << (14 if smoke else 20)
    waves = make_waves(scene, n)
    o, d, tm = waves["bounce"]

    cfg = dict(block=8, cap=96, item_budget=24, tile_blocks=16)
    if smoke:
        cfg = dict(block=8, cap=16, item_budget=8, tile_blocks=4)

    # --- stage-isolated jits -------------------------------------------------
    @partial(jax.jit, static_argnames=("block", "sort_mode"))
    def s0_prepare(o_, d_, tm_, block, sort_mode):
        return _prepare_blocks(accel, o_, d_, tm_, block, True, sort_mode)[:3]

    @partial(jax.jit, static_argnames=("row_chunk",))
    def s1_masks(ob, db, tb, row_chunk):
        return ctiles._ray_masks(accel, ob, db, tb, 1e-3, row_chunk)

    @partial(jax.jit, static_argnames=("cap", "item_budget", "tile_blocks"))
    def s2_tables(cand, n_cand, cap, item_budget, tile_blocks):
        t = ctiles._build_tiles(accel, cand, n_cand, cap, item_budget,
                                tile_blocks)
        return {k: v for k, v in t.items() if not isinstance(v, int)}

    @partial(jax.jit,
             static_argnames=("cap", "item_budget", "tile_blocks",
                              "tile_chunk", "want_tri"))
    def s3_sweep(tiles_d, ob, db, tb, cap, item_budget, tile_blocks,
                 tile_chunk, want_tri):
        nb = ob.shape[0]
        tiles_d = dict(tiles_d)
        tiles_d["i_cap"] = -(-(nb * item_budget) // tile_blocks) * tile_blocks
        tiles_d["ni_pad"] = tiles_d["i_cap"] + tile_blocks * accel.num_clusters
        return ctiles._sweep_tiles(accel, tiles_d, ob, db, tb, 1e-3,
                                   tile_blocks, tile_chunk, want_tri)

    @partial(jax.jit,
             static_argnames=("cap", "item_budget", "tile_blocks",
                              "row_chunk", "want_tri"))
    def s4_resolve(tiles_d, per_item, cap, item_budget, tile_blocks,
                   row_chunk, want_tri):
        nb = tiles_d["overflow"].shape[0]
        tiles_d = dict(tiles_d)
        tiles_d["i_cap"] = -(-(nb * item_budget) // tile_blocks) * tile_blocks
        tiles_d["ni_pad"] = tiles_d["i_cap"] + tile_blocks * accel.num_clusters
        return ctiles._resolve_blocks(tiles_d, per_item, cap, nb, 8,
                                      row_chunk, want_tri)

    block = cfg["block"]
    ob, db, tb = jax.block_until_ready(s0_prepare(o, d, tm, block, "dir"))
    dt, _ = timeit(s0_prepare, o, d, tm, block, "dir")
    emit("stage", name="s0_sort", ms=round(dt * 1e3, 1))

    rc = 1 << (6 if smoke else 11)
    cand, n_cand = jax.block_until_ready(s1_masks(ob, db, tb, rc))
    dt, _ = timeit(s1_masks, ob, db, tb, rc)
    emit("stage", name="s1_masks", ms=round(dt * 1e3, 1))

    tkw = dict(cap=cfg["cap"], item_budget=cfg["item_budget"],
               tile_blocks=cfg["tile_blocks"])
    tiles_d = jax.block_until_ready(s2_tables(cand, n_cand, **tkw))
    dt, cs = timeit(s2_tables, cand, n_cand, **tkw)
    emit("stage", name="s2_tables", ms=round(dt * 1e3, 1),
         compile_s=round(cs, 1))

    tc = 4 if smoke else 256
    per_item = jax.block_until_ready(
        s3_sweep(tiles_d, ob, db, tb, tile_chunk=tc, want_tri=True, **tkw))
    dt, cs = timeit(s3_sweep, tiles_d, ob, db, tb, tile_chunk=tc,
                    want_tri=True, **tkw)
    emit("stage", name="s3_sweep", ms=round(dt * 1e3, 1),
         compile_s=round(cs, 1))

    for tc2 in ([] if smoke else [64, 1024]):
        dt, cs = timeit(s3_sweep, tiles_d, ob, db, tb, tile_chunk=tc2,
                        want_tri=True, **tkw)
        emit("stage", name=f"s3_sweep_tc{tc2}", ms=round(dt * 1e3, 1),
             compile_s=round(cs, 1))

    dt, cs = timeit(s4_resolve, tiles_d, per_item, row_chunk=rc,
                    want_tri=True, **tkw)
    emit("stage", name="s4_resolve", ms=round(dt * 1e3, 1),
         compile_s=round(cs, 1))

    # Tighter cap (p99 was 35): smaller extract + resolve width
    for cap2 in ([] if smoke else [48]):
        tkw2 = dict(tkw, cap=cap2)
        dt, _ = timeit(s2_tables, cand, n_cand, **tkw2)
        emit("stage", name=f"s2_tables_cap{cap2}", ms=round(dt * 1e3, 1))
        tiles2 = jax.block_until_ready(s2_tables(cand, n_cand, **tkw2))
        dt, _ = timeit(s3_sweep, tiles2, ob, db, tb, tile_chunk=tc,
                       want_tri=True, **tkw2)
        emit("stage", name=f"s3_sweep_cap{cap2}", ms=round(dt * 1e3, 1))
        per2 = jax.block_until_ready(
            s3_sweep(tiles2, ob, db, tb, tile_chunk=tc, want_tri=True,
                     **tkw2))
        dt, _ = timeit(s4_resolve, tiles2, per2, row_chunk=rc,
                       want_tri=True, **tkw2)
        emit("stage", name=f"s4_resolve_cap{cap2}", ms=round(dt * 1e3, 1))

    # --- resolve-variant micros at real index distributions ------------------
    if not smoke:
        nb = ob.shape[0]
        i_cap = -(-(nb * tkw["item_budget"]) // tkw["tile_blocks"]) \
            * tkw["tile_blocks"]
        ni_pad = i_cap + tkw["tile_blocks"] * accel.num_clusters
        blk_of_slot = jax.jit(
            lambda t: t["item_block"][t["slot_item"]])(tiles_d)
        t_pad = per_item[0]                                   # [ni_pad, 8]

        # (a) scatter-min from slot domain
        f = jax.jit(lambda b_, tp: jnp.full((nb, 8), jnp.inf).at[b_].min(tp))
        dt, _ = timeit(f, blk_of_slot, t_pad)
        emit("micro", name="resolve_scatter_min", ms=round(dt * 1e3, 1))

        # (b) item-order gather (narrow 32B rows, i_cap of them)
        g = jax.jit(lambda t, tp: tp[t["item_slot"]])
        dt, _ = timeit(g, tiles_d, t_pad)
        emit("micro", name="itemorder_gather", ms=round(dt * 1e3, 1))

        # (c) fused t+tri single-pass gather (64B rows)
        both = jax.jit(lambda tp, tr: jnp.concatenate(
            [tp, jax.lax.bitcast_convert_type(tr, jnp.float32)], axis=1))(
                per_item[0], per_item[1])
        g2 = jax.jit(lambda t, b_: b_[t["item_slot"]])
        dt, _ = timeit(g2, tiles_d, both)
        emit("micro", name="itemorder_gather_fused", ms=round(dt * 1e3, 1))

        # (d) the 2D order gather in tables (suspect): [i_cap] from [nb, cap]
        order = tiles_d["order"]
        ib2 = tiles_d["item_block"]
        kk = jnp.minimum(
            jnp.arange(i_cap, dtype=jnp.int32) - tiles_d["ibase"][ib2],
            tkw["cap"] - 1)
        h = jax.jit(lambda o_, b_, k_: o_[b_, jnp.maximum(k_, 0)])
        dt, _ = timeit(h, order, ib2, kk)
        emit("micro", name="order_2d_gather", ms=round(dt * 1e3, 1))

        # (e) extract width: top_k at [nb, 641] k=96 vs k=48
        from path_tracer_ai_tpu.accel.worklist import _extract_k
        neg_big = jnp.int32(-(2**30))
        col = jnp.arange(accel.num_clusters, dtype=jnp.int32)[None, :]
        neg = jax.jit(lambda c_: jnp.where(c_, -col, neg_big))(cand)
        for kx in [96, 48]:
            f2 = jax.jit(partial(_extract_k, k=kx, neg_big=neg_big))
            dt, _ = timeit(f2, neg)
            emit("micro", name=f"extract_topk_k{kx}", ms=round(dt * 1e3, 1))

    # Full closest at cap=48 for comparison with probe D's cap=96
    if not smoke:
        for kw in [dict(block=8, cap=48, item_budget=24, sort_mode="dir"),
                   dict(block=8, cap=48, item_budget=24, sort_mode="dir",
                        tile_chunk=1024)]:
            dt, cs = timeit(lambda: ctiles.closest_hit_ctiles(
                accel, o, d, 1e-3, tm, **kw))
            emit("ctiles_full", kw=str(kw), ms=round(dt * 1e3, 1),
                 mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))

    log("probe E complete")


if __name__ == "__main__":
    main()
