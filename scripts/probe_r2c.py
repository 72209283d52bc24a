"""Round-2 probe C: sort-key shootout, kslots, gather isolation, e2e.

Model built from probes A/B (v5e, 82k-tri scene, 2^20-ray waves):
- The worklist sweep runs at ~13 Gtests/s (4.3G tests in 326ms) — about
  half the 25 Gtests/s dense-MT peak. The waste is TEST COUNT: dir-sorted
  8-blocks union ~75 candidate clusters (p99 293) vs per-ray exact ~4-6,
  i.e. ~4100 tests/ray vs ~768. Sort keys that group rays by
  (octant, fine origin) should cut unions several-fold.
- kslots (per-ray exact dense sweep) pays ~55KB/ray of triangle gathers;
  measured gather rate 63 GB/s says ~1 Mrays/s — measure to confirm/kill.
- Isolate the sweep's gather cost: same [ic,B,gS] MT with gathered vs
  materialized triangles at the production shape.

ONE TPU process. JSON lines to stdout. Ordered most-important-first so a
partial run still decides the next step.
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

    from __graft_entry__ import _demo_scene
    from path_tracer_ai_tpu.accel import kslots, worklist
    from path_tracer_ai_tpu.accel.clusters import build_clusters
    from scripts.perf_probe_r2 import make_waves

    scene, _ = _demo_scene(subdivisions=3 if smoke else 6)
    accel128 = build_clusters(scene.triangles, cluster_size=128)
    accel64 = build_clusters(scene.triangles, cluster_size=64)
    n = 1 << (14 if smoke else 20)
    waves = make_waves(scene, n)

    # --- A. sort-mode shootout on the bounce closest wave -------------------
    o, d, tm = waves["bounce"]

    def wl_stats(accel, o_, d_, tm_, *, block, cap, group, item_budget,
                 sort_mode):
        ob, db, tb, _, _ = worklist._prepare_blocks(
            accel, o_, d_, tm_, block, True, sort_mode=sort_mode)
        wl = worklist._build_worklist(
            accel, ob, db, tb, 1e-3, cap, group, item_budget, 4096, 1024)
        live = tb.max(axis=1) >= 0
        return (wl.n_items, jnp.sum(wl.overflow & live),
                jnp.sum(wl.n_cand), jnp.sum(live))

    wl_stats = jax.jit(wl_stats, static_argnames=(
        "block", "cap", "group", "item_budget", "sort_mode"))

    best = None
    for tag, accel, cfg in [
        ("dir/s128/b8", accel128,
         dict(block=8, cap=96, group=8, item_budget=8, sort_mode="dir")),
        ("origin/s128/b8", accel128,
         dict(block=8, cap=96, group=8, item_budget=8, sort_mode="origin")),
        ("octorig/s128/b8", accel128,
         dict(block=8, cap=96, group=8, item_budget=8, sort_mode="octorig")),
        ("origoct/s128/b8", accel128,
         dict(block=8, cap=96, group=8, item_budget=8, sort_mode="origoct")),
        ("octorig/s64/b8", accel64,
         dict(block=8, cap=128, group=8, item_budget=10,
              sort_mode="octorig")),
        ("octorig/s64/b16", accel64,
         dict(block=16, cap=128, group=8, item_budget=6,
              sort_mode="octorig")),
    ]:
        ni, nov, ncand, nlive = (int(x) for x in wl_stats(
            accel, o, d, tm, **cfg))
        s = accel.cluster_size
        tests = ni * cfg["block"] * cfg["group"] * s
        dt, cs = timeit(lambda: worklist.closest_hit_worklist(
            accel, o, d, 1e-3, tm, **cfg))
        emit("sortmode", tag=tag, n_items=ni, overflow_blocks=nov,
             sum_cand=ncand, tests_g=round(tests / 1e9, 2),
             ms=round(dt * 1e3, 1), mrays=round(n / dt / 1e6, 2),
             gtests=round(tests / dt / 1e9, 1), compile_s=round(cs, 1))
        if best is None or dt < best[1]:
            best = (tag, dt, accel, cfg)
    log(f"best sortmode: {best[0]} at {best[1]*1e3:.0f}ms")

    # Best config on primary closest (must not regress badly)
    po, pd, ptm = waves["primary"]
    dt, cs = timeit(lambda: worklist.closest_hit_worklist(
        best[2], po, pd, 1e-3, ptm, **best[3]))
    emit("sortmode_primary", tag=best[0], ms=round(dt * 1e3, 1),
         mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))

    # Shadow anyhit on the best accel (sort=False as in production)
    so, sd, stm = waves["shadow"]
    scfg = dict(best[3])
    scfg.pop("sort_mode")
    dt, cs = timeit(lambda: worklist.any_hit_worklist(
        best[2], so, sd, 1e-3, stm, sort=False, **scfg))
    emit("sortmode_shadow", tag=best[0], ms=round(dt * 1e3, 1),
         mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))

    # --- B. kslots on all three wave types ----------------------------------
    ks_ok = True
    for wname, fn, kw in [
        ("bounce", kslots.closest_hit_kslots,
         dict(k_supers=6, k_clusters=12)),
        ("primary", kslots.closest_hit_kslots,
         dict(k_supers=6, k_clusters=12)),
        ("shadow", kslots.any_hit_kslots, dict(k_supers=6, k_clusters=8)),
    ]:
        wo, wd, wtm = waves[wname]
        try:
            dt, cs = timeit(lambda: fn(accel128, wo, wd, 1e-3, wtm, **kw))
            emit("kslots", wave=wname, **kw, ms=round(dt * 1e3, 1),
                 mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))
            if wname == "bounce" and dt * 1e3 > 700:
                ks_ok = False
        except Exception as e:  # noqa: BLE001
            emit("kslots", wave=wname, error=str(e)[:200])
            ks_ok = False

    # --- C. gather isolation at the production sweep shape ------------------
    from path_tracer_ai_tpu.accel.traverse import _mt_sweep as _mts

    rng0 = np.random.default_rng(3)
    ic, b, g, s = 1024, 8, 8, 128
    nsteps = 2 if smoke else 64
    ob = jnp.asarray(rng0.standard_normal((nsteps, ic, b, 3)), jnp.float32)
    db = jnp.asarray(rng0.standard_normal((nsteps, ic, b, 3)), jnp.float32)
    tb = jnp.full((nsteps, ic, b), 1e9, jnp.float32)
    cids = jnp.asarray(
        rng0.integers(0, accel128.num_clusters, (nsteps, ic, g)), jnp.int32)

    def sweep_gather(ob_, db_, tb_, cids_):
        def body(i, acc):
            cid = cids_[i]
            cv0 = accel128.v0[cid].reshape(ic, g * s, 3)
            ce1 = accel128.e1[cid].reshape(ic, g * s, 3)
            ce2 = accel128.e2[cid].reshape(ic, g * s, 3)
            tt, ok = _mts(ob_[i], db_[i], cv0, ce1, ce2, 1e-3, tb_[i])
            return acc + jnp.sum(jnp.min(jnp.where(ok, tt, jnp.inf), -1))
        return jax.lax.fori_loop(0, nsteps, body, jnp.float32(0))

    cv0m = jnp.asarray(rng0.standard_normal((ic, g * s, 3)), jnp.float32)
    ce1m = jnp.asarray(rng0.standard_normal((ic, g * s, 3)), jnp.float32)
    ce2m = jnp.asarray(rng0.standard_normal((ic, g * s, 3)), jnp.float32)

    def sweep_mat(ob_, db_, tb_):
        def body(i, acc):
            tt, ok = _mts(ob_[i], db_[i], cv0m, ce1m, ce2m, 1e-3, tb_[i])
            return acc + jnp.sum(jnp.min(jnp.where(ok, tt, jnp.inf), -1))
        return jax.lax.fori_loop(0, nsteps, body, jnp.float32(0))

    tests = nsteps * ic * b * g * s
    dt, _ = timeit(jax.jit(sweep_gather), ob, db, tb, cids)
    emit("sweep_gather", ms=round(dt * 1e3, 1),
         gtests=round(tests / dt / 1e9, 1))
    dt, _ = timeit(jax.jit(sweep_mat), ob, db, tb)
    emit("sweep_mat", ms=round(dt * 1e3, 1),
         gtests=round(tests / dt / 1e9, 1))

    # Same-cid gather (all items fetch the SAME cluster rows: measures
    # whether XLA exploits duplicate gather indices at all)
    cids_same = jnp.broadcast_to(
        jnp.arange(g, dtype=jnp.int32)[None, None, :], (nsteps, ic, g))
    dt, _ = timeit(jax.jit(sweep_gather), ob, db, tb,
                   jnp.asarray(cids_same))
    emit("sweep_gather_samecid", ms=round(dt * 1e3, 1),
         gtests=round(tests / dt / 1e9, 1))

    # --- D. e2e renders ------------------------------------------------------
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.camera import default_camera

    camera = default_camera()
    if smoke:
        settings = RenderSettings(width=128, height=72, samples_per_pixel=2,
                                  max_bounces=5, seed=0)
    else:
        settings = RenderSettings(width=1920, height=1080,
                                  samples_per_pixel=2, max_bounces=5, seed=0)
    plans = [("packets", accel128, None, None)]
    bcfg = dict(best[3])
    plans.append(("worklist", best[2], bcfg,
                  dict(sort=False, block=bcfg["block"], cap=bcfg["cap"],
                       group=bcfg["group"], item_budget=bcfg["item_budget"])))
    if ks_ok:
        plans.append(("kslots", accel128, None, None))

    for backend, accel, ckw, okw in plans:
        if ckw is not None:
            wavefront.WORKLIST_CLOSEST_KW = ckw
            wavefront.WORKLIST_OCCLUDE_KW = okw
            wavefront.clear_executable_caches()
        t0 = time.perf_counter()
        warm = settings.replace(samples_per_pixel=1)
        wavefront.render(scene, camera, warm, accel=accel, block_size=64,
                         wave_size=1 << 20, backend=backend)
        log(f"[{backend}] warmup {time.perf_counter() - t0:.1f}s")
        stats = wavefront.RenderStats()
        t0 = time.perf_counter()
        img = wavefront.render(scene, camera, settings, accel=accel,
                               stats=stats, block_size=64,
                               wave_size=1 << 20, backend=backend)
        wall = time.perf_counter() - t0
        assert np.isfinite(img).all()
        emit("render", backend=backend, wall_s=round(wall, 2),
             mrays=round(stats.mrays_per_s, 3),
             total_mrays=round(stats.total_rays / 1e6, 1))

    log("probe C complete")


if __name__ == "__main__":
    main()
