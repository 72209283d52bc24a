"""Round-2 probe D: ctiles configs, permutation micros, true unions, e2e.

Decides the production traversal config. Open questions from probe C
(answers decide block=1 per-ray pairs vs block-major true unions):
- argsort / unique-scatter cost at 2M/8M elements (the cluster-major
  transpose is the only non-streaming step in ctiles).
- TRUE block union sizes under dir vs octorig keys (the conservative
  interval numbers are useless for origin-led keys).
- ctiles wave times + stage split (masks / tables / sweep+resolve).

ONE TPU process. JSON lines to stdout, most-important-first.
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
    from path_tracer_ai_tpu.accel import ctiles
    from path_tracer_ai_tpu.accel.clusters import build_clusters
    from scripts.perf_probe_r2 import make_waves

    scene, _ = _demo_scene(subdivisions=3 if smoke else 6)
    accel = build_clusters(scene.triangles, cluster_size=128)
    n = 1 << (14 if smoke else 20)
    waves = make_waves(scene, n)

    # --- 1. permutation micros ----------------------------------------------
    rng0 = np.random.default_rng(7)
    for m in ([1 << 12] if smoke else [1 << 21, 1 << 23]):
        keys = jnp.asarray(rng0.integers(0, 641, m), jnp.int32)
        f = jax.jit(lambda k: jnp.argsort(k))
        dt, _ = timeit(f, keys)
        emit("argsort", m=m, ms=round(dt * 1e3, 2))

        perm = jnp.asarray(rng0.permutation(m), jnp.int32)
        f = jax.jit(lambda p: jnp.zeros((m,), jnp.int32).at[p].set(
            jnp.arange(m, dtype=jnp.int32)))
        dt, _ = timeit(f, perm)
        emit("scatter_set", m=m, ms=round(dt * 1e3, 2))

        # narrow-row gather ([m] rows of 12B from a [k, 3] table)
        idx = jnp.asarray(rng0.integers(0, 1 << 17, m), jnp.int32)
        tbl = jnp.asarray(rng0.standard_normal((1 << 17, 3)), jnp.float32)
        f = jax.jit(lambda i, t: jnp.sum(t[i], axis=0))
        dt, _ = timeit(f, idx, tbl)
        emit("narrow_gather", m=m, ms=round(dt * 1e3, 2),
             gbps=round(m * 12 / dt / 1e9, 1))

    # --- 2. true block unions (per-ray OR) ----------------------------------
    from path_tracer_ai_tpu.accel.worklist import _prepare_blocks

    def union_stats(o_, d_, tm_, block, sort_mode):
        ob, db, tb, _, _ = _prepare_blocks(
            accel, o_, d_, tm_, block, True, sort_mode=sort_mode)
        cand, n_cand = ctiles._ray_masks(accel, ob, db, tb, 1e-3, 1 << 11)
        live = tb.max(axis=1) >= 0
        return n_cand, live

    jstats = jax.jit(union_stats, static_argnames=("block", "sort_mode"))
    o, d, tm = waves["bounce"]
    for block, mode in [(8, "dir"), (8, "octorig"), (16, "octorig"),
                        (32, "octorig")]:
        dt, cs = timeit(lambda: jstats(o, d, tm, block=block,
                                       sort_mode=mode))
        nc, live = jstats(o, d, tm, block=block, sort_mode=mode)
        nc = np.asarray(nc)[np.asarray(live)]
        emit("true_union", wave="bounce", block=block, mode=mode,
             mean=round(float(nc.mean()), 1), p90=int(np.percentile(nc, 90)),
             p99=int(np.percentile(nc, 99)), mx=int(nc.max()),
             sum_pairs=int(nc.sum()), masks_ms=round(dt * 1e3, 1),
             compile_s=round(cs, 1))

    so, sd, stm = waves["shadow"]
    nc, live = jstats(so, sd, stm, block=8, sort_mode="octorig")
    nc = np.asarray(nc)[np.asarray(live)]
    emit("true_union", wave="shadow", block=8, mode="octorig",
         mean=round(float(nc.mean()), 1), p99=int(np.percentile(nc, 99)),
         mx=int(nc.max()), sum_pairs=int(nc.sum()))

    # --- 3. ctiles wave timings ---------------------------------------------
    results = {}
    for tag, kw in [
        ("b8/octorig/c96", dict(block=8, cap=96, item_budget=24)),
        ("b8/dir/c96", dict(block=8, cap=96, item_budget=24,
                            sort_mode="dir")),
        ("b16/octorig/c128", dict(block=16, cap=128, item_budget=16,
                                  tile_blocks=8)),
        ("b1/c24/t128", dict(block=1, cap=24, item_budget=10,
                             tile_blocks=128, row_chunk=1 << 13)),
    ]:
        try:
            dt, cs = timeit(lambda: ctiles.closest_hit_ctiles(
                accel, o, d, 1e-3, tm, **kw))
            emit("ctiles_bounce", tag=tag, ms=round(dt * 1e3, 1),
                 mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))
            results[tag] = (dt, kw)
        except Exception as e:  # noqa: BLE001
            emit("ctiles_bounce", tag=tag, error=str(e)[:200])

    best_tag = min(results, key=lambda t: results[t][0])
    best_kw = results[best_tag][1]
    log(f"best ctiles bounce: {best_tag}")

    po, pd, ptm = waves["primary"]
    dt, cs = timeit(lambda: ctiles.closest_hit_ctiles(
        accel, po, pd, 1e-3, ptm, **best_kw))
    emit("ctiles_primary", tag=best_tag, ms=round(dt * 1e3, 1),
         mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))

    for stag, skw in [(best_tag, best_kw),
                      (best_tag + "/nosort", dict(best_kw, sort=False))]:
        dt, cs = timeit(lambda: ctiles.any_hit_ctiles(
            accel, so, sd, 1e-3, stm, **skw))
        emit("ctiles_shadow", tag=stag, ms=round(dt * 1e3, 1),
             mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))

    # --- 4. e2e render with best config -------------------------------------
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

    wavefront.CTILES_CLOSEST_KW = best_kw
    wavefront.CTILES_OCCLUDE_KW = best_kw
    wavefront.clear_executable_caches()
    t0 = time.perf_counter()
    warm = settings.replace(samples_per_pixel=1)
    wavefront.render(scene, camera, warm, accel=accel, block_size=64,
                     wave_size=1 << 20, backend="ctiles")
    log(f"[ctiles] warmup {time.perf_counter() - t0:.1f}s")
    stats = wavefront.RenderStats()
    t0 = time.perf_counter()
    img = wavefront.render(scene, camera, settings, accel=accel,
                           stats=stats, block_size=64, wave_size=1 << 20,
                           backend="ctiles")
    wall = time.perf_counter() - t0
    assert np.isfinite(img).all()
    emit("render", backend="ctiles", tag=best_tag, wall_s=round(wall, 2),
         mrays=round(stats.mrays_per_s, 3),
         total_mrays=round(stats.total_rays / 1e6, 1))

    log("probe D complete")


if __name__ == "__main__":
    main()
