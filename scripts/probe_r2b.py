"""Round-2 probe B: pairs waves, tuned worklist, shadow grid, MXU precision.

Learned from probe A (all numbers v5e, 2^20-ray waves, 82k-tri scene):
- bounce-wave stage split (worklist, dir sort, cap 96): sort 29 + tables 39
  + sweep 326 + resolve 26 ms, overflow 28k rays -> the sweep dominates.
- TRUE 8-block candidate unions: bounce mean 75 (p99 293!), per-ray ~4-6;
  the incoherent tail carries ~half the volume -> per-ray pair scheduling
  is the right fallback (now wired in) and possibly the right bounce path.
- micro ops under ~10ms measure the axon dispatch floor, NOT compute;
  every micro here is sized >= 0.3G tests.

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
    import jax
    import jax.numpy as jnp
    import numpy as np

    emit("devices", platform=jax.devices()[0].platform)

    from __graft_entry__ import _demo_scene
    from path_tracer_ai_tpu.accel import pairs, worklist
    from path_tracer_ai_tpu.accel.clusters import build_clusters
    from scripts.perf_probe_r2 import make_waves

    scene, _ = _demo_scene(subdivisions=6)
    accel128 = build_clusters(scene.triangles, cluster_size=128)
    accel256 = build_clusters(scene.triangles, cluster_size=256)
    n = 1 << 20
    waves = make_waves(scene, n)

    # --- pairs backend on real waves (never measured on-chip!) --------------
    for aname, accel in [("s128", accel128), ("s256", accel256)]:
        for wname in ["primary", "bounce", "shadow"]:
            o, d, tm = waves[wname]
            for cap, budget in ([(32, 8)] if aname == "s128" else [(24, 6)]):
                try:
                    dt, cs = timeit(lambda: pairs.closest_hit_pairs(
                        accel, o, d, 1e-3, tm, cap=cap, pair_budget=budget))
                    emit("pairs_closest", accel=aname, wave=wname, cap=cap,
                         ms=round(dt * 1e3, 1), mrays=round(n / dt / 1e6, 2),
                         compile_s=round(cs, 1))
                except Exception as e:  # noqa: BLE001
                    emit("pairs_closest", accel=aname, wave=wname,
                         error=str(e)[:200])
            if wname == "shadow":
                dt, cs = timeit(lambda: pairs.any_hit_pairs(
                    accel, o, d, 1e-3, tm, cap=24, pair_budget=6))
                emit("pairs_anyhit", accel=aname, wave=wname,
                     ms=round(dt * 1e3, 1), mrays=round(n / dt / 1e6, 2),
                     compile_s=round(cs, 1))

    # --- tuned worklist end-to-end (dir sort + pairs fallback now default) --
    o, d, tm = waves["bounce"]
    for cfg in [
        dict(cap=96, item_budget=8),                      # engine config
        dict(cap=96, item_budget=8, group=8),
        dict(cap=160, item_budget=10, group=8),
        dict(cap=96, item_budget=8, group=8, item_chunk=4096),
    ]:
        dt, cs = timeit(lambda: worklist.closest_hit_worklist(
            accel128, o, d, 1e-3, tm, **cfg))
        emit("wl_bounce", **cfg, ms=round(dt * 1e3, 1),
             mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))

    # --- MXU intersector: precision x speed x agreement at block 64 ---------
    ref = jax.block_until_ready(worklist.closest_hit_worklist(
        accel128, o, d, 1e-3, tm, cap=96, item_budget=8, group=8))
    for isec in ["exact", "mxu", "mxu:default"]:
        cfg = dict(block=64, group=4, cap=160, item_budget=40,
                   item_chunk=512, intersector=isec)
        try:
            dt, cs = timeit(lambda: worklist.closest_hit_worklist(
                accel128, o, d, 1e-3, tm, **cfg))
            hit = jax.block_until_ready(worklist.closest_hit_worklist(
                accel128, o, d, 1e-3, tm, **cfg))
            flips = int(jnp.sum(hit.hit != ref.hit))
            both = np.asarray(hit.hit & ref.hit)
            tri_mm = int(np.sum(
                (np.asarray(hit.tri) != np.asarray(ref.tri)) & both))
            emit("wl_mxu", intersector=isec, ms=round(dt * 1e3, 1),
                 mrays=round(n / dt / 1e6, 2), hit_flips=flips,
                 tri_mismatch=tri_mm, compile_s=round(cs, 1))
        except Exception as e:  # noqa: BLE001
            emit("wl_mxu", intersector=isec, error=str(e)[:200])

    # --- shadow grid: block x cap (sort=False, light-major layout) ----------
    so, sd, stm = waves["shadow"]
    for cfg in [
        dict(block=8, cap=64, item_budget=6),             # engine config
        dict(block=8, cap=96, item_budget=8, group=8),
        dict(block=16, cap=96, item_budget=5, group=8),
        dict(block=32, cap=128, item_budget=4, group=8, item_chunk=2048),
    ]:
        dt, cs = timeit(lambda: worklist.any_hit_worklist(
            accel128, so, sd, 1e-3, stm, sort=False, **cfg))
        emit("shadow_grid", **cfg, ms=round(dt * 1e3, 1),
             mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))
    # pairs on the shadow wave is measured above (pairs_anyhit)

    # --- valid-size micros ---------------------------------------------------
    from path_tracer_ai_tpu.accel.traverse import _mt_sweep as _mts

    rng0 = np.random.default_rng(3)
    for ic_, b_, k_ in [(1 << 16, 8, 1024), (1 << 13, 64, 512),
                        (1 << 12, 128, 1024)]:
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

    # gather micro at sweep scale: [rows, g] cluster-slab gathers
    cid = jnp.asarray(rng0.integers(0, accel128.num_clusters, (1 << 16, 8)),
                      jnp.int32)
    f = jax.jit(
        lambda c: jax.tree.map(jnp.sum, (accel128.v0[c], accel128.e1[c])))
    dt, _ = timeit(f, cid)
    emit("slab_gather", rows=1 << 16, g=8, ms=round(dt * 1e3, 2),
         gbps=round((1 << 16) * 8 * 128 * 6 * 4 / dt / 1e9, 1))

    # einsum at valid size: MXU utilization with contraction dim 10
    gf = jnp.asarray(rng0.standard_normal((8192, 64, 10)), jnp.float32)
    wgt = jnp.asarray(rng0.standard_normal((8192, 10, 2048, 4)), jnp.float32)
    for prec in ["default", "highest"]:
        p = {"default": jax.lax.Precision.DEFAULT,
             "highest": jax.lax.Precision.HIGHEST}[prec]
        f = jax.jit(lambda a, w, p=p: jnp.einsum(
            "ibf,ifkq->ibkq", a, w,
            preferred_element_type=jnp.float32, precision=p))
        dt, _ = timeit(f, gf, wgt)
        tests = 8192 * 64 * 2048
        emit("einsum", precision=prec, ms=round(dt * 1e3, 2),
             gtests=round(tests / dt / 1e9, 1),
             tflops=round(tests * 80 / dt / 1e12, 2))

    # --- full renders: packets reference vs tuned worklist -------------------
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.camera import default_camera

    camera = default_camera()
    settings = RenderSettings(width=1920, height=1080, samples_per_pixel=2,
                              max_bounces=5, seed=0)
    plans = [
        ("packets", None, None),
        ("worklist", dict(cap=96, item_budget=8, group=8),
         dict(sort=False, cap=96, item_budget=8, group=8)),
    ]
    for backend, ckw, okw in plans:
        if ckw is not None:
            wavefront.WORKLIST_CLOSEST_KW = ckw
            wavefront.WORKLIST_OCCLUDE_KW = okw
            jax.clear_caches()  # kwargs are not jit keys; drop stale execs
        t0 = time.perf_counter()
        warm = settings.replace(samples_per_pixel=1)
        wavefront.render(scene, camera, warm, accel=accel128, block_size=64,
                         wave_size=1 << 20, backend=backend)
        log(f"[{backend}] warmup {time.perf_counter() - t0:.1f}s")
        stats = wavefront.RenderStats()
        t0 = time.perf_counter()
        img = wavefront.render(scene, camera, settings, accel=accel128,
                               stats=stats, block_size=64, wave_size=1 << 20,
                               backend=backend)
        wall = time.perf_counter() - t0
        assert np.isfinite(img).all()
        emit("render", backend=backend, wall_s=round(wall, 2),
             mrays=round(stats.mrays_per_s, 3),
             total_mrays=round(stats.total_rays / 1e6, 1))

    log("probe B complete")


if __name__ == "__main__":
    main()
