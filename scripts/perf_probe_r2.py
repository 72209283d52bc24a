"""Round-2 TPU probe: pair/worklist traversal vs the round-1 packet cascade.

ONE process bundles every measurement (axon tunnel hazard rules: never run
two TPU clients concurrently, never kill one mid-flight). Diagnostics to
stderr, a JSON summary line per measurement to stdout.

Usage: python scripts/perf_probe_r2.py [--quick] [--skip-micro]
       [--skip-render] [--spp N]
"""

from __future__ import annotations

import argparse
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
    jax.block_until_ready(out)  # compile + warm
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, compile_s


def make_waves(scene, n, seed=0):
    """Representative ray distributions: primary / bounce-like / shadow."""
    import numpy as np
    import jax.numpy as jnp

    from path_tracer_ai_tpu.scene.camera import default_camera, get_rays

    rng = np.random.default_rng(seed)
    cam = default_camera()

    w, h = 1920, 1080
    idx = rng.choice(w * h, n, replace=n > w * h)
    xs = (idx % w).astype(np.float32) + rng.random(n, dtype=np.float32)
    ys = (idx // w).astype(np.float32) + rng.random(n, dtype=np.float32)
    po, pd = get_rays(cam, jnp.asarray(xs / (w - 1)), jnp.asarray(ys / (h - 1)),
                      16.0 / 9.0)

    tv0 = np.asarray(scene.triangles.v0)
    tv1 = np.asarray(scene.triangles.v1)
    tv2 = np.asarray(scene.triangles.v2)
    ti = rng.choice(tv0.shape[0], n)
    b1 = rng.random((n, 1), dtype=np.float32)
    b2 = rng.random((n, 1), dtype=np.float32) * (1 - b1)
    pos = tv0[ti] + b1 * (tv1[ti] - tv0[ti]) + b2 * (tv2[ti] - tv0[ti])
    dirs = rng.standard_normal((n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    bo = jnp.asarray(pos + dirs * 1e-3)
    bd = jnp.asarray(dirs)

    lp = np.asarray(scene.lights.position)
    li = rng.choice(lp.shape[0], n)
    lvec = lp[li] - pos
    dist = np.linalg.norm(lvec, axis=1, keepdims=True)
    so = jnp.asarray(pos + 1e-3)
    sd = jnp.asarray((lvec / np.maximum(dist, 1e-9)).astype(np.float32))
    stm = jnp.asarray((dist[:, 0] - 1e-3).astype(np.float32))

    inf = jnp.full((n,), jnp.inf, jnp.float32)
    return {
        "primary": (po, pd, inf),
        "bounce": (bo, bd, inf),
        "shadow": (so, sd, stm),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-micro", action="store_true")
    ap.add_argument("--skip-render", action="store_true")
    ap.add_argument("--spp", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    log(f"devices: {jax.devices()}")
    emit("devices", platform=jax.devices()[0].platform)

    from __graft_entry__ import _demo_scene
    from path_tracer_ai_tpu.accel import pairs, traverse, worklist

    subdiv = 4 if args.quick else 6
    scene, accel = _demo_scene(subdivisions=subdiv)
    emit("scene", tris=int(scene.triangles.count), clusters=accel.num_clusters)

    # --- microbenchmarks ---------------------------------------------------
    if not args.skip_micro:
        rngn = np.random.default_rng(1)
        for m in [1 << 20, 1 << 22, 1 << 24]:
            perm = rngn.permutation(m).astype(np.int32)
            idx = jnp.asarray(np.where(rngn.random(m) < 0.5, perm, m))
            vals = jnp.arange(m, dtype=jnp.int32)

            def scat(i, v):
                return jnp.full((m,), -1, jnp.int32).at[i].set(
                    v, mode="drop", unique_indices=True
                )

            dt, _ = timeit(jax.jit(scat), idx, vals)
            emit("scatter_perm", updates=m, ms=round(dt * 1e3, 2),
                 melem_per_s=round(m / dt / 1e6, 1))

        for m in [1 << 18, 1 << 20]:
            keys = jnp.asarray(
                rngn.integers(0, 2**31, m, dtype=np.int64).astype(np.int32)
            )
            dt, _ = timeit(jax.jit(jnp.argsort), keys)
            emit("argsort", n=m, ms=round(dt * 1e3, 2))
            # inverse permutation: scatter vs double-argsort
            perm = jnp.asarray(rngn.permutation(m).astype(np.int32))

            def inv_scatter(p):
                return jnp.zeros((m,), jnp.int32).at[p].set(
                    jnp.arange(m, dtype=jnp.int32)
                )

            dt1, _ = timeit(jax.jit(inv_scatter), perm)
            dt2, _ = timeit(jax.jit(jnp.argsort), perm)
            emit("inverse_perm", n=m, scatter_ms=round(dt1 * 1e3, 2),
                 argsort_ms=round(dt2 * 1e3, 2))

    # --- traversal comparison at scale -------------------------------------
    wave_exps = [16] if args.quick else [18, 20]
    for we in wave_exps:
        n = 1 << we
        waves = make_waves(scene, n)

        bj = jax.jit(
            lambda o_, d_, t_: pairs.build_pair_tables(accel, o_, d_,
                                                       1e-3, t_)
        )

        def wlb(o_, d_, t_):
            ob_, db_, tb_, p_, np_ = worklist._prepare_blocks(
                accel, o_, d_, t_, 8, True
            )
            return worklist._build_worklist(
                accel, ob_, db_, tb_, 1e-3, 32, 4, 4, 1 << 13, 1024
            )

        wlb = jax.jit(wlb)

        for name, (o, d, tm) in waves.items():
            # candidate statistics (cluster-major exact + worklist unions),
            # pulled from the JITTED builders (eager calls would pay the
            # ~2.7ms tunnel dispatch per op).
            tb = jax.block_until_ready(bj(o, d, tm))
            nc = np.asarray(tb.n_cand)
            emit("cand_ray", wave=name, n=n, mean=round(float(nc.mean()), 2),
                 p99=int(np.percentile(nc, 99)),
                 overflow=round(float(np.asarray(tb.overflow).mean()), 5))
            wl = jax.block_until_ready(wlb(o, d, tm))
            bc = np.asarray(wl.n_cand)
            emit("cand_block8", wave=name, n=n,
                 mean=round(float(bc.mean()), 2),
                 p99=int(np.percentile(bc, 99)),
                 overflow=round(float(np.asarray(wl.overflow).mean()), 5),
                 items=int(wl.n_items))

            # table builds (jitted as a whole; compile already done above)
            dt, cs = timeit(bj, o, d, tm)
            emit("tables_pairs", wave=name, n=n, ms=round(dt * 1e3, 1),
                 compile_s=round(cs, 1))
            dt, cs = timeit(wlb, o, d, tm)
            emit("tables_worklist", wave=name, n=n, ms=round(dt * 1e3, 1),
                 compile_s=round(cs, 1))

            # full closest / anyhit
            res = {}
            for bk, fn in [
                ("pairs", lambda: pairs.closest_hit_pairs(accel, o, d, 1e-3, tm)),
                ("worklist", lambda: worklist.closest_hit_worklist(
                    accel, o, d, 1e-3, tm)),
                ("packets", lambda: traverse.closest_hit_packets(
                    accel, o, d, 1e-3, tm, block_size=64)),
            ]:
                dt, cs = timeit(fn)
                res[bk] = dt
                emit("closest", wave=name, n=n, backend=bk,
                     ms=round(dt * 1e3, 1), mrays=round(n / dt / 1e6, 2),
                     compile_s=round(cs, 1))
            for bk, fn in [
                ("pairs", lambda: pairs.any_hit_pairs(accel, o, d, 1e-3, tm)),
                ("worklist", lambda: worklist.any_hit_worklist(
                    accel, o, d, 1e-3, tm)),
                ("packets", lambda: traverse.any_hit_packets(
                    accel, o, d, 1e-3, tm, block_size=64)),
            ]:
                dt, cs = timeit(fn)
                emit("anyhit", wave=name, n=n, backend=bk,
                     ms=round(dt * 1e3, 1), mrays=round(n / dt / 1e6, 2),
                     compile_s=round(cs, 1))

    # --- worklist parameter sweep on the 2^20 bounce wave -------------------
    if not args.quick:
        n = 1 << 20
        o, d, tm = make_waves(scene, n)["bounce"]
        grid = [
            dict(block=8, group=4, item_budget=4, item_chunk=1024),
            dict(block=8, group=8, item_budget=2, item_chunk=512),
            dict(block=8, group=2, item_budget=8, item_chunk=2048),
            dict(block=16, group=4, item_budget=3, item_chunk=512),
            dict(block=16, group=8, item_budget=2, item_chunk=512),
            dict(block=4, group=4, item_budget=6, item_chunk=2048),
            dict(block=8, group=4, item_budget=4, item_chunk=4096),
            dict(block=8, group=4, item_budget=4, item_chunk=256),
        ]
        for gset in grid:
            try:
                dt, cs = timeit(
                    lambda: worklist.closest_hit_worklist(
                        accel, o, d, 1e-3, tm, **gset
                    )
                )
                emit("wl_sweep", **gset, ms=round(dt * 1e3, 1),
                     mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))
            except Exception as e:  # noqa: BLE001
                emit("wl_sweep", **gset, error=str(e)[:200])

        # cluster size: S=64 accel variant
        from path_tracer_ai_tpu.accel.clusters import build_clusters

        accel64 = build_clusters(scene.triangles, cluster_size=64)
        for gset in [dict(block=8, group=4, item_budget=4, item_chunk=1024),
                     dict(block=8, group=8, item_budget=3, item_chunk=1024)]:
            dt, cs = timeit(
                lambda: worklist.closest_hit_worklist(
                    accel64, o, d, 1e-3, tm, **gset
                )
            )
            emit("wl_sweep_s64", **gset, ms=round(dt * 1e3, 1),
                 mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))

    # --- full-frame render comparison --------------------------------------
    if not args.skip_render:
        from path_tracer_ai_tpu.config import RenderSettings
        from path_tracer_ai_tpu.engine import wavefront
        from path_tracer_ai_tpu.scene.camera import default_camera

        camera = default_camera()
        w, h = (640, 360) if args.quick else (1920, 1080)
        settings = RenderSettings(width=w, height=h,
                                  samples_per_pixel=args.spp,
                                  max_bounces=5, seed=0)
        for backend in ["worklist", "pairs"]:
            npix = w * h
            sc = max(1, min((1 << 20) // min(npix, 1 << 20), args.spp))
            warm = settings.replace(samples_per_pixel=sc)
            t0 = time.perf_counter()
            wavefront.render(scene, camera, warm, accel=accel, block_size=64,
                             wave_size=1 << 20, backend=backend)
            log(f"[{backend}] warmup: {time.perf_counter() - t0:.1f}s")
            stats = wavefront.RenderStats()
            t0 = time.perf_counter()
            img = wavefront.render(scene, camera, settings, accel=accel,
                                   stats=stats, block_size=64,
                                   wave_size=1 << 20, backend=backend)
            wall = time.perf_counter() - t0
            assert np.isfinite(img).all()
            emit("render", backend=backend, w=w, h=h, spp=args.spp,
                 wall_s=round(wall, 2), mrays=round(stats.mrays_per_s, 3),
                 total_mrays=round(stats.total_rays / 1e6, 1))

    log("probe complete")


if __name__ == "__main__":
    main()
