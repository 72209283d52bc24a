"""Round-2 TPU probe v3: cluster builders x worklist tuning x backends.

ONE process bundles every measurement (axon tunnel hazard rules: never run
two TPU clients concurrently, never kill one mid-flight). Diagnostics to
stderr, a JSON summary line per measurement to stdout.

Usage: python scripts/perf_probe_r2.py [--quick] [--skip-grid] [--spp N]
"""

from __future__ import annotations

import argparse
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


def make_waves(scene, n, seed=0):
    import numpy as np
    import jax.numpy as jnp

    from path_tracer_ai_tpu.scene.camera import default_camera, get_rays

    rng = np.random.default_rng(seed)
    cam = default_camera()

    # primary: a CONTIGUOUS pixel chunk (what the engine actually traces)
    w, h = 1920, 1080
    idx = np.arange(n) % (w * h)
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

    # shadow: light-major layout exactly like engine.shading.direct_lighting
    lp = np.asarray(scene.lights.position)
    li = np.repeat(np.arange(lp.shape[0]), n // lp.shape[0] + 1)[:n]
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
    ap.add_argument("--skip-grid", action="store_true")
    ap.add_argument("--spp", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    log(f"devices: {jax.devices()}")
    emit("devices", platform=jax.devices()[0].platform)

    from __graft_entry__ import _demo_scene
    from path_tracer_ai_tpu.accel import traverse, worklist
    from path_tracer_ai_tpu.accel.clusters import build_clusters

    subdiv = 4 if args.quick else 6
    scene, _ = _demo_scene(subdivisions=subdiv)
    emit("scene", tris=int(scene.triangles.count))

    accels = {}
    for name, (method, s) in {
        "split128": ("split", 128),
        "morton128": ("morton", 128),
        "split256": ("split", 256),
        "split64": ("split", 64),
    }.items():
        t0 = time.perf_counter()
        accels[name] = build_clusters(scene.triangles, cluster_size=s,
                                      method=method)
        emit("accel_build", name=name, clusters=accels[name].num_clusters,
             build_s=round(time.perf_counter() - t0, 2))

    n = (1 << 16) if args.quick else (1 << 20)
    waves = make_waves(scene, n)

    # --- extraction microbench: top_k vs unrolled argmax ---------------------
    if not args.quick:
        from path_tracer_ai_tpu.accel.worklist import _extract_k

        rngn = np.random.default_rng(2)
        for rows, cols, k in [(1 << 17, 256, 64), (1 << 17, 41, 16)]:
            cand = jnp.asarray(rngn.random((rows, cols)) < 0.1)
            col = jnp.arange(cols, dtype=jnp.int32)[None, :]
            neg = jnp.where(cand, -col, jnp.int32(-(2**30)))

            dt, _ = timeit(jax.jit(lambda x: jax.lax.top_k(x, k)), neg)
            emit("extract_topk", rows=rows, cols=cols, k=k,
                 ms=round(dt * 1e3, 2))
            dt, _ = timeit(
                jax.jit(lambda x: _extract_k(x, k, jnp.int32(-(2**30)))), neg
            )
            emit("extract_argmax", rows=rows, cols=cols, k=k,
                 ms=round(dt * 1e3, 2))

    # --- slab-only cull micro (tables minus extraction) ---------------------
    if not args.quick:
        from path_tracer_ai_tpu.accel.traverse import (
            _interval_slab,
            _ray_block_bounds,
        )

        accel0 = accels["split128"]
        o, d, tm = waves["bounce"]
        ob_, db_, tb_, _, _ = worklist._prepare_blocks(accel0, o, d, tm, 8,
                                                       True)

        def slab_only(ob, db, tb):
            def chunk(argsx):
                oc, dc, tc = argsx
                olo, ohi, dlo, dhi = _ray_block_bounds(oc, dc)
                lb, ub = _interval_slab(accel0.bmin, accel0.bmax, olo, ohi,
                                        dlo, dhi)
                cand = (lb <= ub) & (ub >= 0.0)
                return jnp.sum(cand, axis=1).astype(jnp.int32)

            nchk = ob.shape[0] // 8192
            return jax.lax.map(
                chunk,
                (ob.reshape(nchk, 8192, -1, 3), db.reshape(nchk, 8192, -1, 3),
                 tb.reshape(nchk, 8192, -1)),
            )

        dt, _ = timeit(jax.jit(slab_only), ob_, db_, tb_)
        emit("slab_only_flat", rows=int(ob_.shape[0]), cols=641,
             ms=round(dt * 1e3, 2))

    # --- candidate quality per accel variant (block 8, cap 64) --------------
    for aname, accel in accels.items():
        wlb = jax.jit(
            lambda o_, d_, t_, a_=accel: worklist._build_worklist(
                a_, *worklist._prepare_blocks(a_, o_, d_, t_, 8, True)[:3],
                1e-3, 64, 8, 8, 1 << 13, 1024
            )
        )
        for wname, (o, d, tm) in waves.items():
            wl = jax.block_until_ready(wlb(o, d, tm))
            bc = np.asarray(wl.n_cand)
            emit("cand", accel=aname, wave=wname,
                 mean=round(float(bc.mean()), 2),
                 p99=int(np.percentile(bc, 99)),
                 overflow=round(float(np.asarray(wl.overflow).mean()), 5),
                 items=int(wl.n_items))
            if wname == "bounce":
                dt, cs = timeit(wlb, o, d, tm)
                emit("tables", accel=aname, ms=round(dt * 1e3, 1),
                     compile_s=round(cs, 1))

    # --- backend timings on the best-looking accels -------------------------
    for aname in (["split128"] if args.quick else ["split128", "split256"]):
        accel = accels[aname]
        for wname, (o, d, tm) in waves.items():
            dt, cs = timeit(
                lambda: worklist.closest_hit_worklist(accel, o, d, 1e-3, tm)
            )
            emit("closest", accel=aname, wave=wname, backend="worklist",
                 ms=round(dt * 1e3, 1), mrays=round(n / dt / 1e6, 2),
                 compile_s=round(cs, 1))
            sort = wname != "shadow"
            dt, cs = timeit(
                lambda: worklist.any_hit_worklist(accel, o, d, 1e-3, tm,
                                                  sort=sort)
            )
            emit("anyhit", accel=aname, wave=wname, backend="worklist",
                 sort=sort, ms=round(dt * 1e3, 1),
                 mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))

    # packets reference on split128 (accel quality helps it too)
    accel = accels["split128"]
    for wname, (o, d, tm) in waves.items():
        dt, cs = timeit(
            lambda: traverse.closest_hit_packets(accel, o, d, 1e-3, tm,
                                                 block_size=64)
        )
        emit("closest", accel="split128", wave=wname, backend="packets",
             ms=round(dt * 1e3, 1), mrays=round(n / dt / 1e6, 2),
             compile_s=round(cs, 1))

    # --- parameter grid on the bounce wave ---------------------------------
    if not args.skip_grid and not args.quick:
        o, d, tm = waves["bounce"]
        accel = accels["split128"]
        grid = [
            dict(block=8, group=8, item_budget=6, item_chunk=1024, cap=96),
            dict(block=8, group=8, item_budget=6, item_chunk=4096, cap=96),
            dict(block=8, group=16, item_budget=4, item_chunk=4096, cap=96),
            dict(block=8, group=8, item_budget=6, item_chunk=4096, cap=96,
                 sort_mode="dir"),
            dict(block=16, group=8, item_budget=5, item_chunk=2048, cap=128),
            dict(block=8, group=8, item_budget=6, item_chunk=4096, cap=96,
                 levels=2),
            dict(block=64, group=4, item_budget=40, item_chunk=512, cap=160,
                 intersector="mxu"),
            dict(block=128, group=4, item_budget=64, item_chunk=256, cap=256,
                 intersector="mxu"),
            dict(block=128, group=2, item_budget=128, item_chunk=256, cap=256,
                 intersector="mxu"),
            dict(block=128, group=4, item_budget=64, item_chunk=256, cap=256),
        ]
        for gset in grid:
            try:
                dt, cs = timeit(
                    lambda: worklist.closest_hit_worklist(
                        accel, o, d, 1e-3, tm, **gset
                    )
                )
                emit("grid", **gset, ms=round(dt * 1e3, 1),
                     mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))
            except Exception as e:  # noqa: BLE001
                emit("grid", **gset, error=str(e)[:200])
        # small-cluster accels: less sweep arithmetic per candidate
        for aname in ["split64"]:
            for gset in [
                dict(block=8, group=8, item_budget=8, item_chunk=1024),
                dict(block=8, group=8, item_budget=8, item_chunk=1024,
                     levels=2),
                dict(block=16, group=8, item_budget=6, item_chunk=512),
            ]:
                try:
                    dt, cs = timeit(
                        lambda: worklist.closest_hit_worklist(
                            accels[aname], o, d, 1e-3, tm, cap=96, **gset
                        )
                    )
                    emit("grid_s64", **gset, ms=round(dt * 1e3, 1),
                         mrays=round(n / dt / 1e6, 2), compile_s=round(cs, 1))
                except Exception as e:  # noqa: BLE001
                    emit("grid_s64", **gset, error=str(e)[:200])

        # shadow wave with and without sort
        o, d, tm = waves["shadow"]
        for sort in [True, False]:
            dt, cs = timeit(
                lambda: worklist.any_hit_worklist(accel, o, d, 1e-3, tm,
                                                  sort=sort)
            )
            emit("shadow_sort", sort=sort, ms=round(dt * 1e3, 1),
                 mrays=round(n / dt / 1e6, 2))

    # --- full-frame render --------------------------------------------------
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.camera import default_camera

    camera = default_camera()
    w, h = (640, 360) if args.quick else (1920, 1080)
    settings = RenderSettings(width=w, height=h, samples_per_pixel=args.spp,
                              max_bounces=5, seed=0)
    for aname, backend in [("split128", "worklist"), ("split128", "packets")]:
        accel = accels[aname]
        npix = w * h
        sc = max(1, min((1 << 20) // min(npix, 1 << 20), args.spp))
        warm = settings.replace(samples_per_pixel=sc)
        t0 = time.perf_counter()
        wavefront.render(scene, camera, warm, accel=accel, block_size=64,
                         wave_size=1 << 20, backend=backend)
        log(f"[{aname}/{backend}] warmup: {time.perf_counter() - t0:.1f}s")
        stats = wavefront.RenderStats()
        t0 = time.perf_counter()
        img = wavefront.render(scene, camera, settings, accel=accel,
                               stats=stats, block_size=64, wave_size=1 << 20,
                               backend=backend)
        wall = time.perf_counter() - t0
        assert np.isfinite(img).all()
        emit("render", accel=aname, backend=backend, w=w, h=h, spp=args.spp,
             wall_s=round(wall, 2), mrays=round(stats.mrays_per_s, 3),
             total_mrays=round(stats.total_rays / 1e6, 1))

    log("probe complete")


if __name__ == "__main__":
    main()
