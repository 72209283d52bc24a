"""Round-2 TPU probe: pair-tile traversal vs the round-1 packet cascade.

ONE process bundles every measurement (axon tunnel hazard rules: never run
two TPU clients concurrently, never kill one mid-flight). Diagnostics to
stderr, a JSON summary line per measurement to stdout.

Usage: python scripts/perf_probe_r2.py [--quick] [--skip-sweep] [--spp N]
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


def timeit(fn, *args, reps=4, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def make_waves(scene, accel, n, seed=0):
    """Representative ray distributions: primary / bounce-like / shadow."""
    import numpy as np
    import jax.numpy as jnp

    from path_tracer_ai_tpu.scene.camera import default_camera, get_rays

    rng = np.random.default_rng(seed)
    cam = default_camera()

    # primary: jittered 1080p camera rays (coherent)
    w, h = 1920, 1080
    idx = rng.choice(w * h, n, replace=n > w * h)
    xs = (idx % w).astype(np.float32) + rng.random(n, dtype=np.float32)
    ys = (idx // w).astype(np.float32) + rng.random(n, dtype=np.float32)
    u = jnp.asarray(xs / (w - 1))
    v = jnp.asarray(ys / (h - 1))
    po, pd = get_rays(cam, u, v, 16.0 / 9.0)

    # bounce-like: origins on scene surfaces, uniform sphere directions
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

    # shadow-like: surface origins toward the 4 default lights, short t_max
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
    ap.add_argument("--skip-sweep", action="store_true")
    ap.add_argument("--spp", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    log(f"devices: {jax.devices()}")
    emit("devices", platform=jax.devices()[0].platform)

    from __graft_entry__ import _demo_scene
    from path_tracer_ai_tpu.accel import pairs, traverse

    subdiv = 4 if args.quick else 6
    scene, accel = _demo_scene(subdivisions=subdiv)
    n_tris = int(scene.triangles.count)
    log(f"scene: {n_tris} tris, {accel.num_clusters} clusters")
    emit("scene", tris=n_tris, clusters=accel.num_clusters)

    wave_exp = 16 if args.quick else 20
    n = 1 << wave_exp
    waves = make_waves(scene, accel, n)

    # --- scatter microbenchmark (the one risky primitive) ------------------
    rngn = np.random.default_rng(1)
    for m in ([1 << 20, 1 << 24] if not args.quick else [1 << 18]):
        perm = rngn.permutation(m).astype(np.int32)
        half = jnp.asarray(np.where(rngn.random(m) < 0.5, perm, m))
        vals = jnp.arange(m, dtype=jnp.int32)

        def scat(idx, v):
            return jnp.full((m,), -1, jnp.int32).at[idx].set(
                v, mode="drop", unique_indices=True
            )

        sc = jax.jit(scat)
        dt = timeit(sc, half, vals)
        emit("scatter_perm", updates=m, ms=round(dt * 1e3, 3),
             melem_per_s=round(m / dt / 1e6, 1))

    # --- candidate statistics per distribution -----------------------------
    for name, (o, d, tm) in waves.items():
        tb = pairs.build_pair_tables(accel, o, d, 1e-3, tm)
        nc = np.asarray(tb.n_cand)
        ov = np.asarray(tb.overflow)
        emit(
            "candidates", wave=name, n=n,
            mean=round(float(nc.mean()), 2),
            p50=int(np.percentile(nc, 50)), p99=int(np.percentile(nc, 99)),
            overflow_frac=round(float(ov.mean()), 5),
            pairs_total=int(nc.sum()),
            tiles=int(tb.n_tiles),
        )

    # --- pair path vs packet cascade, per distribution ---------------------
    for name, (o, d, tm) in waves.items():
        t_pair = timeit(
            lambda: pairs.closest_hit_pairs(accel, o, d, 1e-3, tm)
        )
        t_pack = timeit(
            lambda: traverse.closest_hit_packets(
                accel, o, d, 1e-3, tm, block_size=64
            )
        )
        emit(
            "closest", wave=name, n=n,
            pairs_ms=round(t_pair * 1e3, 1),
            packets_ms=round(t_pack * 1e3, 1),
            speedup=round(t_pack / t_pair, 2),
            pairs_mrays=round(n / t_pair / 1e6, 2),
        )
        t_pair_a = timeit(lambda: pairs.any_hit_pairs(accel, o, d, 1e-3, tm))
        t_pack_a = timeit(
            lambda: traverse.any_hit_packets(
                accel, o, d, 1e-3, tm, block_size=64
            )
        )
        emit(
            "anyhit", wave=name, n=n,
            pairs_ms=round(t_pair_a * 1e3, 1),
            packets_ms=round(t_pack_a * 1e3, 1),
            speedup=round(t_pack_a / t_pair_a, 2),
            pairs_mrays=round(n / t_pair_a / 1e6, 2),
        )

    # --- table-build vs sweep decomposition (bounce wave) ------------------
    o, d, tm = waves["bounce"]
    t_tables = timeit(
        lambda: pairs.build_pair_tables(accel, o, d, 1e-3, tm)
    )
    emit("tables_only", wave="bounce", ms=round(t_tables * 1e3, 1))

    # --- parameter sweep on the bounce wave --------------------------------
    if not args.skip_sweep:
        grid = [
            dict(cap=16, pair_budget=8, tile_rays=128, tile_chunk=256,
                 row_chunk=1 << 15),
            dict(cap=16, pair_budget=8, tile_rays=128, tile_chunk=64,
                 row_chunk=1 << 15),
            dict(cap=16, pair_budget=8, tile_rays=128, tile_chunk=1024,
                 row_chunk=1 << 15),
            dict(cap=16, pair_budget=8, tile_rays=256, tile_chunk=128,
                 row_chunk=1 << 15),
            dict(cap=8, pair_budget=6, tile_rays=128, tile_chunk=256,
                 row_chunk=1 << 15),
            dict(cap=16, pair_budget=8, tile_rays=128, tile_chunk=256,
                 row_chunk=1 << 14),
            dict(cap=16, pair_budget=8, tile_rays=128, tile_chunk=256,
                 row_chunk=1 << 16),
            dict(cap=24, pair_budget=12, tile_rays=128, tile_chunk=256,
                 row_chunk=1 << 15),
        ]
        for g in grid:
            try:
                dt = timeit(
                    lambda: pairs.closest_hit_pairs(accel, o, d, 1e-3, tm, **g)
                )
                emit("sweep", **g, ms=round(dt * 1e3, 1),
                     mrays=round(n / dt / 1e6, 2))
            except Exception as e:  # noqa: BLE001
                emit("sweep", **g, error=str(e)[:200])

    # --- full-frame render comparison (the bench.py configuration) --------
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.camera import default_camera

    camera = default_camera()
    w, h = (640, 360) if args.quick else (1920, 1080)
    settings = RenderSettings(width=w, height=h, samples_per_pixel=args.spp,
                              max_bounces=5, seed=0)
    for backend in ["pairs", "packets"]:
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
                               stats=stats, block_size=64, wave_size=1 << 20,
                               backend=backend)
        wall = time.perf_counter() - t0
        assert np.isfinite(img).all()
        emit(
            "render", backend=backend, w=w, h=h, spp=args.spp,
            wall_s=round(wall, 2),
            mrays=round(stats.mrays_per_s, 3),
            total_mrays=round(stats.total_rays / 1e6, 1),
        )
        if backend == "packets" and not args.quick:
            break  # packets at full scale already known (~1.5 Mrays/s)

    log("probe complete")


if __name__ == "__main__":
    main()
