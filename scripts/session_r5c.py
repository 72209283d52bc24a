"""Round-5 client C: current-config stage splits + informed pairs retune + 4K.

Client B's union histogram on the production wave shape killed the
H in {8,12,16} pair_split guesses (mean union is 15, p99 30 — NOT the ~6
the ceiling plan assumed; 32-50% of blocks exceeded those heads against a
12.5% tail budget, and all three measured ~2x WORSE wave-level from
overflow-fallback swamp). This session replaces guesswork with data:

  1. extended union histogram (frac > {16..44}) on the S=256 closest accel
     — sizes the head/cap levers precisely.
  2. closest-wave stage decomposition AT THE ROUND-5 ADOPTED CONFIG
     (fallback_sorted + fc4096 + Pallas tile sweep, S=256): cumulative
     jitted prefixes through prepare | cull | extract | pairs | sweep |
     fallback | full — the r3 split (41ms pairs, ~89ms outro) predates
     both adoptions, so round-6 planning needs fresh terms.
  3. shadow-wave split at production (any_hit_packets b64 g2 dir-sort):
     sort | cull | full-on-presorted (cascade, no un/sort) | full.
  4. informed pairs retune, exact-gated vs prod: cap44, cap40 (max union
     observed 42), split32 (head >= p99 so the tail budget holds),
     cap40+split32.
  5. e2e A/B with a bitwise image gate IF a retune row wins wave-level by
     >= 1.5% (the transfer bar round 4/5 losses taught us to demand).
  6. 4K progressive increment via run_baselines (chunked, checkpointed,
     stop-file-aware) — every round-5 TPU session ends with increments.

ONE TPU process; sections check the driver-bench stop-file and yield.
Usage: python scripts/session_r5c.py [--cpu] [--skip-4k] [--skip-stages]
                                     [--spp-increment N]
"""
import functools
import json
import os
import runpy
import sys
import time

sys.path.insert(0, "/root/repo")

ARGS = list(sys.argv[1:])
smoke = "--cpu" in ARGS


def tlog(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def stop_requested():
    return os.path.exists(os.environ.get(
        "PT_BENCH_STOPFILE", "/tmp/pt_bench_wants_tpu"))


tlog("importing jax")
import jax  # noqa: E402

if smoke:
    jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001
    pass
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

tlog(f"devices: {jax.devices()}")
t0 = time.perf_counter()
_ = np.asarray(jnp.ones((8,), jnp.float32))
emit(probe="init", platform=jax.devices()[0].platform,
     first_d2h_s=round(time.perf_counter() - t0, 1))

from __graft_entry__ import _demo_scene  # noqa: E402
from path_tracer_ai_tpu.accel import ctiles, traverse, worklist  # noqa: E402
from path_tracer_ai_tpu.accel.clusters import build_clusters  # noqa: E402
from path_tracer_ai_tpu.core.types import RAY_TMIN  # noqa: E402
from path_tracer_ai_tpu.engine import wavefront  # noqa: E402

host = {}
scene, accel = _demo_scene(subdivisions=3 if smoke else 6, host_out=host)
accel_c = build_clusters(host["tris"], cluster_size=256)
emit(probe="scene", tris=int(scene.triangles.count),
     clusters=accel.num_clusters, clusters_c=accel_c.num_clusters)

rng = np.random.default_rng(0)
N = 1 << 12 if smoke else 1 << 20
tv0 = np.asarray(host["tris"].v0)
ntri = tv0.shape[0]

# probe_r5 / session_r5b closest-wave construction (comparable rows).
nv = N // 4
ti = np.sort(rng.choice(ntri, nv))
pp = tv0[ti] + rng.standard_normal((nv, 3)).astype(np.float32) * 1e-3
dcl = rng.standard_normal((N, 3)).astype(np.float32)
dcl /= np.linalg.norm(dcl, axis=1, keepdims=True)
ocl = np.tile(pp, (4, 1)) + 1e-3 * dcl
tcl = np.full(N, np.inf, np.float32)
tcl[rng.random(N) < 0.3] = -1.0
ocl_j, dcl_j, tcl_j = jnp.asarray(ocl), jnp.asarray(dcl), jnp.asarray(tcl)
live_cl = int(jnp.sum(tcl_j >= 0))

# probe_r3b shadow-wave construction: 4 light rays per surface vertex.
from path_tracer_ai_tpu.scene.scene import DEFAULT_LIGHTS  # noqa: E402

nvs = N // 4
tis = np.sort(rng.choice(ntri, nvs))
ps = tv0[tis] + rng.standard_normal((nvs, 3)).astype(np.float32) * 1e-3
lights = np.asarray([l[0] for l in DEFAULT_LIGHTS], np.float32)
lv = lights[:, None, :] - ps[None, :, :]
dist = np.linalg.norm(lv, axis=-1)
osh = np.tile(ps, (4, 1))
dsh = (lv / np.maximum(dist, 1e-30)[..., None]).reshape(-1, 3)
tsh = (dist - 1e-3).reshape(-1).astype(np.float32)
tsh[rng.random(tsh.shape[0]) < 0.3] = -1.0
osh_j, dsh_j, tsh_j = jnp.asarray(osh), jnp.asarray(dsh), jnp.asarray(tsh)
live_sh = int(jnp.sum(tsh_j >= 0))


def timeit(fn, reps=3):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, cs, out


# Production closest config (round-5 adopted committed defaults).
CKW = dict(wavefront.CTILES_CLOSEST_KW)
CAP = CKW.get("cap", 48)
TC = 256 if smoke else CKW.get("tile_chunk", 2048)
FC = 256 if smoke else CKW.get("fallback_compact", 1 << 12)
RC = 1 << 8 if smoke else 1 << 11
BLOCK, TB, FBB = 8, 16, 64
USE_PALLAS = not smoke
if USE_PALLAS:
    from path_tracer_ai_tpu.accel.pallas_ctiles import GROUP as TG
else:
    TG = 1

# ---------------------------------------------------------------------------
# 1. extended union histogram (S=256 accel, production wave shape)
# ---------------------------------------------------------------------------
if not stop_requested():
    try:
        @jax.jit
        def union_sizes(acc, o, d, t):
            ob, db, tb, _, _ = worklist._prepare_blocks(
                acc, o, d, t, BLOCK, True, "octorig")
            _, n_cand = ctiles._ray_masks(acc, ob, db, tb, RAY_TMIN, RC)
            return n_cand

        nc = np.asarray(union_sizes(accel_c, ocl_j, dcl_j, tcl_j))
        nb = nc.shape[0]
        livec = nc[nc > 0]
        emit(probe="union_hist_ext", nb=int(nb),
             live_blocks=int(livec.size),
             mean=round(float(livec.mean()), 2),
             p50=int(np.percentile(livec, 50)),
             p90=int(np.percentile(livec, 90)),
             p99=int(np.percentile(livec, 99)),
             p999=int(np.percentile(livec, 99.9)),
             max=int(livec.max()),
             **{f"n_gt{k}": int((nc > k).sum())
                for k in (16, 20, 24, 28, 32, 36, 40, 44)},
             tail_budget_den8=nb // 8)
    except Exception as e:  # noqa: BLE001
        emit(probe="union_hist_ext", error=str(e)[:300])

# ---------------------------------------------------------------------------
# 2. closest stage decomposition at the ADOPTED config
# ---------------------------------------------------------------------------
if "--skip-stages" not in ARGS and not stop_requested():

    def _stages(o, d, tm_in, upto):
        n = o.shape[0]
        t_max = jnp.where(tm_in >= 0, tm_in, -1.0)
        o_blk, d_blk, tm_blk, perm, npad = worklist._prepare_blocks(
            accel_c, o, d, t_max, BLOCK, True, "octorig")
        if upto == "prepare":
            return o_blk.sum() + d_blk.sum() + tm_blk.sum()
        nbk = o_blk.shape[0]
        n_live = jnp.sum((t_max >= 0.0).astype(jnp.int32))
        live_blocks = -(-n_live // BLOCK)
        cand, n_cand = ctiles._ray_masks(
            accel_c, o_blk, d_blk, tm_blk, RAY_TMIN, RC,
            live_blocks=live_blocks)
        if upto == "cull":
            return jnp.sum(cand) + jnp.sum(n_cand)
        order, n_cand, over = ctiles._extract_order_flat(
            accel_c, cand, n_cand, CAP, live_blocks=live_blocks,
            row_chunk=RC)
        if upto == "extract":
            return jnp.sum(order) + jnp.sum(n_cand) + jnp.sum(over)
        pairs = ctiles._build_pairs(accel_c, order, n_cand, over, CAP,
                                    TB, TC, tile_group=TG)
        if upto == "pairs":
            return (jnp.sum(pairs["slot_pair"]) + jnp.sum(pairs["slot_cid"])
                    + pairs["n_slots"])
        blk_res = ctiles._sweep_resolve(
            accel_c, pairs, o_blk, d_blk, tm_blk, RAY_TMIN, CAP, TB, TC,
            True, use_pallas=USE_PALLAS, interpret=smoke)
        if upto == "sweep":
            return sum(jnp.sum(a) for a in blk_res)
        # fallback_sorted production outro: sorted-domain completion,
        # merge, then ONE packed unsort (mirrors ctiles._run exactly).
        over_s = (pairs["overflow"][:, None]
                  & jnp.ones((nbk, BLOCK), bool)).reshape(-1)
        fb = ctiles._overflow_fallback(
            accel_c, o_blk.reshape(npad, 3), d_blk.reshape(npad, 3),
            RAY_TMIN, tm_blk.reshape(npad), over_s,
            want_tri=True, compact_cap=FC, fallback_block=FBB)
        merged = tuple(jnp.where(over_s, f, r.reshape(-1))
                       for f, r in zip(fb, blk_res))
        if upto == "fallback":
            return sum(jnp.sum(a) for a in merged)
        out = ctiles._unsort(merged, perm, npad, n)
        return sum(jnp.sum(a) for a in out)

    prev = 0.0
    for upto in ["prepare", "cull", "extract", "pairs", "sweep",
                 "fallback", "full"]:
        if stop_requested():
            break
        try:
            fn = jax.jit(functools.partial(_stages, upto=upto))
            dt, cs, _ = timeit(lambda: fn(ocl_j, dcl_j, tcl_j))
            emit(probe="closest_stage_r5", upto=upto,
                 ms=round(dt * 1e3, 1),
                 delta_ms=round((dt - prev) * 1e3, 1),
                 compile_s=round(cs, 1))
            prev = dt
        except Exception as e:  # noqa: BLE001
            emit(probe="closest_stage_r5", upto=upto, error=str(e)[:300])
            break

# ---------------------------------------------------------------------------
# 3. shadow stage decomposition at production (b64 g2 dir-sort, S=128)
# ---------------------------------------------------------------------------
if "--skip-stages" not in ARGS and not stop_requested():
    try:
        def _sh_sort(o, d, tm_in, cull):
            t_max = jnp.where(tm_in >= 0, tm_in, -1.0)
            keys = traverse._sort_keys(accel, o, d, t_max, mode="dir")
            perm = jnp.argsort(keys).astype(jnp.int32)
            packed = jnp.concatenate([o, d, t_max[:, None]], axis=1)[perm]
            o2, d2, tm2 = packed[:, 0:3], packed[:, 3:6], packed[:, 6]
            if not cull:
                return o2.sum() + d2.sum() + tm2.sum()
            nbs = o.shape[0] // 64
            order, n_cand, _ = traverse._block_candidates(
                accel, o2.reshape(nbs, 64, 3), d2.reshape(nbs, 64, 3),
                tm2.reshape(nbs, 64))
            return jnp.sum(order) + jnp.sum(n_cand)

        rows = {}
        for tag, fn in [
            ("sort", jax.jit(functools.partial(_sh_sort, cull=False))),
            ("sort+cull", jax.jit(functools.partial(_sh_sort, cull=True))),
        ]:
            dt, cs, _ = timeit(lambda: fn(osh_j, dsh_j, tsh_j))
            rows[tag] = dt
            emit(probe="shadow_stage_r5", upto=tag, ms=round(dt * 1e3, 1),
                 compile_s=round(cs, 1))

        # Pre-sort the wave on host so "cascade" rows see production block
        # unions without paying (or timing) the sort.
        keys_h = np.asarray(jax.jit(
            lambda o, d, t: traverse._sort_keys(
                accel, o, d, jnp.where(t >= 0, t, -1.0), mode="dir")
        )(osh_j, dsh_j, tsh_j))
        pm = np.argsort(keys_h, kind="stable")
        osr = jnp.asarray(osh[pm])
        dsr = jnp.asarray(dsh[pm])
        tsr = jnp.asarray(tsh[pm])

        dt, cs, _ = timeit(lambda: traverse.any_hit_packets(
            accel, osr, dsr, RAY_TMIN, tsr, block_size=64, group_size=2,
            sort=False))
        rows["cascade_presorted"] = dt
        emit(probe="shadow_stage_r5", upto="cascade_presorted",
             ms=round(dt * 1e3, 1), compile_s=round(cs, 1))

        dt, cs, _ = timeit(lambda: traverse.any_hit_packets(
            accel, osh_j, dsh_j, RAY_TMIN, tsh_j, block_size=64,
            group_size=2, sort=True, sort_mode="dir"))
        rows["full"] = dt
        emit(probe="shadow_stage_r5", upto="full", ms=round(dt * 1e3, 1),
             mrays=round(live_sh / dt / 1e6, 2), compile_s=round(cs, 1),
             sort_cull_ms=round(rows["sort+cull"] * 1e3, 1),
             sortunsort_overhead_ms=round(
                 (rows["full"] - rows["cascade_presorted"]) * 1e3, 1))
    except Exception as e:  # noqa: BLE001
        emit(probe="shadow_stage_r5", error=str(e)[:300])

# ---------------------------------------------------------------------------
# 4. informed pairs retune (exact-gated wave A/B)
# ---------------------------------------------------------------------------
best = None
if not stop_requested():
    pkw = dict(use_pallas=USE_PALLAS, interpret=smoke)
    ref = None
    prod_dt = None
    for tag, kw in [("prod", {}),
                    ("cap44", dict(cap=44)),
                    ("cap40", dict(cap=40)),
                    ("split32", dict(pair_split=32)),
                    ("cap40_s32", dict(cap=40, pair_split=32))]:
        if stop_requested():
            emit(probe="pairs_retune", engine=tag, status="skipped: stop")
            break
        try:
            ckw = dict(CKW, tile_chunk=TC, fallback_compact=FC)
            ckw.update(kw)
            dt, cs, hit = timeit(lambda: ctiles.closest_hit_ctiles(
                accel_c, ocl_j, dcl_j, RAY_TMIN, tcl_j, **ckw, **pkw))
            row = dict(probe="pairs_retune", engine=tag,
                       ms=round(dt * 1e3, 1),
                       mrays=round(live_cl / dt / 1e6, 2),
                       compile_s=round(cs, 1))
            if ref is None:
                ref, prod_dt = hit, dt
            else:
                row["mismatch_t"] = int(jnp.sum(hit.t != ref.t))
                row["mismatch_tri"] = int(jnp.sum(hit.tri != ref.tri))
                exact = (row["mismatch_t"] == 0
                         and row["mismatch_tri"] == 0)
                if exact and dt < prod_dt * 0.985 and (
                        best is None or dt < best[1]):
                    best = (tag, dt, kw)
            emit(**row)
        except Exception as e:  # noqa: BLE001
            emit(probe="pairs_retune", engine=tag, error=str(e)[:300])
    if best:
        emit(probe="pairs_retune_best", engine=best[0],
             ms=round(best[1] * 1e3, 1),
             vs_prod=round(prod_dt / best[1], 3))

# ---------------------------------------------------------------------------
# 5. e2e panel (bitwise gate) — FIXED panel, not wave-level-gated: client
#    B's adjudication showed the transfer can INVERT (split16 lost 2x
#    wave-level on the synthetic 2^20 wave yet won e2e 3.32 vs 3.14,
#    images bitwise identical — real render waves have far smaller unions
#    than the probe wave, so the tail budget holds there).
# ---------------------------------------------------------------------------
if not smoke and not stop_requested():
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.scene.camera import default_camera

    cam = default_camera()
    settings = RenderSettings(width=1920, height=1080, samples_per_pixel=2,
                              max_bounces=5, seed=0)
    wave = 1 << 20
    CKW0 = dict(wavefront.CTILES_CLOSEST_KW)

    def e2e(tag, ckw):
        wavefront.CTILES_CLOSEST_KW = dict(ckw)
        wavefront.clear_executable_caches()
        t0 = time.perf_counter()
        wavefront.render(scene, cam, settings, accel=accel, block_size=64,
                         wave_size=wave, backend="hybrid",
                         accel_closest=accel_c)
        warm_s = time.perf_counter() - t0
        bestm = None
        img = None
        for _ in range(2):
            stats = wavefront.RenderStats()
            t0 = time.perf_counter()
            img = wavefront.render(scene, cam, settings, accel=accel,
                                   stats=stats, block_size=64,
                                   wave_size=wave, backend="hybrid",
                                   accel_closest=accel_c)
            if bestm is None or stats.mrays_per_s > bestm[0]:
                bestm = (stats.mrays_per_s, time.perf_counter() - t0)
        assert np.isfinite(img).all()
        emit(probe="e2e_retune", config=tag, mrays=round(bestm[0], 2),
             warm_s=round(warm_s, 1), render_s=round(bestm[1], 1))
        return bestm[0], img

    panel = [("split16", dict(pair_split=16)),
             ("split32", dict(pair_split=32))]
    if best is not None and best[0] not in dict(panel):
        panel.append((best[0], best[2]))
    try:
        m_prod, img_a = e2e("prod_r5", CKW0)
        for tag, kw in panel:
            if stop_requested():
                emit(probe="e2e_retune", config=tag, status="skipped: stop")
                break
            m_ch, img_b = e2e(tag, dict(CKW0, **kw))
            identical = bool(np.array_equal(img_a, img_b))
            emit(probe="e2e_retune_gate", identical=identical,
                 prod=round(m_prod, 2), challenger=round(m_ch, 2),
                 config=tag, wins=bool(identical and m_ch > m_prod))
    except Exception as e:  # noqa: BLE001
        emit(probe="e2e_retune", error=str(e)[:300])
    finally:
        wavefront.CTILES_CLOSEST_KW = dict(CKW0)
        wavefront.clear_executable_caches()

# ---------------------------------------------------------------------------
# 5.5 kernel-throughput ladder (is the tile sweep at the VPU floor?)
# ---------------------------------------------------------------------------
if not stop_requested():
    try:
        sys.path.insert(0, "/root/repo/scripts")
        import probe_r5_kernel

        probe_r5_kernel.main(smoke=smoke)
    except Exception as e:  # noqa: BLE001
        emit(probe="kernel_ladder", error=str(e)[:300])

# ---------------------------------------------------------------------------
# 6. 4K progressive increment (chunked, checkpointed, stop-file-aware)
# ---------------------------------------------------------------------------
if "--skip-4k" not in ARGS and not stop_requested():
    inc = "96"
    if "--spp-increment" in ARGS:
        inc = ARGS[ARGS.index("--spp-increment") + 1]
    bargs = ["--spp-increment", inc,
             "--skip", "cpu-ref", "cornell", "dielectric", "gpu-parity",
             "evidence", "rmse1pct"]
    if smoke:
        bargs = ["--cpu", "--scale", "0.002",
                 "--skip", "cpu-ref", "cornell", "dielectric",
                 "gpu-parity", "evidence", "rmse1pct", "4k"]
    sys.argv = ["/root/repo/scripts/run_baselines.py"] + bargs
    t0 = time.perf_counter()
    try:
        runpy.run_path("/root/repo/scripts/run_baselines.py",
                       run_name="__main__")
        status = "ok"
    except SystemExit as e:
        status = f"exit {e.code}" if e.code else "ok"
    except Exception as e:  # noqa: BLE001
        status = f"error: {e}"[:300]
    emit(probe="session_c_4k", status=status,
         wall_s=round(time.perf_counter() - t0, 1))

emit(probe="session_c_done")
