"""Round-3 probe J: fused Pallas shadow cascade A/B (VERDICT task 2).

Shadow is 55-60% of bounce time. pallas_anyhit.any_hit_fused keeps the
packet cascade's structure but fuses the per-iteration gather+MT+reduce
into one kernel (8 candidate clusters per 128-ray block per grid step,
cluster DMA via scalar-prefetch index maps). The kernel coarsens the
early-out to 8-candidate granularity (probe F: g2 beat g8 by ~8%), so
it must win more than that back. Sections:

  1. wave-level shadow A/B on the probe-F synthetic distribution:
     b64_g2 XLA (prod) | b128_g2 / b128_g8 XLA (controls separating the
     block-width and granularity effects) | fused b128 | fused b256.
     All occlusion vectors must match prod exactly.
  2. e2e 1080p@2spp/5b hybrid: engine="packets" g2 (prod) vs
     engine="packets_fused" — images must be bit-identical.

Usage: python scripts/probe_r3j.py [--cpu] [--no-e2e]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


smoke = "--cpu" in sys.argv

import jax

if smoke:
    jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001
    pass

import jax.numpy as jnp
import numpy as np

jnp.zeros(()).block_until_ready()
t0 = time.perf_counter()
_ = np.asarray(jnp.ones((8,), jnp.float32))
emit(probe="init", platform=jax.devices()[0].platform,
     first_d2h_s=round(time.perf_counter() - t0, 1))

from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel import pallas_anyhit, traverse
from path_tracer_ai_tpu.accel.clusters import build_clusters
from path_tracer_ai_tpu.core.types import RAY_TMIN
from path_tracer_ai_tpu.scene.scene import DEFAULT_LIGHTS

host = {}
scene, accel = _demo_scene(subdivisions=3 if smoke else 6, host_out=host)
accel_c = build_clusters(host["tris"], cluster_size=256)
emit(probe="scene", tris=int(scene.triangles.count),
     clusters=accel.num_clusters)

rng = np.random.default_rng(0)
N = 1 << 12 if smoke else 1 << 20
tv0 = np.asarray(host["tris"].v0)
ntri = tv0.shape[0]


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


# ---- 1. wave-level shadow A/B (probe-F distribution) -------------------
nv = N // 4
ti = np.sort(rng.choice(ntri, nv))
pp = tv0[ti] + rng.standard_normal((nv, 3)).astype(np.float32) * 1e-3
lights = np.asarray([l[0] for l in DEFAULT_LIGHTS], np.float32)
osh = np.tile(pp, (4, 1))
lv = lights[:, None, :] - pp[None, :, :]
dist = np.linalg.norm(lv, axis=-1)
dsh = (lv / np.maximum(dist, 1e-30)[..., None]).reshape(-1, 3)
tsh = (dist - 1e-3).reshape(-1).astype(np.float32)
tsh[rng.random(tsh.shape[0]) < 0.3] = -1.0
osh, dsh, tsh = jnp.asarray(osh), jnp.asarray(dsh), jnp.asarray(tsh)
live_sh = int(jnp.sum(tsh >= 0))

ref_occ = None
ikw = dict(interpret=True) if smoke else {}


def shadow_case(tag, fn):
    global ref_occ
    try:
        dt, cs, occ = timeit(fn)
        row = dict(probe="shadow7", engine=tag, ms=round(dt * 1e3, 1),
                   mrays=round(live_sh / dt / 1e6, 2),
                   compile_s=round(cs, 1))
        if ref_occ is None:
            ref_occ = occ
        else:
            row["mismatch"] = int(jnp.sum(occ != ref_occ))
        emit(**row)
    except Exception as e:  # noqa: BLE001
        emit(probe="shadow7", engine=tag, error=str(e)[:300])


shadow_case("xla_b64_g2", lambda: traverse.any_hit_packets(
    accel, osh, dsh, RAY_TMIN, tsh, block_size=64, group_size=2))
# unsorted control: live-masked block bounds should fix the round-2
# catastrophe (0.35 Mrays/s) caused by dead placeholder lanes widening
# mixed blocks' frusta
shadow_case("xla_b64_g2_nosort", lambda: traverse.any_hit_packets(
    accel, osh, dsh, RAY_TMIN, tsh, block_size=64, group_size=2,
    sort=False))
shadow_case("xla_b128_g2", lambda: traverse.any_hit_packets(
    accel, osh, dsh, RAY_TMIN, tsh, block_size=128, group_size=2))
# exact 2-level cull on the XLA cascade (the production path): 5-10x
# fewer candidates -> fewer sweep iterations + cluster-row gathers
shadow_case("xla_b64_g2_exact16", lambda: traverse.any_hit_packets(
    accel, osh, dsh, RAY_TMIN, tsh, block_size=64, group_size=2,
    exact_cull=16))
shadow_case("xla_b128_g2_exact16", lambda: traverse.any_hit_packets(
    accel, osh, dsh, RAY_TMIN, tsh, block_size=128, group_size=2,
    exact_cull=16))
shadow_case("xla_b128_g8", lambda: traverse.any_hit_packets(
    accel, osh, dsh, RAY_TMIN, tsh, block_size=128, group_size=8))
shadow_case("fused_b128", lambda: pallas_anyhit.any_hit_fused(
    accel, osh, dsh, RAY_TMIN, tsh, block_size=128, **ikw))
shadow_case("fused_b128_skip", lambda: pallas_anyhit.any_hit_fused(
    accel, osh, dsh, RAY_TMIN, tsh, block_size=128, early_skip=True,
    **ikw))
shadow_case("fused_b128_skip_nosort", lambda: pallas_anyhit.any_hit_fused(
    accel, osh, dsh, RAY_TMIN, tsh, block_size=128, early_skip=True,
    sort=False, **ikw))
# sub-slab skip (probe P: only 2.3-5.4% of 32-tri sub-slabs are active on
# real shadow waves — the conservative candidates are loose, and the
# kernel can skip the rest of the dense MT exactly)
shadow_case("fused_b128_sub", lambda: pallas_anyhit.any_hit_fused(
    accel, osh, dsh, RAY_TMIN, tsh, block_size=128, sub_skip=True, **ikw))
shadow_case("fused_b128_skip_sub", lambda: pallas_anyhit.any_hit_fused(
    accel, osh, dsh, RAY_TMIN, tsh, block_size=128, early_skip=True,
    sub_skip=True, **ikw))
shadow_case("fused_b128_skip_sub_nosort", lambda: pallas_anyhit.any_hit_fused(
    accel, osh, dsh, RAY_TMIN, tsh, block_size=128, early_skip=True,
    sub_skip=True, sort=False, **ikw))
# per-ray-exact 2-level cull (round-4 lever, probe_r4_exact_shadow: 8.5x
# fewer candidate DMAs at b128_dir bounce-0, 21.5x at bounce-1; super
# shortlist p99 ~20 of 41 -> ksup 16 vs 24 trades refine cost vs
# conservative-fallback tail). INTERPRETATION CAVEAT: this synthetic
# wave's origins are subdivision-ordered (incoherent), which inflates
# per-block super unions vs real in-render waves (probe M vs N lesson) —
# these rows UNDERSTATE exact_cull; the e2e rows (real waves) decide.
shadow_case("fused_b128_skip_sub_exact16", lambda: pallas_anyhit.any_hit_fused(
    accel, osh, dsh, RAY_TMIN, tsh, block_size=128, early_skip=True,
    sub_skip=True, exact_cull=16, **ikw))
shadow_case("fused_b128_skip_sub_exact24", lambda: pallas_anyhit.any_hit_fused(
    accel, osh, dsh, RAY_TMIN, tsh, block_size=128, early_skip=True,
    sub_skip=True, exact_cull=24, **ikw))
shadow_case(
    "fused_b128_skip_sub_exact16_nosort", lambda: pallas_anyhit.any_hit_fused(
        accel, osh, dsh, RAY_TMIN, tsh, block_size=128, early_skip=True,
        sub_skip=True, exact_cull=16, sort=False, **ikw))
if not smoke:
    shadow_case("fused_b256", lambda: pallas_anyhit.any_hit_fused(
        accel, osh, dsh, RAY_TMIN, tsh, block_size=256))
    shadow_case("fused_b256_skip", lambda: pallas_anyhit.any_hit_fused(
        accel, osh, dsh, RAY_TMIN, tsh, block_size=256, early_skip=True))
    shadow_case("fused_b256_skip_sub", lambda: pallas_anyhit.any_hit_fused(
        accel, osh, dsh, RAY_TMIN, tsh, block_size=256, early_skip=True,
        sub_skip=True))

    # isolated sort/unsort costs at this wave size (what sort=False saves)
    @jax.jit
    def sort_cost(o, d, tm):
        keys = traverse._sort_keys(accel, o, d, tm, mode="dir")
        perm = jnp.argsort(keys).astype(jnp.int32)
        packed = jnp.concatenate([o, d, tm[:, None]], axis=1)[perm]
        return packed, perm

    dt, cs, (_, perm_m) = timeit(lambda: sort_cost(osh, dsh, tsh))
    emit(probe="sort_cost", ms=round(dt * 1e3, 1), compile_s=round(cs, 1))

    occ_m = ref_occ

    @jax.jit
    def unsort_cost(perm, occ):
        return jnp.zeros_like(occ).at[perm].set(occ)

    dt, cs, _ = timeit(lambda: unsort_cost(perm_m, occ_m))
    emit(probe="unsort_cost", ms=round(dt * 1e3, 1), compile_s=round(cs, 1))
log("shadow section complete")

# ---- 1b. closest-wave sub_skip A/B (probe P: active tile fraction
# 0.31-0.54 at S=256 on real closest waves) -------------------------------
from path_tracer_ai_tpu.accel import ctiles

dcl = rng.standard_normal((N, 3)).astype(np.float32)
dcl /= np.linalg.norm(dcl, axis=1, keepdims=True)
ocl = np.tile(pp, (4, 1)) + 1e-3 * dcl
tcl = np.full(N, np.inf, np.float32)
tcl[rng.random(N) < 0.3] = -1.0
ocl_j, dcl_j, tcl_j = jnp.asarray(ocl), jnp.asarray(dcl), jnp.asarray(tcl)
live_cl = int(jnp.sum(tcl_j >= 0))
ckw_base = dict(cap=48, tile_chunk=2048, fallback_compact=1 << 13)
ref_cl = None


def closest_case(tag, **kw):
    global ref_cl
    try:
        dt, cs, hit = timeit(lambda: ctiles.closest_hit_ctiles(
            accel_c, ocl_j, dcl_j, RAY_TMIN, tcl_j, **ckw_base, **kw))
        row = dict(probe="closest_sub", engine=tag, ms=round(dt * 1e3, 1),
                   mrays=round(live_cl / dt / 1e6, 2),
                   compile_s=round(cs, 1))
        if ref_cl is None:
            ref_cl = hit
        else:
            # split t vs tri: t-only mismatches with tri identical are
            # the ulp-contraction signature (scripts/debug_ulp.py), not
            # a traversal bug — still a rejection for adoption (image
            # bitwise identity), but a different diagnosis.
            row["mismatch_t"] = int(jnp.sum(hit.t != ref_cl.t))
            row["mismatch_tri"] = int(jnp.sum(hit.tri != ref_cl.tri))
        emit(**row)
    except Exception as e:  # noqa: BLE001
        emit(probe="closest_sub", engine=tag, error=str(e)[:300])


closest_case("pallas", use_pallas=True, interpret=smoke)
closest_case("pallas_sub", sub_skip=True, use_pallas=True, interpret=smoke)

# fused closest cascade (probe Q lever): no pair domain, base accel
from path_tracer_ai_tpu.accel import pallas_closest


def cascade_case(tag, acc, **kw):
    global ref_cl
    try:
        dt, cs, hit = timeit(lambda: pallas_closest.closest_hit_fused(
            acc, ocl_j, dcl_j, RAY_TMIN, tcl_j, interpret=smoke, **kw))
        row = dict(probe="closest_cascade", engine=tag,
                   ms=round(dt * 1e3, 1),
                   mrays=round(live_cl / dt / 1e6, 2),
                   compile_s=round(cs, 1))
        if ref_cl is not None:
            row["mismatch_t"] = int(jnp.sum(hit.t != ref_cl.t))
            row["mismatch_tri"] = int(jnp.sum(hit.tri != ref_cl.tri))
        emit(**row)
    except Exception as e:  # noqa: BLE001
        emit(probe="closest_cascade", engine=tag, error=str(e)[:300])


cascade_case("s128_sub", accel)
cascade_case("s128_nosub", accel, sub_skip=False)
cascade_case("s256_sub", accel_c)
# per-ray-exact cull for the closest cascade (probe_r4_exact_closest:
# 1.8x fewer pack DMAs primary / 4.7x bounce-1 at b128 octorig)
cascade_case("s128_sub_exact16", accel, exact_cull=16)
log("closest sub section complete")

# ---- 2. e2e adoption A/B ------------------------------------------------
if "--no-e2e" not in sys.argv and not smoke:
    from path_tracer_ai_tpu.config import RenderSettings
    from path_tracer_ai_tpu.engine import wavefront
    from path_tracer_ai_tpu.scene.camera import default_camera

    cam = default_camera()
    settings = RenderSettings(width=1920, height=1080, samples_per_pixel=2,
                              max_bounces=5, seed=0)
    wave = 1 << 20

    def e2e(tag, occ_kw, closest_kw=None, closest_eng=None):
        wavefront.HYBRID_OCCLUDE_KW = occ_kw
        if closest_kw is not None:
            wavefront.CTILES_CLOSEST_KW = closest_kw
        if closest_eng is not None:
            wavefront.HYBRID_CLOSEST_KW = closest_eng
        wavefront.clear_executable_caches()
        t0 = time.perf_counter()
        wavefront.render(scene, cam, settings, accel=accel, block_size=64,
                         wave_size=wave, backend="hybrid",
                         accel_closest=accel_c)
        warm_s = time.perf_counter() - t0
        best = None
        img = None
        for _ in range(2):
            stats = wavefront.RenderStats()
            t0 = time.perf_counter()
            img = wavefront.render(scene, cam, settings, accel=accel,
                                   stats=stats, block_size=64,
                                   wave_size=wave, backend="hybrid",
                                   accel_closest=accel_c)
            if best is None or stats.mrays_per_s > best[0]:
                best = (stats.mrays_per_s, time.perf_counter() - t0)
        assert np.isfinite(img).all()
        emit(probe="e2e", config=tag, mrays=round(best[0], 2),
             warm_s=round(warm_s, 1), render_s=round(best[1], 1))
        return img

    try:
        img_a = e2e("shadow_packets_g2", dict(engine="packets",
                                              group_size=2))
        # round-4 session 50: xla_b128_g2 beat the b64 production wave row
        # 7.38 vs 7.17 Mrays (same-session, mismatch 0) — the e2e A/B it
        # needs for adoption (wave rows alone never adopt: the block-size
        # handicap on REAL waves is 1.54x, probe N).
        img_p = e2e("shadow_packets_b128_g2",
                    dict(engine="packets", group_size=2, block_size=128))
        emit(probe="e2e_same_image_b128_g2",
             identical=bool(np.array_equal(img_a, img_p)))
        # probe N (CPU): at b64 the real wave's pixel order equals the
        # dir sort in candidate volume — nosort drops ~75ms/wave of
        # sort+unsort row movement for free if this holds e2e
        img_n = e2e("shadow_packets_g2_nosort",
                    dict(engine="packets", group_size=2, sort=False))
        emit(probe="e2e_same_image_xla_nosort",
             identical=bool(np.array_equal(img_a, img_n)))
        img_x = e2e("shadow_g2_exact",
                    dict(engine="packets", group_size=2, exact_cull=16))
        emit(probe="e2e_same_image_g2_exact",
             identical=bool(np.array_equal(img_a, img_x)))
        img_b = e2e("shadow_fused_b128", dict(engine="packets_fused"))
        emit(probe="e2e_same_image",
             identical=bool(np.array_equal(img_a, img_b)))
        img_c = e2e("shadow_fused_skip", dict(engine="packets_fused",
                                              early_skip=True))
        emit(probe="e2e_same_image_skip",
             identical=bool(np.array_equal(img_a, img_c)))
        img_d = e2e("shadow_fused_skip_nosort",
                    dict(engine="packets_fused", early_skip=True,
                         sort=False))
        emit(probe="e2e_same_image_nosort",
             identical=bool(np.array_equal(img_a, img_d)))
        # bounce-0-only nosort (probe N: bounce-0 pixel order == dir
        # sort for shadow; measured identical b8 unions for closest)
        wavefront.SHADOW_NOSORT_BOUNCE0 = True
        wavefront.CLOSEST_NOSORT_BOUNCE0 = True
        try:
            img_e = e2e("shadow_g2_nosort_b0",
                        dict(engine="packets", group_size=2))
        finally:
            wavefront.SHADOW_NOSORT_BOUNCE0 = False
            wavefront.CLOSEST_NOSORT_BOUNCE0 = False
        emit(probe="e2e_same_image_nosort_b0",
             identical=bool(np.array_equal(img_a, img_e)))
        # sub-slab skip levers (probe P): closest alone, shadow alone,
        # then the combined candidate
        ckw_prod = dict(wavefront.CTILES_CLOSEST_KW)
        try:
            img_f = e2e("closest_sub", dict(engine="packets", group_size=2),
                        closest_kw=dict(ckw_prod, sub_skip=True))
            emit(probe="e2e_same_image_closest_sub",
                 identical=bool(np.array_equal(img_a, img_f)))
            img_g = e2e("shadow_fused_skip_sub",
                        dict(engine="packets_fused", early_skip=True,
                             sub_skip=True), closest_kw=ckw_prod)
            emit(probe="e2e_same_image_shadow_sub",
                 identical=bool(np.array_equal(img_a, img_g)))
            img_h = e2e("combo_sub",
                        dict(engine="packets_fused", early_skip=True,
                             sub_skip=True),
                        closest_kw=dict(ckw_prod, sub_skip=True))
            emit(probe="e2e_same_image_combo_sub",
                 identical=bool(np.array_equal(img_a, img_h)))
            # fused closest cascade (probe Q): alone, then the full combo
            img_i = e2e("closest_cascade",
                        dict(engine="packets", group_size=2),
                        closest_kw=ckw_prod,
                        closest_eng=dict(engine="cascade_fused"))
            emit(probe="e2e_same_image_closest_cascade",
                 identical=bool(np.array_equal(img_a, img_i)))
            img_j = e2e("combo_cascade",
                        dict(engine="packets_fused", early_skip=True,
                             sub_skip=True),
                        closest_kw=ckw_prod,
                        closest_eng=dict(engine="cascade_fused"))
            emit(probe="e2e_same_image_combo_cascade",
                 identical=bool(np.array_equal(img_a, img_j)))
            # round-4 exact-union shadow cull, alone and in the full combo
            img_k = e2e("shadow_fused_exact",
                        dict(engine="packets_fused", early_skip=True,
                             sub_skip=True, exact_cull=16),
                        closest_kw=ckw_prod)
            emit(probe="e2e_same_image_shadow_exact",
                 identical=bool(np.array_equal(img_a, img_k)))
            img_l = e2e("combo_cascade_exact",
                        dict(engine="packets_fused", early_skip=True,
                             sub_skip=True, exact_cull=16),
                        closest_kw=ckw_prod,
                        closest_eng=dict(engine="cascade_fused"))
            emit(probe="e2e_same_image_combo_cascade_exact",
                 identical=bool(np.array_equal(img_a, img_l)))
            img_m = e2e("combo_exact_full",
                        dict(engine="packets_fused", early_skip=True,
                             sub_skip=True, exact_cull=16),
                        closest_kw=ckw_prod,
                        closest_eng=dict(engine="cascade_fused",
                                         exact_cull=16))
            emit(probe="e2e_same_image_combo_exact_full",
                 identical=bool(np.array_equal(img_a, img_m)))
        finally:
            wavefront.CTILES_CLOSEST_KW = ckw_prod
            wavefront.HYBRID_CLOSEST_KW = dict(engine="ctiles")
    except Exception as e:  # noqa: BLE001
        emit(probe="e2e", error=str(e)[:300])

log("probe J complete")
