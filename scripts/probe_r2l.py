import json, sys, time
sys.path.insert(0, "/root/repo")
def emit(**kw): print(json.dumps(kw), flush=True)
def log(*a): print(*a, file=sys.stderr, flush=True)
import jax, numpy as np, jax.numpy as jnp
emit(probe="devices", platform=jax.devices()[0].platform)
from functools import partial
from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel.clusters import build_clusters
from path_tracer_ai_tpu.accel import worklist
from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.engine import wavefront, shading
from path_tracer_ai_tpu.scene.camera import default_camera

scene, _ = _demo_scene(subdivisions=6)
accel = build_clusters(scene.triangles, cluster_size=128)
camera = default_camera()

# Construct the REAL depth-1 shadow wave eagerly from bounce-0 hits,
# mirroring shading.direct_lighting's ray setup (light-major flatten).
from path_tracer_ai_tpu.accel import ctiles
from path_tracer_ai_tpu.core.types import (MATERIAL_DIELECTRIC, RAY_EPS)
from path_tracer_ai_tpu.engine import intersect

w, h = 1920, 1080
pix_chunk = 1 << 20
xs = np.arange(pix_chunk, dtype=np.int32) % w
ys = np.arange(pix_chunk, dtype=np.int32) // w
gen_statics = dict(w=w, h=h, sc=1, pix_chunk=pix_chunk,
                   lanes_padded=pix_chunk, aspect=16.0/9.0)
base_key = jax.random.key(np.uint32(0))
o, d, keys, lane_s = wavefront._wave_gen_exe(**gen_statics)(
    camera, base_key, jnp.asarray(xs), jnp.asarray(ys), 0)
n = o.shape[0]
ch = ctiles.closest_hit_ctiles(accel, o, d, 1e-3,
                               jnp.full((n,), jnp.inf), cap=48,
                               tile_chunk=2048)
attrs = intersect.hit_attributes(scene.triangles, o, d, ch.t,
                                 jnp.maximum(ch.tri, 0))
active = ch.hit
position = jnp.where(active[:, None], attrs.position, 0.0)
normal = jnp.where(active[:, None], attrs.normal, 0.0)
mats = shading.gather_materials(scene.materials, attrs.mat_id)
lights = scene.lights
lp = lights.position[:, None, :]
lvec = lp - position[None]
dist = jnp.sqrt(jnp.sum(lvec * lvec, axis=-1))
unit_x = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
ldir = jnp.where(active[None, :, None],
                 lvec / jnp.maximum(dist, 1e-30)[..., None], unit_x)
so3 = jnp.broadcast_to((position + normal * RAY_EPS)[None],
                       ldir.shape)
cos_t = jnp.maximum(jnp.sum(normal[None] * ldir, axis=-1), 0.0)
contributes = (active[None] & (cos_t > 0.0)
               & (mats.mtype != MATERIAL_DIELECTRIC)[None])
stm = jnp.where(contributes, dist - RAY_EPS, -1.0)
so = so3.reshape(-1, 3)
sd = ldir.reshape(-1, 3)
stm = stm.reshape(-1)
ns = so.shape[0]
live = int((np.asarray(stm) >= 0).sum())
emit(probe="shadow_wave", rays=int(ns), live=live)

# Overflow CDF of the worklist conservative cull on this wave (sort=False).
@partial(jax.jit, static_argnames=("cap",))
def overflow_rays(o_, d_, tm_, cap):
    ob, db, tb, _, _ = worklist._prepare_blocks(accel, o_, d_, tm_, 8, False)
    wl = worklist._build_worklist(accel, ob, db, tb, 1e-3, cap, 4, 6,
                                  1 << 13, 1024)
    liveb = tb.max(axis=1) >= 0
    return jnp.sum((wl.overflow & liveb).astype(jnp.int32)) * 8

for cap in [64, 128, 192, 256]:
    ov = int(overflow_rays(so, sd, stm, cap))
    emit(probe="shadow_overflow", cap=cap, overflow_rays=ov)

# Timed worklist anyhit at candidate configs on the REAL wave.
def timeit(fn):
    t0 = time.perf_counter(); out = fn(); jax.block_until_ready(out)
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3): out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 3, cs

for tag, kw in [
    ("c128/fc13", dict(cap=128, item_budget=10, fallback_compact=1 << 13)),
    ("c192/fc13", dict(cap=192, item_budget=14, fallback_compact=1 << 13)),
]:
    dt, cs = timeit(lambda: worklist.any_hit_worklist(
        accel, so, sd, 1e-3, stm, sort=False, **kw))
    emit(probe="shadow_wl", tag=tag, ms=round(dt*1e3, 1),
         mrays_live=round(live/dt/1e6, 2), compile_s=round(cs, 1))

# packets reference on the same wave
from path_tracer_ai_tpu.accel import traverse
dt, cs = timeit(lambda: traverse.any_hit_packets(
    accel, so, sd, 1e-3, stm, block_size=64))
emit(probe="shadow_pkt", ms=round(dt*1e3, 1),
     mrays_live=round(live/dt/1e6, 2), compile_s=round(cs, 1))
log("probe L complete")
