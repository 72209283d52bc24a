import json, sys, time
sys.path.insert(0, "/root/repo")
def emit(**kw): print(json.dumps(kw), flush=True)
def log(*a): print(*a, file=sys.stderr, flush=True)
import jax, numpy as np
emit(probe="devices", platform=jax.devices()[0].platform)
from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel.clusters import build_clusters
from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.engine import wavefront
from path_tracer_ai_tpu.scene.camera import default_camera
scene, _ = _demo_scene(subdivisions=6)
accel = build_clusters(scene.triangles, cluster_size=128)
camera = default_camera()
settings = RenderSettings(width=1920, height=1080, samples_per_pixel=2,
                          max_bounces=5, seed=0)
t0 = time.perf_counter()
wavefront.render(scene, camera, settings.replace(samples_per_pixel=2),
                 accel=accel, block_size=64, wave_size=1 << 20)
log(f"warmup {time.perf_counter()-t0:.1f}s")
stats = wavefront.RenderStats()
t0 = time.perf_counter()
img = wavefront.render(scene, camera, settings, accel=accel, stats=stats,
                       block_size=64, wave_size=1 << 20)
wall = time.perf_counter() - t0
assert np.isfinite(img).all()
emit(probe="render", tag="default/liveprefix+smallfc",
     wall_s=round(wall, 2), mrays=round(stats.mrays_per_s, 3))
# spp=8 variant: closer to production spp, amortizes per-wave host overheads
settings8 = settings.replace(samples_per_pixel=8)
stats = wavefront.RenderStats()
t0 = time.perf_counter()
img = wavefront.render(scene, camera, settings8, accel=accel, stats=stats,
                       block_size=64, wave_size=1 << 20)
wall = time.perf_counter() - t0
assert np.isfinite(img).all()
emit(probe="render", tag="spp8", wall_s=round(wall, 2),
     mrays=round(stats.mrays_per_s, 3))
log("probe K complete")
