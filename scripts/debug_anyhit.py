"""Isolate the any_hit_packets mismatch at small (block, group) combos."""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel import traverse
from path_tracer_ai_tpu.accel.clusters import build_clusters
from path_tracer_ai_tpu.core.geometry import moller_trumbore
from path_tracer_ai_tpu.core.types import RAY_TMIN
from path_tracer_ai_tpu.scene.scene import DEFAULT_LIGHTS

host = {}
scene, accel = _demo_scene(subdivisions=3, host_out=host)
rng = np.random.default_rng(0)
N = 1 << 12
tv0 = np.asarray(host["tris"].v0)
ntri = tv0.shape[0]

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
osh_j, dsh_j, tsh_j = jnp.asarray(osh), jnp.asarray(dsh), jnp.asarray(tsh)

# brute-force reference occlusion
tris = scene.triangles


def brute_chunk(o, d, tm):
    hits = moller_trumbore(
        o, d,
        tris.v0, tris.v1, tris.v2,
        RAY_TMIN, tm,
    )
    return jnp.any(hits.valid, axis=1)


occ_ref = []
for s in range(0, N, 512):
    occ_ref.append(brute_chunk(osh_j[s:s+512], dsh_j[s:s+512],
                               tsh_j[s:s+512]))
occ_ref = np.asarray(jnp.concatenate(occ_ref))
occ_ref = occ_ref & (tsh >= 0)
print("brute occluded:", occ_ref.sum())

for bs, gs, mode in [(64, 8, "dir"), (16, 2, "dir"), (32, 2, "octorig"),
                     (16, 4, "dir"), (16, 2, "octorig")]:
    occ = np.asarray(traverse.any_hit_packets(
        accel, osh_j, dsh_j, RAY_TMIN, tsh_j, block_size=bs, group_size=gs,
        sort_mode=mode))
    extra = int((occ & ~occ_ref).sum())
    missing = int((~occ & occ_ref).sum())
    print(f"b{bs}_g{gs}_{mode}: mismatch={int((occ != occ_ref).sum())} "
          f"(false-occluded={extra}, missed={missing})")
