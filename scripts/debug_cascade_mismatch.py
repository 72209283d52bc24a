"""Isolate probe L's big-scene cascade image mismatch (CPU, interpret).

Probe L smoke: worklist vs (cascade_fused closest + packets_fused
early_skip+sub_skip shadow) images differ on the 5128-tri / 41-cluster
scene. Small-scene tests pass, so the bug is scale-dependent. This
script wave-level A/Bs each fused function against its exact XLA
reference on the big accel to pinpoint which lever breaks.

Usage: python scripts/debug_cascade_mismatch.py
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel import ctiles, traverse
from path_tracer_ai_tpu.accel.pallas_anyhit import any_hit_fused
from path_tracer_ai_tpu.accel.pallas_closest import closest_hit_fused


def emit(**kw):
    print(json.dumps(kw), flush=True)


host = {}
scene, accel = _demo_scene(subdivisions=4, host_out=host)
emit(probe="scene", tris=int(scene.triangles.count),
     clusters=accel.num_clusters)

rng = np.random.default_rng(7)
N = 4096
# Rays spanning the scene: origins inside the room volume, random dirs,
# mixed t_max incl. dead lanes — the same recipe the unit tests use, but
# on the 41-cluster accel.
o = rng.uniform(-4.0, 4.0, (N, 3)).astype(np.float32)
o[:, 1] = rng.uniform(0.0, 4.0, N).astype(np.float32)
d = rng.normal(size=(N, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
t_max = np.full(N, 1e30, np.float32)
t_max[::7] = rng.uniform(0.5, 5.0, len(t_max[::7])).astype(np.float32)
t_max[::13] = -1.0  # dead lanes
o = jnp.asarray(o)
d = jnp.asarray(d)
t_max = jnp.asarray(t_max)

# --- closest: cascade_fused vs ctiles (exact reference) ---
ref = ctiles.closest_hit_ctiles(accel, o, d, 1e-3, t_max, use_pallas=False)
for tag, kw in [
    ("fused_sub", dict(sub_skip=True)),
    ("fused_nosub", dict(sub_skip=False)),
    ("fused_nosort", dict(sub_skip=True, sort=False)),
]:
    got = closest_hit_fused(accel, o, d, 1e-3, t_max, interpret=True, **kw)
    mt = int(jnp.sum(got.t != ref.t))
    mi = int(jnp.sum(got.tri != ref.tri))
    emit(probe="closest", config=tag, mismatch_t=mt, mismatch_tri=mi)
    if mt or mi:
        bad = np.nonzero(np.asarray(got.t != ref.t) | np.asarray(got.tri != ref.tri))[0]
        emit(probe="closest_bad", config=tag, n_bad=len(bad),
             first=[int(b) for b in bad[:8]],
             ref_t=[float(x) for x in np.asarray(ref.t)[bad[:4]]],
             got_t=[float(x) for x in np.asarray(got.t)[bad[:4]]],
             ref_tri=[int(x) for x in np.asarray(ref.tri)[bad[:4]]],
             got_tri=[int(x) for x in np.asarray(got.tri)[bad[:4]]])

# --- shadow: any_hit_fused vs packets (exact reference) ---
ref_occ = traverse.any_hit_packets(accel, o, d, 1e-3, t_max)
for tag, kw in [
    ("fused", dict()),
    ("fused_skip", dict(early_skip=True)),
    ("fused_skip_sub", dict(early_skip=True, sub_skip=True)),
    ("fused_nosort", dict(early_skip=True, sub_skip=True, sort=False)),
]:
    got = any_hit_fused(accel, o, d, 1e-3, t_max, interpret=True, **kw)
    mm = int(jnp.sum(got != ref_occ))
    emit(probe="shadow", config=tag, mismatch=mm)
    if mm:
        bad = np.nonzero(np.asarray(got != ref_occ))[0]
        emit(probe="shadow_bad", config=tag, n_bad=len(bad),
             first=[int(b) for b in bad[:8]])

print("debug complete", file=sys.stderr)
