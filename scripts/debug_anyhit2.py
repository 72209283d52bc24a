"""Localize the b16_g2 any_hit_packets permutation bug."""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel import traverse
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

tris = scene.triangles
occ_ref = []
for s in range(0, N, 512):
    h = moller_trumbore(osh_j[s:s+512], dsh_j[s:s+512],
                        tris.v0, tris.v1, tris.v2, RAY_TMIN, tsh_j[s:s+512])
    occ_ref.append(jnp.any(h.valid, axis=1))
occ_ref = np.asarray(jnp.concatenate(occ_ref)) & (tsh >= 0)

BS, GS = 16, 2


def run(**kw):
    occ = np.asarray(traverse.any_hit_packets(
        accel, osh_j, dsh_j, RAY_TMIN, tsh_j, block_size=BS, group_size=GS,
        **kw))
    mm = int((occ != occ_ref).sum())
    return occ, mm


occ1, mm1 = run()
print("jit sorted:", mm1)

with jax.disable_jit():
    occ2, mm2 = run()
print("eager sorted:", mm2)

# cascade with min_blocks huge => single stage, no compaction
orig_cascade = traverse._cascade_traverse


def cascade_nocompact(block_arrays, carry, sweep_update, active_fn,
                      min_blocks=32):
    return orig_cascade(block_arrays, carry, sweep_update, active_fn,
                        min_blocks=1 << 30)


traverse._cascade_traverse = cascade_nocompact
occ3, mm3 = run()
print("jit sorted, no-compaction cascade:", mm3)
traverse._cascade_traverse = orig_cascade

# which blocks (in SORTED order) hold mismatched rays?
keys = traverse._sort_keys(accel, osh_j, dsh_j, tsh_j, mode="dir")
perm = np.asarray(jnp.argsort(keys))
inv = np.empty_like(perm)
inv[perm] = np.arange(N)
bad = np.nonzero(occ1 != occ_ref)[0]
bad_sorted_pos = inv[bad]
bad_blocks = np.unique(bad_sorted_pos // BS)
print("mismatched rays:", len(bad), "in", len(bad_blocks), "sorted blocks")
print("block ids:", bad_blocks[:40])
nb = N // BS
print("nb =", nb)

# structural analysis: compare sorted-order results vs sorted-order ref
occ_sorted = occ1[perm]
ref_sorted = occ_ref[perm]
mm = occ_sorted != ref_sorted
print("mismatch in sorted order:", mm.sum())
for shift in [-4, -2, -1, 1, 2, 4]:
    print(f"shift {shift}: mismatch vs ref rolled =",
          int((occ_sorted != np.roll(ref_sorted, shift)).sum()))
# within-pair swap (g=2 lanes)?
sw = ref_sorted.reshape(-1, 2)[:, ::-1].reshape(-1)
print("pair-swapped ref mismatch:", int((occ_sorted != sw).sum()))
# first mismatching sorted positions
pos = np.nonzero(mm)[0]
print("first mismatch positions:", pos[:30])
print("positions mod 16:", np.unique(pos % 16, return_counts=True))
