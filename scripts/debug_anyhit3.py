"""Bisect jit-vs-eager divergence: candidates stage vs sweep stage."""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel import traverse
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

BS = 16
nb = N // BS

# sort exactly as any_hit_packets does (eagerly; deterministic either way)
keys = traverse._sort_keys(accel, osh_j, dsh_j, tsh_j, mode="dir")
perm = jnp.argsort(keys).astype(jnp.int32)
o = osh_j[perm]
d = dsh_j[perm]
tm = tsh_j[perm]
o_blk = o.reshape(nb, BS, 3)
d_blk = d.reshape(nb, BS, 3)
tm_blk = tm.reshape(nb, BS)

# --- stage 1: _block_candidates jit vs eager -------------------------------
bc_jit = jax.jit(traverse._block_candidates)
order_j, ncand_j, ent_j = bc_jit(accel, o_blk, d_blk, tm_blk)
with jax.disable_jit():
    order_e, ncand_e, ent_e = traverse._block_candidates(
        accel, o_blk, d_blk, tm_blk)
print("n_cand equal:", bool(jnp.array_equal(ncand_j, ncand_e)),
      "order equal:", bool(jnp.array_equal(order_j, order_e)),
      "entry equal:", bool(jnp.array_equal(ent_j, ent_e)))
diffb = np.nonzero(np.asarray(ncand_j) != np.asarray(ncand_e))[0]
print("blocks with differing n_cand:", len(diffb), diffb[:10])
if len(diffb):
    b = int(diffb[0])
    print("block", b, "ncand jit", int(ncand_j[b]), "eager", int(ncand_e[b]))

# as candidate SETS (order may tie-differ legitimately):
oj = np.asarray(order_j)
oe = np.asarray(order_e)
ncj = np.asarray(ncand_j)
nce = np.asarray(ncand_e)
setdiff = 0
for b in range(nb):
    sj = set(oj[b, :ncj[b]].tolist())
    se = set(oe[b, :nce[b]].tolist())
    if sj != se:
        setdiff += 1
print("blocks where candidate SET differs:", setdiff)

# --- stage 2: sweep given identical (eager) candidates ---------------------
# run the g2 sweep jitted on the eager candidate lists vs eagerly
g = 2
c = accel.num_clusters
c_pad = -(-c // g) * g
order_pad = jnp.pad(order_e, ((0, 0), (0, c_pad - c)))
order_g = order_pad.reshape(nb, c_pad // g, g)
max_k = c_pad // g - 1


def sweep(o_blk, d_blk, tm_blk, n_cand, order_g):
    def body(carry):
        k, occ = carry
        cid = order_g[:, jnp.minimum(k, max_k)]
        blk_on = (k * g < n_cand) & ~jnp.all(occ, axis=1)
        cv0 = accel.v0[cid].reshape(nb, -1, 3)
        ce1 = accel.e1[cid].reshape(nb, -1, 3)
        ce2 = accel.e2[cid].reshape(nb, -1, 3)
        _, ok = traverse._mt_sweep(o_blk, d_blk, cv0, ce1, ce2, RAY_TMIN,
                                   tm_blk)
        occ = occ | (blk_on[:, None] & jnp.any(ok, axis=-1))
        return k + 1, occ

    def cond(carry):
        k, occ = carry
        return jnp.any((k * g < n_cand) & ~jnp.all(occ, axis=1))

    _, occ = jax.lax.while_loop(cond, body, (jnp.int32(0),
                                             jnp.zeros((nb, BS), bool)))
    return occ


occ_sweep_jit = jax.jit(sweep)(o_blk, d_blk, tm_blk, ncand_e, order_g)
with jax.disable_jit():
    occ_sweep_eager = sweep(o_blk, d_blk, tm_blk, ncand_e, order_g)
mm = int(jnp.sum(occ_sweep_jit != occ_sweep_eager))
print("sweep jit vs eager mismatch (same candidates):", mm)

# --- stage 3: full any_hit_packets on PRE-SORTED rays, sort=False ----------
occ_ns = traverse.any_hit_packets(accel, o, d, RAY_TMIN, tm,
                                  block_size=BS, group_size=g, sort=False)
# brute reference on sorted rays
from path_tracer_ai_tpu.core.geometry import moller_trumbore
tris = scene.triangles
occ_ref_s = []
for s in range(0, N, 512):
    h = moller_trumbore(o[s:s+512], d[s:s+512],
                        tris.v0, tris.v1, tris.v2, RAY_TMIN, tm[s:s+512])
    occ_ref_s.append(jnp.any(h.valid, axis=1))
occ_ref_s = np.asarray(jnp.concatenate(occ_ref_s)) & (np.asarray(tm) >= 0)
print("presorted sort=False mismatch:", int((np.asarray(occ_ns) != occ_ref_s).sum()))

# --- stage 4: full jitted path with sort=True on original rays, then compare
occ_s = traverse.any_hit_packets(accel, osh_j, dsh_j, RAY_TMIN, tsh_j,
                                 block_size=BS, group_size=g, sort=True)
occ_s = np.asarray(occ_s)
occ_ref_o = np.zeros(N, bool)
occ_ref_o[np.asarray(perm)] = occ_ref_s
print("sort=True mismatch:", int((occ_s != occ_ref_o).sum()))
