"""Morph the failing jitted any_hit path toward the passing isolation."""
import sys
from functools import partial

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel import traverse
from path_tracer_ai_tpu.accel.traverse import (_block_candidates,
                                               _cascade_traverse, _mt_sweep,
                                               _unpermute_blocks)
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

keys = traverse._sort_keys(accel, jnp.asarray(osh), jnp.asarray(dsh),
                           jnp.asarray(tsh), mode="dir")
perm = np.asarray(jnp.argsort(keys))
o = jnp.asarray(osh[perm])
d = jnp.asarray(dsh[perm])
tm = jnp.asarray(tsh[perm])

tris = scene.triangles
occ_ref = []
for s in range(0, N, 512):
    h = moller_trumbore(o[s:s+512], d[s:s+512],
                        tris.v0, tris.v1, tris.v2, RAY_TMIN, tm[s:s+512])
    occ_ref.append(jnp.any(h.valid, axis=1))
occ_ref = np.asarray(jnp.concatenate(occ_ref)) & (np.asarray(tm) >= 0)

BS, G = 16, 2
nb = N // BS
c = accel.num_clusters
c_pad = -(-c // G) * G
max_k = c_pad // G - 1


@partial(jax.jit, static_argnames=("variant",))
def anyhit_local(accel, origins, directions, t_max, variant,
                 order=None, n_cand=None):
    o_blk = origins.reshape(nb, BS, 3)
    d_blk = directions.reshape(nb, BS, 3)
    tmax_blk = t_max.reshape(nb, BS)
    if order is None:
        order, n_cand, _entry = _block_candidates(accel, o_blk, d_blk,
                                                  tmax_blk)
    if c_pad - c:
        order = jnp.pad(order, ((0, 0), (0, c_pad - c)))
    order_g = order.reshape(nb, c_pad // G, G)

    def active_fn(k, blocks, carry):
        nc = blocks[3]
        occ = carry[0]
        return (k * G < nc) & ~jnp.all(occ, axis=1)

    def sweep_update(k, blocks, carry):
        ob, db, tb, nc, ordg = blocks
        (occ,) = carry
        size = ob.shape[0]
        cid = ordg[:, jnp.minimum(k, max_k)]
        blk_on = (k * G < nc) & ~jnp.all(occ, axis=1)
        cv0 = accel.v0[cid].reshape(size, -1, 3)
        ce1 = accel.e1[cid].reshape(size, -1, 3)
        ce2 = accel.e2[cid].reshape(size, -1, 3)
        _, ok = _mt_sweep(ob, db, cv0, ce1, ce2, RAY_TMIN, tb)
        occ = occ | (blk_on[:, None] & jnp.any(ok, axis=-1))
        return (occ,)

    if variant == "naive":
        def cond(state):
            k, occ = state
            return jnp.sum(active_fn(k, (o_blk, d_blk, tmax_blk, n_cand,
                                         order_g), (occ,))) > 0

        def body(state):
            k, occ = state
            (occ,) = sweep_update(k, (o_blk, d_blk, tmax_blk, n_cand,
                                      order_g), (occ,))
            return k + 1, occ

        _, occ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((nb, BS), bool)))
        return occ.reshape(-1)

    mb = 1 << 30 if variant == "nocompact" else 32
    carry, blk_index = _cascade_traverse(
        (o_blk, d_blk, tmax_blk, n_cand, order_g),
        (jnp.zeros((nb, BS), bool),),
        sweep_update, active_fn, min_blocks=mb)
    occ = _unpermute_blocks(carry[0], blk_index)
    return occ.reshape(-1)


# eager candidates for the fed variants
o_blk = o.reshape(nb, BS, 3)
d_blk = d.reshape(nb, BS, 3)
tm_blk = tm.reshape(nb, BS)
with jax.disable_jit():
    order_e, ncand_e, _ = _block_candidates(accel, o_blk, d_blk, tm_blk)

for variant in ["naive", "nocompact", "cascade"]:
    for fed in [False, True]:
        kw = dict(order=order_e, n_cand=ncand_e) if fed else {}
        occ = np.asarray(anyhit_local(accel, o, d, tm, variant, **kw))
        print(f"variant={variant} fed_candidates={fed}: "
              f"mismatch={int((occ != occ_ref).sum())}")

# --- instrumented cascade: recover blk_index + raw carry -------------------
with jax.disable_jit():
    occ_eager = np.asarray(anyhit_local.__wrapped__(
        accel, o, d, tm, "cascade", order=order_e, n_cand=ncand_e))
print("cascade EAGER mismatch:", int((occ_eager != occ_ref).sum()))


@partial(jax.jit, static_argnames=("as_int",))
def cascade_raw(accel, origins, directions, t_max, order, n_cand,
                as_int=False):
    o_blk = origins.reshape(nb, BS, 3)
    d_blk = directions.reshape(nb, BS, 3)
    tmax_blk = t_max.reshape(nb, BS)
    op = jnp.pad(order, ((0, 0), (0, c_pad - c))) if c_pad - c else order
    order_g = op.reshape(nb, c_pad // G, G)

    def active_fn(k, blocks, carry):
        nc = blocks[3]
        occ = carry[0]
        occb = occ != 0 if occ.dtype != jnp.bool_ else occ
        return (k * G < nc) & ~jnp.all(occb, axis=1)

    def sweep_update(k, blocks, carry):
        ob, db, tb, nc, ordg = blocks
        (occ,) = carry
        occb = occ != 0 if occ.dtype != jnp.bool_ else occ
        size = ob.shape[0]
        cid = ordg[:, jnp.minimum(k, max_k)]
        blk_on = (k * G < nc) & ~jnp.all(occb, axis=1)
        cv0 = accel.v0[cid].reshape(size, -1, 3)
        ce1 = accel.e1[cid].reshape(size, -1, 3)
        ce2 = accel.e2[cid].reshape(size, -1, 3)
        _, ok = _mt_sweep(ob, db, cv0, ce1, ce2, RAY_TMIN, tb)
        new = occb | (blk_on[:, None] & jnp.any(ok, axis=-1))
        return (new.astype(occ.dtype),)

    init = jnp.zeros((nb, BS), jnp.int32 if as_int else bool)
    carry, blk_index = _cascade_traverse(
        (o_blk, d_blk, tmax_blk, n_cand, order_g),
        (init,), sweep_update, active_fn, min_blocks=32)
    return carry[0], blk_index


for as_int in [False, True]:
    raw, bidx = cascade_raw(accel, o, d, tm, order_e, ncand_e, as_int)
    raw = np.asarray(raw)
    bidx = np.asarray(bidx)
    valid_perm = (np.sort(bidx) == np.arange(nb)).all()
    un = np.empty_like(raw)
    un[bidx] = raw           # out[orig] = raw[i]
    occ_j = (un != 0).reshape(-1)
    print(f"as_int={as_int}: blk_index valid perm: {valid_perm}, "
          f"mismatch after manual unpermute: {int((occ_j != occ_ref).sum())}")
