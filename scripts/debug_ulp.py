"""Pin down the 1-ulp t divergence between _mt_rows (fused kernels) and
_mt_sweep (XLA reference) on the big-scene mismatch rays.

Same triangle, same ray, t off by 1 ulp => either the two formulas
compile differently (XLA contraction is context-dependent) or an input
representation differs. Compute the SAME (ray, tri) through both
standalone and compare bits.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _demo_scene
from path_tracer_ai_tpu.accel import ctiles, traverse
from path_tracer_ai_tpu.accel import pallas_ctiles as pc
from path_tracer_ai_tpu.core import geometry

host = {}
scene, accel = _demo_scene(subdivisions=4, host_out=host)

rng = np.random.default_rng(7)
N = 4096
o = rng.uniform(-4.0, 4.0, (N, 3)).astype(np.float32)
o[:, 1] = rng.uniform(0.0, 4.0, N).astype(np.float32)
d = rng.normal(size=(N, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)

ray = 155
# Find tri 3268's (cluster, slot) in the accel
tid = np.asarray(accel.tri_id)
cl, sl = [int(x[0]) for x in np.nonzero(tid == 3268)]
print("tri 3268 at cluster", cl, "slot", sl)

ox = jnp.asarray(o[ray])
dx = jnp.asarray(d[ray])

# 1. scalar geometry reference
t1 = geometry.moller_trumbore(
    ox, dx,
    accel.v0[cl, sl], accel.v0[cl, sl] + accel.e1[cl, sl],
    accel.v0[cl, sl] + accel.e2[cl, sl], 1e-3, 1e30)
print("geometry:", [np.float32(x).item() if hasattr(x, 'item') else x for x in np.asarray(t1, dtype=object).ravel()[:3]] if hasattr(t1, 'ravel') else t1)

# 2. _mt_sweep dense [1,1,S] over the whole cluster
ob = ox[None, None, :]
db = dx[None, None, :]
tt, ok = traverse._mt_sweep(
    ob, db, accel.v0[cl][None], accel.e1[cl][None], accel.e2[cl][None],
    1e-3, jnp.full((1, 1), 1e30))
t_sweep = np.asarray(tt)[0, 0, sl]
print("mt_sweep  t:", repr(t_sweep), hex(np.float32(t_sweep).view(np.int32)))

# 3. _mt_rows on the packed representation (as the fused kernel sees it)
pack = pc.pack_tris(accel)          # [C, 16, S]
trit = pack[cl].T                    # [S, 16]
oxr = jnp.full((1, 1), o[ray, 0])
oyr = jnp.full((1, 1), o[ray, 1])
ozr = jnp.full((1, 1), o[ray, 2])
dxr = jnp.full((1, 1), d[ray, 0])
dyr = jnp.full((1, 1), d[ray, 1])
dzr = jnp.full((1, 1), d[ray, 2])
tmin = jnp.full((1, 1), 1e-3)
tmax = jnp.full((1, 1), 1e30)
best, tri_min = pc._mt_rows(trit[sl:sl + 1, :], oxr, oyr, ozr,
                            dxr, dyr, dzr, tmin, tmax)
t_rows = np.asarray(best)[0, 0]
print("mt_rows   t:", repr(t_rows), hex(np.float32(t_rows).view(np.int32)))

# 4. pack roundtrip check: does the pack alter v0/e1/e2 bits?
same = (np.array_equal(np.asarray(pack[cl, 0:3, sl]), np.asarray(accel.v0[cl, sl]))
        and np.array_equal(np.asarray(pack[cl, 3:6, sl]), np.asarray(accel.e1[cl, sl]))
        and np.array_equal(np.asarray(pack[cl, 6:9, sl]), np.asarray(accel.e2[cl, sl])))
print("pack bits identical:", same)

# 5. whole-cluster _mt_rows (row-slice context as the kernel uses)
best_c, _ = pc._mt_rows(trit, oxr, oyr, ozr, dxr, dyr, dzr, tmin, tmax)
print("mt_rows cluster-best:", repr(np.asarray(best_c)[0, 0]))
print("mt_sweep cluster-best:", repr(np.asarray(tt)[0, 0].min()))

# 6. shape-context dependence: same _mt_sweep, same values, bigger batch
S = accel.v0.shape[1]
B, R = 16, 128
ob2 = jnp.zeros((B, R, 3), jnp.float32).at[0, 0].set(ox)
db2 = jnp.ones((B, R, 3), jnp.float32).at[0, 0].set(dx)
cv0 = jnp.broadcast_to(accel.v0[cl][None], (B, S, 3))
ce1 = jnp.broadcast_to(accel.e1[cl][None], (B, S, 3))
ce2 = jnp.broadcast_to(accel.e2[cl][None], (B, S, 3))
tt2, _ = traverse._mt_sweep(ob2, db2, cv0, ce1, ce2, 1e-3,
                            jnp.full((B, R), 1e30))
t_big = np.asarray(tt2)[0, 0, sl]
print("mt_sweep [16,128,S] t:", repr(t_big), hex(np.float32(t_big).view(np.int32)))

# 7. and inside jit with a consumer (fusion context changes codegen?)
@jax.jit
def f(ob, db, cv0, ce1, ce2):
    tt, _ = traverse._mt_sweep(ob, db, cv0, ce1, ce2, 1e-3,
                               jnp.full((ob.shape[0], ob.shape[1]), 1e30))
    return jnp.min(tt, axis=-1), jnp.argmin(tt, axis=-1)

mn, am = f(ob2, db2, cv0, ce1, ce2)
print("jit min-consumer t:", repr(np.asarray(mn)[0, 0]),
      "slot:", int(np.asarray(am)[0, 0]))
