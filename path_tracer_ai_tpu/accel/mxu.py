"""Möller–Trumbore as a matmul: per-ray features x per-triangle matrix.

The worklist sweep's elementwise MT runs on the VPU (~29 G tests/s measured
on v5e). The MXU (the systolic array, where the chip's FLOPs live) needs the
intersection test shaped as a matrix product. MT decomposes exactly:

    a     = -d . N                          with N = e1 x e2
    u_num = (o x d) . e2 - d . (e2 x v0)
    v_num = -(o x d) . e1 + d . (e1 x v0)
    t_num = o . N - v0 . N
    u = u_num / a,  v = v_num / a,  t = t_num / a   (same guards as MT)

so all four quantities are ONE dot of the per-ray feature vector

    G = [d, o x d, o, 1]            (10 floats, ray-only)

with a per-triangle coefficient matrix W [10, 4] (triangle-only). A block of
rays against a cluster of triangles is then [B, 10] @ [10, S*4] — MXU food.
Algebraically identical to MT, but the rearranged terms round differently
(measured <~5e-4 relative in cancellation-prone cases), so this intersector
is an OPT-IN fast path: the default stays the elementwise sweep that agrees
bitwise with the brute-force oracle. Role: the RT-core fixed-function
intersector (optix_kernels.cu:101-114), TPU-style.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from path_tracer_ai_tpu.accel.clusters import ClusterAccel
from path_tracer_ai_tpu.core.types import MT_EPSILON


def build_linear_table(accel: ClusterAccel) -> jnp.ndarray:
    """Per-cluster coefficient matrices W: [C, 10, S, 4] float32.

    Cheap enough (40 flops/triangle) to build inside the traversal jit —
    XLA hoists it to a constant-like subgraph per accel operand.
    """
    v0, e1, e2 = accel.v0, accel.e1, accel.e2        # [C, S, 3]
    n = jnp.cross(e1, e2)
    e2xv0 = jnp.cross(e2, v0)
    e1xv0 = jnp.cross(e1, v0)
    c, s, _ = v0.shape
    w = jnp.zeros((c, s, 10, 4), jnp.float32)
    w = w.at[..., 0:3, 0].set(-n)                    # a:      d . (-N)
    w = w.at[..., 0:3, 1].set(-e2xv0)                # u_num:  d . -(e2 x v0)
    w = w.at[..., 3:6, 1].set(e2)                    #        (o x d) . e2
    w = w.at[..., 0:3, 2].set(e1xv0)                 # v_num:  d . (e1 x v0)
    w = w.at[..., 3:6, 2].set(-e1)                   #        (o x d) . -e1
    w = w.at[..., 6:9, 3].set(n)                     # t_num:  o . N
    w = w.at[..., 9, 3].set(-jnp.sum(v0 * n, axis=-1))
    return jnp.transpose(w, (0, 2, 1, 3))            # [C, 10, S, 4]


def ray_features(o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] x2 -> [..., 10] feature vectors G = [d, o x d, o, 1]."""
    return jnp.concatenate(
        [d, jnp.cross(o, d), o, jnp.ones(o.shape[:-1] + (1,), o.dtype)],
        axis=-1,
    )


def mxu_sweep(g_feat, wg, t_min, t_max_blk, precision="highest"):
    """Dense intersection via batched matmul.

    g_feat: [I, B, 10] ray features; wg: [I, 10, K, 4] gathered cluster
    coefficient tables (K = group * S triangles); t_max_blk: [I, B].
    Returns (t [I, B, K] inf where invalid, ok mask) — the same contract as
    traverse._mt_sweep.

    precision: TPU MXU matmul precision. The MXU natively multiplies in
    bfloat16 (8 mantissa bits — relative error ~4e-3, which punches visible
    cracks through shared triangle edges), so the DEFAULT jax precision is
    NOT usable for intersection; "highest" (fp32-exact via multi-pass
    decomposition) is the production setting, "high" (bf16x3) a measured
    compromise, "default" exposed only for probing.
    """
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[precision]
    q = jnp.einsum(
        "ibf,ifkq->ibkq", g_feat, wg,
        preferred_element_type=jnp.float32, precision=prec,
    )                                                # [I, B, K, 4]
    a = q[..., 0]
    ok = jnp.abs(a) > MT_EPSILON
    f = 1.0 / jnp.where(ok, a, 1.0)
    u = q[..., 1] * f
    v = q[..., 2] * f
    t = q[..., 3] * f
    ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    ok &= (t >= t_min) & (t <= t_max_blk[:, :, None])
    return jnp.where(ok, t, jnp.inf), ok
