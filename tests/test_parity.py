"""Statistical parity: JAX oracle vs the independent scalar NumPy port.

Both implementations are unbiased estimators of the same recursive radiance
integral (reference renderer.hpp semantics), with different RNG streams.
Monte-Carlo means over many samples must agree within noise (SURVEY.md §4
"compare ... at equal spp within MC noise"). This is the test that would
catch any estimator/BRDF/termination divergence between the rebuild and the
reference semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from path_tracer_ai_tpu.core.types import (
    MATERIAL_DIELECTRIC,
    MATERIAL_DIFFUSE,
    MATERIAL_SPECULAR,
    Lights,
)
from path_tracer_ai_tpu.engine import oracle
from path_tracer_ai_tpu.scene.scene import HostMaterial, build_scene_from_arrays

from tests import ref_impl


def make_box_scene():
    """Small three-wall box with diffuse walls, a specular panel and a
    dielectric panel, lit by two point lights."""
    tris = []  # (v0, v1, v2, n, mat)
    # floor y=0
    tris.append(([-4, 0, -4], [4, 0, -4], [4, 0, 4], [0, 1, 0], 0))
    tris.append(([-4, 0, -4], [4, 0, 4], [-4, 0, 4], [0, 1, 0], 0))
    # back wall z=-4
    tris.append(([-4, 0, -4], [-4, 6, -4], [4, 6, -4], [0, 0, 1], 0))
    tris.append(([-4, 0, -4], [4, 6, -4], [4, 0, -4], [0, 0, 1], 0))
    # left wall x=-4
    tris.append(([-4, 0, -4], [-4, 0, 4], [-4, 6, 4], [1, 0, 0], 0))
    tris.append(([-4, 0, -4], [-4, 6, 4], [-4, 6, -4], [1, 0, 0], 0))
    # specular panel (tilted, right side)
    tris.append(([1, 0, -1], [3, 0, -2], [2, 3, -1.5], [-0.6, 0.2, 0.77], 1))
    # dielectric panel (front-left, oblique)
    tris.append(([-2, 0.5, 1], [0, 0.5, 1], [-1, 2.5, 1.3], [0.1, -0.15, -0.98], 2))

    mats = [
        HostMaterial(mtype=MATERIAL_DIFFUSE, albedo=(0.8, 0.7, 0.6), roughness=0.9),
        HostMaterial(mtype=MATERIAL_SPECULAR, albedo=(0.9, 0.9, 0.5), roughness=0.25),
        HostMaterial(mtype=MATERIAL_DIELECTRIC, albedo=(1, 1, 1), ior=1.5),
    ]
    lights = Lights(
        position=jnp.asarray([[2.0, 4.0, 2.0], [-2.0, 3.0, 3.0]], jnp.float32),
        color=jnp.asarray([[1.0, 0.95, 0.8], [0.7, 0.8, 1.0]], jnp.float32),
        intensity=jnp.asarray([8.0, 3.0], jnp.float32),
    )

    def col(i):
        return [t[i] for t in tris]

    n = col(3)
    uv = [[0, 0]] * len(tris)
    scene = build_scene_from_arrays(
        col(0), col(1), col(2), n, n, n, uv, uv, uv, col(4),
        materials=mats, lights=lights,
    )
    return scene


RAYS = [
    ((0.0, 2.0, 5.0), (0.0, -0.35, -1.0)),   # hits floor near wall
    ((0.0, 2.0, 5.0), (0.35, -0.1, -1.0)),   # toward specular panel
    ((0.0, 2.0, 5.0), (-0.25, -0.12, -0.9)),  # through dielectric panel
    ((0.0, 2.0, 5.0), (-0.4, 0.3, -1.0)),    # upper left wall
]


@pytest.mark.parametrize("ray_idx", range(len(RAYS)))
def test_mean_radiance_matches_scalar_reference(ray_idx):
    scene = make_box_scene()
    ref = ref_impl.scene_from_jax(scene)
    o, d = RAYS[ray_idx]
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    d = d / np.linalg.norm(d)
    max_bounces = 3

    # JAX estimate: large batch of independent sample streams
    n_jax = 6000
    keys = jax.random.split(jax.random.key(ray_idx + 1), n_jax)
    oj = jnp.broadcast_to(jnp.asarray(o, jnp.float32), (n_jax, 3))
    dj = jnp.broadcast_to(jnp.asarray(d, jnp.float32), (n_jax, 3))
    L, valid = oracle.trace_paths(scene, oj, dj, keys, max_bounces)
    L = np.asarray(L)
    v = np.asarray(valid)
    jax_mean = L[v].mean(axis=0)
    jax_se = L[v].std(axis=0) / np.sqrt(v.sum())

    # Scalar reference estimate
    rng = np.random.default_rng(1000 + ray_idx)
    n_ref = 900
    acc = np.zeros(3)
    cnt = 0
    for _ in range(n_ref):
        s = ref_impl.trace_path(ref, o, d, 0, max_bounces, rng)
        if np.all(np.isfinite(s)):
            acc += s
            cnt += 1
    ref_mean = acc / cnt
    ref_se = 0.0
    # rough SE for the scalar side from a second pass estimate of variance
    acc2 = np.zeros(3)
    rng2 = np.random.default_rng(5000 + ray_idx)
    samples = []
    for _ in range(300):
        s = ref_impl.trace_path(ref, o, d, 0, max_bounces, rng2)
        if np.all(np.isfinite(s)):
            samples.append(s)
    ref_se = np.std(samples, axis=0) / np.sqrt(n_ref)

    tol = 5.0 * (jax_se + ref_se) + 5e-3
    assert np.all(np.abs(jax_mean - ref_mean) < tol), (
        f"ray {ray_idx}: jax {jax_mean} vs ref {ref_mean} "
        f"(tol {tol}, se_jax {jax_se}, se_ref {ref_se})"
    )
