"""Core SoA data types (pytrees).

TPU-first redesign of the reference's L0 object types (SURVEY.md §1):
- `Ray` (ray.hpp:5-17)            -> plain (origins, directions) arrays; tMin
  is the constant RAY_TMIN=0.001, tMax is carried as a per-ray array where
  needed (shadow rays) instead of a mutable field.
- `Triangle` (triangle.hpp:8-78)  -> TrianglesSoA: [T,3] vertex/normal arrays.
- `Material` (material.hpp:12-18) -> MaterialTable: [M] typed columns.
- `Light` (scene.hpp:21-37)       -> Lights: [L] columns.

Everything is a NamedTuple so it's automatically a JAX pytree and can cross
jit/shard_map boundaries. All float arrays are float32 (matches the reference,
which is float throughout); integer ids are int32.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

# Material type codes (mirror MaterialType, material.hpp:6-10).
MATERIAL_DIFFUSE = 0
MATERIAL_SPECULAR = 1
MATERIAL_DIELECTRIC = 2

# Reference ray epsilon: Ray::tMin default (ray.hpp:8) and the shadow/bounce
# origin offsets (renderer.hpp:169,195,244,274-275).
RAY_TMIN = 1.0e-3
RAY_EPS = 1.0e-3
# Möller–Trumbore determinant epsilon (triangle.hpp:25).
MT_EPSILON = 1.0e-7
# Minimum light distance guard (renderer.hpp:263).
LIGHT_MIN_DIST = 1.0e-4

INF = float(np.inf)


class TrianglesSoA(NamedTuple):
    """Triangle soup in structure-of-arrays layout.

    v0/v1/v2: [T,3] float32 vertex positions
    n0/n1/n2: [T,3] float32 vertex normals (already z-flipped by the loader)
    uv0/uv1/uv2: [T,2] float32 texture coordinates
    mat_id: [T] int32 index into the MaterialTable
    """

    v0: jnp.ndarray
    v1: jnp.ndarray
    v2: jnp.ndarray
    n0: jnp.ndarray
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    mat_id: jnp.ndarray

    @property
    def count(self) -> int:
        return self.v0.shape[0]


class MaterialTable(NamedTuple):
    """Typed material columns (mirrors Material, material.hpp:12-18)."""

    mtype: jnp.ndarray     # [M] int32, MATERIAL_*
    albedo: jnp.ndarray    # [M,3] float32
    roughness: jnp.ndarray  # [M] float32
    metallic: jnp.ndarray  # [M] float32
    ior: jnp.ndarray       # [M] float32

    @property
    def count(self) -> int:
        return self.mtype.shape[0]


class Lights(NamedTuple):
    """Point lights (mirrors Light, scene.hpp:21-37)."""

    position: jnp.ndarray   # [L,3] float32
    color: jnp.ndarray      # [L,3] float32
    intensity: jnp.ndarray  # [L] float32

    @property
    def count(self) -> int:
        return self.position.shape[0]


class SceneData(NamedTuple):
    """Complete device-resident scene (mirrors Scene, scene.hpp:39-115).

    The BVH/cluster acceleration structure is carried separately (see
    path_tracer_ai_tpu.accel) because the oracle engine does not need one.
    """

    triangles: TrianglesSoA
    materials: MaterialTable
    lights: Lights


def triangles_from_numpy(
    v0, v1, v2, n0, n1, n2, uv0, uv1, uv2, mat_id
) -> TrianglesSoA:
    f = lambda a: jnp.asarray(np.asarray(a, dtype=np.float32))
    return TrianglesSoA(
        v0=f(v0), v1=f(v1), v2=f(v2),
        n0=f(n0), n1=f(n1), n2=f(n2),
        uv0=f(uv0), uv1=f(uv1), uv2=f(uv2),
        mat_id=jnp.asarray(np.asarray(mat_id, dtype=np.int32)),
    )
