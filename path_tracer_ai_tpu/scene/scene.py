"""Scene assembly (mirrors Scene + Scene::loadFromObj, scene.hpp/scene.cpp).

Reproduces every loader invariant catalogued in SURVEY.md §3.3:
- model bounds over ALL file vertices, uniform scale to a 3-unit box
  (scene.cpp:48-49), recenter, z-flip (180° about Y), y += 1.8 (scene.cpp:236-238)
- normals z-flipped + normalized; face-normal fallback when the last corner
  has no normal index (scene.cpp:243-256); uv fallback (0,0) (scene.cpp:258-265)
- material table: [0] default specular red, [1] diffuse wall, MTL materials
  appended at +2 offset (scene.cpp:57-71, 268-270)
- name-keyed material overrides red/gold/silver/black, else Kd^0.8 * 1.2
  clamped, all forced SPECULAR metallic=1 (scene.cpp:74-108)
- 8 procedural room triangles PREPENDED before the model (scene.cpp:118-209)
- 4 hardcoded point lights (scene.hpp:55-80)

The hardcoded lights/room/camera are kept as *data* (module-level tables)
rather than code, per SURVEY.md §5 config guidance.

Extension (off by default, needed for the dielectric BASELINE config): when
`enable_dielectrics=True`, MTL materials named *glass*/*dielectric*, or with
illum 7 / dissolve < 1, become MATERIAL_DIELECTRIC with the MTL's Ni. The
reference loader can never produce dielectrics even though both its engines
shade them (SURVEY.md §2.8 note).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from path_tracer_ai_tpu.core.types import (
    MATERIAL_DIELECTRIC,
    MATERIAL_DIFFUSE,
    MATERIAL_SPECULAR,
    Lights,
    MaterialTable,
    SceneData,
    TrianglesSoA,
)
from path_tracer_ai_tpu.scene.objloader import ObjMaterial, load_obj
from path_tracer_ai_tpu.utils.logging import get_logger

log = get_logger(__name__)

# --- reference scene constants -------------------------------------------------
MODEL_TARGET_SIZE = 3.0   # scene.cpp:48 (comment says 1.5, code says 3)
MODEL_LIFT_Y = 1.8        # scene.cpp:238
ROOM_SIZE = 8.0           # scene.cpp:119
ROOM_HEIGHT = 4.0         # scene.cpp:120
WALL_MAT_ID = 1           # scene.cpp:121
MTL_MATERIAL_OFFSET = 2   # scene.cpp:270

# The four hardcoded point lights (scene.hpp:55-80): position, color, intensity.
DEFAULT_LIGHTS = [
    ((2.0, 3.5, 2.0), (1.0, 0.95, 0.8), 9.0),   # key (front right, warm)
    ((-1.5, 2.0, 1.5), (0.8, 0.9, 1.0), 2.0),   # fill (front left, cool)
    ((0.0, 2.0, -2.0), (1.0, 1.0, 1.0), 1.0),   # rim (back)
    ((0.0, 0.1, 0.0), (0.9, 0.9, 1.0), 2.0),    # ground bounce
]

# The 8 procedural room triangles (scene.cpp:124-209), wall material id 1.
# Each row: (v0, v1, v2, normal, uv0, uv1, uv2).
_S, _H = ROOM_SIZE, ROOM_HEIGHT
ROOM_TRIANGLES = [
    # Floor
    ((-_S, 0, -_S), (_S, 0, -_S), (_S, 0, _S), (0, 1, 0), (0, 0), (1, 0), (1, 1)),
    ((-_S, 0, -_S), (_S, 0, _S), (-_S, 0, _S), (0, 1, 0), (0, 0), (1, 1), (0, 1)),
    # Back wall
    ((-_S, 0, -_S), (-_S, _H, -_S), (_S, _H, -_S), (0, 0, 1), (0, 0), (0, 1), (1, 1)),
    ((-_S, 0, -_S), (_S, _H, -_S), (_S, 0, -_S), (0, 0, 1), (0, 0), (1, 1), (1, 0)),
    # Left wall
    ((-_S, 0, -_S), (-_S, 0, _S), (-_S, _H, _S), (1, 0, 0), (0, 0), (1, 0), (1, 1)),
    ((-_S, 0, -_S), (-_S, _H, _S), (-_S, _H, -_S), (1, 0, 0), (0, 0), (1, 1), (0, 1)),
    # Right wall
    ((_S, 0, -_S), (_S, _H, _S), (_S, 0, _S), (-1, 0, 0), (0, 0), (1, 1), (1, 0)),
    ((_S, 0, -_S), (_S, _H, -_S), (_S, _H, _S), (-1, 0, 0), (0, 0), (0, 1), (1, 1)),
]


@dataclasses.dataclass
class HostMaterial:
    """Host-side material record before packing into MaterialTable.

    Field defaults mirror struct Material (material.hpp:12-18).
    """

    mtype: int = MATERIAL_DIFFUSE
    albedo: tuple = (0.8, 0.8, 0.8)
    roughness: float = 0.5
    metallic: float = 0.5
    ior: float = 1.5


def _default_model_material() -> HostMaterial:
    """Material [0]: metallic red default (scene.cpp:57-63)."""
    return HostMaterial(
        mtype=MATERIAL_SPECULAR, albedo=(0.9, 0.2, 0.2), roughness=0.1, metallic=1.0
    )


def _wall_material() -> HostMaterial:
    """Material [1]: diffuse wall (scene.cpp:65-71)."""
    return HostMaterial(
        mtype=MATERIAL_DIFFUSE, albedo=(0.9, 0.9, 0.9), roughness=0.95, metallic=0.0
    )


def _convert_mtl_material(m: ObjMaterial, enable_dielectrics: bool) -> HostMaterial:
    """Name-keyed overrides (scene.cpp:74-108) + optional dielectric extension."""
    out = HostMaterial(mtype=MATERIAL_SPECULAR, metallic=1.0, roughness=0.1)
    name = m.name
    if "red" in name:
        out.albedo, out.roughness = (0.9, 0.2, 0.2), 0.1
    elif "gold" in name:
        out.albedo, out.roughness = (1.0, 0.8, 0.0), 0.05
    elif "silver" in name:  # covers "darksilver" too (scene.cpp:89-90)
        out.albedo, out.roughness = (0.95, 0.95, 0.95), 0.05
    elif "black" in name:
        out.albedo, out.roughness = (0.02, 0.02, 0.02), 0.1
    else:
        kd = np.asarray(m.diffuse, dtype=np.float32)
        kd = np.power(np.maximum(kd, 0.0), 0.8)       # vibrance (scene.cpp:104)
        kd = np.clip(kd * 1.2, 0.0, 1.0)              # brighten (scene.cpp:105)
        out.albedo = tuple(float(x) for x in kd)

    if enable_dielectrics and (
        "glass" in name or "dielectric" in name or m.illum == 7 or m.dissolve < 1.0
    ):
        out.mtype = MATERIAL_DIELECTRIC
        out.ior = float(m.ior) if m.ior > 0 else 1.5
    return out


def _room_triangle_arrays():
    """The 8 room triangles as numpy SoA blocks."""
    n = len(ROOM_TRIANGLES)
    v0 = np.zeros((n, 3), np.float32)
    v1 = np.zeros((n, 3), np.float32)
    v2 = np.zeros((n, 3), np.float32)
    nrm = np.zeros((n, 3), np.float32)
    uv0 = np.zeros((n, 2), np.float32)
    uv1 = np.zeros((n, 2), np.float32)
    uv2 = np.zeros((n, 2), np.float32)
    for i, (a, b, c, nn, ua, ub, uc) in enumerate(ROOM_TRIANGLES):
        v0[i], v1[i], v2[i], nrm[i] = a, b, c, nn
        uv0[i], uv1[i], uv2[i] = ua, ub, uc
    mat = np.full((n,), WALL_MAT_ID, np.int32)
    return v0, v1, v2, nrm, nrm.copy(), nrm.copy(), uv0, uv1, uv2, mat


def transform_model_vertices(raw: np.ndarray, center: np.ndarray, scale: float):
    """The reference vertex transform chain (scene.cpp:236-238)."""
    v = (raw - center) * scale
    v = v * np.asarray([1.0, 1.0, -1.0], np.float32)  # 180° about Y
    v = v + np.asarray([0.0, MODEL_LIFT_Y, 0.0], np.float32)
    return v.astype(np.float32)


def _pack_materials(mats: List[HostMaterial]) -> MaterialTable:
    return MaterialTable(
        mtype=jnp.asarray(np.asarray([m.mtype for m in mats], np.int32)),
        albedo=jnp.asarray(np.asarray([m.albedo for m in mats], np.float32)),
        roughness=jnp.asarray(np.asarray([m.roughness for m in mats], np.float32)),
        metallic=jnp.asarray(np.asarray([m.metallic for m in mats], np.float32)),
        ior=jnp.asarray(np.asarray([m.ior for m in mats], np.float32)),
    )


def default_lights() -> Lights:
    return Lights(
        position=jnp.asarray(np.asarray([l[0] for l in DEFAULT_LIGHTS], np.float32)),
        color=jnp.asarray(np.asarray([l[1] for l in DEFAULT_LIGHTS], np.float32)),
        intensity=jnp.asarray(np.asarray([l[2] for l in DEFAULT_LIGHTS], np.float32)),
    )


def build_scene_from_arrays(
    v0, v1, v2, n0, n1, n2, uv0, uv1, uv2, mat_id,
    materials: Optional[List[HostMaterial]] = None,
    lights: Optional[Lights] = None,
) -> SceneData:
    """Assemble a SceneData from raw triangle arrays (tests / custom scenes)."""
    if materials is None:
        materials = [_default_model_material(), _wall_material()]
    tri = TrianglesSoA(
        v0=jnp.asarray(np.asarray(v0, np.float32)),
        v1=jnp.asarray(np.asarray(v1, np.float32)),
        v2=jnp.asarray(np.asarray(v2, np.float32)),
        n0=jnp.asarray(np.asarray(n0, np.float32)),
        n1=jnp.asarray(np.asarray(n1, np.float32)),
        n2=jnp.asarray(np.asarray(n2, np.float32)),
        uv0=jnp.asarray(np.asarray(uv0, np.float32)),
        uv1=jnp.asarray(np.asarray(uv1, np.float32)),
        uv2=jnp.asarray(np.asarray(uv2, np.float32)),
        mat_id=jnp.asarray(np.asarray(mat_id, np.int32)),
    )
    return SceneData(
        triangles=tri,
        materials=_pack_materials(materials),
        lights=lights if lights is not None else default_lights(),
    )


def build_scene(
    obj_path: str,
    enable_dielectrics: bool = False,
    include_room: bool = True,
    lights: Optional[Lights] = None,
) -> SceneData:
    """Load an OBJ+MTL model into the reference's walled-room scene.

    Mirrors Scene::loadFromObj (scene.cpp:8-293) end to end. Raises on a
    missing/unreadable file, mirroring the loader's `return false` path which
    main() turns into an error exit (main.cpp:40-43).
    """
    log.info("Loading model from: %s", obj_path)
    obj = load_obj(obj_path)

    # Bounds over ALL file vertices, referenced or not (scene.cpp:30-42).
    if obj.vertices.shape[0] > 0:
        min_b = obj.vertices.min(axis=0)
        max_b = obj.vertices.max(axis=0)
        model_size = max_b - min_b
        log.info("Original model size: %s", model_size.tolist())
        max_extent = float(model_size.max())
        scale = MODEL_TARGET_SIZE / max_extent if max_extent > 0 else 1.0
        center = ((min_b + max_b) * 0.5).astype(np.float32)
    else:
        scale, center = 1.0, np.zeros(3, np.float32)

    # Material table (scene.cpp:54-114).
    materials: List[HostMaterial] = [_default_model_material(), _wall_material()]
    for m in obj.materials:
        hm = _convert_mtl_material(m, enable_dielectrics)
        materials.append(hm)
        log.info(
            "Loaded material: %s (type=%d, roughness=%g, metallic=%g)",
            m.name, hm.mtype, hm.roughness, hm.metallic,
        )

    blocks = []
    if include_room:
        blocks.append(_room_triangle_arrays())

    # Model triangles (scene.cpp:215-282), vectorized over faces.
    F = obj.v_idx.shape[0]
    if F > 0:
        verts = transform_model_vertices(obj.vertices, center, scale)  # [Nv,3]
        tri_v = verts[obj.v_idx]  # [F,3,3]

        # Normals: z-flip + normalize where indexed (scene.cpp:243-250);
        # face-normal fallback from transformed verts otherwise (:251-256).
        flip = np.asarray([1.0, 1.0, -1.0], np.float32)
        has_n = obj.n_idx >= 0  # [F,3]
        n_safe = np.clip(obj.n_idx, 0, max(obj.normals.shape[0] - 1, 0))
        if obj.normals.shape[0] > 0:
            vn = obj.normals[n_safe] * flip
            norms = np.linalg.norm(vn, axis=-1, keepdims=True)
            vn = vn / np.maximum(norms, 1e-30)
        else:
            vn = np.zeros((F, 3, 3), np.float32)
        e1 = tri_v[:, 1] - tri_v[:, 0]
        e2 = tri_v[:, 2] - tri_v[:, 0]
        fn = np.cross(e1, e2)
        fn = fn / np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-30)
        # Reference: if the LAST corner lacks a normal, all three corners get
        # the face normal (scene.cpp:251-256). A corner missing a normal while
        # corner 2 has one reads uninitialized memory in the reference; we use
        # the face normal for any missing corner (documented sane choice).
        last_missing = ~has_n[:, 2]
        use_face = last_missing[:, None] | ~has_n
        tri_n = np.where(use_face[..., None], fn[:, None, :], vn).astype(np.float32)

        # UVs with (0,0) fallback (scene.cpp:258-265).
        has_t = obj.t_idx >= 0
        t_safe = np.clip(obj.t_idx, 0, max(obj.texcoords.shape[0] - 1, 0))
        if obj.texcoords.shape[0] > 0:
            tri_uv = np.where(has_t[..., None], obj.texcoords[t_safe], 0.0)
        else:
            tri_uv = np.zeros((F, 3, 2), np.float32)
        tri_uv = tri_uv.astype(np.float32)

        # Material ids: max(id, 0) + 2 (scene.cpp:268-270).
        mat = np.maximum(obj.mat_ids, 0) + MTL_MATERIAL_OFFSET

        blocks.append((
            tri_v[:, 0], tri_v[:, 1], tri_v[:, 2],
            tri_n[:, 0], tri_n[:, 1], tri_n[:, 2],
            tri_uv[:, 0], tri_uv[:, 1], tri_uv[:, 2],
            mat.astype(np.int32),
        ))

    if not blocks:
        raise ValueError(f"Scene has no triangles (empty OBJ: {obj_path})")

    cat = [np.concatenate([b[i] for b in blocks], axis=0) for i in range(10)]
    scene = build_scene_from_arrays(*cat, materials=materials, lights=lights)
    log.info(
        "Model loaded successfully: %d triangles, %d materials",
        scene.triangles.count, scene.materials.count,
    )
    return scene
