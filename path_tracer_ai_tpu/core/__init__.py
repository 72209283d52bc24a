from path_tracer_ai_tpu.core.types import (
    TrianglesSoA,
    MaterialTable,
    Lights,
    SceneData,
    MATERIAL_DIFFUSE,
    MATERIAL_SPECULAR,
    MATERIAL_DIELECTRIC,
)

__all__ = [
    "TrianglesSoA",
    "MaterialTable",
    "Lights",
    "SceneData",
    "MATERIAL_DIFFUSE",
    "MATERIAL_SPECULAR",
    "MATERIAL_DIELECTRIC",
]
