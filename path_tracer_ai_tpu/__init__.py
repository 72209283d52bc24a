"""path_tracer_ai_tpu — a TPU-native physically-based path tracer.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Seenyo/path_tracer_ai
(reference: CUDA/OptiX + OpenMP C++). The reference's CPU renderer
(`include/renderer.hpp:40-301`) is the semantic ground truth; this package
reproduces its radiance semantics with a TPU-first architecture:

- SoA pytrees instead of objects (rays, triangles, materials, lights)
- a pure-JAX "oracle" integrator reproducing the reference CPU renderer
  (used as the correctness baseline, mirrors `--mode cpu`)
- a wavefront engine (fixed ray pool, masked lanes, on-device bounce loop)
  playing the architectural role of the reference's OptiX megakernel
  (`src/gpu/ptx/optix_kernels.cu`) but built for the MXU/VPU
- multi-chip scaling via jax.sharding over pixel tiles (the reference has no
  multi-device story; see SURVEY.md §2 parallelism table)
"""

from path_tracer_ai_tpu.config import RenderSettings
from path_tracer_ai_tpu.core.types import (
    TrianglesSoA,
    MaterialTable,
    Lights,
    SceneData,
    MATERIAL_DIFFUSE,
    MATERIAL_SPECULAR,
    MATERIAL_DIELECTRIC,
)
from path_tracer_ai_tpu.scene.camera import Camera, default_camera
from path_tracer_ai_tpu.scene.scene import build_scene, build_scene_from_arrays

__version__ = "0.1.0"

__all__ = [
    "RenderSettings",
    "TrianglesSoA",
    "MaterialTable",
    "Lights",
    "SceneData",
    "MATERIAL_DIFFUSE",
    "MATERIAL_SPECULAR",
    "MATERIAL_DIELECTRIC",
    "Camera",
    "default_camera",
    "build_scene",
    "build_scene_from_arrays",
]
