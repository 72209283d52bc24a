from path_tracer_ai_tpu.scene.camera import Camera, default_camera
from path_tracer_ai_tpu.scene.scene import build_scene, build_scene_from_arrays

__all__ = ["Camera", "default_camera", "build_scene", "build_scene_from_arrays"]
