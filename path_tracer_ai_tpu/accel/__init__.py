from path_tracer_ai_tpu.accel.clusters import ClusterAccel, build_clusters

__all__ = ["ClusterAccel", "build_clusters"]
