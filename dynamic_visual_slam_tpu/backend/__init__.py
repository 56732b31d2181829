from dynamic_visual_slam_tpu.backend import ba, mapping  # noqa: F401
