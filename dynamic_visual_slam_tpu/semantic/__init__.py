from dynamic_visual_slam_tpu.semantic import classes  # noqa: F401
