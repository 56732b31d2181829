from dynamic_visual_slam_tpu.parallel import mesh  # noqa: F401
