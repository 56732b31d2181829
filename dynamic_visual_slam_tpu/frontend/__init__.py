from dynamic_visual_slam_tpu.frontend import orb  # noqa: F401
