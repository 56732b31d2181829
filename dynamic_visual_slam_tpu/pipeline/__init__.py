from dynamic_visual_slam_tpu.pipeline import slam, sync  # noqa: F401
