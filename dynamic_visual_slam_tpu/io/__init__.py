from dynamic_visual_slam_tpu.io import synthetic, trajectory, tum  # noqa: F401
