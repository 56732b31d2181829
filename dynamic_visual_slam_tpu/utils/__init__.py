from dynamic_visual_slam_tpu.utils import profiling, viz  # noqa: F401
