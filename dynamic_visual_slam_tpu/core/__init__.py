from dynamic_visual_slam_tpu.core import camera, containers, lie  # noqa: F401
