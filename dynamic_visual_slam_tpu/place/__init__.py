from dynamic_visual_slam_tpu.place import bow  # noqa: F401
