from dynamic_visual_slam_tpu.ops import fast, hamming, image  # noqa: F401
