from dynamic_visual_slam_tpu.models import yolov8  # noqa: F401
