from quan_ultralytics_tpu.losses.tal import task_aligned_assigner
from quan_ultralytics_tpu.losses.detect import detection_loss, obb_loss

__all__ = ["task_aligned_assigner", "detection_loss", "obb_loss"]
