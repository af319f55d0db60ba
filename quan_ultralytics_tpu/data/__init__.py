from quan_ultralytics_tpu.data.dataset import YOLODataset
from quan_ultralytics_tpu.data.build import build_dataloader

__all__ = ["YOLODataset", "build_dataloader"]
