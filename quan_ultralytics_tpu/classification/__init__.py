"""Classification stack: Q-WRN / Q-ResNet on CIFAR/SVHN/ImageNet.

TPU rebuild of the reference's standalone classification harness
(classification/classification.py + classification/models/*)."""

from quan_ultralytics_tpu.classification.models import create_model, MODEL_FACTORIES

__all__ = ["create_model", "MODEL_FACTORIES"]
