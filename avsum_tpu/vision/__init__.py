"""Visual backbones (Flax) + frame preprocessing + per-shot pooling."""

from avsum_tpu.vision.backbone import DualBackbone, VisualFrontend, preprocess_frames
from avsum_tpu.vision.inception import InceptionV3
from avsum_tpu.vision.resnet import ResNet50

__all__ = [
    "ResNet50",
    "InceptionV3",
    "DualBackbone",
    "VisualFrontend",
    "preprocess_frames",
]
