"""Temporal structure: shot detection, alignment, resampling."""

from avsum_tpu.temporal.align import (
    align_shots_to_annotations,
    shot_segment_means,
)
from avsum_tpu.temporal.shots import (
    ContentDetectorConfig,
    content_scores,
    detect_shots,
    detect_shots_streaming,
)

__all__ = [
    "align_shots_to_annotations",
    "shot_segment_means",
    "ContentDetectorConfig",
    "content_scores",
    "detect_shots",
    "detect_shots_streaming",
]
