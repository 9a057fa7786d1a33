"""Temporal structure: shot detection, alignment, resampling."""

from avsum_tpu.temporal.align import (
    align_shots_to_annotations,
    shot_segment_means,
)

__all__ = ["align_shots_to_annotations", "shot_segment_means"]
