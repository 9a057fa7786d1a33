"""Alignment semantics vs a literal transcription of
/root/reference/utils/alignments.py:4-22."""

import numpy as np
import pytest

from avsum_tpu.temporal import align_shots_to_annotations
from avsum_tpu.temporal.align import (
    expand_shot_scores_to_frames,
    frame_scores_to_shot_scores,
)


def reference_align(shot_boundaries, annotations, fps):
    shot_scores = []
    for start, end in shot_boundaries:
        start_time = start / fps
        end_time = end / fps
        start_idx = int(start_time // 2)
        end_idx = int(end_time // 2) + 1
        segment = annotations[start_idx:end_idx]
        shot_scores.append(segment.mean())
    return np.array(shot_scores)


@pytest.mark.parametrize("fps", [24.0, 29.97, 30.0])
def test_align_matches_reference_semantics(fps):
    rng = np.random.default_rng(int(fps))
    annotations = rng.random(120).astype(np.float32)  # 240 s of 2 s intervals
    # in-range shot boundaries (frames)
    max_frame = int(238 * fps)
    starts = np.sort(rng.integers(0, max_frame - 100, 15))
    ends = starts + rng.integers(10, 100, 15)
    bounds = list(zip(starts.tolist(), ends.tolist()))
    ref = reference_align(bounds, annotations, fps)
    ours = np.asarray(align_shots_to_annotations(bounds, annotations, fps))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_align_out_of_range_clamps_not_nan():
    annotations = np.ones(10, np.float32)
    # shot far past the annotation range: reference would NaN on empty slice
    out = np.asarray(align_shots_to_annotations([(10_000, 10_030)], annotations, 30.0))
    assert np.isfinite(out).all()


def test_align_mask_zeroes_padded():
    annotations = np.ones(10, np.float32)
    bounds = [(0, 30), (30, 60), (0, 0)]
    mask = np.array([1.0, 1.0, 0.0])
    out = np.asarray(align_shots_to_annotations(bounds, annotations, 30.0, mask=mask))
    assert out[2] == 0.0
    assert out[0] > 0


def test_frame_shot_roundtrip():
    frame_scores = np.arange(100, dtype=np.float32)
    bounds = np.array([[0, 50], [50, 100]])
    shot = frame_scores_to_shot_scores(frame_scores, bounds)
    np.testing.assert_allclose(shot, [24.5, 74.5])
    frames = expand_shot_scores_to_frames(shot, bounds, 100)
    assert frames[0] == pytest.approx(24.5)
    assert frames[99] == pytest.approx(74.5)
