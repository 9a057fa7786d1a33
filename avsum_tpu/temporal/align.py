"""Shot <-> annotation alignment.

Reimplements the exact integer semantics of
/root/reference/utils/alignments.py:4-22 (TVSum annotations are one score
per 2-second interval in that code's model; a shot's target is the mean of
the intervals it spans):

    start_idx = int((start_frame / fps) // 2)
    end_idx   = int((end_frame / fps) // 2) + 1
    target    = annotations[start_idx:end_idx].mean()

but vectorized over shots via a cumulative-sum (segment means become two
gathers + a divide — O(S) gathers instead of a Python loop), jittable, and
mask-aware for padded shot buckets. Out-of-range shots clamp to the last
annotation instead of producing the reference's silent NaN on an empty
slice.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def shot_segment_means(
    annotations: jnp.ndarray,
    start_idx: jnp.ndarray,
    end_idx: jnp.ndarray,
) -> jnp.ndarray:
    """Mean of ``annotations[start:end]`` per row, via cumsum gathers.

    Indices are clamped into range and empty segments clamp to one element.
    """
    annotations = jnp.asarray(annotations, jnp.float32).reshape(-1)
    n = annotations.shape[0]
    cs = jnp.concatenate([jnp.zeros(1, jnp.float32), jnp.cumsum(annotations)])
    start = jnp.clip(jnp.asarray(start_idx, jnp.int32), 0, n - 1)
    end = jnp.clip(jnp.asarray(end_idx, jnp.int32), start + 1, n)
    total = jnp.take(cs, end) - jnp.take(cs, start)
    return total / (end - start).astype(jnp.float32)


def align_shots_to_annotations(
    shot_boundaries,
    annotations,
    fps: float,
    interval_seconds: float = 2.0,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-shot ground-truth scores from interval-level annotations.

    Args:
      shot_boundaries: [S, 2] (start_frame, end_frame) pairs (array or list
        of tuples, matching the reference's call shape, alignments.py:4).
      annotations: [N] scores, one per ``interval_seconds`` of video.
      fps: frames per second of the original video.
      interval_seconds: annotation granularity (reference hardcodes 2).
      mask: optional [S] validity mask; padded shots get score 0.

    Returns:
      [S] float32 per-shot target scores.
    """
    bounds = jnp.asarray(shot_boundaries, jnp.float32).reshape(-1, 2)
    start_idx = jnp.floor(bounds[:, 0] / fps / interval_seconds).astype(jnp.int32)
    end_idx = jnp.floor(bounds[:, 1] / fps / interval_seconds).astype(jnp.int32) + 1
    scores = shot_segment_means(annotations, start_idx, end_idx)
    if mask is not None:
        scores = scores * jnp.asarray(mask, jnp.float32)
    return scores


def frame_scores_to_shot_scores(
    frame_scores: np.ndarray, shot_boundaries: np.ndarray
) -> np.ndarray:
    """Mean frame-level score per shot (frame-granular variant used when
    annotations are per-frame, e.g. TVSum user_anno rows)."""
    frame_scores = np.asarray(frame_scores, np.float32).reshape(-1)
    n = len(frame_scores)
    bounds = np.asarray(shot_boundaries, np.int64).reshape(-1, 2)
    cs = np.concatenate([[0.0], np.cumsum(frame_scores)])
    start = np.clip(bounds[:, 0], 0, n - 1)
    end = np.clip(bounds[:, 1], start + 1, n)
    return ((cs[end] - cs[start]) / (end - start)).astype(np.float32)


def expand_shot_scores_to_frames(
    shot_scores: np.ndarray, shot_boundaries: np.ndarray, total_frames: int
) -> np.ndarray:
    """Broadcast per-shot scores back to per-frame scores (for frame-level
    evaluation against per-frame ground truth)."""
    out = np.zeros(total_frames, np.float32)
    bounds = np.asarray(shot_boundaries, np.int64).reshape(-1, 2)
    for score, (start, end) in zip(np.asarray(shot_scores).reshape(-1), bounds):
        out[max(0, start) : min(total_frames, end)] = score
    return out
