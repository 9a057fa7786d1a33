"""Dataset assembly: feature cache + annotations -> VideoExamples.

The training target for each shot is the mean of the per-frame (TVSum
user-mean) or gt (SumMe) annotation over the shot's REAL frame range —
using the persisted boundaries, which fixes the reference's placeholder
``[(0, num_shots)]`` + fps=30 target bug
(/root/reference/scripts/train_av_model.py:77-83; SURVEY.md §8.4).
TVSum 1-5 importance scores are rescaled to [0, 1] to match the model's
sigmoid output range (the reference regressed sigmoid outputs onto raw
1-5 scores, saturating the loss).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from avsum_tpu.data.batching import VideoExample
from avsum_tpu.data.cache import FeatureCache
from avsum_tpu.data.summe import load_summe_dir
from avsum_tpu.data.tvsum import load_tvsum, tvsum_index
from avsum_tpu.temporal.align import frame_scores_to_shot_scores


def _attach_targets(
    example: VideoExample, frame_scores: np.ndarray, normalize: bool = True
) -> VideoExample:
    scores = np.asarray(frame_scores, np.float32)
    if normalize and scores.size:
        lo, hi = float(scores.min()), float(scores.max())
        if hi > lo:
            scores = (scores - lo) / (hi - lo)
        else:
            scores = np.zeros_like(scores)
    example.targets = frame_scores_to_shot_scores(scores, example.shot_boundaries)
    return example


def load_tvsum_examples(
    cache: FeatureCache,
    mat_path: str,
    video_ids: Optional[Sequence[str]] = None,
) -> List[VideoExample]:
    index = tvsum_index(load_tvsum(mat_path))
    ids = video_ids if video_ids is not None else cache.video_ids()
    out = []
    for vid in ids:
        if vid not in index or not cache.has(vid):
            continue
        ex = cache.get(vid)
        out.append(_attach_targets(ex, index[vid].mean_scores()))
    return out


def load_summe_examples(
    cache: FeatureCache,
    gt_dir: str,
    video_ids: Optional[Sequence[str]] = None,
) -> List[VideoExample]:
    index = {v.video_id: v for v in load_summe_dir(gt_dir)}
    ids = video_ids if video_ids is not None else cache.video_ids()
    out = []
    for vid in ids:
        if vid not in index or not cache.has(vid):
            continue
        ex = cache.get(vid)
        out.append(_attach_targets(ex, index[vid].gt_score))
    return out


def load_cached_examples(
    cache: FeatureCache,
    frame_scores: Optional[Dict[str, np.ndarray]] = None,
    video_ids: Optional[Sequence[str]] = None,
) -> List[VideoExample]:
    """Generic loader: optional {video_id: frame_scores} target map."""
    ids = video_ids if video_ids is not None else cache.video_ids()
    out = []
    for vid in ids:
        if not cache.has(vid):
            continue
        ex = cache.get(vid)
        if frame_scores and vid in frame_scores:
            ex = _attach_targets(ex, frame_scores[vid])
        out.append(ex)
    return out
