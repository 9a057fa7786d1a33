"""Shot (scene-cut) detection.

Functional equivalent of PySceneDetect's ContentDetector as the reference
uses it (/root/reference/features/extractors.py:388-393 and
scripts/preprocess.py:11-13, both ``detect(path, ContentDetector())`` with
defaults: threshold 27.0, min_scene_len 15).

ContentDetector's score for frame t is the mean absolute per-pixel
difference between frames t and t-1 in HSV, averaged over the H/S/V
channels. Here that score is computed fully vectorized on device for a
whole chunk of frames at once (one subtraction + reductions on the VPU);
only the final thresholding/min-length walk runs on host (tiny, O(T) on a
scalar vector). Chunks overlap by one frame so streaming hour-scale video
works in bounded memory.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avsum_tpu.ops.color import rgb_to_hsv_channels

DEFAULT_THRESHOLD = 27.0
DEFAULT_MIN_SCENE_LEN = 15


@dataclasses.dataclass(frozen=True)
class ContentDetectorConfig:
    threshold: float = DEFAULT_THRESHOLD
    min_scene_len: int = DEFAULT_MIN_SCENE_LEN
    # channel weights, matching ContentDetector.Components defaults
    # (delta_hue=1, delta_sat=1, delta_lum=1, delta_edges=0)
    weight_hue: float = 1.0
    weight_sat: float = 1.0
    weight_lum: float = 1.0


@jax.jit
def content_scores(frames: jnp.ndarray) -> jnp.ndarray:
    """[T, H, W, 3] RGB -> [T] content-change score (score[0] = 0).

    score[t] = mean(|HSV[t] - HSV[t-1]|) averaged over pixels, per channel,
    then channel-averaged — ContentDetector's frame_score. Channels are
    processed as separate [T, H, W] arrays (minor dim = width); keeping
    the size-3 channel axis minor is a TPU layout pathology.
    """
    h, s, v = rgb_to_hsv_channels(frames)
    score = sum(
        jnp.mean(jnp.abs(c[1:] - c[:-1]), axis=(1, 2)) for c in (h, s, v)
    ) / 3.0
    return jnp.concatenate([jnp.zeros(1, score.dtype), score])


def content_scores_weighted(
    frames: jnp.ndarray, config: ContentDetectorConfig
) -> jnp.ndarray:
    h, s, v = rgb_to_hsv_channels(frames)
    weights = (config.weight_hue, config.weight_sat, config.weight_lum)
    score = sum(
        w * jnp.mean(jnp.abs(c[1:] - c[:-1]), axis=(1, 2))
        for w, c in zip(weights, (h, s, v))
    ) / sum(weights)
    return jnp.concatenate([jnp.zeros(1, score.dtype), score])


def cuts_from_scores(
    scores: np.ndarray,
    threshold: float = DEFAULT_THRESHOLD,
    min_scene_len: int = DEFAULT_MIN_SCENE_LEN,
) -> List[int]:
    """Host-side thresholding walk (matches ContentDetector: a cut fires at
    frame t when score[t] >= threshold and t - last_cut >= min_scene_len)."""
    cuts = []
    last_cut = 0
    for t in range(1, len(scores)):
        if scores[t] >= threshold and (t - last_cut) >= min_scene_len:
            cuts.append(t)
            last_cut = t
    return cuts


def boundaries_from_cuts(cuts: List[int], total_frames: int) -> np.ndarray:
    """Cut positions -> [(start, end), ...] covering [0, total_frames)."""
    edges = [0] + list(cuts) + [total_frames]
    return np.array(
        [(edges[i], edges[i + 1]) for i in range(len(edges) - 1)], np.int64
    )


def detect_shots(
    frames: np.ndarray,
    config: ContentDetectorConfig = ContentDetectorConfig(),
    chunk_size: int = 512,
) -> np.ndarray:
    """[T, H, W, 3] RGB frames -> [S, 2] shot boundaries.

    Scores are computed on device in overlapping chunks (frame t needs
    frame t-1, so each chunk carries one frame of context).
    """
    t = frames.shape[0]
    if t == 0:
        return np.zeros((0, 2), np.int64)
    scores = np.zeros(t, np.float32)
    start = 0
    while start < t:
        end = min(start + chunk_size, t)
        lo = max(start - 1, 0)
        chunk = jnp.asarray(frames[lo:end])
        s = np.asarray(content_scores(chunk))
        scores[start:end] = s[start - lo :]
        start = end
    cuts = cuts_from_scores(scores, config.threshold, config.min_scene_len)
    return boundaries_from_cuts(cuts, t)


def detect_shots_streaming(
    frame_chunks: Iterable[np.ndarray],
    config: ContentDetectorConfig = ContentDetectorConfig(),
) -> Tuple[np.ndarray, int]:
    """Streaming variant over an iterator of frame chunks; returns
    (boundaries, total_frames). Keeps one frame of carry between chunks."""
    all_scores: List[np.ndarray] = []
    carry: Optional[np.ndarray] = None
    total = 0
    for chunk in frame_chunks:
        if chunk.shape[0] == 0:
            continue
        block = chunk if carry is None else np.concatenate([carry[None], chunk])
        s = np.asarray(content_scores(jnp.asarray(block)))
        all_scores.append(s if carry is None else s[1:])
        carry = chunk[-1]
        total += chunk.shape[0]
    if total == 0:
        return np.zeros((0, 2), np.int64), 0
    scores = np.concatenate(all_scores)
    cuts = cuts_from_scores(scores, config.threshold, config.min_scene_len)
    return boundaries_from_cuts(cuts, total), total


def refined_content_scores(
    reader,
    fine_scale: int,
    threshold: float = DEFAULT_THRESHOLD,
    coarse_mult: int = 9,
    margin: float = 8.0,
) -> np.ndarray:
    """Hierarchical two-pass content scoring over a native reader.

    The exact (fine-scale) score of every frame is only *needed* where the
    threshold decision could change. Pass 1 scores the whole video at
    ``fine_scale * coarse_mult`` (~coarse_mult^2 x cheaper); pass 2
    re-scores, at ``fine_scale``, only the frames whose coarse score lands
    within ``margin`` of the threshold or above it. Coarse-vs-fine score
    deviation measured (round 5): max 3.18 at 9x coarser on the noisiest
    640x360 bench content, <=0.87 across 6 seeds x 2 resolutions of
    synthetic scene video — margin=8 bounds the worst observation 2.5x
    over, so the returned cut decisions are identical to a full
    fine-scale pass (pinned in
    tests/test_fast_paths.py::test_refined_scores_cut_exact). Content
    score distributions are strongly bimodal (cut frames ~10x the
    threshold, steady frames ~10x under it), so widening the margin does
    not widen the candidate set: on the bench clip, margins 4..12 all
    select the same 3.2% of frames, while 9x (vs the previous 3x) coarse
    cuts the full-video pass from 0.55 s to 0.14 s. ``coarse_mult`` is
    clamped so the coarse raster stays >= ~24 px wide (tiny inputs).

    ``reader`` needs the native ``content_scores(start, stop, scale)``
    surface (avsumio). Returns the hybrid score vector: exact fine scores
    at every frame that matters, coarse elsewhere (all sub-threshold).
    """
    width = getattr(reader, "width", 0)
    if width:
        while coarse_mult > 3 and width // (fine_scale * coarse_mult) < 24:
            coarse_mult -= 3
    coarse = np.asarray(
        reader.content_scores(scale=fine_scale * coarse_mult), np.float32
    ).copy()
    n = len(coarse)
    if n == 0:
        return coarse
    cand = np.nonzero(coarse >= threshold - margin)[0]
    cand = cand[cand > 0]
    if len(cand) == 0:
        return coarse
    # contiguous candidate runs -> one fine window each (amortizes decode)
    splits = np.nonzero(np.diff(cand) > 1)[0] + 1
    for run in np.split(cand, splits):
        a, b = int(run[0]), int(run[-1])
        # scores for frames a..b need frames a-1..b decoded at fine scale
        w = np.asarray(
            reader.content_scores(start=a - 1, stop=b + 1, scale=fine_scale)
        )
        coarse[a : b + 1] = w[1:]
    return coarse
