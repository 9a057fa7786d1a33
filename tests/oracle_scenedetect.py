"""Independent ContentDetector oracle (PySceneDetect semantics, via cv2).

An INDEPENDENT implementation of PySceneDetect's ContentDetector frame
scoring — the detector the reference runs (scenedetect.detect(path,
ContentDetector()), /root/reference/features/extractors.py:388-393) —
sharing no code with the production implementations it checks
(avsum_tpu/temporal/shots.py and native/avsumio.cc):

- color conversion is OpenCV's own ``cv2.cvtColor`` (the library
  PySceneDetect calls), not our rgb_to_hsv math;
- planes stay uint8 until the diff, reproducing PySceneDetect's
  quantized ``_mean_pixel_distance`` (int32 abs diff of uint8 HSV
  planes, mean over pixels);
- downscaling is PySceneDetect's ``frame_im[::factor, ::factor]``
  subsample.

Production scores are float (unquantized), so they may differ from this
oracle by <1.0 per frame (uint8 rounding); cut decisions must match
exactly on content whose score margins exceed that. Used live where cv2
exists and to generate the committed golden fixtures
(scripts/gen_shot_fixtures.py -> tests/fixtures/shots_golden.npz).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

DEFAULT_THRESHOLD = 27.0
DEFAULT_MIN_SCENE_LEN = 15


def content_scores_oracle(
    frames_rgb: np.ndarray,
    downscale: int = 1,
    weights: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> np.ndarray:
    """[T, H, W, 3] uint8 RGB -> [T] ContentDetector frame scores."""
    import cv2

    frames_rgb = np.asarray(frames_rgb, np.uint8)
    if downscale > 1:
        frames_rgb = frames_rgb[:, ::downscale, ::downscale]
    w_h, w_s, w_v = weights
    total_w = w_h + w_s + w_v
    scores = np.zeros(len(frames_rgb), np.float64)
    prev = None
    for t, frame in enumerate(frames_rgb):
        hsv = cv2.cvtColor(frame, cv2.COLOR_RGB2HSV)
        planes = [hsv[..., 0], hsv[..., 1], hsv[..., 2]]
        if prev is not None:
            npix = float(planes[0].size)
            deltas = [
                np.sum(np.abs(c.astype(np.int32) - p.astype(np.int32))) / npix
                for c, p in zip(planes, prev)
            ]
            scores[t] = (
                w_h * deltas[0] + w_s * deltas[1] + w_v * deltas[2]
            ) / total_w
        prev = planes
    return scores.astype(np.float32)


def cuts_oracle(
    scores: np.ndarray,
    threshold: float = DEFAULT_THRESHOLD,
    min_scene_len: int = DEFAULT_MIN_SCENE_LEN,
) -> List[int]:
    """PySceneDetect's thresholding walk (ContentDetector semantics)."""
    cuts, last_cut = [], 0
    for t in range(1, len(scores)):
        if scores[t] >= threshold and (t - last_cut) >= min_scene_len:
            cuts.append(t)
            last_cut = t
    return cuts
