"""Evaluation metrics.

Reproduces the reference's metric semantics exactly:

- keyframe F1 by mean-thresholding pred and target independently
  (/root/reference/scripts/evaluate.py:26-33)
- Spearman rho / Kendall tau rank correlations (evaluate.py:35-36)
- segment-overlap temporal F1 (/root/reference/evaluation/metrics.py:1-9,
  /root/reference/utils/shot_metrics.py:4-16 — defined there, never called)

All core computations are jittable jnp; scipy is used only in tests as the
golden reference. Masked variants support padded shot sequences (the
reference has no padding/masking at all — SURVEY.md §4 item 3).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

_EPS = 1e-8


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def keyframe_f1(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean-threshold keyframe F1 (evaluate.py:26-33 semantics).

    Both ``pred`` and ``target`` are binarized at their own mean; F1 is
    computed on the binary vectors with the reference's ``+1e-8`` guard in
    the harmonic mean only (precision/recall may divide by zero in the
    reference; we add the same epsilon to those denominators, which matches
    the reference everywhere it is finite).
    """
    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    valid = None if mask is None else jnp.asarray(mask, jnp.float32)

    bp = (pred > _masked_mean(pred, valid)).astype(jnp.float32)
    bt = (target > _masked_mean(target, valid)).astype(jnp.float32)
    if valid is not None:
        bp = bp * valid
        bt = bt * valid

    tp = jnp.sum(bp * bt)
    precision = tp / jnp.maximum(jnp.sum(bp), _EPS)
    recall = tp / jnp.maximum(jnp.sum(bt), _EPS)
    return 2.0 * precision * recall / (precision + recall + _EPS)


# ---------------------------------------------------------------------------
# Rank correlations (jittable; validated against scipy in tests)
# ---------------------------------------------------------------------------


def _rankdata(x: jnp.ndarray) -> jnp.ndarray:
    """Average ranks (ties get the mean of the ranks they cover), like
    ``scipy.stats.rankdata(method='average')``."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    # rank = 1 + #strictly-less + (#equal - 1)/2   (average-tie rank)
    less = jnp.sum(x[:, None] > x[None, :], axis=1).astype(jnp.float32)
    equal = jnp.sum(x[:, None] == x[None, :], axis=1).astype(jnp.float32)
    return less + (equal + 1.0) / 2.0


def spearman_rho(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Spearman rank correlation = Pearson correlation of average ranks.
    Matches ``scipy.stats.spearmanr`` (evaluate.py:35)."""
    rp = _rankdata(jnp.asarray(pred).reshape(-1))
    rt = _rankdata(jnp.asarray(target).reshape(-1))
    rp = rp - jnp.mean(rp)
    rt = rt - jnp.mean(rt)
    denom = jnp.sqrt(jnp.sum(rp * rp) * jnp.sum(rt * rt))
    return jnp.sum(rp * rt) / jnp.maximum(denom, _EPS)


def kendall_tau(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Kendall tau-b, matching ``scipy.stats.kendalltau`` (evaluate.py:36).

    O(n^2) pairwise formulation — fine for shot sequences (tens to a few
    thousand elements) and fully vectorized for the VPU.
    """
    x = jnp.asarray(pred, jnp.float32).reshape(-1)
    y = jnp.asarray(target, jnp.float32).reshape(-1)
    dx = jnp.sign(x[:, None] - x[None, :])
    dy = jnp.sign(y[:, None] - y[None, :])
    n = x.shape[0]
    iu = jnp.triu(jnp.ones((n, n), jnp.float32), k=1)
    concordant_minus_discordant = jnp.sum(dx * dy * iu)
    n0 = n * (n - 1) / 2.0
    tx = jnp.sum((dx == 0).astype(jnp.float32) * iu)  # ties in x
    ty = jnp.sum((dy == 0).astype(jnp.float32) * iu)  # ties in y
    denom = jnp.sqrt((n0 - tx) * (n0 - ty))
    return concordant_minus_discordant / jnp.maximum(denom, _EPS)


def rank_correlations(pred, target) -> Dict[str, float]:
    return {
        "spearman": float(spearman_rho(pred, target)),
        "kendall": float(kendall_tau(pred, target)),
    }


# ---------------------------------------------------------------------------
# Segment-overlap temporal F1 (metrics.py:1-9 semantics)
# ---------------------------------------------------------------------------


def segment_overlap(pred_segments, gt_segments) -> float:
    """Total pairwise temporal overlap between two segment lists
    (shot_metrics.py:4-9 semantics; frames or seconds, caller's choice)."""
    pred = np.asarray(pred_segments, np.float64).reshape(-1, 2)
    gt = np.asarray(gt_segments, np.float64).reshape(-1, 2)
    if pred.size == 0 or gt.size == 0:
        return 0.0
    lo = np.maximum(pred[:, None, 0], gt[None, :, 0])
    hi = np.minimum(pred[:, None, 1], gt[None, :, 1])
    return float(np.maximum(0.0, hi - lo).sum())


def segment_f1(pred_segments, gt_segments) -> float:
    """Temporal-overlap F1 over segment lists (metrics.py:1-9 semantics,
    including the ``total_frames`` argument being unused)."""
    pred = np.asarray(pred_segments, np.float64).reshape(-1, 2)
    gt = np.asarray(gt_segments, np.float64).reshape(-1, 2)
    overlap = segment_overlap(pred, gt)
    pred_len = float((pred[:, 1] - pred[:, 0]).sum()) if pred.size else 0.0
    gt_len = float((gt[:, 1] - gt[:, 0]).sum()) if gt.size else 0.0
    if pred_len <= 0 or gt_len <= 0:
        return 0.0
    precision = overlap / pred_len
    recall = overlap / gt_len
    return 2.0 * precision * recall / (precision + recall + _EPS)


def evaluate_scores(pred, target, mask=None) -> Dict[str, float]:
    """Per-video metric bundle matching evaluate.py:38-42's dict."""
    if mask is not None:
        m = np.asarray(mask, bool)
        pred = np.asarray(pred)[m]
        target = np.asarray(target)[m]
    return {
        "f1": float(keyframe_f1(pred, target)),
        "spearman": float(spearman_rho(pred, target)),
        "kendall": float(kendall_tau(pred, target)),
    }
