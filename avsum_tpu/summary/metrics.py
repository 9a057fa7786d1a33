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

import jax
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
    ``scipy.stats.rankdata(method='average')``.

    Sort-based O(n log n), jittable, and materializes only [n] arrays —
    safe at hour-scale shot counts (S≈7168) where the old pairwise
    formulation allocated ~200 MB [S,S] matrices.
    """
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    order = jnp.argsort(x)
    xs = x[order]
    idx = jnp.arange(n, dtype=jnp.float32)
    # tie-group starts/ends in the sorted order
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), xs[1:] != xs[:-1]]) if n else jnp.ones((0,), bool)
    is_end = jnp.concatenate(
        [xs[1:] != xs[:-1], jnp.ones((1,), bool)]) if n else jnp.ones((0,), bool)
    # position of my group's first element: running max of start positions
    start_pos = jax.lax.cummax(jnp.where(is_start, idx, -1.0))
    # position of my group's last element: reversed running min of end positions
    end_pos = jax.lax.cummin(
        jnp.where(is_end, idx, float(n))[::-1])[::-1]
    avg_rank_sorted = (start_pos + end_pos) / 2.0 + 1.0  # 1-based average
    return jnp.zeros(n, jnp.float32).at[order].set(avg_rank_sorted)


def spearman_rho(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Spearman rank correlation = Pearson correlation of average ranks.
    Matches ``scipy.stats.spearmanr`` (evaluate.py:35)."""
    rp = _rankdata(jnp.asarray(pred).reshape(-1))
    rt = _rankdata(jnp.asarray(target).reshape(-1))
    rp = rp - jnp.mean(rp)
    rt = rt - jnp.mean(rt)
    denom = jnp.sqrt(jnp.sum(rp * rp) * jnp.sum(rt * rt))
    return jnp.sum(rp * rt) / jnp.maximum(denom, _EPS)


# Above this length the host Knight-algorithm tau runs instead of the
# pairwise kernel (an [S,S] f32 at S=7168 is ~200 MB; several live at once
# during eval). Tracer inputs always take the pairwise path (jittable).
_TAU_PAIRWISE_MAX = 2048


def _kendall_tau_pairwise(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Kendall tau-b, O(n^2) pairwise formulation — fully vectorized for
    the VPU and jittable; the golden reference for the O(n log n) path."""
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


def _count_inversions(a: np.ndarray) -> int:
    """Inversions (pairs i<j with a[i] > a[j]) by merge sort with
    vectorized cross-counting — O(n log n), no [n,n] arrays."""
    n = a.shape[0]
    if n <= 1:
        return 0
    mid = n // 2
    left, right = a[:mid], a[mid:]
    inv = _count_inversions(left) + _count_inversions(right)
    left_sorted = np.sort(left)
    # for each r in right: #left strictly greater than r
    inv += int(
        (left_sorted.shape[0]
         - np.searchsorted(left_sorted, right, side="right")).sum()
    )
    return inv


def _tie_pair_count(sorted_x: np.ndarray) -> float:
    """sum over tie groups of t*(t-1)/2, given a sorted array."""
    _, counts = np.unique(sorted_x, return_counts=True)
    c = counts.astype(np.float64)
    return float((c * (c - 1.0) / 2.0).sum())


def _kendall_tau_knight(pred, target) -> float:
    """Kendall tau-b via Knight's O(n log n) algorithm: sort by (x, y),
    count discordant pairs as inversions of the y sequence, correct for
    ties. Matches ``scipy.stats.kendalltau`` without any [n,n] array."""
    x = np.asarray(pred, np.float64).reshape(-1)
    y = np.asarray(target, np.float64).reshape(-1)
    n = x.shape[0]
    if n < 2:
        return 0.0
    order = np.lexsort((y, x))  # primary x, secondary y
    xs, ys = x[order], y[order]
    n0 = n * (n - 1) / 2.0
    tx = _tie_pair_count(xs)
    ty = _tie_pair_count(np.sort(y))
    # pairs tied in BOTH x and y: tie groups of the (x, y) tuples
    both = xs + 1j * ys  # unique on complex pairs keeps (x,y) grouping
    txy = _tie_pair_count(both[np.argsort(both)])
    discordant = _count_inversions(ys)
    c_minus_d = n0 - tx - ty + txy - 2.0 * discordant
    denom = np.sqrt((n0 - tx) * (n0 - ty))
    return float(c_minus_d / max(denom, _EPS))


def kendall_tau(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Kendall tau-b, matching ``scipy.stats.kendalltau`` (evaluate.py:36).

    Concrete inputs longer than ``_TAU_PAIRWISE_MAX`` take the host
    O(n log n) Knight path; everything else (including any traced input)
    takes the vectorized pairwise kernel.
    """
    x = jnp.asarray(pred)
    if (
        not isinstance(x, jax.core.Tracer)
        and not isinstance(jnp.asarray(target), jax.core.Tracer)
        and x.size > _TAU_PAIRWISE_MAX
    ):
        return jnp.float32(_kendall_tau_knight(np.asarray(pred), np.asarray(target)))
    return _kendall_tau_pairwise(pred, target)


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
