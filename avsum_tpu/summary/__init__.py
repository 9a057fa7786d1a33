"""Summary selection + evaluation protocol.

The reference scores shots but never selects a summary (SURVEY.md §3.4 —
no knapsack exists in its code). This package supplies the canonical
15%-budget knapsack selection, the reference's keyframe-level metrics
(mean-threshold F1, Spearman, Kendall) and the segment-overlap F1 it
defined but never called.
"""

from avsum_tpu.summary.metrics import (
    evaluate_scores,
    keyframe_f1,
    kendall_tau,
    rank_correlations,
    segment_f1,
    segment_overlap,
    spearman_rho,
)
from avsum_tpu.summary.knapsack import knapsack_select, select_summary

__all__ = [
    "keyframe_f1",
    "spearman_rho",
    "kendall_tau",
    "rank_correlations",
    "segment_f1",
    "segment_overlap",
    "evaluate_scores",
    "knapsack_select",
    "select_summary",
]
