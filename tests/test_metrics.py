"""Golden tests for metrics vs scipy / the reference's literal formulas
(/root/reference/scripts/evaluate.py:26-36, evaluation/metrics.py:1-9)."""

import numpy as np
import pytest
from scipy.stats import kendalltau, spearmanr

from avsum_tpu.summary import (
    evaluate_scores,
    kendall_tau,
    keyframe_f1,
    segment_f1,
    segment_overlap,
    spearman_rho,
)


def _reference_keyframe_f1(pred, target):
    # literal transcription of evaluate.py:26-33 semantics
    binary_pred = (pred > np.mean(pred)).astype(int)
    binary_target = (target > np.mean(target)).astype(int)
    tp = np.logical_and(binary_pred, binary_target).sum()
    precision = tp / binary_pred.sum()
    recall = tp / binary_target.sum()
    return 2 * (precision * recall) / (precision + recall + 1e-8)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_keyframe_f1_matches_reference_formula(seed):
    rng = np.random.default_rng(seed)
    pred = rng.random(200).astype(np.float32)
    target = rng.random(200).astype(np.float32)
    ours = float(keyframe_f1(pred, target))
    ref = _reference_keyframe_f1(pred, target)
    assert ours == pytest.approx(ref, abs=1e-5)


def test_keyframe_f1_masked_equals_sliced():
    rng = np.random.default_rng(3)
    pred = rng.random(64).astype(np.float32)
    target = rng.random(64).astype(np.float32)
    mask = np.zeros(64, bool)
    mask[:40] = True
    # pad tail with garbage; masked metric must ignore it
    pred_p, target_p = pred.copy(), target.copy()
    pred_p[40:] = 99.0
    target_p[40:] = -5.0
    masked = float(keyframe_f1(pred_p, target_p, mask))
    sliced = float(keyframe_f1(pred[:40], target[:40]))
    assert masked == pytest.approx(sliced, abs=1e-5)


@pytest.mark.parametrize("n,ties", [(50, False), (117, False), (60, True)])
def test_rank_correlations_match_scipy(n, ties):
    rng = np.random.default_rng(n)
    pred = rng.random(n)
    target = rng.random(n)
    if ties:
        pred = np.round(pred, 1)  # induce ties
        target = np.round(target, 1)
    assert float(spearman_rho(pred, target)) == pytest.approx(
        spearmanr(pred, target).correlation, abs=1e-4
    )
    assert float(kendall_tau(pred, target)) == pytest.approx(
        kendalltau(pred, target).correlation, abs=1e-4
    )


def test_segment_f1_matches_reference_formula():
    pred = [(0, 10), (20, 35)]
    gt = [(5, 12), (30, 50)]
    # reference metrics.py:1-9
    overlap = sum(
        max(0, min(pe, ge) - max(ps, gs)) for ps, pe in pred for gs, ge in gt
    )
    precision = overlap / sum(pe - ps for ps, pe in pred)
    recall = overlap / sum(ge - gs for gs, ge in gt)
    expected = 2 * precision * recall / (precision + recall + 1e-8)
    assert segment_overlap(pred, gt) == overlap
    assert segment_f1(pred, gt) == pytest.approx(expected, abs=1e-9)


def test_segment_f1_empty_inputs():
    assert segment_f1([], [(0, 10)]) == 0.0
    assert segment_f1([(0, 10)], []) == 0.0


def test_evaluate_scores_bundle():
    rng = np.random.default_rng(7)
    pred = rng.random(80)
    out = evaluate_scores(pred, pred)  # identical -> perfect correlation
    assert out["spearman"] == pytest.approx(1.0, abs=1e-4)
    assert out["kendall"] == pytest.approx(1.0, abs=1e-4)
    assert 0.0 <= out["f1"] <= 1.0
