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


@pytest.mark.parametrize("n,ties", [(33, True), (257, True), (400, False)])
def test_knight_tau_matches_pairwise_golden(n, ties):
    """The O(n log n) Knight path vs the O(n^2) pairwise kernel (the
    golden reference it replaces for long sequences)."""
    from avsum_tpu.summary.metrics import (
        _kendall_tau_knight,
        _kendall_tau_pairwise,
    )

    rng = np.random.default_rng(n)
    pred = rng.integers(0, 9, n).astype(np.float64) if ties else rng.random(n)
    target = np.round(pred + rng.normal(size=n), 0 if ties else 12)
    assert _kendall_tau_knight(pred, target) == pytest.approx(
        float(_kendall_tau_pairwise(pred, target)), abs=1e-4
    )
    assert _kendall_tau_knight(pred, target) == pytest.approx(
        kendalltau(pred, target).correlation, abs=1e-9
    )


def test_hour_scale_rank_metrics_no_pairwise_matrix():
    """S=7168 (1 h @ 30 fps, 2 fps sampling — SURVEY §5.7): rank metrics
    must run without materializing any [S,S] array (~200 MB each). The
    dispatch threshold sends concrete long inputs down the Knight path;
    scipy remains the oracle."""
    from avsum_tpu.summary.metrics import _TAU_PAIRWISE_MAX

    S = 7168
    assert S > _TAU_PAIRWISE_MAX
    rng = np.random.default_rng(42)
    pred = rng.integers(0, 100, S).astype(np.float32)
    target = (pred + rng.normal(size=S) * 30).astype(np.float32)
    out = evaluate_scores(pred, target)
    assert out["spearman"] == pytest.approx(
        spearmanr(pred, target).correlation, abs=1e-4
    )
    assert out["kendall"] == pytest.approx(
        kendalltau(pred, target).correlation, abs=1e-4
    )


def test_rank_metrics_still_jittable():
    """Traced inputs must keep working under jit (pairwise tau path,
    sort-based spearman)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    pred = np.round(rng.random(96), 1).astype(np.float32)
    target = np.round(rng.random(96), 1).astype(np.float32)
    f = jax.jit(lambda a, b: (spearman_rho(a, b), kendall_tau(a, b)))
    rho, tau = f(jnp.asarray(pred), jnp.asarray(target))
    assert float(rho) == pytest.approx(
        spearmanr(pred, target).correlation, abs=1e-4
    )
    assert float(tau) == pytest.approx(
        kendalltau(pred, target).correlation, abs=1e-4
    )


def test_evaluate_scores_bundle():
    rng = np.random.default_rng(7)
    pred = rng.random(80)
    out = evaluate_scores(pred, pred)  # identical -> perfect correlation
    assert out["spearman"] == pytest.approx(1.0, abs=1e-4)
    assert out["kendall"] == pytest.approx(1.0, abs=1e-4)
    assert 0.0 <= out["f1"] <= 1.0
