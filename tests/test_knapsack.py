"""Knapsack selection vs a brute-force host reference."""

import itertools

import numpy as np
import pytest

from avsum_tpu.summary import knapsack_select, select_summary
from avsum_tpu.summary.knapsack import frame_summary_mask


def brute_force(values, weights, capacity):
    best, best_sel = 0.0, ()
    n = len(values)
    for r in range(n + 1):
        for combo in itertools.combinations(range(n), r):
            w = sum(weights[i] for i in combo)
            if w <= capacity:
                v = sum(values[i] for i in combo)
                if v > best + 1e-12:
                    best, best_sel = v, combo
    return best, set(best_sel)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_knapsack_optimal_small(seed):
    rng = np.random.default_rng(seed)
    n = 10
    values = rng.random(n).astype(np.float32) * 10
    weights = rng.integers(1, 15, n).astype(np.int32)
    capacity = int(weights.sum() * 0.4)
    sel = np.asarray(knapsack_select(values, weights, capacity))
    assert weights[sel].sum() <= capacity
    best, _ = brute_force(values.tolist(), weights.tolist(), capacity)
    assert values[sel].sum() == pytest.approx(best, rel=1e-5)


def test_knapsack_mask_excludes_padded_items():
    values = np.array([5.0, 5.0, 5.0, 5.0], np.float32)
    weights = np.array([1, 1, 1, 1], np.int32)
    mask = np.array([True, True, False, False])
    sel = np.asarray(knapsack_select(values, weights, 4, mask))
    assert not sel[2] and not sel[3]
    assert sel[0] and sel[1]


def test_knapsack_zero_capacity():
    sel = np.asarray(
        knapsack_select(np.ones(3, np.float32), np.ones(3, np.int32), 0)
    )
    assert not sel.any()


def test_select_summary_budget_respected():
    rng = np.random.default_rng(5)
    n_shots, total = 20, 1000
    cuts = np.sort(rng.choice(np.arange(1, total), n_shots - 1, replace=False))
    bounds = np.stack(
        [np.concatenate([[0], cuts]), np.concatenate([cuts, [total]])], axis=1
    )
    scores = rng.random(n_shots).astype(np.float32)
    selected, segments = select_summary(scores, bounds, total, budget_fraction=0.15)
    frames = frame_summary_mask(segments, total)
    assert frames.sum() <= int(0.15 * total)
    assert selected.sum() == len(segments)
    assert selected.any()  # something was picked
