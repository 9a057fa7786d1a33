"""DTW: host exact DTW properties, device wavefront cost parity,
alignment-fidelity justification for the fixed-rate pooling decision."""

import numpy as np
import pytest

from avsum_tpu.ops.dtw import (
    _pairwise_dist,
    aligned_mean,
    alignment_fidelity,
    dtw_cost_device,
    dtw_host,
)


def test_pairwise_dist_matches_direct():
    rng = np.random.default_rng(0)
    a, b = rng.standard_normal((5, 3)), rng.standard_normal((7, 3))
    d = _pairwise_dist(a, b)
    for i in range(5):
        for j in range(7):
            assert d[i, j] == pytest.approx(np.linalg.norm(a[i] - b[j]), abs=1e-9)


def test_dtw_identical_sequences_zero_cost():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((10, 4))
    cost, path = dtw_host(a, a)
    assert cost == pytest.approx(0.0, abs=1e-5)
    assert path == [(i, i) for i in range(10)]


def test_dtw_path_monotone_and_complete():
    rng = np.random.default_rng(2)
    a, b = rng.standard_normal((8, 4)), rng.standard_normal((13, 4))
    cost, path = dtw_host(a, b)
    assert path[0] == (0, 0) and path[-1] == (7, 12)
    for (i0, j0), (i1, j1) in zip(path, path[1:]):
        assert (i1 - i0, j1 - j0) in {(0, 1), (1, 0), (1, 1)}
    assert cost > 0


def test_dtw_warp_invariance():
    """A time-warped copy (repeated frames) must align at ~zero cost."""
    rng = np.random.default_rng(3)
    a = rng.standard_normal((6, 4))
    b = np.repeat(a, 2, axis=0)  # each frame doubled
    cost, _ = dtw_host(a, b)
    assert cost == pytest.approx(0.0, abs=1e-5)


@pytest.mark.parametrize("n,m", [(6, 6), (8, 13), (1, 5)])
def test_device_cost_matches_host(n, m):
    rng = np.random.default_rng(n * 100 + m)
    a, b = rng.standard_normal((n, 4)), rng.standard_normal((m, 4))
    host_cost, _ = dtw_host(a, b)
    dev_cost = float(dtw_cost_device(_pairwise_dist(a, b)))
    assert dev_cost == pytest.approx(host_cost, rel=1e-5)


def test_alignment_fidelity_small_for_similar_rates():
    """The §8.2 decision check: for feature streams at comparable rates,
    DTW-aligned mean pooling ~= plain mean pooling."""
    rng = np.random.default_rng(5)
    base = np.cumsum(rng.standard_normal((40, 8)), axis=0) * 0.1
    a = base + 0.01 * rng.standard_normal((40, 8))
    b = base + 0.01 * rng.standard_normal((40, 8))
    rel = alignment_fidelity(a, b)
    assert rel < 0.15, rel


def test_aligned_mean_shape():
    rng = np.random.default_rng(6)
    a, b = rng.standard_normal((5, 3)), rng.standard_normal((9, 3))
    assert aligned_mean(a, b).shape == (3,)
