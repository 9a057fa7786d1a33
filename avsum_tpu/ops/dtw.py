"""Dynamic time warping — alignment fidelity checking.

The reference DTW-aligns MFCC/mel streams to VGGish frames before
mean-pooling (/root/reference/features/extractors.py:277-284, plus the
dead fusion helpers in features/fusion.py:7-32). The production pipeline
replaces DTW with fixed-rate segment pooling (SURVEY.md §8.2: after
mean-pooling, path ordering is near-vacuous; DTW is inherently
sequential). This module keeps DTW available for exactly that fidelity
claim to be *checked*, plus general alignment use:

- ``dtw_host``: plain numpy O(N*M) DTW with full path backtracking
- ``dtw_cost_device``: jittable cost via anti-diagonal ``lax.scan``
  (each diagonal is a vectorized VPU update; the sequential dependency
  is over diagonals, length N+M, not cells)
- ``alignment_fidelity``: measures how much DTW-aligned mean pooling
  differs from plain mean pooling on real feature streams
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pairwise_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Euclidean distance matrix [N, M] (scipy.cdist semantics)."""
    a2 = (a * a).sum(-1)[:, None]
    b2 = (b * b).sum(-1)[None, :]
    d2 = np.maximum(a2 + b2 - 2.0 * a @ b.T, 0.0)
    return np.sqrt(d2)


def dtw_host(a: np.ndarray, b: np.ndarray) -> Tuple[float, List[Tuple[int, int]]]:
    """Exact DTW between feature sequences a [N, D], b [M, D].

    Returns (total cost, path as (i, j) pairs) — the contract of
    ``fastdtw(a, b, dist=cdist)`` as the reference calls it (with exact
    rather than approximate search).
    """
    dist = _pairwise_dist(
        np.asarray(a, np.float64).reshape(len(a), -1),
        np.asarray(b, np.float64).reshape(len(b), -1),
    )
    n, m = dist.shape
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        # vectorized row update still needs the running min over j; keep the
        # scalar loop here — host DTW is a test/debug tool, not a hot path
        for j in range(1, m + 1):
            acc[i, j] = dist[i - 1, j - 1] + min(
                acc[i - 1, j], acc[i, j - 1], acc[i - 1, j - 1]
            )
    # backtrack
    path = [(n - 1, m - 1)]
    i, j = n, m
    while (i, j) != (1, 1):
        steps = [(i - 1, j - 1), (i - 1, j), (i, j - 1)]
        i, j = min(steps, key=lambda ij: acc[ij])
        path.append((i - 1, j - 1))
    return float(acc[n, m]), path[::-1]


@jax.jit
def dtw_cost_device(dist: jnp.ndarray) -> jnp.ndarray:
    """Total DTW cost from a [N, M] distance matrix, on device.

    Wavefront formulation: scan over the N+M-1 anti-diagonals; each step
    updates a whole diagonal with a vectorized 3-way min. Sequential work
    is O(N+M) scan steps instead of O(N*M) scalar cells.
    """
    dist = jnp.asarray(dist, jnp.float32)
    n, m = dist.shape
    inf = jnp.float32(3e38)
    # diag buffers padded to m+2 to keep static shapes
    width = m + 2

    def step(carry, k):
        prev2, prev1 = carry  # diagonals k-2 and k-1, padded [width]
        j = jnp.arange(width) - 1  # j index into [0, m)
        i = k - j
        valid = (j >= 0) & (j < m) & (i >= 0) & (i < n)
        d = dist[jnp.clip(i, 0, n - 1), jnp.clip(j, 0, m - 1)]
        up = prev1  # cell (i-1, j) lives at same j slot in diag k-1
        left = jnp.roll(prev1, 1)  # cell (i, j-1) at slot j-1
        diag = jnp.roll(prev2, 1)  # cell (i-1, j-1)
        best = jnp.minimum(jnp.minimum(up, left), diag)
        start = (i == 0) & (j == 0)
        cur = jnp.where(start, d, d + best)
        cur = jnp.where(valid, cur, inf)
        return (prev1, cur), None

    init = (jnp.full(width, inf), jnp.full(width, inf))
    (prev2, prev1), _ = jax.lax.scan(
        step, init, jnp.arange(n + m - 1)
    )
    # final cell (n-1, m-1) sits at slot j = m-1 -> index m in padded buffer
    return prev1[m]


def aligned_mean(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Mean of b along a DTW path against a (the reference's
    ``aligned_mfcc.mean(0)`` semantics, extractors.py:231-234)."""
    _, path = dtw_host(a, b)
    return np.stack([b[j] for _, j in path]).mean(axis=0)


def alignment_fidelity(a: np.ndarray, b: np.ndarray) -> float:
    """Relative L2 difference between DTW-aligned mean pooling of ``b``
    (against reference stream ``a``) and plain mean pooling — the number
    that justifies dropping DTW from the hot path (SURVEY.md §8.2)."""
    dtw_pool = aligned_mean(a, b)
    plain_pool = np.asarray(b).mean(axis=0)
    denom = np.linalg.norm(plain_pool) + 1e-12
    return float(np.linalg.norm(dtw_pool - plain_pool) / denom)
