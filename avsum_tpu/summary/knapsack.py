"""Vectorized 0/1 knapsack summary selection.

New capability the reference lacks (SURVEY.md §3.4: "no knapsack/summary-
selection step exists anywhere") but the canonical TVSum/SumMe protocol
requires: pick shots maximizing total importance subject to a summary
budget of ``budget_fraction`` (15%) of the video's frames.

TPU design: the DP is a ``lax.scan`` over shots whose carry is the dense
value table over all capacities — each step is a vectorized shift+max on
the VPU (O(S*C) work, O(C) carry), instead of the classic doubly-nested
host loop. Backtracking is a second (reverse) scan over the keep table.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("capacity",))
def knapsack_select(
    values: jnp.ndarray,
    weights: jnp.ndarray,
    capacity: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Exact 0/1 knapsack. Returns a boolean selection mask over items.

    Args:
      values: [S] float item values (e.g. shot_score * shot_length).
      weights: [S] integer item weights (e.g. shot length in frames).
      capacity: static int budget (e.g. int(0.15 * total_frames)).
      mask: [S] optional validity mask for padded shot sequences.
    """
    values = jnp.asarray(values, jnp.float32)
    weights = jnp.asarray(weights, jnp.int32)
    valid = (
        jnp.ones_like(values, dtype=bool)
        if mask is None
        else jnp.asarray(mask, bool)
    )
    caps = jnp.arange(capacity + 1, dtype=jnp.int32)

    def dp_step(dp, item):
        v, w, ok = item
        # dp[c - w] + v for every capacity c, -inf where c < w
        src = jnp.take(dp, jnp.clip(caps - w, 0, capacity))
        cand = jnp.where((caps >= w) & ok & (w > 0), src + v, NEG_INF)
        take = cand > dp
        return jnp.where(take, cand, dp), take

    dp0 = jnp.zeros(capacity + 1, jnp.float32)
    _, keep = jax.lax.scan(dp_step, dp0, (values, weights, valid))

    def back_step(c, item):
        keep_row, w = item
        sel = keep_row[c]
        return jnp.where(sel, c - w, c), sel

    _, selected_rev = jax.lax.scan(
        back_step, jnp.int32(capacity), (keep, weights), reverse=True
    )
    return selected_rev


def knapsack_select_np(
    values: np.ndarray,
    weights: np.ndarray,
    capacity: int,
    mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Vectorized NumPy DP (same algorithm/results as the jit version).

    For TVSum-sized problems (S~50, capacity~10^3-10^4) this is
    microseconds with zero compilation; the jit/device version pays a
    per-capacity XLA compile, which only amortizes at hour-scale capacities
    or when the data already lives on device.
    """
    values = np.asarray(values, np.float64).reshape(-1)
    weights = np.asarray(weights, np.int64).reshape(-1)
    valid = np.ones(len(values), bool) if mask is None else np.asarray(mask, bool)
    dp = np.zeros(capacity + 1)
    keep = np.zeros((len(values), capacity + 1), bool)
    caps = np.arange(capacity + 1)
    for i, (v, w, ok) in enumerate(zip(values, weights, valid)):
        if not ok or w <= 0 or w > capacity:
            continue
        cand = np.full(capacity + 1, NEG_INF)
        cand[w:] = dp[:-w] + v if w else dp + v
        take = cand > dp
        dp = np.where(take, cand, dp)
        keep[i] = take
    selected = np.zeros(len(values), bool)
    c = capacity
    for i in range(len(values) - 1, -1, -1):
        if keep[i, c]:
            selected[i] = True
            c -= int(weights[i])
    return selected


def select_summary(
    shot_scores: np.ndarray,
    shot_boundaries: np.ndarray,
    total_frames: int,
    budget_fraction: float = 0.15,
) -> Tuple[np.ndarray, np.ndarray]:
    """Shot scores -> summary selection under the canonical budget.

    Args:
      shot_scores: [S] importance per shot (model output in [0, 1]).
      shot_boundaries: [S, 2] (start_frame, end_frame) per shot.
      total_frames: video length in frames.
      budget_fraction: max summary length as a fraction of total_frames.

    Returns:
      (selected [S] bool, segments [K, 2] selected (start, end) pairs)
    """
    bounds = np.asarray(shot_boundaries, np.int64).reshape(-1, 2)
    lengths = np.maximum(bounds[:, 1] - bounds[:, 0], 0)
    scores = np.asarray(shot_scores, np.float32).reshape(-1)
    # value of a shot = its mean importance * its duration (frame-mass of
    # importance), the standard knapsack objective for this protocol.
    values = scores * lengths.astype(np.float32)
    capacity = int(budget_fraction * total_frames)
    if len(values) * (capacity + 1) < 50_000_000:
        selected = knapsack_select_np(values, lengths, capacity)
    else:
        selected = np.asarray(
            knapsack_select(values, lengths.astype(np.int32), capacity)
        )
    segments = bounds[selected]
    return selected, segments


def frame_summary_mask(
    segments: np.ndarray, total_frames: int
) -> np.ndarray:
    """Binary per-frame membership vector for a list of segments."""
    out = np.zeros(total_frames, dtype=bool)
    for start, end in np.asarray(segments, np.int64).reshape(-1, 2):
        out[max(0, start) : min(total_frames, end)] = True
    return out
