"""Ring attention wired INSIDE the scorer (VERDICT round-1 item 4).

With a mesh whose ``seq`` axis is >1, every self-attention in AVScorer runs
context-parallel via shard_map + ppermute (avsum_tpu/parallel/ring.py). The
sharded training step must (a) actually contain the ring collectives and
(b) produce the same params as unsharded full-attention training.
"""

import jax
import numpy as np
import pytest

from avsum_tpu.data.batching import batch_iterator
from avsum_tpu.data.synthetic import make_synthetic_videos
from avsum_tpu.models import make_model
from avsum_tpu.train.config import ModelConfig, TrainConfig
from avsum_tpu.train.steps import (

    create_train_state,
    make_train_step,
    shard_batch_dict,
)

pytestmark = pytest.mark.slow  # integration module: fixtures alone cost 15-50s

CFG = ModelConfig(
    visual_dim=48, audio_dim=24, hidden_dim=32, scorer_hidden=16,
    num_heads=2, dropout=0.1,
)


def _one_batch(max_shots=16):
    vids = make_synthetic_videos(
        n_videos=8, min_shots=8, max_shots=14,
        visual_dim=CFG.visual_dim, audio_dim=CFG.audio_dim, seed=3,
    )
    return next(iter(batch_iterator(vids, 8, max_shots, seed=3)))


def test_mesh_model_dispatches_ring(mesh8):
    """The seq>1 mesh model's forward must lower to collective-permute
    (the ring's K/V rotation) — proof the ring path is live, not just the
    XLA all-gather attention with sharding annotations."""
    model = make_model(CFG, mesh=mesh8)
    batch = _one_batch()
    params = model.init(
        jax.random.PRNGKey(0), batch["visual"], batch["audio"], batch["mask"]
    )["params"]

    from avsum_tpu.train.steps import batch_shardings

    bs = batch_shardings(mesh8)
    lowered = jax.jit(
        lambda p, v, a, m: model.apply({"params": p}, v, a, m),
        in_shardings=(None, bs["visual"], bs["audio"], bs["mask"]),
    ).lower(params, batch["visual"], batch["audio"], batch["mask"])
    text = lowered.as_text()
    assert "ppermute" in text or "collective_permute" in text, (
        "ring attention not present in the lowered program"
    )


@pytest.mark.slow
def test_ring_training_matches_full_attention(mesh8):
    """3 steps of ring-mode sharded training == 3 steps of unsharded
    full-attention training (same params out)."""
    model = make_model(CFG)
    batch = _one_batch()
    train = TrainConfig(lr=3e-3, warmup_steps=2, seed=0)

    state_a = create_train_state(model, train, batch, total_steps=50)
    state_b = create_train_state(model, train, batch, total_steps=50)
    step_full = make_train_step(model, mesh=None, seed=0)
    step_ring = make_train_step(model, mesh8, seed=0)  # clones onto mesh

    for _ in range(3):
        state_a, ma = step_full(state_a, batch)
        state_b, mb = step_ring(state_b, shard_batch_dict(batch, mesh8))

    assert float(ma["loss"]) == pytest.approx(float(mb["loss"]), rel=1e-4)
    # ring's online softmax reorders reductions vs the XLA softmax; AdamW's
    # m/sqrt(v) normalization amplifies the ~1e-6 forward deltas early in
    # training, so compare at 3e-4 (identical-math sharding tests use 1e-4)
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state_a.params)),
        jax.tree.leaves(jax.device_get(state_b.params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_ring_inference_matches_full(mesh8):
    model_full = make_model(CFG)
    model_ring = make_model(CFG, mesh=mesh8)
    batch = _one_batch()
    params = model_full.init(
        jax.random.PRNGKey(1), batch["visual"], batch["audio"], batch["mask"]
    )["params"]
    s_full = np.asarray(
        model_full.apply({"params": params}, batch["visual"], batch["audio"], batch["mask"])
    )
    s_ring = np.asarray(
        model_ring.apply(
            {"params": params}, batch["visual"], batch["audio"], batch["mask"]
        )
    )
    np.testing.assert_allclose(s_full, s_ring, rtol=2e-5, atol=2e-5)
    # padding invariance holds in ring mode too
    assert np.all(s_ring[np.asarray(batch["mask"]) == 0] == 0.0)
