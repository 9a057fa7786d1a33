"""Tensor parallelism over the reserved ``model`` mesh axis (VERDICT
round-1 item 8 / SURVEY.md §2 #19): parameter-sharded matmuls for the
upgraded encoders, validated on a model=2 virtual mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from avsum_tpu.data.batching import batch_iterator
from avsum_tpu.data.synthetic import make_synthetic_videos
from avsum_tpu.models import make_model
from avsum_tpu.parallel import MeshConfig, build_mesh
from avsum_tpu.parallel.mesh import AXIS_MODEL
from avsum_tpu.train.config import ModelConfig, TrainConfig
from avsum_tpu.train.steps import (
    create_train_state,
    make_train_step,
    param_partition_spec,
    shard_batch_dict,
    shard_state,
)

CFG = ModelConfig(
    visual_dim=48, audio_dim=24, hidden_dim=32, scorer_hidden=16,
    num_heads=2, dropout=0.1,
)
TRAIN = TrainConfig(lr=3e-3, warmup_steps=2, seed=0)


@pytest.fixture(scope="module")
def mesh_tp():
    return build_mesh(MeshConfig(data=4, seq=1, model=2, auto_data=False))


def _batch():
    vids = make_synthetic_videos(
        n_videos=8, min_shots=6, max_shots=12,
        visual_dim=CFG.visual_dim, audio_dim=CFG.audio_dim, seed=5,
    )
    return next(iter(batch_iterator(vids, 8, 16, seed=5)))


def test_param_partition_spec(mesh_tp):
    spec2d = param_partition_spec(np.zeros((48, 32), np.float32), mesh_tp)
    assert spec2d == P(None, AXIS_MODEL)
    # odd output dims and vectors replicate
    assert param_partition_spec(np.zeros((48, 33), np.float32), mesh_tp) == P()
    assert param_partition_spec(np.zeros((32,), np.float32), mesh_tp) == P()


@pytest.mark.slow
def test_model_axis_training_matches_replicated(mesh_tp):
    model = make_model(CFG)
    batch = _batch()

    state_a = create_train_state(model, TRAIN, batch, total_steps=50)
    state_b = shard_state(
        create_train_state(model, TRAIN, batch, total_steps=50), mesh_tp
    )
    # params really are model-axis sharded (at least one matrix leaf)
    specs = [
        leaf.sharding.spec
        for leaf in jax.tree.leaves(state_b.params)
        if hasattr(leaf, "sharding")
    ]
    assert any(AXIS_MODEL in str(s) for s in specs), specs

    from avsum_tpu.train.steps import state_shardings

    step_single = make_train_step(model, mesh=None, seed=0)
    step_tp = make_train_step(
        model, mesh_tp, seed=0, state_sharding=state_shardings(state_b, mesh_tp)
    )

    for _ in range(3):
        state_a, ma = step_single(state_a, batch)
        state_b, mb = step_tp(state_b, shard_batch_dict(batch, mesh_tp))

    assert float(ma["loss"]) == pytest.approx(float(mb["loss"]), rel=1e-4)
    # sharded-matmul reduction order differs; AdamW's m/sqrt(v) amplifies
    # the ~1e-7 forward deltas over the first steps — 5e-4 is numerics-only
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state_a.params)),
        jax.tree.leaves(jax.device_get(state_b.params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    # params REMAIN tensor-parallel after the step (no silent re-replication)
    specs_after = [
        leaf.sharding.spec
        for leaf in jax.tree.leaves(state_b.params)
        if hasattr(leaf, "sharding")
    ]
    assert any(AXIS_MODEL in str(s) for s in specs_after), specs_after
