"""Pipeline parallelism as a first-class config feature (SURVEY.md §2 row
19 pp): ``model.pp_stages`` stages a deep attention encoder over the
mesh's `model` axis end-to-end through the train/eval steps, and the MoE
expert-parallel config trains through the same path (ep). Exact parity
with the sequential (meshless) execution of the SAME parameters pins that
checkpoints are mesh-portable."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from avsum_tpu.data.batching import batch_iterator
from avsum_tpu.data.synthetic import make_synthetic_videos
from avsum_tpu.models import make_model
from avsum_tpu.parallel import MeshConfig, build_mesh
from avsum_tpu.train.config import ModelConfig, TrainConfig, load_config
from avsum_tpu.train.steps import (

    create_train_state,
    make_train_step,
    shard_batch_dict,
    state_shardings,
)

pytestmark = pytest.mark.slow  # integration module: fixtures alone cost 15-50s

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")

PP_MODEL = ModelConfig(
    visual_dim=48,
    audio_dim=24,
    hidden_dim=32,
    scorer_hidden=16,
    num_heads=4,
    temporal_layers=4,
    pp_stages=4,
    dropout=0.0,
)
TRAIN = TrainConfig(lr=3e-3, warmup_steps=5, seed=0)


def _pp_mesh():
    return build_mesh(MeshConfig(data=2, seq=1, model=4, auto_data=False))


def _videos_and_batches(n=8, batch=8, max_shots=16, seed=0):
    vids = make_synthetic_videos(
        n_videos=n, min_shots=8, max_shots=14,
        visual_dim=PP_MODEL.visual_dim, audio_dim=PP_MODEL.audio_dim,
        seed=seed,
    )
    return vids, lambda: batch_iterator(vids, batch, max_shots, seed=seed)


def test_pp_forward_exact_vs_sequential():
    """Same params: pipelined execution over the model axis == sequential
    lax.scan execution (mesh-portable checkpoints)."""
    mesh = _pp_mesh()
    seq_model = make_model(PP_MODEL)  # no mesh -> sequential stages
    pp_model = make_model(PP_MODEL, mesh=mesh)

    rng = jax.random.PRNGKey(0)
    b, s = 8, 16
    visual = jax.random.normal(rng, (b, s, PP_MODEL.visual_dim))
    audio = jax.random.normal(jax.random.fold_in(rng, 1), (b, s, PP_MODEL.audio_dim))
    mask = np.ones((b, s), np.float32)
    mask[:, 13:] = 0.0
    mask = jax.numpy.asarray(mask)

    params = seq_model.init(rng, visual, audio, mask)["params"]
    # stage params live on a leading [n_stages, ...] axis
    stages = params["visual_temporal"]["stages"]
    assert all(leaf.shape[0] == 4 for leaf in jax.tree.leaves(stages))

    ref = np.asarray(seq_model.apply({"params": params}, visual, audio, mask))
    out = np.asarray(
        jax.jit(pp_model.apply)({"params": params}, visual, audio, mask)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_pp_forward_batch_not_divisible_by_stages():
    """B=1 (the eval/score_video shape) still runs: microbatch count falls
    back to gcd(B, n_stages)."""
    mesh = _pp_mesh()
    seq_model = make_model(PP_MODEL)
    pp_model = make_model(PP_MODEL, mesh=mesh)
    rng = jax.random.PRNGKey(1)
    visual = jax.random.normal(rng, (1, 12, PP_MODEL.visual_dim))
    audio = jax.random.normal(rng, (1, 12, PP_MODEL.audio_dim))
    params = seq_model.init(rng, visual, audio)["params"]
    ref = np.asarray(seq_model.apply({"params": params}, visual, audio))
    out = np.asarray(pp_model.apply({"params": params}, visual, audio))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_pp_stage_mismatch_raises():
    mesh = _pp_mesh()
    bad = dataclasses.replace(PP_MODEL, pp_stages=2, temporal_layers=4)
    model = make_model(bad, mesh=mesh)
    rng = jax.random.PRNGKey(0)
    visual = jax.random.normal(rng, (4, 8, bad.visual_dim))
    audio = jax.random.normal(rng, (4, 8, bad.audio_dim))
    with pytest.raises(ValueError, match="pp_stages"):
        model.init(rng, visual, audio)


def test_pp_train_step_loss_decreases_and_stage_sharded():
    """The full pjit train step over the pipelined model: loss decreases,
    and with state_shardings each stage param leaf is sharded on its
    leading stage axis over `model` (per-device stage weights)."""
    mesh = _pp_mesh()
    model = make_model(PP_MODEL)
    _, batches = _videos_and_batches()
    first = next(iter(batches()))
    state = create_train_state(model, TRAIN, first, total_steps=200)
    st_shard = state_shardings(state, mesh)
    # stage leaves shard over the model axis on the leading (stage) dim
    stage_sh = jax.tree.leaves(st_shard.params["visual_temporal"]["stages"])
    assert all(sh.spec[0] == "model" for sh in stage_sh)
    state = jax.device_put(state, st_shard)
    step = make_train_step(model, mesh, seed=0, state_sharding=st_shard)

    losses = []
    for _ in range(10):
        for b in batches():
            state, metrics = step(state, shard_batch_dict(b, mesh))
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.6 * losses[0], (losses[0], losses[-1])


def _train_config_through_trainer(path, overrides):
    """Load a shipped parallelism config (scaled down) and run the real
    train step over its declared mesh."""
    cfg = load_config(path, overrides=overrides)
    mesh = build_mesh(
        MeshConfig(
            data=cfg.mesh.data, seq=cfg.mesh.seq, model=cfg.mesh.model,
            auto_data=cfg.mesh.auto_data,
        )
    )
    vids = make_synthetic_videos(
        n_videos=8, min_shots=8, max_shots=14,
        visual_dim=cfg.model.visual_dim, audio_dim=cfg.model.audio_dim,
        seed=0,
    )

    def batches():
        return batch_iterator(
            vids, cfg.data.batch_videos, cfg.data.max_shots, seed=0
        )

    model = make_model(cfg.model)
    first = next(iter(batches()))
    state = create_train_state(
        model, dataclasses.replace(cfg.train, lr=3e-3, warmup_steps=5),
        first, total_steps=200,
    )
    st_shard = state_shardings(state, mesh)
    state = jax.device_put(state, st_shard)
    step = make_train_step(model, mesh, seed=0, state_sharding=st_shard)
    losses = []
    for _ in range(25):
        for b in batches():
            state, metrics = step(state, shard_batch_dict(b, mesh))
            losses.append(float(metrics["loss"]))
    return losses


SMALL = [
    "model.visual_dim=48",
    "model.audio_dim=24",
    "model.hidden_dim=32",
    "model.scorer_hidden=16",
    "data.max_shots=16",
]


@pytest.mark.slow
def test_deep_pp_config_end_to_end():
    losses = _train_config_through_trainer(
        os.path.join(CONFIG_DIR, "deep_pp.yaml"),
        SMALL + ["model.temporal_layers=4"],
    )
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.6 * losses[0], (losses[0], losses[-1])


@pytest.mark.slow
def test_moe_ep_config_end_to_end():
    losses = _train_config_through_trainer(
        os.path.join(CONFIG_DIR, "moe_ep.yaml"), SMALL
    )
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.6 * losses[0], (losses[0], losses[-1])


@pytest.mark.slow
def test_pp_training_math_equals_sequential():
    """TRAINED params on the GPipe mesh match sequential-mesh training to
    float noise (round-5 bisect, docs/pp_param_equality_r05.log: the
    deep_pp quality gap is a trajectory/budget effect, not a pipeline
    bug — this pins that finding against regressions in the PP train
    path). Scaled-down deep_pp shape: 8 layers over 4 stages."""
    from scripts.exp_pp_param_equality import train

    import jax

    small = ["model.temporal_layers=8", "model.hidden_dim=32",
             "data.max_shots=8"]
    pp_params, _ = train(
        ["mesh.data=2", "mesh.seq=1", "mesh.model=4", "mesh.auto_data=false"],
        2, "pp-mesh", extra_overrides=small,
    )
    sq_params, _ = train(
        ["mesh.data=8", "mesh.seq=1", "mesh.model=1", "mesh.auto_data=false"],
        2, "seq-mesh", extra_overrides=small,
    )
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(pp_params),
        jax.tree_util.tree_leaves_with_path(sq_params),
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5,
            err_msg=jax.tree_util.keystr(ka),
        )
