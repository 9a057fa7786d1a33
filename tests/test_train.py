"""Training-step tests: loss decreases, sharded == single-device, resume."""

import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from avsum_tpu.data.batching import batch_iterator
from avsum_tpu.data.synthetic import make_synthetic_videos
from avsum_tpu.models import make_model
from avsum_tpu.parallel import MeshConfig, build_mesh
from avsum_tpu.train.config import Config, ModelConfig, TrainConfig
from avsum_tpu.train.steps import (
    create_train_state,
    make_eval_step,
    make_train_step,
    masked_mse,
    shard_batch_dict,
)

SMALL_MODEL = ModelConfig(
    visual_dim=48, audio_dim=24, hidden_dim=32, scorer_hidden=16, dropout=0.1
)
TRAIN = TrainConfig(lr=3e-3, warmup_steps=5, seed=0)


def _videos_and_batches(n=8, batch=4, max_shots=24, seed=0):
    vids = make_synthetic_videos(
        n_videos=n, min_shots=8, max_shots=20,
        visual_dim=SMALL_MODEL.visual_dim, audio_dim=SMALL_MODEL.audio_dim,
        seed=seed,
    )
    return vids, lambda: batch_iterator(vids, batch, max_shots, seed=seed)


@pytest.mark.slow
def test_loss_decreases_on_synthetic_data():
    model = make_model(SMALL_MODEL)
    _, batches = _videos_and_batches()
    first = next(iter(batches()))
    state = create_train_state(model, TRAIN, first, total_steps=200)
    step = make_train_step(model, mesh=None, seed=0)

    losses = []
    for epoch in range(10):
        for b in batches():
            state, metrics = step(state, b)
            losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_sharded_step_matches_single_device(mesh8):
    """Distributed-without-a-cluster (SURVEY.md §4 item 5): same batch, same
    params — the 8-device pjit step must produce the same loss and params
    as the unsharded step."""
    model = make_model(SMALL_MODEL)
    _, batches = _videos_and_batches(n=8, batch=8, max_shots=16)
    batch = next(iter(batches()))

    state_a = create_train_state(model, TRAIN, batch, total_steps=100)
    state_b = create_train_state(model, TRAIN, batch, total_steps=100)
    step_single = make_train_step(model, mesh=None, seed=0)
    step_sharded = make_train_step(model, mesh8, seed=0)

    for _ in range(3):
        state_a, ma = step_single(state_a, batch)
        state_b, mb = step_sharded(state_b, shard_batch_dict(batch, mesh8))

    assert float(ma["loss"]) == pytest.approx(float(mb["loss"]), rel=1e-4)
    pa = jax.tree.leaves(jax.device_get(state_a.params))
    pb = jax.tree.leaves(jax.device_get(state_b.params))
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_eval_step_deterministic_and_masked():
    model = make_model(SMALL_MODEL)
    _, batches = _videos_and_batches()
    batch = next(iter(batches()))
    state = create_train_state(model, TRAIN, batch, total_steps=10)
    eval_step = make_eval_step(model)
    o1 = eval_step(state.params, batch)
    o2 = eval_step(state.params, batch)
    np.testing.assert_array_equal(np.asarray(o1["preds"]), np.asarray(o2["preds"]))
    # padded positions must score exactly 0
    assert np.all(np.asarray(o1["preds"])[batch["mask"] == 0] == 0.0)


def test_masked_mse_ignores_padding():
    pred = np.array([[1.0, 1.0, 9.0]])
    tgt = np.array([[0.0, 1.0, 0.0]])
    mask = np.array([[1.0, 1.0, 0.0]])
    assert float(masked_mse(pred, tgt, mask)) == pytest.approx(0.5)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from avsum_tpu.train.checkpoint import CheckpointManager

    model = make_model(SMALL_MODEL)
    _, batches = _videos_and_batches()
    batch = next(iter(batches()))
    state = create_train_state(model, TRAIN, batch, total_steps=10)
    step = make_train_step(model, mesh=None, seed=0)
    state, _ = step(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(int(state.step), state, {"epoch": 0})

    template = create_train_state(model, TRAIN, batch, total_steps=10)
    restored, meta = mgr.restore(template)
    assert restored is not None
    assert int(restored.step) == int(state.step)
    assert meta == {"epoch": 0}
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    mgr.close()


@pytest.mark.slow
def test_score_video_covers_all_shots_past_bucket():
    """Long videos climb the bucket ladder: every shot is scored, none are
    truncated at data.max_shots (VERDICT round-1 item 7)."""
    from avsum_tpu.train.trainer import Trainer

    cfg = Config(model=SMALL_MODEL)
    base = cfg.data.max_shots  # 128
    vids = make_synthetic_videos(
        n_videos=1, min_shots=2 * base + 37, max_shots=2 * base + 37,
        visual_dim=SMALL_MODEL.visual_dim, audio_dim=SMALL_MODEL.audio_dim,
        seed=7,
    )
    long_ex = vids[0]
    assert long_ex.n_shots == 2 * base + 37

    trainer = Trainer(make_model(SMALL_MODEL), cfg, total_steps=10)
    first = next(iter(batch_iterator(vids, 1, base, seed=0)))
    trainer.init_state(first)

    scores = trainer.score_video(long_ex)
    assert scores.shape == (long_ex.n_shots,)
    assert np.isfinite(scores).all()
    # the tail past the training bucket carries real (nonzero) scores
    assert np.abs(scores[base:]).max() > 0

    # prefix consistency: scoring at the padded bucket directly agrees
    from avsum_tpu.data.batching import pad_batch
    from avsum_tpu.train.steps import shard_batch_dict

    bucket = base
    while bucket < long_ex.n_shots:
        bucket *= 2
    out = trainer.eval_step(
        trainer.state.params,
        shard_batch_dict(pad_batch([long_ex], bucket), trainer.mesh),
    )
    np.testing.assert_allclose(
        scores, np.asarray(out["preds"])[0, : long_ex.n_shots], atol=1e-6
    )


@pytest.mark.slow
def test_hour_scale_training_config_steps():
    """BASELINE config 5 viability: a long-sequence (hour-scale shaped)
    train step with chunked attention + remat runs and learns. (Full
    S=7200 runs on real HBM; the shape contract is what's under test.)"""
    cfg = ModelConfig(
        visual_dim=48, audio_dim=24, hidden_dim=32, scorer_hidden=16,
        num_heads=2, dropout=0.1, chunk_size=256, remat=True,
    )
    model = make_model(cfg)
    s = 1024
    rng = np.random.default_rng(4)
    batch = {
        "visual": rng.standard_normal((1, s, 48)).astype(np.float32),
        "audio": rng.standard_normal((1, s, 24)).astype(np.float32),
        "targets": (rng.random((1, s)) > 0.5).astype(np.float32),
        "mask": np.ones((1, s), np.float32),
    }
    state = create_train_state(model, TrainConfig(lr=3e-3, warmup_steps=2),
                               batch, total_steps=20)
    step = make_train_step(model, mesh=None, seed=0)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_matmul_precision_knob():
    """train.matmul_precision pins jax's default matmul precision
    process-wide; 'default' leaves it alone."""
    import jax

    from avsum_tpu.models import make_model
    from avsum_tpu.train.config import load_config
    from avsum_tpu.train.trainer import Trainer

    before = jax.config.jax_default_matmul_precision
    try:
        cfg = load_config(overrides=[
            "model.hidden_dim=16", "model.scorer_hidden=8",
            "train.matmul_precision=highest",
        ])
        Trainer(make_model(cfg.model), cfg)
        assert jax.config.jax_default_matmul_precision == "highest"
    finally:
        jax.config.update("jax_default_matmul_precision", before)


def test_ema_weight_averaging():
    """train.ema_decay maintains a Polyak average used for eval; 0 keeps
    the raw-params behavior with no ema state at all."""
    import jax
    import numpy as np

    from avsum_tpu.data.batching import batch_iterator
    from avsum_tpu.models import make_model
    from avsum_tpu.train.config import load_config
    from avsum_tpu.train.trainer import Trainer

    rng = np.random.default_rng(3)

    class Ex:
        def __init__(s, i):
            s.video_id = f"v{i}"
            s.n_shots = 8
            s.visual = rng.standard_normal((8, 8)).astype(np.float32)
            s.audio = rng.standard_normal((8, 4)).astype(np.float32)
            s.targets = rng.random(8).astype(np.float32)

    exs = [Ex(i) for i in range(4)]

    def batches(epoch=0):
        return batch_iterator(
            exs, batch_size=2, max_shots=8, shuffle=True, seed=epoch
        )

    def build(decay):
        cfg = load_config(overrides=[
            "model.hidden_dim=16", "model.scorer_hidden=8",
            "model.visual_dim=8", "model.audio_dim=4", "data.max_shots=8",
            "train.epochs=2", f"train.ema_decay={decay}",
            "train.checkpoint_dir=/tmp/ema_ck_" + str(decay),
        ])
        tr = Trainer(make_model(cfg.model), cfg)
        tr.fit(batches, epochs=2)
        return tr

    off = build(0.0)
    assert off.state.ema_params is None
    assert off.eval_params is off.state.params

    on = build(0.9)
    assert on.state.ema_params is not None
    assert on.eval_params is on.state.ema_params
    # the average lags the raw params but tracks them
    p = jax.tree.leaves(on.state.params)[0]
    e = jax.tree.leaves(on.state.ema_params)[0]
    assert not np.array_equal(np.asarray(p), np.asarray(e))
    assert np.abs(np.asarray(p) - np.asarray(e)).max() < 1.0
    # scoring runs through the averaged weights without error
    s = on.score_video(exs[0])
    assert s.shape == (8,) and np.isfinite(s).all()
