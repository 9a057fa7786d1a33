"""Failure recovery: a 'crashed' training run resumes from its checkpoint
and continues identically-shaped training (SURVEY.md §5.3/5.4 — the
reference had no persistence at all)."""

import numpy as np
import pytest

from avsum_tpu.data.batching import batch_iterator
from avsum_tpu.data.synthetic import make_synthetic_videos
from avsum_tpu.models import make_model
from avsum_tpu.train.config import load_config
from avsum_tpu.train.trainer import Trainer


def _world(tmp_path, epochs):
    cfg = load_config(
        overrides=[
            "model.visual_dim=32",
            "model.audio_dim=16",
            "model.hidden_dim=32",
            "model.scorer_hidden=8",
            "train.lr=3e-3",
            f"train.epochs={epochs}",
            f"train.checkpoint_dir={tmp_path}/ckpt",
            "train.eval_every_epochs=100",
        ]
    )
    vids = make_synthetic_videos(8, visual_dim=32, audio_dim=16, seed=5)
    batches = lambda: batch_iterator(vids, 4, 24, seed=1)  # noqa: E731
    return cfg, batches


@pytest.mark.slow
def test_crash_and_resume_continues_training(tmp_path):
    cfg, batches = _world(tmp_path, epochs=2)
    t1 = Trainer(make_model(cfg.model), cfg, total_steps=100)
    t1.fit(batches)  # runs 2 epochs, checkpoints each
    step_before = int(t1.state.step)
    from avsum_tpu.train.steps import shard_batch_dict

    eval_batch = shard_batch_dict(next(iter(batches())), t1.mesh)
    loss_before = float(t1.eval_step(t1.state.params, eval_batch)["loss"])

    # "crash": new process -> fresh Trainer, restore, train 2 more epochs
    cfg2, _ = _world(tmp_path, epochs=4)
    t2 = Trainer(make_model(cfg2.model), cfg2, total_steps=100)
    t2.init_state(next(iter(batches())))
    resumed_step = t2.maybe_restore()
    assert resumed_step == step_before

    meta_epoch = None
    _, meta = t2.ckpt.restore(t2.state)
    meta_epoch = meta["epoch"]
    t2.fit(batches, start_epoch=meta_epoch + 1)
    assert int(t2.state.step) > step_before
    eval_batch2 = shard_batch_dict(next(iter(batches())), t2.mesh)
    loss_after = float(t2.eval_step(t2.state.params, eval_batch2)["loss"])
    assert np.isfinite(loss_after)
    assert loss_after <= loss_before * 1.5  # no catastrophic reset
