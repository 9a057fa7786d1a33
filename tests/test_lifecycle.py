"""Deployment lifecycle: train -> checkpoint -> restore -> export -> serve.

Each stage is unit-tested elsewhere; this pins the chain end-to-end —
what a production rollout actually does with a trained model.
"""

import jax
import numpy as np
import pytest

from avsum_tpu.serve.export import export_scorer, load_scorer
from avsum_tpu.train.config import load_config


@pytest.mark.slow
def test_train_checkpoint_export_serve_chain(tmp_path):
    from avsum_tpu.cli.main import _load_scorer
    from avsum_tpu.models import make_model
    from avsum_tpu.train.checkpoint import CheckpointManager
    from avsum_tpu.train.config import TrainConfig
    from avsum_tpu.train.steps import create_train_state, make_train_step

    cfg = load_config(
        overrides=[
            "model.hidden_dim=32",
            "model.scorer_hidden=8",
            f"train.checkpoint_dir={tmp_path}/ckpt",
        ]
    )
    model = make_model(cfg.model)
    rng = np.random.default_rng(0)
    b, s = 2, 16
    batch = {
        "visual": rng.standard_normal((b, s, cfg.model.visual_dim)).astype(np.float32),
        "audio": rng.standard_normal((b, s, cfg.model.audio_dim)).astype(np.float32),
        "mask": np.ones((b, s), np.float32),
        "targets": rng.random((b, s)).astype(np.float32),
    }

    # train a few steps; loss must decrease
    state = create_train_state(model, cfg.train, batch, total_steps=30)
    step = make_train_step(model, None, seed=0)
    first = None
    for _ in range(8):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first, (first, last)

    # checkpoint -> restore through the CLI loader
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(int(state.step), state, {"epoch": 0})
    restored_model, restored_params = _load_scorer(cfg, str(tmp_path / "ckpt"))
    assert restored_model is not None

    v = rng.standard_normal((1, s, cfg.model.visual_dim)).astype(np.float32)
    a = rng.standard_normal((1, s, cfg.model.audio_dim)).astype(np.float32)
    m = np.ones((1, s), np.float32)
    live = np.asarray(model.apply({"params": state.params}, v, a, m))
    restored = np.asarray(
        restored_model.apply({"params": restored_params}, v, a, m)
    )
    np.testing.assert_allclose(restored, live, rtol=1e-6, atol=1e-6)

    # export the restored checkpoint -> artifact scores match live model
    blob = export_scorer(
        restored_model, restored_params,
        cfg.model.visual_dim, cfg.model.audio_dim, platforms=("cpu",),
    )
    artifact = load_scorer(blob)
    np.testing.assert_allclose(
        np.asarray(artifact(v, a, m)), live, rtol=1e-5, atol=1e-5
    )
