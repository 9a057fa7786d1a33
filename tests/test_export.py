"""StableHLO scorer export (serve/export.py): bake weights, round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsum_tpu.models import make_model
from avsum_tpu.serve.export import export_scorer, load_scorer
from avsum_tpu.train.config import ModelConfig


@pytest.fixture(scope="module")
def scorer():
    cfg = ModelConfig(hidden_dim=32, scorer_hidden=8)
    model = make_model(cfg)
    rng = jax.random.PRNGKey(0)
    v = jnp.zeros((1, 8, cfg.visual_dim))
    a = jnp.zeros((1, 8, cfg.audio_dim))
    m = jnp.ones((1, 8))
    params = model.init(rng, v, a, m)["params"]
    return cfg, model, params


@pytest.mark.slow
def test_export_roundtrip_matches_apply(scorer, tmp_path):
    cfg, model, params = scorer
    blob = export_scorer(
        model, params, cfg.visual_dim, cfg.audio_dim, platforms=("cpu",)
    )
    path = tmp_path / "scorer.stablehlo"
    path.write_bytes(blob)

    fn = load_scorer(path.read_bytes())
    rng = np.random.default_rng(0)
    for b, s in [(1, 8), (2, 16), (3, 40)]:  # symbolic axes: any shape
        v = rng.standard_normal((b, s, cfg.visual_dim)).astype(np.float32)
        a = rng.standard_normal((b, s, cfg.audio_dim)).astype(np.float32)
        m = np.ones((b, s), np.float32)
        want = np.asarray(model.apply({"params": params}, v, a, m))
        got = np.asarray(fn(v, a, m))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_needs_no_model_code(scorer):
    """The loaded artifact scores without touching the model object."""
    cfg, model, params = scorer
    blob = export_scorer(
        model, params, cfg.visual_dim, cfg.audio_dim, platforms=("cpu",)
    )
    fn = load_scorer(blob)
    del model, params
    out = np.asarray(fn(
        np.zeros((1, 4, cfg.visual_dim), np.float32),
        np.zeros((1, 4, cfg.audio_dim), np.float32),
        np.ones((1, 4), np.float32),
    ))
    assert out.shape == (1, 4)
    assert np.isfinite(out).all()
    assert (out >= 0).all() and (out <= 1).all()  # sigmoid head


@pytest.mark.slow
def test_pipeline_scores_with_artifact(scorer, tmp_path):
    """summarize(path, artifact_fn, None) == summarize(path, model, params)."""
    from avsum_tpu.io.synthetic import write_scene_video
    from avsum_tpu.pipeline import AVPipeline
    from avsum_tpu.train.config import load_config

    cfg_m, model, params = scorer
    stem = str(tmp_path / "clip")
    write_scene_video(
        stem, n_scenes=3, seed=3, fps=8.0, height=64, width=96,
        scene_len_frames=(10, 16),
    )
    cfg = load_config(
        overrides=[
            "visual.backbone=tiny",
            "visual.dtype=float32",
            "audio.silence_fallback=true",
            f"model.hidden_dim={cfg_m.hidden_dim}",
            f"model.scorer_hidden={cfg_m.scorer_hidden}",
        ]
    )
    pipe = AVPipeline(cfg)
    with_model = pipe.summarize(stem + ".y4m", model, params)
    artifact = load_scorer(
        export_scorer(
            model, params, cfg_m.visual_dim, cfg_m.audio_dim,
            platforms=("cpu",),
        )
    )
    with_artifact = pipe.summarize(stem + ".y4m", artifact, None)
    np.testing.assert_allclose(
        with_artifact["scores"], with_model["scores"], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        with_artifact["segments"], with_model["segments"]
    )


def test_cli_export_random_init(tmp_path, capsys):
    """`avsum export --random-init` writes a loadable artifact."""
    from avsum_tpu.cli.main import main

    out = str(tmp_path / "scorer.hlo")
    rc = main([
        "export", "--random-init", "--platforms", "cpu", "--output", out,
        "--set", "model.hidden_dim=32", "--set", "model.scorer_hidden=8",
    ])
    assert rc == 0
    fn = load_scorer(open(out, "rb").read())
    cfg = ModelConfig()
    res = np.asarray(fn(
        np.zeros((1, 5, cfg.visual_dim), np.float32),
        np.zeros((1, 5, cfg.audio_dim), np.float32),
        np.ones((1, 5), np.float32),
    ))
    assert res.shape == (1, 5) and np.isfinite(res).all()


def test_cli_export_requires_weights_source(capsys):
    from avsum_tpu.cli.main import main

    assert main(["export", "--output", "/tmp/x.hlo"]) == 1
