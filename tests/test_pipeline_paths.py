"""Pipeline path equivalence: the classic (pure-Python reader) path and the
overlapped native fast path must agree; long-video shapes stay bounded."""

import numpy as np
import pytest

import avsum_tpu.pipeline as pipeline_mod
from avsum_tpu.io.native import native_available
from avsum_tpu.io.synthetic import write_scene_video
from avsum_tpu.io.y4m import Y4MReader
from avsum_tpu.pipeline import AVPipeline
from avsum_tpu.train.config import load_config

pytestmark = pytest.mark.slow  # integration module: fixtures alone cost 15-50s


@pytest.fixture(scope="module")
def shared_pipeline(cfg):
    return AVPipeline(cfg)


@pytest.fixture(scope="module")
def cfg():
    return load_config(
        overrides=[
            "visual.backbone=tiny",
            "visual.max_frames_per_shot=8",
            "model.hidden_dim=32",
            "model.scorer_hidden=8",
        ]
    )


@pytest.mark.skipif(not native_available(), reason="libavsumio.so not built")
def test_fast_and_classic_paths_agree(cfg, shared_pipeline, tmp_path, monkeypatch):
    stem = str(tmp_path / "clip")
    write_scene_video(stem, n_scenes=3, seed=70, height=48, width=64)
    pipeline = shared_pipeline

    fast = pipeline.process_video(stem + ".y4m")
    # force the classic path by opening with the pure-Python reader
    monkeypatch.setattr(
        pipeline_mod, "open_video", lambda p, prefer_native=True: Y4MReader(p)
    )
    classic = pipeline.process_video(stem + ".y4m")

    np.testing.assert_array_equal(fast.boundaries, classic.boundaries)
    assert fast.visual.shape == classic.visual.shape
    assert fast.audio.shape == classic.audio.shape
    # YUV-on-device vs RGB-on-host conversions and sampling offsets differ
    # slightly; pooled features must still be strongly correlated
    for a, b in [(fast.visual, classic.visual), (fast.audio, classic.audio)]:
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.98, corr


def test_long_video_chunked_scorer(cfg, tmp_path):
    """Hour-scale shape handling in miniature: many shots + chunked
    attention; memory per attention block is O(chunk * S)."""
    import jax

    from avsum_tpu.models import make_model
    from avsum_tpu.train.config import ModelConfig

    s = 600  # shots (an hour of video at ~6 s/shot)
    mc = ModelConfig(
        visual_dim=32, audio_dim=16, hidden_dim=32, scorer_hidden=8,
        temporal_encoder="tcn", chunk_size=128,
    )
    model = make_model(mc)
    rng = jax.random.PRNGKey(0)
    visual = jax.random.normal(rng, (1, s, 32))
    audio = jax.random.normal(jax.random.fold_in(rng, 1), (1, s, 16))
    mask = np.ones((1, s), np.float32)
    params = model.init(rng, visual, audio, mask)["params"]
    out = jax.jit(
        lambda p, v, a, m: model.apply({"params": p}, v, a, m)
    )(params, visual, audio, mask)
    assert out.shape == (1, s)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(not native_available(), reason="libavsumio.so not built")
def test_summarize_longish_video_budget(cfg, shared_pipeline, tmp_path):
    stem = str(tmp_path / "long")
    write_scene_video(
        stem, n_scenes=12, seed=71, height=48, width=64,
        scene_len_frames=(60, 120),
    )
    result = shared_pipeline.summarize(stem + ".y4m")
    n = result["n_frames"]
    assert n > 700
    frames = sum(b - a for a, b in result["segments"])
    assert 0 < frames <= int(0.15 * n) + 1


@pytest.mark.skipif(not native_available(), reason="libavsumio.so not built")
def test_fast_path_short_shots_get_features(cfg, shared_pipeline, tmp_path):
    """Regression: shots shorter than the sampling stride must still get a
    (non-zero) visual feature in the overlapped path — their start frame is
    embedded in a follow-up dispatch."""
    stem = str(tmp_path / "short")
    # scenes as short as 16 frames vs stride 15 (30 fps / 2 fps sampling):
    # some shots will land between uniform samples
    write_scene_video(
        stem, n_scenes=6, seed=72, height=48, width=64,
        scene_len_frames=(16, 24),
    )
    p = shared_pipeline.process_video(stem + ".y4m")
    norms = np.linalg.norm(p.visual, axis=1)
    assert (norms > 0).all(), norms
