"""Pipeline integration: synthetic video through decode -> shots ->
features -> cache -> train-one-step -> evaluate -> summarize
(SURVEY.md §4 item 4), with the tiny CPU backbone."""

import os

import numpy as np
import pytest

from avsum_tpu.data.cache import FeatureCache
from avsum_tpu.data.datasets import load_cached_examples
from avsum_tpu.io.synthetic import write_scene_video
from avsum_tpu.pipeline import AVPipeline
from avsum_tpu.train.config import load_config

pytestmark = pytest.mark.slow  # integration module: fixtures alone cost 15-50s


@pytest.fixture(scope="module")
def pipeline_cfg():
    return load_config(
        overrides=[
            "visual.backbone=tiny",
            "visual.max_frames_per_shot=8",
            "visual.frame_stride=5",
            "model.hidden_dim=32",
            "model.scorer_hidden=8",
        ]
    )


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    scenes = {}
    for i in range(2):
        stem = str(d / f"clip{i}")
        scenes[f"clip{i}"] = write_scene_video(
            stem, n_scenes=4, seed=10 + i, height=48, width=64
        )
    return d, scenes


@pytest.fixture(scope="module")
def processed(pipeline_cfg, media_dir, tmp_path_factory):
    d, scenes = media_dir
    pipeline = AVPipeline(pipeline_cfg)
    cache = FeatureCache(str(tmp_path_factory.mktemp("cache")))
    done = pipeline.preprocess_dataset(str(d), cache)
    return pipeline, cache, done, scenes


def test_preprocess_caches_both_videos(processed):
    _, cache, done, _ = processed
    assert sorted(done) == ["clip0", "clip1"]
    assert cache.video_ids() == ["clip0", "clip1"]


def test_cached_features_meet_contracts(processed, pipeline_cfg):
    _, cache, _, scenes = processed
    for vid in cache.video_ids():
        ex = cache.get(vid)
        assert ex.visual.shape[1] == pipeline_cfg.visual.feature_dim
        assert ex.audio.shape[1] == pipeline_cfg.audio.feature_dim
        assert ex.shot_boundaries.shape == (ex.n_shots, 2)
        assert np.isfinite(ex.visual).all() and np.isfinite(ex.audio).all()
        # shot count should be near the true scene count (4)
        assert 2 <= ex.n_shots <= 7
        # boundaries tile the whole video
        assert ex.shot_boundaries[0, 0] == 0
        assert ex.shot_boundaries[-1, 1] == ex.n_frames


def test_preprocess_skips_cached(processed, media_dir):
    pipeline, cache, _, _ = processed
    d, _ = media_dir
    before = {v: cache.meta(v) for v in cache.video_ids()}
    done = pipeline.preprocess_dataset(str(d), cache)  # second sweep
    assert sorted(done) == ["clip0", "clip1"]
    assert {v: cache.meta(v) for v in cache.video_ids()} == before


def test_preprocess_isolates_failures(pipeline_cfg, tmp_path):
    (tmp_path / "broken.y4m").write_bytes(b"not a video")
    stem = str(tmp_path / "good")
    write_scene_video(stem, n_scenes=2, seed=42, height=32, width=32)
    pipeline = AVPipeline(pipeline_cfg)
    cache = FeatureCache(str(tmp_path / "cache"))
    done = pipeline.preprocess_dataset(str(tmp_path), cache)
    assert done == ["good"]
    assert not cache.has("broken")


@pytest.mark.slow
def test_train_eval_on_extracted_features(processed, pipeline_cfg):
    from avsum_tpu.data.batching import batch_iterator
    from avsum_tpu.models import make_model
    from avsum_tpu.train.trainer import Trainer

    _, cache, _, _ = processed
    # synthetic targets: per-shot random-but-fixed frame scores
    rng = np.random.default_rng(0)
    frame_scores = {
        vid: rng.random(cache.get(vid).n_frames).astype(np.float32)
        for vid in cache.video_ids()
    }
    examples = load_cached_examples(cache, frame_scores)
    assert all(ex.targets.max() > 0 for ex in examples)

    cfg = pipeline_cfg
    batches = lambda: batch_iterator(examples, 2, 16, seed=0)  # noqa: E731
    trainer = Trainer(make_model(cfg.model), cfg, total_steps=20)
    trainer.init_state(next(iter(batches())))
    state0_loss = None
    for _ in range(8):
        for b in batches():
            from avsum_tpu.train.steps import shard_batch_dict

            b = shard_batch_dict(b, trainer.mesh)
            trainer.state, metrics = trainer.train_step(trainer.state, b)
            if state0_loss is None:
                state0_loss = float(metrics["loss"])
    assert float(metrics["loss"]) < state0_loss
    scores = trainer.evaluate_videos(batches())
    assert set(scores) == {"f1", "spearman", "kendall"}


def test_summarize_end_to_end(processed, media_dir, pipeline_cfg):
    pipeline, _, _, scenes = processed
    d, _ = media_dir
    result = pipeline.summarize(str(d / "clip0.y4m"))
    n = result["n_frames"]
    summary_frames = sum(b - a for a, b in result["segments"])
    assert 0 < summary_frames <= int(0.15 * n) + 1
    assert len(result["scores"]) == len(result["boundaries"])


def test_pipelined_sweep_isolates_finish_stage_failures(pipeline_cfg, tmp_path):
    """Cross-video pipelining must keep per-item isolation when a video
    fails in its FINISH stage (here: missing .wav sidecar -> audio policy
    error raised out of the joined wav thread), not just at open."""
    import os

    for i, name in enumerate(["a_ok", "b_bad", "c_ok"]):
        write_scene_video(str(tmp_path / name), n_scenes=2, seed=50 + i,
                          height=32, width=32)
    os.remove(str(tmp_path / "b_bad.wav"))  # silence_fallback=False -> error
    pipeline = AVPipeline(pipeline_cfg)
    cache = FeatureCache(str(tmp_path / "cache"))
    done = pipeline.preprocess_dataset(str(tmp_path), cache)
    assert done == ["a_ok", "c_ok"]
    assert cache.has("a_ok") and cache.has("c_ok") and not cache.has("b_bad")
