"""OpenCV compressed-container backend: reader semantics + e2e ingest.

The reference decoded every container through cv2.VideoCapture
(extractors.py:307-309); this framework reaches cv2 only for codecs the
native demuxer cannot handle (H.264/mp4v/...). These tests write an
mp4v-coded .mp4 (a codec the native path rejects) and drive it through
``open_video`` and the full pipeline.
"""

import os

import numpy as np
import pytest

from avsum_tpu.io.cv2video import cv2_available
from avsum_tpu.io.video import open_video

pytestmark = pytest.mark.skipif(
    not cv2_available(), reason="opencv-python not importable"
)


def _write_mp4v(path, frames, fps=30.0):
    import cv2

    h, w = frames.shape[1:3]
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    assert writer.isOpened()
    for frame in frames:
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()


def _flat_frames(n=24, h=48, w=64):
    """Per-frame constant luma ramp — survives lossy mp4v encoding."""
    frames = np.zeros((n, h, w, 3), np.uint8)
    for i in range(n):
        frames[i] = 40 + i * 8
    return frames


def test_open_video_dispatches_to_cv2(tmp_path):
    from avsum_tpu.io.cv2video import Cv2Reader

    path = str(tmp_path / "clip.mp4")
    frames = _flat_frames()
    _write_mp4v(path, frames)
    reader = open_video(path)
    try:
        assert isinstance(reader, Cv2Reader)
        assert (reader.width, reader.height) == (64, 48)
        assert reader.n_frames == len(frames)
        assert reader.fps == pytest.approx(30.0)
    finally:
        reader.close()


def test_cv2_reader_frame_values_and_seek(tmp_path):
    path = str(tmp_path / "clip.mp4")
    frames = _flat_frames()
    _write_mp4v(path, frames)
    reader = open_video(path)
    try:
        # sequential, random access, and batched reads agree with source
        for idx in (0, 7, 3, 23):
            got = reader.read_frame(idx)
            assert got.shape == (48, 64, 3)
            assert abs(float(got.mean()) - float(frames[idx].mean())) < 4.0
        batch = reader.read_frames([2, 10, 18])
        assert batch.shape == (3, 48, 64, 3)
        it = list(reader.iter_frames(start=20))
        assert len(it) == 4
        with pytest.raises(IndexError):
            reader.read_frame(len(frames))
    finally:
        reader.close()


def test_cv2_reader_rgb_channel_order(tmp_path):
    """A pure-red RGB source must come back red (BGR->RGB conversion)."""
    path = str(tmp_path / "red.mp4")
    frames = np.zeros((8, 48, 64, 3), np.uint8)
    frames[..., 0] = 200  # red in RGB
    _write_mp4v(path, frames)
    reader = open_video(path)
    try:
        got = reader.read_frame(4).astype(np.float32).mean(axis=(0, 1))
        assert got[0] > 150, got  # red channel dominant
        assert got[1] < 80 and got[2] < 80, got
    finally:
        reader.close()


@pytest.mark.slow
def test_pipeline_summarize_compressed_mp4(tmp_path):
    """Full summarize on an mp4v container: scene video re-encoded with a
    codec only the cv2 backend can decode, silence-fallback audio."""
    import jax
    import jax.numpy as jnp

    from avsum_tpu.io.synthetic import make_scene_video
    from avsum_tpu.models import make_model
    from avsum_tpu.pipeline import AVPipeline
    from avsum_tpu.train.config import load_config

    video, _audio, scenes = make_scene_video(
        n_scenes=4, seed=5, height=48, width=64
    )
    path = str(tmp_path / "scene.mp4")
    _write_mp4v(path, video)

    cfg = load_config(
        overrides=[
            "visual.backbone=tiny",
            "visual.dtype=float32",
            "audio.silence_fallback=true",
            "model.hidden_dim=32",
            "model.scorer_hidden=8",
        ]
    )
    pipeline = AVPipeline(cfg)
    model = make_model(cfg.model)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, cfg.model.visual_dim)),
        jnp.zeros((1, 4, cfg.model.audio_dim)),
        jnp.ones((1, 4)),
    )["params"]
    result = pipeline.summarize(path, model, params)
    assert result["n_frames"] == len(video)
    assert len(result["segments"]) >= 1
    # shot detection through the lossy codec still finds the scene cuts
    assert len(result["boundaries"]) >= 2
