"""In-container audio: ISO-BMFF PCM demux + the missing-audio policy
(VERDICT round-1 item 3; reference behavior: extractors.py:364-386 pulled
audio out of the .mp4 itself via pydub/ffmpeg)."""

import numpy as np
import pytest

from avsum_tpu.io.mp4 import (
    Mp4NoAudioTrack,
    Mp4UnsupportedCodec,
    extract_audio,
    load_mp4_audio_mono_16k,
)
from avsum_tpu.io.synthetic import write_pcm_mp4


def _tone(n=32000, rate=16000, f=440.0):
    t = np.arange(n) / rate
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def _quantized(x):
    return (np.clip(x, -1, 1) * 32767).astype(np.int16).astype(np.float32) / 32768


def test_mono_sowt_roundtrip(tmp_path):
    wave = _tone()
    path = str(tmp_path / "a.mp4")
    write_pcm_mp4(path, wave, 16000)
    samples, rate = extract_audio(path)
    assert rate == 16000 and samples.shape == (32000, 1)
    np.testing.assert_allclose(samples[:, 0], _quantized(wave), atol=1e-4)
    mono = load_mp4_audio_mono_16k(path)
    np.testing.assert_allclose(mono, _quantized(wave), atol=1e-4)


def test_stereo_twos_odd_chunks_resampled(tmp_path):
    wave = _tone(30001, 22050)
    stereo = np.stack([wave, -wave], 1)
    path = str(tmp_path / "b.mov")
    write_pcm_mp4(path, stereo, 22050, chunk_frames=1000, codec="twos")
    samples, rate = extract_audio(path)
    assert rate == 22050 and samples.shape == (30001, 2)
    np.testing.assert_allclose(samples[:, 0], _quantized(wave), atol=1e-4)
    # stereo downmix of (x, -x) is ~0; resampled length tracks the ratio
    mono = load_mp4_audio_mono_16k(path)
    assert abs(len(mono) - int(30001 * 16000 / 22050)) <= 2
    assert np.abs(mono).max() < 1e-3


def test_compressed_codec_raises_with_advice(tmp_path):
    path = str(tmp_path / "aac.mp4")
    write_pcm_mp4(path, _tone(1600), 16000, codec="mp4a")
    with pytest.raises(Mp4UnsupportedCodec, match="sidecar"):
        extract_audio(path)


def test_not_an_mp4(tmp_path):
    path = str(tmp_path / "junk.mp4")
    with open(path, "wb") as fh:
        fh.write(b"\x00" * 64)
    with pytest.raises(Exception, match="moov|MP4"):
        extract_audio(path)


# ---------------------------------------------------------------------------
# pipeline policy
# ---------------------------------------------------------------------------


def _pipeline(**audio_overrides):
    from avsum_tpu.pipeline import AVPipeline
    from avsum_tpu.train.config import load_config

    overrides = [f"audio.{k}={v}" for k, v in audio_overrides.items()]
    cfg = load_config(overrides=overrides)
    return AVPipeline.__new__(AVPipeline), cfg  # avoid frontends for unit test


def _load_audio(cfg, path, duration=1.0):
    from avsum_tpu.pipeline import AVPipeline

    p = AVPipeline.__new__(AVPipeline)
    p.config = cfg
    return AVPipeline._load_audio(p, path, duration)


def test_pipeline_prefers_sidecar_then_container(tmp_path):
    from avsum_tpu.io.wav import write_wav
    from avsum_tpu.train.config import load_config

    cfg = load_config()
    video = str(tmp_path / "v.mp4")
    write_pcm_mp4(video, _tone(16000, f=220.0), 16000)
    # no sidecar -> container track
    out = _load_audio(cfg, video)
    np.testing.assert_allclose(out, _quantized(_tone(16000, f=220.0)), atol=1e-4)
    # sidecar wins over the container; mono-16k-PCM16 sidecars ship int16
    # (normalized on device by the audio front-end — see
    # avsum_tpu/io/wav.py::load_audio_mono_16k_ship)
    write_wav(str(tmp_path / "v.wav"), _tone(16000, f=880.0), 16000)
    out2 = _load_audio(cfg, video)
    assert out2.dtype == np.int16
    np.testing.assert_allclose(
        out2.astype(np.float32) / 32768.0,
        _quantized(_tone(16000, f=880.0)),
        atol=2e-4,
    )


def test_pipeline_errors_on_undecodable_audio_by_default(tmp_path):
    from avsum_tpu.train.config import load_config

    video = str(tmp_path / "compressed.mp4")
    write_pcm_mp4(video, _tone(1600), 16000, codec="mp4a")
    with pytest.raises(Mp4UnsupportedCodec):
        _load_audio(load_config(), video)
    # opt-in fallback restores the lenient behavior
    cfg = load_config(overrides=["audio.silence_fallback=true"])
    out = _load_audio(cfg, video, duration=2.0)
    assert out.shape == (32000,) and np.all(out == 0.0)


def test_pipeline_errors_on_missing_sidecar_for_y4m(tmp_path):
    from avsum_tpu.train.config import load_config

    video = str(tmp_path / "nosound.y4m")  # never opened; policy is ext-based
    with pytest.raises(RuntimeError, match="sidecar"):
        _load_audio(load_config(), video)
    cfg = load_config(overrides=["audio.silence_fallback=true"])
    out = _load_audio(cfg, video, duration=1.5)
    assert out.shape == (24000,) and np.all(out == 0.0)


# ---------------------------------------------------------------------------
# MJPEG video track: in-container video ingest
# ---------------------------------------------------------------------------


def _mjpeg_file(tmp_path, name="clip.mp4", n_scenes=4, fps=25.0, with_audio=True):
    from avsum_tpu.io.mp4_mux import write_mjpeg_mp4
    from avsum_tpu.io.synthetic import make_scene_video

    video, audio, scenes = make_scene_video(
        n_scenes=n_scenes, seed=3, height=72, width=96, fps=fps
    )
    path = str(tmp_path / name)
    write_mjpeg_mp4(
        path, video, fps=fps, audio=audio if with_audio else None, audio_rate=16000
    )
    return path, video, audio, scenes


def test_mjpeg_reader_roundtrip(tmp_path):
    from avsum_tpu.io.mp4 import Mp4VideoReader
    from avsum_tpu.io.video import open_video

    path, video, audio, _ = _mjpeg_file(tmp_path)
    r = open_video(path)
    assert isinstance(r, Mp4VideoReader)
    assert (r.width, r.height, r.n_frames) == (96, 72, len(video))
    assert r.fps == pytest.approx(25.0)
    # lossy but close (synthetic scenes are smooth; JPEG err is small)
    f0 = r.read_frame(0).astype(np.float32)
    assert np.abs(f0 - video[0].astype(np.float32)).mean() < 6.0
    batch = r.read_frames([0, 7, r.n_frames - 1])
    assert batch.shape == (3, 72, 96, 3)
    it = list(r.iter_frames(stop=5))
    np.testing.assert_array_equal(it[0], r.read_frame(0))
    r.close()
    # the container's PCM track is reachable from the same file
    samples, rate = extract_audio(path)
    assert rate == 16000
    np.testing.assert_allclose(
        samples[:, 0], np.clip(audio, -1, 1), atol=2 / 32768
    )


def test_unsupported_video_codec_advice(tmp_path):
    from avsum_tpu.io.mp4 import Mp4UnsupportedCodec
    from avsum_tpu.io.video import open_video

    path, *_ = _mjpeg_file(tmp_path, name="h264ish.mp4", n_scenes=2)
    data = bytearray(open(path, "rb").read())
    idx = data.find(b"jpeg", data.find(b"moov"))  # the stsd fourcc
    data[idx : idx + 4] = b"avc1"
    bad = str(tmp_path / "h264.mp4")
    with open(bad, "wb") as fh:
        fh.write(bytes(data))
    with pytest.raises(Mp4UnsupportedCodec, match="transcode"):
        open_video(bad)


@pytest.mark.slow
def test_pipeline_end_to_end_on_mp4_container(tmp_path):
    """The reference's whole flow on an actual .mp4 — video AND audio from
    the container, no sidecar (extractors.py:298-362 parity)."""
    from avsum_tpu.pipeline import AVPipeline
    from avsum_tpu.train.config import load_config

    path, video, audio, scenes = _mjpeg_file(tmp_path, n_scenes=4)
    cfg = load_config(
        overrides=[
            "visual.backbone=resnet50",
            "visual.sample_fps=2.0",
            "visual.max_frames_per_shot=8",
        ]
    )
    pipe = AVPipeline(cfg)
    p = pipe.process_video(path)
    assert p.visual.shape[1] == cfg.visual.feature_dim
    assert p.audio.shape[1] == 296
    assert len(p.boundaries) == len(p.visual) == len(p.audio)
    assert p.fps == pytest.approx(25.0) and p.n_frames == len(video)
    # shot detection found the scene structure from the JPEG frames
    true_cuts = {start for start, _ in scenes[1:]}
    found = {int(b[0]) for b in p.boundaries[1:]}
    assert sum(any(abs(c - f) <= 2 for f in found) for c in true_cuts) >= len(true_cuts) - 1
    # audio features are non-silent (the real soundtrack was demuxed)
    assert float(np.abs(p.audio[:, 40:168]).sum()) > 0
