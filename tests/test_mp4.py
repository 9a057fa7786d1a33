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
    # sidecar wins over the container
    write_wav(str(tmp_path / "v.wav"), _tone(16000, f=880.0), 16000)
    out2 = _load_audio(cfg, video)
    np.testing.assert_allclose(out2, _quantized(_tone(16000, f=880.0)), atol=2e-4)


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
