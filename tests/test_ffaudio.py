"""Bundled-ffmpeg audio backend: ctypes ABI probe, codec decode, and the
pipeline's in-container compressed-audio fallback.

The reference pulled soundtracks out of containers with pydub->ffmpeg
(extractors.py:364-386); here the ffmpeg libraries shipped inside the
opencv-python wheel are bound directly. These tests pin: WAV bit-exact
round-trip, real MP3/OGG fixture decode, MP3 muxed as a genuine 'mp4a'
track (the real-dataset AAC shape) decoding through the fallback chain,
and the no-audio/undecodable distinction.
"""

import os

import numpy as np
import pytest

from avsum_tpu.io.ffaudio import (
    FFNoAudioStream,
    decode_audio,
    ffmpeg_audio_available,
    load_audio_mono_16k_ff,
)
from avsum_tpu.io.wav import read_wav, resample, to_mono, write_wav

pytestmark = pytest.mark.skipif(
    not ffmpeg_audio_available(), reason="bundled-ffmpeg libs not present"
)

_PYGAME_DATA = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data"
_MP3 = os.path.join(_PYGAME_DATA, "house_lo.mp3")
_OGG = os.path.join(_PYGAME_DATA, "house_lo.ogg")


def test_wav_decode_bitexact(tmp_path):
    rng = np.random.RandomState(3)
    want = np.clip(rng.randn(4096, 2) * 0.3, -1, 1).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, want, 44100)
    via_ff, rate = decode_audio(p)
    via_np, rate_np = read_wav(p)
    assert rate == rate_np == 44100
    np.testing.assert_array_equal(via_ff, via_np.astype(np.float32))


def test_mono16k_matches_wav_chain(tmp_path):
    rng = np.random.RandomState(4)
    x = np.clip(rng.randn(22050, 2) * 0.3, -1, 1).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, x, 22050)
    got = load_audio_mono_16k_ff(p)
    want = resample(to_mono(read_wav(p)[0]), 22050, 16000)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.shape == (16000,)


@pytest.mark.skipif(not os.path.exists(_MP3), reason="pygame fixture absent")
def test_real_mp3_decodes():
    x, rate = decode_audio(_MP3)
    assert rate == 11025 and x.shape[1] == 1
    assert x.shape[0] > 5 * rate  # ~7 s clip
    rms = float(np.sqrt((x**2).mean()))
    assert 0.05 < rms < 0.9  # real music, not silence/garbage


@pytest.mark.skipif(not os.path.exists(_OGG), reason="pygame fixture absent")
def test_real_ogg_decodes():
    x, rate = decode_audio(_OGG)
    assert rate == 11025 and x.shape[0] > 5 * rate


@pytest.mark.skipif(not os.path.exists(_MP3), reason="pygame fixture absent")
def test_mp3_in_mp4_track_roundtrip(tmp_path):
    """MP3 muxed as an 'mp4a'+esds track must decode identically to the
    bare stream, and the native demuxer must reject (not mis-decode) it."""
    from avsum_tpu.io.mp3 import parse_mp3
    from avsum_tpu.io.mp4 import Mp4UnsupportedCodec, load_mp4_audio_mono_16k
    from avsum_tpu.io.mp4_mux import write_mp3_mp4

    with open(_MP3, "rb") as fh:
        mp3 = fh.read()
    stream = parse_mp3(mp3)
    assert stream.sample_rate == 11025 and stream.samples_per_frame == 576

    p = str(tmp_path / "m.mp4")
    write_mp3_mp4(p, mp3)
    bare, rate_b = decode_audio(_MP3)
    muxed, rate_m = decode_audio(p)
    assert rate_b == rate_m
    n = min(len(bare), len(muxed))
    assert abs(len(bare) - len(muxed)) <= stream.samples_per_frame * 2
    np.testing.assert_allclose(bare[:n], muxed[:n], atol=1e-5)

    with pytest.raises(Mp4UnsupportedCodec):
        load_mp4_audio_mono_16k(p)


def test_aac_encode_mux_decode_roundtrip(tmp_path):
    """The full real-dataset shape: AAC-LC encoded with the bundled
    encoder, muxed as 'mp4a'+esds(ASC), decoded back through the
    demux->decode chain; the native demuxer must reject (not mis-read)."""
    from avsum_tpu.io.ffaudio import (
        aac_encode_available,
        audio_specific_config,
        encode_aac,
    )
    from avsum_tpu.io.mp4 import Mp4UnsupportedCodec, load_mp4_audio_mono_16k
    from avsum_tpu.io.mp4_mux import write_aac_mp4

    if not aac_encode_available():
        pytest.skip("bundled libavcodec lacks aac encoder or ABI probe")

    assert audio_specific_config(16000, 1) == bytes([0x14, 0x08])

    rate = 16000
    t = np.arange(rate * 2) / rate
    tone = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    packets, asc = encode_aac(tone, rate)
    assert len(packets) >= rate * 2 // 1024  # one AU per 1024 samples
    assert asc == bytes([0x14, 0x08])

    p = str(tmp_path / "aac.mp4")
    write_aac_mp4(p, tone, rate)
    x, got_rate = decode_audio(p)
    assert got_rate == rate and x.shape[1] == 1
    # duration within codec priming/padding slack
    assert abs(x.shape[0] - len(tone)) < 4 * 1024
    # the tone survives: dominant spectral peak at 440 Hz, right level
    mid = x[rate // 2 : rate // 2 + 8192, 0]
    spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    peak_hz = float(np.argmax(spec)) * rate / len(mid)
    assert abs(peak_hz - 440.0) < 4.0
    assert 0.2 < float(mid.std()) < 0.4

    with pytest.raises(Mp4UnsupportedCodec):
        load_mp4_audio_mono_16k(p)


def test_aac_mp4_with_video_through_pipeline_audio(tmp_path):
    """An mp4 whose video is MJPEG (native path) and audio is real AAC
    must yield the AAC soundtrack through AVPipeline._load_audio."""
    from avsum_tpu.io.ffaudio import aac_encode_available
    from avsum_tpu.io.mp4_mux import write_aac_mp4
    from avsum_tpu.pipeline import AVPipeline
    from avsum_tpu.train.config import load_config

    if not aac_encode_available():
        pytest.skip("bundled libavcodec lacks aac encoder or ABI probe")

    rate = 16000
    tone = (
        0.3 * np.sin(2 * np.pi * 220 * np.arange(rate) / rate)
    ).astype(np.float32)
    frames = (np.random.RandomState(2).rand(8, 32, 32, 3) * 255).astype(
        np.uint8
    )
    p = str(tmp_path / "clip.mp4")
    write_aac_mp4(p, tone, rate, frames=frames, fps=4)

    pipe = AVPipeline.__new__(AVPipeline)
    pipe.config = load_config(overrides=["visual.backbone=tiny"])
    got = pipe._load_audio(p, duration_s=1.0)
    want = load_audio_mono_16k_ff(p)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert float(np.std(got)) > 0.1  # real audio, not silence


def test_no_audio_stream_distinguished(tmp_path):
    from avsum_tpu.io.mp4_mux import write_mjpeg_mp4

    p = str(tmp_path / "v.mp4")
    frames = (np.random.RandomState(0).rand(4, 32, 32, 3) * 255).astype(
        np.uint8
    )
    write_mjpeg_mp4(p, frames, fps=4)  # video-only
    with pytest.raises(FFNoAudioStream):
        decode_audio(p)


@pytest.mark.skipif(not os.path.exists(_MP3), reason="pygame fixture absent")
def test_pipeline_falls_back_to_container_audio(tmp_path):
    """_load_audio: native demux rejects mp4a -> bundled-ffmpeg decodes it;
    a .wav sidecar still wins; with the backend gone the error surfaces."""
    import avsum_tpu.io.ffaudio as ffaudio_mod
    from avsum_tpu.io.mp4 import Mp4UnsupportedCodec
    from avsum_tpu.io.mp4_mux import write_mp3_mp4
    from avsum_tpu.pipeline import AVPipeline
    from avsum_tpu.train.config import load_config

    cfg = load_config(overrides=["visual.backbone=tiny"])
    pipe = AVPipeline.__new__(AVPipeline)  # _load_audio only reads config
    pipe.config = cfg

    with open(_MP3, "rb") as fh:
        mp3 = fh.read()
    frames = (np.random.RandomState(1).rand(6, 32, 32, 3) * 255).astype(
        np.uint8
    )
    p = str(tmp_path / "clip.mp4")
    write_mp3_mp4(p, mp3, frames=frames, fps=3)

    got = pipe._load_audio(p, duration_s=2.0)
    want = load_audio_mono_16k_ff(p)
    np.testing.assert_allclose(got, want, atol=1e-6)

    # sidecar convention still wins over container audio
    sidecar = str(tmp_path / "clip.wav")
    tone = (0.25 * np.sin(np.arange(16000) / 16000 * 2 * np.pi * 440)).astype(
        np.float32
    )
    write_wav(sidecar, tone, 16000)
    via_sidecar = np.asarray(pipe._load_audio(p, duration_s=1.0))
    assert via_sidecar.shape[0] == 16000
    assert not np.allclose(via_sidecar[:100], want[:100])
    os.remove(sidecar)

    # backend unavailable -> the clear transcode error surfaces again
    orig = ffaudio_mod.ffmpeg_audio_available
    ffaudio_mod.ffmpeg_audio_available = lambda: False
    try:
        assert not cfg.audio.silence_fallback
        with pytest.raises(Mp4UnsupportedCodec):
            pipe._load_audio(p, duration_s=2.0)
    finally:
        ffaudio_mod.ffmpeg_audio_available = orig
