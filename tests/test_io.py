"""Media I/O: WAV/Y4M roundtrips, native C++ reader parity, synthetic gen."""

import numpy as np
import pytest

from avsum_tpu.io import (
    Y4MReader,
    open_video,
    read_wav,
    resample_linear,
    to_mono,
    write_wav,
    write_y4m,
)
from avsum_tpu.io.native import NativeY4MReader, native_available
from avsum_tpu.io.synthetic import make_scene_video, write_scene_video


def test_wav_roundtrip_mono(tmp_path):
    rng = np.random.default_rng(0)
    x = (0.8 * rng.standard_normal(16000)).clip(-1, 1).astype(np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, x, 16000)
    y, rate = read_wav(path)
    assert rate == 16000
    np.testing.assert_allclose(y[:, 0], x, atol=1.0 / 8000)


def test_wav_roundtrip_stereo_downmix(tmp_path):
    rng = np.random.default_rng(1)
    x = (0.5 * rng.standard_normal((8000, 2))).clip(-1, 1).astype(np.float32)
    path = str(tmp_path / "s.wav")
    write_wav(path, x, 44100)
    y, rate = read_wav(path)
    assert rate == 44100 and y.shape == (8000, 2)
    mono = to_mono(y)
    np.testing.assert_allclose(mono, x.mean(1), atol=1.0 / 8000)


def test_resample_preserves_tone():
    sr_in, sr_out, freq = 44100, 16000, 440.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    y = resample_linear(x, sr_in, sr_out)
    assert len(y) == sr_out
    # dominant FFT bin still at 440 Hz
    spectrum = np.abs(np.fft.rfft(y))
    peak_hz = np.argmax(spectrum) * sr_out / len(y)
    assert abs(peak_hz - freq) < 2.0


def test_y4m_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    # smooth-ish frames: chroma 4:2:0 is lossy on sharp edges
    base = rng.integers(40, 216, (5, 1, 1, 3)).astype(np.uint8)
    frames = np.broadcast_to(base, (5, 48, 64, 3)).copy()
    path = str(tmp_path / "v.y4m")
    write_y4m(path, frames, fps=25.0)
    with Y4MReader(path) as reader:
        assert (reader.n_frames, reader.height, reader.width) == (5, 48, 64)
        assert reader.fps == 25.0
        out = reader.read_frames(range(5))
    assert out.shape == frames.shape
    assert np.abs(out.astype(int) - frames.astype(int)).mean() < 3.0


def test_y4m_random_access(tmp_path):
    video, _, _ = make_scene_video(n_scenes=3, seed=3, height=48, width=64)
    path = str(tmp_path / "ra.y4m")
    write_y4m(path, video)
    with Y4MReader(path) as reader:
        last = reader.read_frame(reader.n_frames - 1)
        first = reader.read_frame(0)
        again = reader.read_frame(reader.n_frames - 1)
    np.testing.assert_array_equal(last, again)
    assert np.abs(first.astype(int) - last.astype(int)).mean() > 5.0


@pytest.mark.skipif(not native_available(), reason="libavsumio.so not built")
def test_native_reader_matches_python(tmp_path):
    video, _, _ = make_scene_video(n_scenes=3, seed=4, height=48, width=64)
    path = str(tmp_path / "n.y4m")
    write_y4m(path, video)
    with Y4MReader(path) as py_reader, NativeY4MReader(path) as nat:
        assert (nat.width, nat.height, nat.n_frames) == (
            py_reader.width,
            py_reader.height,
            py_reader.n_frames,
        )
        idx = [0, 5, py_reader.n_frames - 1]
        a = py_reader.read_frames(idx).astype(int)
        b = nat.read_frames(idx).astype(int)
    # python uses float rounding, C++ 16.16 fixed point: off-by-one max
    assert np.abs(a - b).max() <= 1


@pytest.mark.skipif(not native_available(), reason="libavsumio.so not built")
def test_native_prefetch_blocks_cover_stream(tmp_path):
    video, _, _ = make_scene_video(n_scenes=2, seed=5, height=32, width=32)
    path = str(tmp_path / "p.y4m")
    write_y4m(path, video)
    with NativeY4MReader(path) as nat:
        seen = []
        for first, block in nat.iter_blocks(block_frames=16):
            seen.extend(range(first, first + block.shape[0]))
            ref = nat.read_frames([first])[0]
            np.testing.assert_array_equal(block[0], ref)
        assert seen == list(range(nat.n_frames))


def test_open_video_dispatch_and_paired_audio(tmp_path):
    stem = str(tmp_path / "clip")
    scenes = write_scene_video(stem, n_scenes=2, seed=6)
    reader = open_video(stem + ".y4m")
    assert reader.n_frames == scenes[-1][1]
    from avsum_tpu.io.video import audio_path_for

    assert audio_path_for(stem + ".y4m") == stem + ".wav"
    reader.close()


def test_open_video_unsupported_extension(tmp_path):
    bad = tmp_path / "x.mp4"
    bad.write_bytes(b"\x00" * 100)
    with pytest.raises(RuntimeError, match="cannot decode"):
        open_video(str(bad))


@pytest.mark.skipif(not native_available(), reason="libavsumio.so not built")
def test_native_prefetch_with_stride(tmp_path):
    video, _, _ = make_scene_video(n_scenes=2, seed=65, height=32, width=32)
    path = str(tmp_path / "st.y4m")
    write_y4m(path, video)
    with NativeY4MReader(path) as nat:
        seen = []
        for first, block in nat.iter_blocks(block_frames=8, stride=3):
            # block frames are every 3rd frame starting at `first`
            ref = nat.read_frames(range(first, min(first + 3 * block.shape[0], nat.n_frames), 3))
            np.testing.assert_array_equal(block, ref)
            seen.append(first)
        assert seen[0] == 0


def test_resample_polyphase_rejects_aliasing():
    """44.1k -> 16k is a >2x downsample: a 10 kHz tone must vanish (it is
    above the 8 kHz Nyquist of the target rate), not fold back into band —
    the failure mode of the linear resampler this replaces."""
    from avsum_tpu.io.wav import resample, resample_linear

    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    tone = np.sin(2 * np.pi * 10000 * t).astype(np.float32)
    out = resample(tone, sr_in, sr_out)
    assert abs(len(out) - sr_out) <= 2
    # band-limited filter kills the out-of-band tone...
    assert float(np.sqrt(np.mean(out[100:-100] ** 2))) < 0.02
    # ...while the linear resampler aliases it (sanity of the comparison)
    lin = resample_linear(tone, sr_in, sr_out)
    assert float(np.sqrt(np.mean(lin[100:-100] ** 2))) > 0.1
    # an in-band tone passes through at unit amplitude
    tone2 = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    out2 = resample(tone2, sr_in, sr_out)
    assert 0.9 < float(np.abs(out2[100:-100]).max()) < 1.1
