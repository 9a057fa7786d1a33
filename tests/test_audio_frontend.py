"""Audio front-end: 296-d contract, VGGish shapes, segment pooling."""

import numpy as np
import pytest

from avsum_tpu.audio import AudioFrontend, VGGish, vggish_log_mel_patches
from avsum_tpu.audio.frontend import _segment_means


@pytest.fixture(scope="module")
def frontend():
    # one frontend for the module: VGGish init + jit compiles are the
    # dominant cost of these tests on a single host core
    return AudioFrontend()


def test_vggish_patches_shape():
    wav = np.random.default_rng(0).standard_normal(16000 * 3).astype(np.float32)
    patches = np.asarray(vggish_log_mel_patches(wav))
    # 3 s of audio -> ~300 frames of 10 ms hop -> 3 patches of 96 frames
    assert patches.shape == (3, 96, 64)
    assert np.isfinite(patches).all()


def test_vggish_patches_short_audio_padded():
    wav = np.zeros(1000, np.float32)
    patches = np.asarray(vggish_log_mel_patches(wav))
    assert patches.shape == (1, 96, 64)


@pytest.mark.slow
def test_vggish_network_output():
    import jax

    net = VGGish()
    params = net.init(jax.random.PRNGKey(0), np.zeros((2, 96, 64), np.float32))
    out = net.apply(params, np.random.default_rng(1).standard_normal((2, 96, 64)).astype(np.float32))
    assert out.shape == (2, 128)
    assert np.isfinite(np.asarray(out)).all()


def test_segment_means_matches_manual():
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((50, 4)).astype(np.float32)
    start = np.array([0, 10, 40])
    end = np.array([10, 40, 50])
    out = np.asarray(_segment_means(feats, start, end))
    for i, (s, e) in enumerate(zip(start, end)):
        np.testing.assert_allclose(out[i], feats[s:e].mean(0), atol=1e-4)


def test_shot_features_contract_296(frontend):
    rng = np.random.default_rng(3)
    sr = 16000
    wav = (0.1 * rng.standard_normal(sr * 4)).astype(np.float32)
    bounds = np.array([[0, sr], [sr, 2 * sr], [2 * sr, 4 * sr]], np.float32)
    fe = frontend
    out = np.asarray(fe.shot_features(wav, bounds))
    assert out.shape == (3, 296)
    assert np.isfinite(out).all()
    # different shots of different audio -> different features
    assert not np.allclose(out[0], out[2])


def test_shot_features_mask_zeroes_padded(frontend):
    sr = 16000
    wav = np.random.default_rng(4).standard_normal(sr).astype(np.float32) * 0.1
    bounds = np.array([[0, sr], [0, 0]], np.float32)
    mask = np.array([1.0, 0.0])
    fe = frontend
    out = np.asarray(fe.shot_features(wav, bounds, mask))
    assert np.all(out[1] == 0.0)
    assert not np.all(out[0] == 0.0)


def test_shot_features_empty_waveform_finite(frontend):
    """Degenerate audio (silence, minimal length) must stay finite —
    replaces the reference's zeros-fallback paths (extractors.py:197-211)."""
    sr = 16000
    wav = np.zeros(1600, np.float32)
    bounds = np.array([[0, 1600]], np.float32)
    fe = frontend
    out = np.asarray(fe.shot_features(wav, bounds))
    assert out.shape == (1, 296)
    assert np.isfinite(out).all()


def test_large_audio_encoder_contract():
    from avsum_tpu.train.config import AudioFeatConfig

    fe = AudioFrontend(AudioFeatConfig(encoder="large"))
    wav = np.random.default_rng(7).standard_normal(16000).astype(np.float32) * 0.1
    out = np.asarray(fe.shot_features(wav, np.array([[0, 16000]], np.float32)))
    assert out.shape == (1, 296)
    assert np.isfinite(out).all()


def test_int16_ship_path_matches_float32(frontend, tmp_path):
    """int16 waveforms (shipped at half the link bytes) must produce
    IDENTICAL features to the host-normalized float32 path, and the ship
    loader must keep mono-16k-PCM16 files in int16."""
    from avsum_tpu.io.wav import load_audio_mono_16k, load_audio_mono_16k_ship, write_wav

    sr = 16000
    rng = np.random.default_rng(11)
    f32 = (rng.standard_normal(2 * sr) * 0.2).clip(-1, 1).astype(np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, f32, sr)

    shipped = load_audio_mono_16k_ship(path)
    assert shipped.dtype == np.int16
    loaded = load_audio_mono_16k(path)
    np.testing.assert_allclose(
        shipped.astype(np.float32) / 32768.0, loaded, atol=0
    )

    bounds = np.array([[0, sr], [sr, 2 * sr]], np.float32)
    out_i16 = np.asarray(frontend.shot_features(shipped, bounds))
    out_f32 = np.asarray(frontend.shot_features(loaded, bounds))
    np.testing.assert_array_equal(out_i16, out_f32)


def test_int16_ship_loader_falls_back_for_stereo(tmp_path):
    from avsum_tpu.io.wav import load_audio_mono_16k_ship, write_wav

    sr = 16000
    x = np.stack([np.ones(sr, np.float32) * 0.5, np.zeros(sr, np.float32)], 1)
    path = str(tmp_path / "st.wav")
    write_wav(path, x, sr)
    out = load_audio_mono_16k_ship(path)
    assert out.dtype == np.float32  # stereo downmix needs the float chain
    np.testing.assert_allclose(out, np.full(sr, 0.25), atol=1e-4)
