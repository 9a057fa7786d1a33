"""Golden tests: spectral ops vs torch.stft / numpy references.

torch (CPU) is an independent implementation of the STFT the reference's
torchaudio transforms are built on — our matmul-DFT must match it."""

import numpy as np
import pytest
import torch

from avsum_tpu.ops.spectral import (
    amplitude_to_db,
    dct_matrix,
    frame_signal,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    mel_spectrogram,
    mfcc,
    power_spectrogram,
)


@pytest.fixture
def wave(rng):
    # 1 s of structured audio: two tones + noise
    t = np.arange(16000) / 16000
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 1337 * t)
    return (x + 0.05 * rng.standard_normal(len(t))).astype(np.float32)


def test_hann_window_matches_torch():
    ours = np.asarray(hann_window(400))
    theirs = torch.hann_window(400, periodic=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_power_spectrogram_matches_torch_stft(wave):
    ours = np.asarray(power_spectrogram(wave, n_fft=400, hop_length=200))
    spec = torch.stft(
        torch.from_numpy(wave),
        n_fft=400,
        hop_length=200,
        win_length=400,
        window=torch.hann_window(400),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    theirs = (spec.abs() ** 2).numpy().T  # [T, F]
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_mel_filterbank_properties():
    fb = np.asarray(mel_filterbank(201, 128, 16000))
    assert fb.shape == (201, 128)
    assert (fb >= 0).all()
    # NOTE: with n_mels=128 over 201 bins some low-frequency triangles are
    # genuinely empty (torchaudio warns about this exact configuration, which
    # the reference uses); most filters must have support though.
    assert (fb.sum(axis=0) > 0).mean() > 0.8
    # filters cover the band: most freq bins touched by some filter
    assert (fb.sum(axis=1)[5:-1] > 0).mean() > 0.95


def test_mel_filterbank_matches_htk_formula():
    """Independent numpy construction of the HTK triangle at one mel bin."""
    n_freqs, n_mels, sr = 201, 16, 16000
    fb = np.asarray(mel_filterbank(n_freqs, n_mels, sr))
    hz2mel = lambda f: 2595 * np.log10(1 + f / 700)
    mel2hz = lambda m: 700 * (10 ** (m / 2595) - 1)
    pts = mel2hz(np.linspace(hz2mel(0), hz2mel(sr / 2), n_mels + 2))
    freqs = np.linspace(0, sr / 2, n_freqs)
    m = 7  # arbitrary interior filter
    left, center, right = pts[m], pts[m + 1], pts[m + 2]
    expect = np.clip(
        np.minimum((freqs - left) / (center - left), (right - freqs) / (right - center)),
        0,
        None,
    )
    np.testing.assert_allclose(fb[:, m], expect, atol=1e-5)


def test_log_mel_semantics(wave):
    mel = np.asarray(mel_spectrogram(wave))
    logm = np.asarray(log_mel_spectrogram(wave))
    np.testing.assert_allclose(logm, np.log2(mel + 1e-6), rtol=1e-4, atol=1e-4)


def test_dct_matrix_orthonormal():
    d = np.asarray(dct_matrix(40, 128)).astype(np.float64)  # [128, 40]
    gram = d.T @ d
    np.testing.assert_allclose(gram, np.eye(40), atol=1e-5)


def test_amplitude_to_db_clamps():
    x = np.array([1.0, 1e-12, 100.0], np.float32)
    db = np.asarray(amplitude_to_db(x, top_db=80.0))
    assert db.max() == pytest.approx(20.0)
    assert db.min() >= db.max() - 80.0


def test_mfcc_shape_and_finiteness(wave):
    out = np.asarray(mfcc(wave))
    assert out.shape[1] == 40
    assert np.isfinite(out).all()
    # first coefficient carries overall energy: largest magnitude on average
    assert np.abs(out[:, 0]).mean() > np.abs(out[:, 1:]).mean()


def test_frame_signal_counts():
    frames = np.asarray(frame_signal(np.zeros(16000, np.float32), 400, 200))
    # torch.stft with center=True: 1 + T // hop frames
    assert frames.shape == (1 + 16000 // 200, 400)
