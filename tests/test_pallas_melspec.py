"""Fused Pallas log-mel kernel vs the XLA spectral ops (interpret mode)."""

import numpy as np
import pytest

from avsum_tpu.ops.pallas_melspec import fused_log_mel
from avsum_tpu.ops.spectral import log_mel_spectrogram, mel_spectrogram


@pytest.fixture
def wave(rng):
    t = np.arange(16000 * 2) / 16000
    x = 0.4 * np.sin(2 * np.pi * 523 * t) + 0.2 * np.sin(2 * np.pi * 97 * t)
    return (x + 0.02 * rng.standard_normal(len(t))).astype(np.float32)


def test_fused_matches_xla_ops(wave):
    mel_f, logmel_f = fused_log_mel(wave, interpret=True)
    mel_ref = np.asarray(mel_spectrogram(wave))
    logmel_ref = np.asarray(log_mel_spectrogram(wave))
    assert mel_f.shape == mel_ref.shape
    np.testing.assert_allclose(np.asarray(mel_f), mel_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(logmel_f), logmel_ref, rtol=2e-3, atol=2e-3
    )


def test_fused_short_waveform():
    wave = np.random.default_rng(1).standard_normal(1000).astype(np.float32)
    mel_f, logmel_f = fused_log_mel(wave, interpret=True)
    mel_ref = np.asarray(mel_spectrogram(wave))
    assert mel_f.shape == mel_ref.shape
    np.testing.assert_allclose(np.asarray(mel_f), mel_ref, rtol=2e-3, atol=2e-3)


def test_fused_rejects_bad_hop():
    with pytest.raises(ValueError, match="n_fft == 2"):
        fused_log_mel(np.zeros(1000, np.float32), n_fft=512, hop_length=160,
                      interpret=True)
