"""Jittable primitives + Pallas TPU kernels (the hot ops)."""

from avsum_tpu.ops.spectral import (
    dct_matrix,
    frame_signal,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    mel_spectrogram,
    mfcc,
    power_spectrogram,
)


def flash_attention(q, k, v, mask=None):
    from avsum_tpu.ops.attention import flash_attention as _fa

    return _fa(q, k, v, mask=mask)


__all__ = [
    "frame_signal",
    "hann_window",
    "power_spectrogram",
    "mel_filterbank",
    "mel_spectrogram",
    "log_mel_spectrogram",
    "dct_matrix",
    "mfcc",
    "flash_attention",
]
