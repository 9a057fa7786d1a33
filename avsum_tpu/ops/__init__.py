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


def fused_log_mel(waveform, **kwargs):
    from avsum_tpu.ops.pallas_melspec import fused_log_mel as _fm

    return _fm(waveform, **kwargs)


def chunked_attention(q, k, v, mask=None, chunk_size=512):
    from avsum_tpu.ops.chunked import chunked_attention as _ca

    return _ca(q, k, v, mask=mask, chunk_size=chunk_size)


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
    "fused_log_mel",
    "chunked_attention",
]
