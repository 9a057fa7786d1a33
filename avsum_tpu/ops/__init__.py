"""Jittable primitives + Pallas TPU kernels (the hot ops)."""

from typing import Optional

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


def pallas_enabled(flag: Optional[bool] = None) -> bool:
    """Resolve a tri-state Pallas-kernel flag.

    ``True``/``False`` are explicit; ``None`` means auto — enabled exactly
    when the default jax backend is a TPU (Mosaic kernels compile natively
    there; everywhere else the XLA paths are the right dispatch).
    """
    if flag is not None:
        return bool(flag)
    import jax

    return jax.default_backend() == "tpu"


def _interpret_mode() -> bool:
    """Mosaic compiles natively only on TPU; elsewhere run the Pallas
    interpreter (slow but exact — keeps explicit use_pallas=True working
    in CPU tests)."""
    import jax

    return jax.default_backend() != "tpu"


def flash_attention(q, k, v, mask=None):
    from avsum_tpu.ops.attention import flash_attention as _fa

    return _fa(q, k, v, mask=mask, interpret=_interpret_mode())


def fused_log_mel(waveform, **kwargs):
    from avsum_tpu.ops.pallas_melspec import fused_log_mel as _fm

    kwargs.setdefault("interpret", _interpret_mode())
    return _fm(waveform, **kwargs)


def chunked_attention(q, k, v, mask=None, chunk_size=512):
    from avsum_tpu.ops.chunked import chunked_attention as _ca

    return _ca(q, k, v, mask=mask, chunk_size=chunk_size)


__all__ = [
    "pallas_enabled",
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
