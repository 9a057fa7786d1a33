"""Spectral ops: framing, STFT power spectrum, mel, log-mel, MFCC.

TPU-native replacement for the torchaudio transforms the reference calls
(/root/reference/features/extractors.py:236-246):
``MFCC(sample_rate=16000, n_mfcc=40)`` and
``MelSpectrogram(sample_rate=16000, n_mels=128)`` with torchaudio defaults
(n_fft=400, win=400, hop=200, center/reflect, power=2, HTK mel, norm=None).

Design: the DFT is expressed as two real matmuls (cos/sin bases) so the
whole chain frames -> window -> |DFT|^2 -> mel -> log is a sequence of
MXU matmuls + VPU elementwise ops that XLA fuses; there is no FFT
butterfly (data-dependent shuffles are hostile to the MXU, and for
n_fft=400 the dense DFT matmul is faster on TPU than a radix FFT).
This is the GEMM-native NDFT formulation for accelerator audio
front-ends (cf. MelT, arXiv:2606.01009 — see PAPERS.md).
A fully fused single-kernel Pallas variant lives in
:mod:`avsum_tpu.ops.pallas_melspec`.

Numerical semantics are golden-tested against a pure-numpy transcription
of torchaudio's documented algorithms (tests/test_spectral.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (torch.hann_window default, periodic=True)."""
    n = jnp.arange(win_length, dtype=jnp.float32)
    w = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * n / win_length))
    return w.astype(dtype)


def frame_signal(
    waveform: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    center: bool = True,
) -> jnp.ndarray:
    """[T] -> [n_frames, n_fft] overlapping frames (reflect-padded if
    ``center``, matching torch.stft defaults)."""
    x = jnp.asarray(waveform, jnp.float32).reshape(-1)
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (x.shape[0] - n_fft) // hop_length
    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * hop_length
        + jnp.arange(n_fft, dtype=jnp.int32)[None, :]
    )
    return jnp.take(x, idx)


@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int) -> tuple:
    """Real/imag DFT basis matrices [n_fft, n_fft//2+1] (host-cached)."""
    n_freqs = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    angle = -2.0 * np.pi * t * k / n_fft
    return (
        np.cos(angle).astype(np.float32),
        np.sin(angle).astype(np.float32),
    )


def power_spectrogram(
    waveform: jnp.ndarray,
    n_fft: int = 400,
    hop_length: int = 200,
    win_length: Optional[int] = None,
    center: bool = True,
) -> jnp.ndarray:
    """[T] -> [n_frames, n_fft//2+1] power spectrum (|STFT|^2)."""
    win_length = win_length or n_fft
    frames = frame_signal(waveform, n_fft, hop_length, center)
    window = hann_window(win_length)
    if win_length < n_fft:  # torch pads the window symmetrically
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frames * window[None, :]
    cos_b, sin_b = _dft_bases(n_fft)
    real = jnp.dot(frames, jnp.asarray(cos_b), preferred_element_type=jnp.float32)
    imag = jnp.dot(frames, jnp.asarray(sin_b), preferred_element_type=jnp.float32)
    return real * real + imag * imag


@functools.lru_cache(maxsize=16)
def _mel_fbank_np(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
) -> np.ndarray:
    """HTK-scale triangular mel filterbank [n_freqs, n_mels], norm=None —
    transcribing torchaudio.functional.melscale_fbanks semantics."""

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels+1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def mel_filterbank(
    n_freqs: int,
    n_mels: int = 128,
    sample_rate: int = 16000,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> jnp.ndarray:
    f_max = f_max if f_max is not None else sample_rate / 2.0
    return jnp.asarray(_mel_fbank_np(n_freqs, f_min, f_max, n_mels, sample_rate))


def mel_spectrogram(
    waveform: jnp.ndarray,
    sample_rate: int = 16000,
    n_fft: int = 400,
    hop_length: int = 200,
    win_length: Optional[int] = None,
    n_mels: int = 128,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> jnp.ndarray:
    """[T] -> [n_frames, n_mels] mel power spectrogram (torchaudio
    MelSpectrogram semantics, time-major layout)."""
    spec = power_spectrogram(waveform, n_fft, hop_length, win_length)
    fb = mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max)
    return jnp.dot(spec, fb, preferred_element_type=jnp.float32)


def log_mel_spectrogram(
    waveform: jnp.ndarray,
    sample_rate: int = 16000,
    n_mels: int = 128,
    eps: float = 1e-6,
    log_base2: bool = True,
    **kwargs,
) -> jnp.ndarray:
    """The reference's log-mel feature: log2(mel + 1e-6)
    (/root/reference/features/extractors.py:241-246)."""
    mel = mel_spectrogram(waveform, sample_rate, n_mels=n_mels, **kwargs)
    logm = jnp.log(mel + eps)
    return logm / jnp.log(2.0) if log_base2 else logm


@functools.lru_cache(maxsize=8)
def _dct_matrix_np(n_mfcc: int, n_mels: int) -> np.ndarray:
    """DCT-II with ortho norm, [n_mels, n_mfcc] — torchaudio
    functional.create_dct semantics."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)[None, :]
    dct = np.cos(np.pi / n_mels * (n[:, None] + 0.5) * k)
    dct *= np.sqrt(2.0 / n_mels)
    dct[:, 0] *= 1.0 / np.sqrt(2.0)
    return dct.astype(np.float32)


def dct_matrix(n_mfcc: int, n_mels: int) -> jnp.ndarray:
    return jnp.asarray(_dct_matrix_np(n_mfcc, n_mels))


def amplitude_to_db(
    power: jnp.ndarray, top_db: Optional[float] = 80.0, amin: float = 1e-10
) -> jnp.ndarray:
    """torchaudio AmplitudeToDB('power') semantics: 10*log10(max(x, amin)),
    clamped to (max - top_db) over the whole tensor."""
    db = 10.0 * jnp.log10(jnp.maximum(power, amin))
    if top_db is not None:
        db = jnp.maximum(db, jnp.max(db) - top_db)
    return db


def mfcc(
    waveform: jnp.ndarray,
    sample_rate: int = 16000,
    n_mfcc: int = 40,
    n_mels: int = 128,
    top_db: Optional[float] = 80.0,
    **kwargs,
) -> jnp.ndarray:
    """[T] -> [n_frames, n_mfcc], torchaudio MFCC semantics (dB-scaled
    mel -> ortho DCT-II), matching the reference's
    ``MFCC(sample_rate=16000, n_mfcc=40)`` at extractors.py:236."""
    mel = mel_spectrogram(waveform, sample_rate, n_mels=n_mels, **kwargs)
    db = amplitude_to_db(mel, top_db)
    return jnp.dot(db, dct_matrix(n_mfcc, n_mels), preferred_element_type=jnp.float32)
