"""Fused STFT -> mel -> log Pallas kernel (the audio front-end hot op).

One kernel pass replaces the chain the reference ran through torchaudio
(/root/reference/features/extractors.py:236-246): framing, Hann window,
|DFT|^2, mel projection and log all happen per frame-block in VMEM — the
intermediate spectrogram (frames x 201 power bins) never touches HBM.

Design notes (see /opt/skills/guides/pallas_guide.md):
- The DFT is two dense matmuls against cos/sin bases (MXU), zero-padded
  201 -> 256 freq columns for lane alignment; padded columns have zero
  bases so they contribute exactly zero through the mel matmul.
- Framing exploits n_fft == 2*hop (torchaudio's defaults, 400/200): a
  span of (BF+1)*hop samples reshapes to hop-sized segments and frames
  are concat(seg[:-1], seg[1:]) — fully vectorized, no gathers.
- Grid over frame blocks; waveform, window, bases and the mel filterbank
  stay VMEM-resident across the (sequential) grid.

Outputs both mel and log2(mel + eps): MFCC needs raw mel (dB + DCT happen
downstream, they need a global max), the scorer path needs log-mel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from avsum_tpu.ops.spectral import _dft_bases, _mel_fbank_np

BLOCK_FRAMES = 256
FREQ_PAD = 256  # 201 freq bins padded to lane width multiple


def _melspec_kernel(
    seg_ref, cos_a_ref, cos_b_ref, sin_a_ref, sin_b_ref, mel_ref,
    mel_out, logmel_out, *, eps: float
):
    # seg_ref: [n_segments, hop] — the waveform pre-cut into hop-sized rows
    # on the XLA side. With n_fft == 2*hop, frame t = [seg[t], seg[t+1]],
    # so (window*frame) @ basis splits into
    #   seg[t] @ (w_lo * basis_lo) + seg[t+1] @ (w_hi * basis_hi)
    # with the window folded into the bases on the host. The kernel is two
    # shifted slices + MXU matmuls — no gathers, no in-kernel reshapes.
    seg0 = seg_ref[0]  # [BF, hop] — rows t   of the segment array
    seg1 = seg_ref[1]  # [BF, hop] — rows t+1 (the +1-shifted view is
    # stacked on a leading axis outside the kernel: Mosaic requires
    # sublane-aligned slice starts, so shifting in-kernel is not allowed)
    real = jnp.dot(seg0, cos_a_ref[:], preferred_element_type=jnp.float32)
    real = real + jnp.dot(seg1, cos_b_ref[:], preferred_element_type=jnp.float32)
    imag = jnp.dot(seg0, sin_a_ref[:], preferred_element_type=jnp.float32)
    imag = imag + jnp.dot(seg1, sin_b_ref[:], preferred_element_type=jnp.float32)
    power = real * real + imag * imag  # [BF, FREQ_PAD]
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    mel_out[:] = mel
    logmel_out[:] = jnp.log2(mel + eps)


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "n_fft", "hop_length", "n_mels",
                     "eps", "interpret"),
)
def fused_log_mel(
    waveform: jnp.ndarray,
    sample_rate: int = 16000,
    n_fft: int = 400,
    hop_length: int = 200,
    n_mels: int = 128,
    eps: float = 1e-6,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[T] waveform -> (mel [N, n_mels], log2-mel [N, n_mels]).

    Matches ops.spectral.mel_spectrogram / log_mel_spectrogram (center=True
    reflect padding; torchaudio MelSpectrogram semantics). Requires
    n_fft == 2 * hop_length (the defaults) — the constraint that lets
    framing be reshape+concat instead of a gather.
    """
    if n_fft != 2 * hop_length:
        raise ValueError("fused kernel requires n_fft == 2*hop_length")
    x = jnp.asarray(waveform, jnp.float32).reshape(-1)
    pad = n_fft // 2
    x = jnp.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (x.shape[0] - n_fft) // hop_length
    n_blocks = max(1, -(-n_frames // BLOCK_FRAMES))
    # pad so every block has a full span: (n_blocks*BF + 1) * hop samples
    needed = (n_blocks * BLOCK_FRAMES + 1) * hop_length
    x = jnp.pad(x, (0, max(0, needed - x.shape[0])))
    segments = x[:needed].reshape(-1, hop_length)  # [n_segments, hop]
    # [2, n_frames_padded, hop]: plane 0 = rows t, plane 1 = rows t+1
    seg_pair = jnp.stack([segments[:-1], segments[1:]])

    n_freqs = n_fft // 2 + 1
    cos_b, sin_b = _dft_bases(n_fft)
    cos_p = np.zeros((n_fft, FREQ_PAD), np.float32)
    sin_p = np.zeros((n_fft, FREQ_PAD), np.float32)
    cos_p[:, :n_freqs] = cos_b
    sin_p[:, :n_freqs] = sin_b
    fbank = np.zeros((FREQ_PAD, n_mels), np.float32)
    fbank[:n_freqs] = _mel_fbank_np(
        n_freqs, 0.0, sample_rate / 2.0, n_mels, sample_rate
    )
    n = np.arange(n_fft)
    window = (0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))).astype(np.float32)
    # fold the window into the split bases (see kernel docstring)
    cos_a = window[:hop_length, None] * cos_p[:hop_length]
    cos_b2 = window[hop_length:, None] * cos_p[hop_length:]
    sin_a = window[:hop_length, None] * sin_p[:hop_length]
    sin_b2 = window[hop_length:, None] * sin_p[hop_length:]

    mel, logmel = pl.pallas_call(
        functools.partial(_melspec_kernel, eps=eps),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (2, BLOCK_FRAMES, hop_length),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),  # paired segment rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # windowed cos lo
            pl.BlockSpec(memory_space=pltpu.VMEM),  # windowed cos hi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # windowed sin lo
            pl.BlockSpec(memory_space=pltpu.VMEM),  # windowed sin hi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mel fbank
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_FRAMES, n_mels), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_FRAMES, n_mels), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks * BLOCK_FRAMES, n_mels), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * BLOCK_FRAMES, n_mels), jnp.float32),
        ),
        interpret=interpret,
    )(seg_pair, jnp.asarray(cos_a), jnp.asarray(cos_b2), jnp.asarray(sin_a),
      jnp.asarray(sin_b2), jnp.asarray(fbank))
    return mel[:n_frames], logmel[:n_frames]
