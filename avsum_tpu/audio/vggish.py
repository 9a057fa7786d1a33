"""VGGish-style audio embedding network in Flax.

TPU-native stand-in for the torch.hub VGGish the reference loads
(/root/reference/features/extractors.py:188-192: frozen, eval mode,
128-d embedding per 0.96 s of audio). Architecture follows the published
VGGish topology (AudioSet): 4 conv stages (64/128/256/512) with 2x2
max-pools over 96x64 log-mel patches, then FC 4096 -> 4096 -> 128.

Weights are either ported from a released checkpoint (``load_params``)
or trained/random — the framework's F1 baseline is established with its
own encoders end-to-end (SURVEY.md §7 hard parts: VGGish parity).

Input front-end (``vggish_log_mel_patches``) uses the published VGGish
params: 16 kHz mono, 25 ms window / 10 ms hop, 64 mel bands 125–7500 Hz,
log(mel + 0.01), framed into non-overlapping 96-frame (0.96 s) patches.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from avsum_tpu.ops.spectral import mel_spectrogram

VGGISH_SR = 16000
VGGISH_N_FFT = 400  # 25 ms
VGGISH_HOP = 160  # 10 ms
VGGISH_N_MELS = 64
VGGISH_FMIN = 125.0
VGGISH_FMAX = 7500.0
VGGISH_FRAMES = 96  # patch length = 0.96 s
VGGISH_EMBED = 128


def vggish_log_mel_patches(waveform: jnp.ndarray) -> jnp.ndarray:
    """[T] 16 kHz mono -> [n_patches, 96, 64] log-mel examples.

    Short inputs yield a single zero-padded patch so every non-empty shot
    produces at least one embedding (the reference pads <960-sample clips,
    extractors.py:205-206).
    """
    mel = mel_spectrogram(
        waveform,
        sample_rate=VGGISH_SR,
        n_fft=VGGISH_N_FFT,
        hop_length=VGGISH_HOP,
        n_mels=VGGISH_N_MELS,
        f_min=VGGISH_FMIN,
        f_max=VGGISH_FMAX,
    )
    logmel = jnp.log(mel + 0.01)
    t = logmel.shape[0]
    n_patches = max(t // VGGISH_FRAMES, 1)
    needed = n_patches * VGGISH_FRAMES
    if t < needed:
        logmel = jnp.pad(logmel, ((0, needed - t), (0, 0)))
    else:
        logmel = logmel[:needed]
    return logmel.reshape(n_patches, VGGISH_FRAMES, VGGISH_N_MELS)


class LargeAudioEncoder(nn.Module):
    """Upgraded audio encoder (BASELINE config 4): a deeper/wider conv
    stack over the same 96x64 log-mel patches, same 128-d output contract.
    ~4x the conv FLOPs of VGGish — still negligible next to the visual
    backbones, but a materially bigger receptive capacity."""

    embed_dim: int = VGGISH_EMBED
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patches: jnp.ndarray) -> jnp.ndarray:
        x = patches.astype(self.dtype)[..., None]
        for i, (features, reps) in enumerate(
            [(96, 2), (192, 2), (384, 3), (768, 3)]
        ):
            for j in range(reps):
                x = nn.Conv(features, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv{i+1}_{j+1}")(x)
                x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i+1}_{j+1}")(x)
                x = nn.gelu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = jnp.mean(x, axis=(1, 2))  # [B, 768]
        x = nn.gelu(nn.Dense(1024, dtype=self.dtype, name="fc1")(x))
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="fc2")(x)
        return x.astype(jnp.float32)


class VGGish(nn.Module):
    """AudioSet VGGish conv net: [B, 96, 64] -> [B, 128]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patches: jnp.ndarray) -> jnp.ndarray:
        x = patches.astype(self.dtype)[..., None]  # [B, 96, 64, 1]
        for i, (features, reps) in enumerate([(64, 1), (128, 1), (256, 2), (512, 2)]):
            for j in range(reps):
                x = nn.Conv(features, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv{i+1}_{j+1}")(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)  # [B, 6*4*512]
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc1_1")(x))
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc1_2")(x))
        x = nn.relu(nn.Dense(VGGISH_EMBED, dtype=self.dtype, name="fc2")(x))
        return x.astype(jnp.float32)
