"""Per-shot audio features (the 296-d contract).

Reference behavior (/root/reference/features/extractors.py:195-234): per
shot, compute VGGish embeddings + MFCC + log2-mel, DTW-align the MFCC/mel
streams to VGGish frames, mean-pool each stream, concat. Two deliberate
deltas (SURVEY.md §8.1-8.2):

1. The contract is 296 = 40 raw MFCC + 128 log2-mel + 128 VGGish (the
   reference *declares* 296 everywhere but its code produced 384 by
   projecting MFCC 40->128; 296 is the stated intent).
2. DTW alignment is replaced by fixed-rate segment pooling: after
   mean-pooling, DTW's path ordering is provably near-vacuous, and DTW is
   inherently sequential (hostile to TPU). An optional host-side DTW for
   fidelity checks lives in :mod:`avsum_tpu.ops.dtw`.

TPU-first structure: the WHOLE video's spectral features are computed once
as batched matmuls (the reference recomputes per shot in a Python loop,
extractors.py:344-358), then per-shot means are O(S) cumsum gathers.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from avsum_tpu.audio.vggish import (
    VGGISH_FRAMES,
    VGGISH_HOP,
    VGGish,
    vggish_log_mel_patches,
)
from avsum_tpu.ops.spectral import (
    amplitude_to_db,
    dct_matrix,
    mel_spectrogram,
)
from avsum_tpu.train.config import AudioFeatConfig


def _segment_means(
    features: jnp.ndarray, start: jnp.ndarray, end: jnp.ndarray
) -> jnp.ndarray:
    """Row-range means of [T, D] via cumsum: -> [S, D]. Empty/out-of-range
    segments clamp to one row (never NaN)."""
    t = features.shape[0]
    cs = jnp.concatenate(
        [jnp.zeros((1, features.shape[1]), jnp.float32),
         jnp.cumsum(features.astype(jnp.float32), axis=0)]
    )
    s = jnp.clip(start.astype(jnp.int32), 0, t - 1)
    e = jnp.clip(end.astype(jnp.int32), s + 1, t)
    total = jnp.take(cs, e, axis=0) - jnp.take(cs, s, axis=0)
    return total / (e - s).astype(jnp.float32)[:, None]


class AudioFrontend:
    """Whole-video spectral features + per-shot 296-d pooled vectors."""

    def __init__(
        self,
        config: AudioFeatConfig = AudioFeatConfig(),
        vggish_params=None,
        seed: int = 0,
        use_pallas: Optional[bool] = None,
    ):
        from avsum_tpu.ops import pallas_enabled

        flag = use_pallas if use_pallas is not None else config.use_pallas
        self.use_pallas = pallas_enabled(flag)
        if self.use_pallas and config.n_fft != 2 * config.hop_length:
            if flag is True:  # explicitly requested, loudly refused
                import warnings

                warnings.warn(
                    "audio.use_pallas=True but the fused log-mel kernel "
                    f"requires n_fft == 2*hop_length (got {config.n_fft}/"
                    f"{config.hop_length}); using the XLA spectral path",
                    stacklevel=2,
                )
            self.use_pallas = False
        self.config = config
        from avsum_tpu.vision.backbone import _DTYPES

        dtype = _DTYPES[config.dtype]
        if config.encoder == "large":
            from avsum_tpu.audio.vggish import LargeAudioEncoder

            self.vggish = LargeAudioEncoder(
                embed_dim=config.vggish_dim, dtype=dtype
            )
        else:
            self.vggish = VGGish(dtype=dtype)
        if vggish_params is None and config.vggish_weights:
            from avsum_tpu.utils.serialization import load_params

            vggish_params = load_params(config.vggish_weights)
        if vggish_params is None:
            from avsum_tpu.vision.backbone import fast_init

            vggish_params = fast_init(
                self.vggish,
                jnp.zeros((1, VGGISH_FRAMES, 64)),
                seed=seed,
            )["params"]
        # pin on device once (re-shipping fc1's 50M params per call would
        # dominate the whole pipeline on a slow host link); bf16 compute
        # ships bf16 weights — same declared precision, half the bytes
        # (vision/backbone.py::ship_dtype_cast)
        from avsum_tpu.vision.backbone import ship_dtype_cast

        self.vggish_params = jax.device_put(
            ship_dtype_cast(vggish_params, dtype)
        )
        self._full = jax.jit(self._full_features_impl)
        self._pool = jax.jit(self._pool_impl)

    def _full_features_impl(self, vggish_params, waveform: jnp.ndarray):
        """Whole-waveform streams (no boundaries needed -> dispatchable
        before/while shot detection runs on the host)."""
        cfg = self.config
        if waveform.dtype == jnp.int16:
            # int16 ships half the bytes over the host link; this is the
            # exact same normalization io/wav.py applies on host
            waveform = waveform.astype(jnp.float32) * (1.0 / 32768.0)
        if self.use_pallas:
            from avsum_tpu.ops import fused_log_mel

            mel, lm = fused_log_mel(
                waveform,
                sample_rate=cfg.sample_rate,
                n_fft=cfg.n_fft,
                hop_length=cfg.hop_length,
                n_mels=cfg.n_mels,
                eps=cfg.eps,
            )
            if not cfg.log_base2:  # kernel emits log2; rescale to ln
                lm = lm * jnp.log(2.0)
        else:
            mel = mel_spectrogram(
                waveform,
                cfg.sample_rate,
                n_fft=cfg.n_fft,
                hop_length=cfg.hop_length,
                win_length=cfg.win_length,
                n_mels=cfg.n_mels,
            )
            lm = jnp.log(mel + cfg.eps)
            if cfg.log_base2:
                lm = lm / jnp.log(2.0)
        mf = jnp.dot(
            amplitude_to_db(mel, 80.0),
            dct_matrix(cfg.n_mfcc, cfg.n_mels),
            preferred_element_type=jnp.float32,
        )
        patches = vggish_log_mel_patches(waveform)
        vg = self.vggish.apply({"params": vggish_params}, patches)
        return mf, lm, vg

    def _pool_impl(self, mf, lm, vg, boundaries, mask=None):
        cfg = self.config
        bounds = jnp.asarray(boundaries, jnp.float32).reshape(-1, 2)
        mf_s = bounds / cfg.hop_length
        vg_s = bounds / (VGGISH_HOP * VGGISH_FRAMES)
        mfcc_pooled = _segment_means(mf, mf_s[:, 0], jnp.ceil(mf_s[:, 1]))
        mel_pooled = _segment_means(lm, mf_s[:, 0], jnp.ceil(mf_s[:, 1]))
        vg_pooled = _segment_means(vg, vg_s[:, 0], jnp.ceil(vg_s[:, 1]))
        out = jnp.concatenate([mfcc_pooled, mel_pooled, vg_pooled], axis=-1)
        if mask is not None:
            out = out * jnp.asarray(mask, jnp.float32)[:, None]
        return out

    def dispatch_full(self, waveform):
        """Async whole-waveform feature dispatch (bucketed shapes).

        int16 waveforms ship as-is (half the link bytes; normalized on
        device — see _full_features_impl); everything else as float32."""
        wave = np.asarray(waveform).reshape(-1)
        if wave.dtype != np.int16:
            wave = wave.astype(np.float32)
        t = max(len(wave), self.config.sample_rate)
        t_bucket = 1 << (t - 1).bit_length()
        wave = np.pad(wave, (0, t_bucket - len(wave)))
        return self._full(self.vggish_params, wave)

    def pool(self, full, boundaries_samples, mask=None, s_bucket=None,
             return_device: bool = False) -> jnp.ndarray:
        """Segment-pool previously dispatched full features -> [S, 296].

        ``s_bucket`` overrides the padded shot-axis bucket (the
        device-resident scoring fast path passes the visual pool's bucket
        so both modalities share one padded S); ``return_device=True``
        keeps the full [s_bucket, 296] result on device (rows >= S are
        padding) instead of reading it back.
        """
        mf, lm, vg = full
        bounds = np.asarray(boundaries_samples, np.float32).reshape(-1, 2)
        s = len(bounds)
        if s_bucket is None:
            s_bucket = max(16, -(-s // 16) * 16)
        assert s_bucket >= s
        bounds_p = np.zeros((s_bucket, 2), np.float32)
        bounds_p[:s] = bounds
        mask_p = np.zeros(s_bucket, np.float32)
        mask_p[:s] = 1.0 if mask is None else np.asarray(mask, np.float32).reshape(-1)
        out = self._pool(mf, lm, vg, bounds_p, mask_p)
        if return_device:
            return out
        return out[:s]

    def shot_features(
        self,
        waveform,
        boundaries_samples,
        mask=None,
    ) -> jnp.ndarray:
        """[T] waveform + [S, 2] (start, end) sample boundaries -> [S, 296].

        Shapes are bucketed before the jit calls (waveform to power-of-two
        sample counts, shots to multiples of 16): a dataset sweep compiles
        O(log T) programs instead of one per video. Zero-padding is
        harmless — segment means only gather in-range cumsum rows.
        """
        return self.pool(self.dispatch_full(waveform), boundaries_samples, mask)


@functools.lru_cache(maxsize=1)
def _default_frontend() -> AudioFrontend:
    return AudioFrontend()


def shot_audio_features(waveform, boundaries_samples, mask=None):
    """Module-level convenience using a default (random-weight) frontend."""
    return _default_frontend().shot_features(waveform, boundaries_samples, mask)
