"""Frame preprocessing + dual-backbone feature extraction + shot pooling.

Reference behavior (/root/reference/features/extractors.py:43-115): per
shot, loop over frames in micro-batches of 4 on CPU, run ResNet50 and
InceptionV3, mean each stream over frames, concat -> 4096. Known reference
bugs consciously fixed (SURVEY.md §8.3): frames here are RGB (not BGR) and
BOTH backbones get /255 + ImageNet mean/std (the reference skips /255 for
ResNet).

TPU-first structure: all sampled frames of a video form one [F, H, W, 3]
array, embedded in fixed-size jit batches (bf16 convs on the MXU), then
per-shot means are a single ``segment_sum`` — no Python-per-shot loop, no
micro-batch GC churn (extractors.py:94).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from avsum_tpu.train.config import VisualFeatConfig
from avsum_tpu.vision.inception import InceptionV3
from avsum_tpu.vision.resnet import ResNet50

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class TinyBackbone(nn.Module):
    """Small conv stand-in for the dual backbone (same 4096-d contract) —
    used by CPU tests and as a cheap-encoder option; NOT a quality model."""

    out_dim: int = 4096
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = preprocess_frames(frames, 64, self.dtype)
        x = nn.relu(nn.Conv(32, (5, 5), strides=(4, 4), dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), dtype=self.dtype)(x))
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.out_dim, dtype=jnp.float32)(x)


def preprocess_frames(
    frames: jnp.ndarray, size: int, dtype=jnp.float32
) -> jnp.ndarray:
    """[B, H, W, 3] RGB (uint8 or [0,255] float) -> normalized [B,size,size,3]."""
    x = frames.astype(jnp.float32)
    b, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (b, size, size, c), method="bilinear")
    x = x / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x.astype(dtype)


class DualBackbone(nn.Module):
    """ResNet50 ‖ InceptionV3 -> [B, 4096] (the visual feature contract,
    extractors.py:108-110)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        r_in = preprocess_frames(frames, 224, self.dtype)
        i_in = preprocess_frames(frames, 299, self.dtype)
        r = ResNet50(dtype=self.dtype, name="resnet")(r_in, train)
        i = InceptionV3(dtype=self.dtype, name="inception")(i_in, train)
        return jnp.concatenate([r, i], axis=-1)


_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


class VisualFrontend:
    """Whole-video frame embedding + per-shot mean pooling."""

    def __init__(
        self,
        config: VisualFeatConfig = VisualFeatConfig(),
        variables=None,
        seed: int = 0,
        batch_size: int = 32,
        input_size: int = 224,
        model=None,
    ):
        self.config = config
        self.batch_size = batch_size
        dtype = _DTYPES[config.dtype]
        self.model = model if model is not None else DualBackbone(dtype=dtype)
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, input_size, input_size, 3), jnp.float32),
            )
        self.variables = variables
        self._embed = jax.jit(
            lambda v, f: self.model.apply(v, f, train=False)
        )

    def frame_features(self, frames: np.ndarray) -> np.ndarray:
        """[F, H, W, 3] RGB frames -> [F, 4096], in fixed-size jit batches
        (tail padded so only a handful of distinct shapes ever compile)."""
        f = frames.shape[0]
        out = []
        for i in range(0, f, self.batch_size):
            chunk = frames[i : i + self.batch_size]
            n = chunk.shape[0]
            if n < self.batch_size:
                chunk = np.concatenate(
                    [chunk, np.zeros((self.batch_size - n, *chunk.shape[1:]),
                                     chunk.dtype)]
                )
            feats = np.asarray(self._embed(self.variables, jnp.asarray(chunk)))
            out.append(feats[:n])
        return (
            np.concatenate(out, axis=0)
            if out
            else np.zeros((0, self.config.feature_dim), np.float32)
        )

    def shot_features(
        self,
        frames: np.ndarray,
        frame_shot_ids: np.ndarray,
        n_shots: int,
    ) -> np.ndarray:
        """Frames tagged with their shot id -> [n_shots, 4096] mean-pooled.
        Shots with no sampled frames get zeros (the reference's empty-shot
        fallback, extractors.py:44-45)."""
        feats = self.frame_features(frames)
        ids = np.asarray(frame_shot_ids, np.int64)
        sums = np.zeros((n_shots, feats.shape[1]), np.float32)
        counts = np.zeros(n_shots, np.float32)
        np.add.at(sums, ids, feats)
        np.add.at(counts, ids, 1.0)
        return sums / np.maximum(counts, 1.0)[:, None]


def make_visual_frontend(
    config: VisualFeatConfig = VisualFeatConfig(), **kwargs
) -> "VisualFrontend":
    """Build the frontend for config.backbone: dual | resnet50 | tiny."""
    dtype = _DTYPES[config.dtype]
    if config.backbone == "dual":
        model = None  # DualBackbone default
    elif config.backbone == "resnet50":
        from avsum_tpu.vision.resnet import ResNet50

        class _ResNetOnly(nn.Module):
            @nn.compact
            def __call__(self, frames, train: bool = False):
                x = preprocess_frames(frames, 224, dtype)
                feats = ResNet50(dtype=dtype, name="resnet")(x, train)
                # tile 2048 -> 4096 to honor the feature-dim contract
                return jnp.concatenate([feats, feats], axis=-1)

        model = _ResNetOnly()
    elif config.backbone == "tiny":
        model = TinyBackbone(config.feature_dim, dtype)
    else:
        raise ValueError(f"unknown visual backbone {config.backbone!r}")
    return VisualFrontend(config, model=model, **kwargs)


def sample_shot_frames(
    shot_boundaries: np.ndarray,
    frame_stride: int = 3,
    max_frames_per_shot: int = 96,
) -> Tuple[np.ndarray, np.ndarray]:
    """Frame indices to decode for each shot + their shot ids.

    Matches the reference's sampling (every ``frame_stride``-th frame from
    shot start, capped per shot — extractors.py:395-413) without the
    sequential cap-after-read quirk.
    """
    frame_idx, shot_ids = [], []
    for s, (start, end) in enumerate(np.asarray(shot_boundaries, np.int64)):
        idx = np.arange(start, end)[::frame_stride][:max_frames_per_shot]
        frame_idx.append(idx)
        shot_ids.append(np.full(len(idx), s, np.int64))
    if not frame_idx:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(frame_idx), np.concatenate(shot_ids)
