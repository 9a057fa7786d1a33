"""ResNet-50 in Flax (NHWC), feature-extractor head.

TPU-native equivalent of the reference's frozen torchvision ResNet50 with
the classification head removed (/root/reference/features/extractors.py:25,29:
``nn.Sequential(*list(resnet.children())[:-1])`` -> pooled 2048-d). The
architecture matches torchvision exactly (verified by porting a torchvision
state_dict and comparing outputs, tests/test_vision.py); weights can be
ported via :mod:`avsum_tpu.vision.port_torch` or trained.

BatchNorm runs in inference mode (running stats) by default — the
reference freezes its backbones; set ``train=True`` only for the
"upgraded encoders" finetuning config (BASELINE config 4).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class Bottleneck(nn.Module):
    features: int  # width of the 3x3 conv; output is 4*features
    strides: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=name,
        )
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(4 * self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = norm("bn3")(y)
        if self.downsample:
            residual = nn.Conv(4 * self.features, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """[B, 224, 224, 3] (normalized RGB) -> [B, 2048] pooled features."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1): pad with -inf then pool
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for stage, n_blocks in enumerate(self.stage_sizes):
            features = 64 * 2**stage
            for block in range(n_blocks):
                strides = 2 if (stage > 0 and block == 0) else 1
                x = Bottleneck(
                    features,
                    strides=strides,
                    downsample=(block == 0),
                    dtype=self.dtype,
                    name=f"layer{stage+1}_{block}",
                )(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 2048]
        return x.astype(jnp.float32)
