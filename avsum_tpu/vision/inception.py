"""Inception-V3 in Flax (NHWC), feature-extractor head.

TPU-native equivalent of the reference's frozen torchvision InceptionV3
with fc replaced by Identity and aux logits disabled
(/root/reference/features/extractors.py:26,32-36). Topology and naming
mirror torchvision's ``inception_v3`` (BasicConv2d = conv(no bias) +
BN(eps=1e-3) + relu; Mixed_5b..7c blocks) so a state_dict ports 1:1
(:mod:`avsum_tpu.vision.port_torch`; output-parity tested in
tests/test_vision.py). No input transform (transform_input=False).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


def _max_pool_3x3_s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


def _avg_pool_3x3_s1_pad1(x):
    # torch AvgPool2d(3, 1, 1) default count_include_pad=True == flax avg_pool
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])


class BasicConv2d(nn.Module):
    features: int
    kernel: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b1 = BasicConv2d(64, dtype=d, name="branch1x1")(x, train)
        b5 = BasicConv2d(48, dtype=d, name="branch5x5_1")(x, train)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), dtype=d, name="branch5x5_2")(b5, train)
        b3 = BasicConv2d(64, dtype=d, name="branch3x3dbl_1")(x, train)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(b3, train)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_3")(b3, train)
        bp = _avg_pool_3x3_s1_pad1(x)
        bp = BasicConv2d(self.pool_features, dtype=d, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), dtype=d, name="branch3x3")(x, train)
        bd = BasicConv2d(64, dtype=d, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(bd, train)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), dtype=d, name="branch3x3dbl_3")(bd, train)
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, c7 = self.dtype, self.channels_7x7
        b1 = BasicConv2d(192, dtype=d, name="branch1x1")(x, train)
        b7 = BasicConv2d(c7, dtype=d, name="branch7x7_1")(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7_3")(b7, train)
        bd = BasicConv2d(c7, dtype=d, name="branch7x7dbl_1")(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_2")(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_3")(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_4")(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_5")(bd, train)
        bp = _avg_pool_3x3_s1_pad1(x)
        bp = BasicConv2d(192, dtype=d, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b3 = BasicConv2d(192, dtype=d, name="branch3x3_1")(x, train)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), dtype=d, name="branch3x3_2")(b3, train)
        b7 = BasicConv2d(192, dtype=d, name="branch7x7x3_1")(x, train)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7x3_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7x3_3")(b7, train)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), dtype=d, name="branch7x7x3_4")(b7, train)
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b1 = BasicConv2d(320, dtype=d, name="branch1x1")(x, train)
        b3 = BasicConv2d(384, dtype=d, name="branch3x3_1")(x, train)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3_2a")(b3, train)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3_2b")(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, dtype=d, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(bd, train)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3dbl_3a")(bd, train)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3dbl_3b")(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _avg_pool_3x3_s1_pad1(x)
        bp = BasicConv2d(192, dtype=d, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """[B, 299, 299, 3] (normalized RGB) -> [B, 2048] pooled features."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = x.astype(d)
        x = BasicConv2d(32, (3, 3), strides=(2, 2), dtype=d, name="Conv2d_1a_3x3")(x, train)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x, train)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=d, name="Conv2d_2b_3x3")(x, train)
        x = _max_pool_3x3_s2(x)
        x = BasicConv2d(80, dtype=d, name="Conv2d_3b_1x1")(x, train)
        x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x, train)
        x = _max_pool_3x3_s2(x)
        x = InceptionA(32, dtype=d, name="Mixed_5b")(x, train)
        x = InceptionA(64, dtype=d, name="Mixed_5c")(x, train)
        x = InceptionA(64, dtype=d, name="Mixed_5d")(x, train)
        x = InceptionB(dtype=d, name="Mixed_6a")(x, train)
        x = InceptionC(128, dtype=d, name="Mixed_6b")(x, train)
        x = InceptionC(160, dtype=d, name="Mixed_6c")(x, train)
        x = InceptionC(160, dtype=d, name="Mixed_6d")(x, train)
        x = InceptionC(192, dtype=d, name="Mixed_6e")(x, train)
        x = InceptionD(dtype=d, name="Mixed_7a")(x, train)
        x = InceptionE(dtype=d, name="Mixed_7b")(x, train)
        x = InceptionE(dtype=d, name="Mixed_7c")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool (1,1) -> [B, 2048]
        return x.astype(jnp.float32)
