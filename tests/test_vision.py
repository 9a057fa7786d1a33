"""Vision backbone tests.

torchvision is absent in this image, so full-model parity lives in
tests/test_vision_torchvision.py (skip-gated). Here, block-level parity
against hand-built torch.nn equivalents covers the real porting risks:
conv layout/padding/stride transposes, BN eps/running stats, pool
semantics (-inf max-pool padding, count_include_pad avg pool)."""

import jax
import numpy as np
import pytest
import torch

from avsum_tpu.vision import DualBackbone, InceptionV3, ResNet50, preprocess_frames
from avsum_tpu.vision.backbone import sample_shot_frames
from avsum_tpu.vision.port_torch import inception_v3_from_torch, resnet50_from_torch
from avsum_tpu.vision.resnet import Bottleneck


def _to_nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def test_bottleneck_matches_torch():
    """Flax Bottleneck vs a literal torch transcription of torchvision's
    Bottleneck (stride-2, with downsample), weights ported via the same
    path rewriting used for full checkpoints."""

    class TorchBottleneck(torch.nn.Module):
        def __init__(self, cin, width, stride):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(width)
            self.conv2 = torch.nn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(width)
            self.conv3 = torch.nn.Conv2d(width, width * 4, 1, bias=False)
            self.bn3 = torch.nn.BatchNorm2d(width * 4)
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, width * 4, 1, stride, bias=False),
                torch.nn.BatchNorm2d(width * 4),
            )

        def forward(self, x):
            out = torch.relu(self.bn1(self.conv1(x)))
            out = torch.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return torch.relu(out + self.downsample(x))

    torch.manual_seed(0)
    tb = TorchBottleneck(64, 32, 2)
    # randomize running stats so eval-mode BN is a real check
    for m in tb.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    tb.eval()

    sd = {f"layer1.0.{k}": v for k, v in tb.state_dict().items()}
    # reuse the resnet porting path logic by wrapping keys as layer1.0.*
    params, stats = resnet50_from_torch(sd)

    x = np.random.default_rng(0).standard_normal((2, 16, 16, 64)).astype(np.float32)
    ours = np.asarray(
        Bottleneck(32, strides=2, downsample=True).apply(
            {
                "params": params["layer1_0"],
                "batch_stats": stats["layer1_0"],
            },
            x,
            train=False,
        )
    )
    with torch.no_grad():
        theirs = tb(_to_nchw(x)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_maxpool_matches_torch_with_padding():
    """torch MaxPool2d(3,2,1) pads with -inf; flax must replicate."""
    x = -np.abs(np.random.default_rng(1).standard_normal((1, 7, 7, 2))).astype(
        np.float32
    )  # all-negative input exposes zero-padding bugs
    import flax.linen as fnn
    import jax.numpy as jnp

    padded = jnp.pad(
        jnp.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf
    )
    ours = np.asarray(fnn.max_pool(padded, (3, 3), strides=(2, 2)))
    with torch.no_grad():
        theirs = (
            torch.nn.MaxPool2d(3, 2, 1)(_to_nchw(x)).numpy().transpose(0, 2, 3, 1)
        )
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_avgpool_matches_torch_count_include_pad():
    x = np.random.default_rng(2).standard_normal((1, 9, 9, 3)).astype(np.float32)
    import flax.linen as fnn

    ours = np.asarray(
        fnn.avg_pool(
            np.asarray(x), (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)]
        )
    )
    with torch.no_grad():
        theirs = (
            torch.nn.AvgPool2d(3, 1, 1)(_to_nchw(x)).numpy().transpose(0, 2, 3, 1)
        )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_asymmetric_conv_matches_torch():
    """Inception's (1,7)/(7,1) convs with (0,3)/(3,0) padding."""
    torch.manual_seed(3)
    tc = torch.nn.Conv2d(8, 16, (1, 7), padding=(0, 3), bias=False)
    x = np.random.default_rng(3).standard_normal((2, 5, 12, 8)).astype(np.float32)
    import flax.linen as fnn

    kernel = tc.weight.detach().numpy().transpose(2, 3, 1, 0)
    ours = np.asarray(
        fnn.Conv(16, (1, 7), padding=[(0, 0), (3, 3)], use_bias=False).apply(
            {"params": {"kernel": kernel}}, np.asarray(x)
        )
    )
    with torch.no_grad():
        theirs = tc(_to_nchw(x)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_inception_port_roundtrip_structure():
    """inception_v3_from_torch maps names 1:1 into the flax module tree."""
    from avsum_tpu.vision.backbone import fast_init

    model = InceptionV3()
    variables = fast_init(model, np.zeros((1, 75, 75, 3), np.float32))
    # build a fake torch-style state_dict from the flax tree and port it back
    flat = {}

    def walk(tree, prefix, stats=False):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, name, stats)
            else:
                leaf = {
                    "kernel": "weight",
                    "scale": "weight",
                    "bias": "bias",
                    "mean": "running_mean",
                    "var": "running_var",
                }[k]
                arr = np.asarray(v)
                if k == "kernel":
                    arr = arr.transpose(3, 2, 0, 1)
                flat[f"{name.rsplit('.',1)[0]}.{leaf}"] = torch.from_numpy(
                    np.ascontiguousarray(arr)
                )

    walk(variables["params"], "")
    walk(variables["batch_stats"], "")
    params, stats = inception_v3_from_torch(flat)
    for a, b in zip(
        jax.tree.leaves(variables["params"]), jax.tree.leaves(params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_preprocess_frames_normalization():
    x = np.full((1, 10, 10, 3), 255.0, np.float32)
    out = np.asarray(preprocess_frames(x, 10))
    expect = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], expect, rtol=1e-5)


def test_preprocess_frames_resizes():
    x = np.zeros((2, 37, 53, 3), np.float32)
    assert preprocess_frames(x, 224).shape == (2, 224, 224, 3)


def test_sample_shot_frames_stride_and_cap():
    bounds = np.array([[0, 30], [30, 330], [330, 331]])
    idx, ids = sample_shot_frames(bounds, frame_stride=3, max_frames_per_shot=50)
    assert (idx[ids == 0] == np.arange(0, 30, 3)).all()
    assert (ids == 1).sum() == 50  # capped
    assert (ids == 2).sum() == 1  # single-frame shot still sampled
    assert idx.max() < 331


def test_dual_backbone_contract_dim():
    from avsum_tpu.vision.backbone import fast_init

    model = DualBackbone()
    x = np.random.default_rng(1).standard_normal((1, 64, 64, 3)).astype(np.float32)
    variables = fast_init(model, x)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 4096)
