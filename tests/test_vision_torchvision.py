"""Full-model parity vs torchvision (skip-gated: torchvision is not in this
image). Where torchvision exists, these prove the Flax backbones reproduce
torchvision eval outputs exactly from a ported random-init state_dict."""

import numpy as np
import pytest
import torch

tvm = pytest.importorskip("torchvision.models")

from avsum_tpu.vision import InceptionV3, ResNet50  # noqa: E402
from avsum_tpu.vision.port_torch import (  # noqa: E402
    inception_v3_from_torch,
    resnet50_from_torch,
)


def test_resnet50_matches_torchvision():
    torch.manual_seed(0)
    tv = tvm.resnet50(weights=None)
    tv.eval()
    params, stats = resnet50_from_torch(tv.state_dict())
    x = np.random.default_rng(0).standard_normal((2, 224, 224, 3)).astype(np.float32)
    ours = np.asarray(
        ResNet50().apply({"params": params, "batch_stats": stats}, x, train=False)
    )
    feat = torch.nn.Sequential(*list(tv.children())[:-1])
    with torch.no_grad():
        theirs = (
            feat(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
            .squeeze(-1)
            .squeeze(-1)
            .numpy()
        )
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_inception_v3_matches_torchvision():
    torch.manual_seed(1)
    tv = tvm.inception_v3(weights=None, aux_logits=True, init_weights=False)
    tv.fc = torch.nn.Identity()
    tv.aux_logits = False
    tv.eval()
    params, stats = inception_v3_from_torch(tv.state_dict())
    x = np.random.default_rng(1).standard_normal((2, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        theirs = tv(
            torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
        ).numpy()
    ours = np.asarray(
        InceptionV3().apply({"params": params, "batch_stats": stats}, x, train=False)
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_vit_b16_matches_torchvision():
    """Ported vit_b_16 weights reproduce torchvision's eval features
    (pre-head representation: class token after encoder.ln) exactly."""
    from avsum_tpu.vision.port_torch import vit_from_torch
    from avsum_tpu.vision.vit import ViT

    torch.manual_seed(2)
    tv = tvm.vit_b_16(weights=None)
    tv.eval()
    params, arch = vit_from_torch(tv.state_dict())
    assert arch == {
        "embed_dim": 768, "depth": 12, "num_heads": 12,
        "patch_size": 16, "image_size": 224,
    }
    x = np.random.default_rng(2).standard_normal((2, 224, 224, 3)).astype(np.float32)

    with torch.no_grad():
        xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
        feats = tv._process_input(xt)
        cls = tv.class_token.expand(feats.shape[0], -1, -1)
        feats = torch.cat([cls, feats], dim=1)
        theirs = tv.encoder(feats)[:, 0].numpy()

    ours = np.asarray(
        ViT(cls_token=True, preprocess=False, **arch).apply(
            {"params": params}, x, train=False
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)
