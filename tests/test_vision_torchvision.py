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
