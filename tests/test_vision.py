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


def test_normalize_commutes_with_resize():
    """preprocess_frames normalizes BEFORE the bilinear resize (so the
    resize can run in bf16 at half the HBM traffic — see backbone.py
    normalize_frames). That reordering is exact: a per-channel affine map
    commutes with bilinear interpolation (whose weights sum to 1). Pin it
    against the reference order (resize, then /255 + mean/std —
    extractors.py transforms) in f32."""
    import jax.numpy as jnp

    from avsum_tpu.vision.backbone import IMAGENET_MEAN, IMAGENET_STD

    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (2, 37, 53, 3)).astype(np.float32)

    got = np.asarray(preprocess_frames(x, 32))

    r = jax.image.resize(jnp.asarray(x), (2, 32, 32, 3), method="bilinear")
    expect = np.asarray((r / 255.0 - IMAGENET_MEAN) / IMAGENET_STD)

    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-5)


def test_tail_bucket_chain():
    from avsum_tpu.train.config import VisualFeatConfig
    from avsum_tpu.vision.backbone import TinyBackbone, VisualFrontend

    fe = VisualFrontend(
        VisualFeatConfig(backbone="tiny", feature_dim=16, dtype="float32"),
        model=TinyBackbone(16),
        batch_size=256,
    )
    assert fe.tail_bucket(256) == 256  # full block
    assert fe.tail_bucket(241) == 256  # >half -> full
    assert fe.tail_bucket(89) == 128
    assert fe.tail_bucket(64) == 64
    assert fe.tail_bucket(33) == 64
    assert fe.tail_bucket(1) == 32  # MIN_BUCKET floor
    # batches below MIN_BUCKET never bucket (tests use tiny batches)
    fe_small = VisualFrontend(
        VisualFeatConfig(backbone="tiny", feature_dim=16, dtype="float32"),
        model=TinyBackbone(16),
        batch_size=8,
    )
    assert fe_small.tail_bucket(3) == 8


def test_frame_features_tail_bucket_invariant():
    """A partial tail block padded to its power-of-two bucket must produce
    the same features as any other batch size (the bucket only changes
    how much zero padding ships, never the per-frame math)."""
    from avsum_tpu.train.config import VisualFeatConfig
    from avsum_tpu.vision.backbone import TinyBackbone, VisualFrontend, fast_init

    cfg = VisualFeatConfig(backbone="tiny", feature_dim=16, dtype="float32")
    model = TinyBackbone(16)
    variables = fast_init(model, np.zeros((1, 32, 32, 3), np.float32))
    frames = (
        np.random.default_rng(3)
        .integers(0, 256, (70, 32, 32, 3))
        .astype(np.float32)
    )
    # batch 64: one full block + a 6-frame tail in a 32-bucket
    fe_a = VisualFrontend(cfg, variables=variables, model=model, batch_size=64)
    # batch 128: everything in one 128 block
    fe_b = VisualFrontend(cfg, variables=variables, model=model, batch_size=128)
    np.testing.assert_allclose(
        fe_a.frame_features(frames),
        fe_b.frame_features(frames),
        rtol=1e-5,
        atol=1e-5,
    )


def test_sample_shot_frames_stride_and_cap():
    bounds = np.array([[0, 30], [30, 330], [330, 331]])
    idx, ids = sample_shot_frames(bounds, frame_stride=3, max_frames_per_shot=50)
    assert (idx[ids == 0] == np.arange(0, 30, 3)).all()
    assert (ids == 1).sum() == 50  # capped
    assert (ids == 2).sum() == 1  # single-frame shot still sampled
    assert idx.max() < 331


@pytest.mark.slow
def test_dual_backbone_contract_dim():
    from avsum_tpu.vision.backbone import fast_init

    model = DualBackbone()
    x = np.random.default_rng(1).standard_normal((1, 64, 64, 3)).astype(np.float32)
    variables = fast_init(model, x)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 4096)


def test_vit_port_matches_torch_mini():
    """vit_from_torch parity without torchvision: a minimal torch ViT with
    torchvision's exact state-dict layout (conv_proj, class_token,
    encoder.pos_embedding, encoder_layer_i.{ln_1,self_attention,ln_2,mlp},
    encoder.ln) must match the Flax ViT(cls_token=True) bit-for-bit."""
    from avsum_tpu.vision.port_torch import vit_from_torch
    from avsum_tpu.vision.vit import ViT

    embed, depth, patch, img = 64, 2, 8, 32  # heads = embed // 64 = 1

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            # torchvision ViT builds all LayerNorms with eps=1e-6
            self.ln_1 = torch.nn.LayerNorm(embed, eps=1e-6)
            self.self_attention = torch.nn.MultiheadAttention(
                embed, embed // 64, batch_first=True
            )
            self.ln_2 = torch.nn.LayerNorm(embed, eps=1e-6)
            self.mlp = torch.nn.Sequential(
                torch.nn.Linear(embed, 4 * embed),
                torch.nn.GELU(),
                torch.nn.Dropout(0.0),
                torch.nn.Linear(4 * embed, embed),
                torch.nn.Dropout(0.0),
            )

        def forward(self, x):
            y = self.ln_1(x)
            y, _ = self.self_attention(y, y, y, need_weights=False)
            x = x + y
            return x + self.mlp(self.ln_2(x))

    class MiniViT(torch.nn.Module):
        def __init__(self):
            super().__init__()
            n = (img // patch) ** 2
            self.conv_proj = torch.nn.Conv2d(3, embed, patch, patch)
            self.class_token = torch.nn.Parameter(torch.zeros(1, 1, embed))
            self.encoder = torch.nn.Module()
            self.encoder.pos_embedding = torch.nn.Parameter(
                torch.empty(1, n + 1, embed).normal_(std=0.02)
            )
            self.encoder.layers = torch.nn.ModuleDict(
                {f"encoder_layer_{i}": Block() for i in range(depth)}
            )
            self.encoder.ln = torch.nn.LayerNorm(embed, eps=1e-6)

        def forward(self, x):
            x = self.conv_proj(x)  # [B, E, gh, gw]
            x = x.flatten(2).permute(0, 2, 1)  # [B, N, E]
            cls = self.class_token.expand(x.shape[0], -1, -1)
            x = torch.cat([cls, x], dim=1) + self.encoder.pos_embedding
            for i in range(depth):
                x = self.encoder.layers[f"encoder_layer_{i}"](x)
            return self.encoder.ln(x)[:, 0]

    torch.manual_seed(3)
    tv = MiniViT()
    with torch.no_grad():
        tv.class_token.normal_(std=0.02)
    tv.eval()
    params, arch = vit_from_torch(tv.state_dict())
    assert arch == {
        "embed_dim": embed, "depth": depth, "num_heads": embed // 64,
        "patch_size": patch, "image_size": img,
    }
    x = np.random.default_rng(3).standard_normal((2, img, img, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        theirs = tv(_to_nchw(x)).numpy()
    ours = np.asarray(
        ViT(cls_token=True, preprocess=False, **arch).apply(
            {"params": params}, x, train=False
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_vit_backbone_variables_wiring():
    """Ported ViT weights compose into a ViTBackbone variable tree the
    visual frontend can consume (pretrained transformer + seeded random
    `project` readout)."""
    from avsum_tpu.vision.vit import vit_backbone_variables

    rng = np.random.default_rng(5)
    e, depth, patch, img = 64, 1, 8, 16

    def arr(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    sd = {
        "conv_proj.weight": arr(e, 3, patch, patch),
        "conv_proj.bias": arr(e),
        "class_token": arr(1, 1, e),
        "encoder.pos_embedding": arr(1, (img // patch) ** 2 + 1, e),
        "encoder.ln.weight": np.ones(e, np.float32),
        "encoder.ln.bias": arr(e),
    }
    pre = "encoder.layers.encoder_layer_0."
    sd.update({
        pre + "ln_1.weight": np.ones(e, np.float32),
        pre + "ln_1.bias": arr(e),
        pre + "self_attention.in_proj_weight": arr(3 * e, e),
        pre + "self_attention.in_proj_bias": arr(3 * e),
        pre + "self_attention.out_proj.weight": arr(e, e),
        pre + "self_attention.out_proj.bias": arr(e),
        pre + "ln_2.weight": np.ones(e, np.float32),
        pre + "ln_2.bias": arr(e),
        pre + "mlp.0.weight": arr(4 * e, e),
        pre + "mlp.0.bias": arr(4 * e),
        pre + "mlp.3.weight": arr(e, 4 * e),
        pre + "mlp.3.bias": arr(e),
    })
    module, variables = vit_backbone_variables(sd, out_dim=128)
    x = rng.integers(0, 255, (2, img, img, 3)).astype(np.uint8)
    out = np.asarray(module.apply(variables, x, train=False))
    assert out.shape == (2, 128)
    assert np.isfinite(out).all()
    # the ported weights are live: zeroing the transformer changes output
    import jax

    zeroed = {
        "params": {
            "vit": jax.tree.map(np.zeros_like, variables["params"]["vit"]),
            "project": variables["params"]["project"],
        }
    }
    out0 = np.asarray(module.apply(zeroed, x, train=False))
    assert np.abs(out - out0).max() > 1e-4
