"""Vision Transformer backbone — the "upgraded encoders" option
(BASELINE config 4: ResNet/ViT visual backbone with cross-modal attention
fusion). Pure [B, N, E] matmul workload: the best-case shape for the MXU,
and the model axis of the mesh can shard its MLP/attention weights when
scaled up (the scorer itself stays small).

Standard ViT: conv patch embedding, learned position embeddings, pre-norm
transformer blocks (reusing the scorer's mask-aware attention blocks),
mean pooling -> feature vector.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from avsum_tpu.models.temporal import AttentionBlock
from avsum_tpu.vision.backbone import preprocess_frames


class ViT(nn.Module):
    """[B, H, W, 3] RGB frames -> [B, embed_dim] pooled features.

    ``cls_token=True`` selects the torchvision ``vit_b_16`` layout
    (learned class token prepended, position embeddings over N+1 tokens,
    representation = the class token after the final LayerNorm) so ported
    pretrained weights reproduce torch outputs exactly
    (vision/port_torch.py::vit_from_torch). The default mean-pool variant
    stays for from-scratch training (no token wasted on a register).
    """

    image_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384  # ViT-S defaults; bump for ViT-B (768)
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    cls_token: bool = False
    preprocess: bool = True  # resize + ImageNet-normalize raw frames
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = (
            preprocess_frames(frames, self.image_size, self.dtype)
            if self.preprocess
            else frames.astype(self.dtype)
        )
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )(x)  # [B, H/p, W/p, E]
        b, gh, gw, e = x.shape
        x = x.reshape(b, gh * gw, e)
        n_tokens = gh * gw
        if self.cls_token:
            cls = self.param(
                "cls",
                nn.initializers.zeros,
                (1, 1, self.embed_dim),
                self.dtype,
            )
            x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1)
            n_tokens += 1
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, n_tokens, self.embed_dim),
            self.dtype,
        )
        x = x + pos
        for i in range(self.depth):
            x = AttentionBlock(
                self.embed_dim,
                self.num_heads,
                dropout=0.0,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, mask=None, deterministic=not train)
        x = nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)
        pooled = x[:, 0] if self.cls_token else jnp.mean(x, axis=1)
        return pooled.astype(jnp.float32)


# named variants: (embed_dim, depth, num_heads, cls_token)
VIT_VARIANTS = {
    "s16": (384, 12, 6, False),  # from-scratch default (mean pool)
    "b16": (768, 12, 12, True),  # torchvision vit_b_16 layout (ported)
}


class ViTBackbone(nn.Module):
    """ViT features projected/tiled to the 4096-d visual contract so the
    scorer and feature cache are backbone-agnostic."""

    out_dim: int = 4096
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    image_size: int = 224
    patch_size: int = 16
    cls_token: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = ViT(
            image_size=self.image_size,
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            cls_token=self.cls_token,
            dtype=self.dtype,
            name="vit",
        )(frames, train)
        return nn.Dense(self.out_dim, dtype=jnp.float32, name="project")(feats)


def vit_backbone_variables(torch_state_dict, out_dim: int = 4096, seed: int = 0):
    """Ported torchvision ViT weights -> ViTBackbone variables + module.

    The transformer comes from the checkpoint (``vit_from_torch``); the
    ``project`` readout to the backbone-agnostic feature dim is a SEEDED
    random linear map (information-preserving for downstream training, the
    analogue of the reference's head-removed frozen extractors,
    extractors.py:29). Returns ``(module, variables)`` ready for
    ``VisualFrontend(config, model=module, variables=variables)``.
    """
    import jax
    import numpy as np

    from avsum_tpu.vision.port_torch import vit_from_torch

    params, arch = vit_from_torch(torch_state_dict)
    module = ViTBackbone(
        out_dim=out_dim,
        embed_dim=arch["embed_dim"],
        depth=arch["depth"],
        num_heads=arch["num_heads"],
        image_size=arch["image_size"],
        patch_size=arch["patch_size"],
        cls_token=True,
    )
    init = module.init(
        jax.random.PRNGKey(seed),
        np.zeros((1, arch["image_size"], arch["image_size"], 3), np.float32),
    )
    return module, {"params": {"vit": params, "project": init["params"]["project"]}}
