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
    """[B, H, W, 3] RGB frames -> [B, embed_dim] pooled features."""

    image_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384  # ViT-S defaults; bump for ViT-B (768)
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = preprocess_frames(frames, self.image_size, self.dtype)
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )(x)  # [B, H/p, W/p, E]
        b, gh, gw, e = x.shape
        x = x.reshape(b, gh * gw, e)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, gh * gw, self.embed_dim),
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
        return jnp.mean(x, axis=1).astype(jnp.float32)


class ViTBackbone(nn.Module):
    """ViT features projected/tiled to the 4096-d visual contract so the
    scorer and feature cache are backbone-agnostic."""

    out_dim: int = 4096
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    image_size: int = 224
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = ViT(
            image_size=self.image_size,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            dtype=self.dtype,
            name="vit",
        )(frames, train)
        return nn.Dense(self.out_dim, dtype=jnp.float32, name="project")(feats)
