"""Multi-head self-attention, mask-aware, with an optional fused Pallas path.

Functional equivalent of both attention surfaces in the reference:
- the custom MHSA it defines but never uses
  (/root/reference/models/attention.py:5-25)
- the ``nn.MultiheadAttention(1024, 4)`` actually called in the model
  (/root/reference/models/av_model.py:26,43-44)

Unlike the reference (which sets no key-padding mask and mixes up batch
order, SURVEY.md §8.5), this module takes an explicit [B, S] validity mask
and a strict [B, S, E] layout. Attention logits are computed in f32
regardless of input dtype (bf16-safe softmax).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from jax.sharding import Mesh

NEG_INF = -1e30


def attention_bias(mask: Optional[jnp.ndarray], dtype=jnp.float32):
    """[B,S] validity mask -> [B,1,1,S] additive key bias."""
    if mask is None:
        return None
    bias = jnp.where(mask.astype(bool), 0.0, NEG_INF).astype(dtype)
    return bias[:, None, None, :]


class MultiHeadCrossAttention(nn.Module):
    """Queries from ``x``, keys/values from ``y`` (co-attention between
    modality streams — the true "cross-modal attention fusion" of
    BASELINE config 4; the reference's nn.MultiheadAttention was pure
    self-attention over the concatenated features, av_model.py:44).
    Attention-based AV fusion of this shape is the efficient alternative
    to full joint self-attention (cf. Attend-Fusion, arXiv:2408.14441 —
    see PAPERS.md)."""

    embed_dim: int
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, mask: Optional[jnp.ndarray] = None):
        b, s, e = x.shape
        h = self.num_heads
        d = e // h
        q = nn.DenseGeneral((h, d), axis=-1, dtype=self.dtype, name="q")(x)
        kv = nn.DenseGeneral((2, h, d), axis=-1, dtype=self.dtype, name="kv")(y)
        k, v = kv[:, :, 0], kv[:, :, 1]
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (d ** -0.5)
        bias = attention_bias(mask)
        if bias is not None:
            logits = logits + bias
        probs = nn.softmax(logits, axis=-1).astype(self.dtype)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        out = nn.DenseGeneral(e, axis=(-2, -1), dtype=self.dtype, name="out")(ctx)
        if mask is not None:
            out = out * mask.astype(out.dtype)[..., None]
        return out


class MultiHeadSelfAttention(nn.Module):
    """Bidirectional MHSA over the shot/frame sequence axis.

    attention(Q,K,V) with Q=K=V=x, optional key-padding mask, f32 softmax.
    When ``use_pallas`` is set and the sequence/head dims are tile-aligned,
    dispatches to the fused Pallas flash-attention kernel
    (:func:`avsum_tpu.ops.flash_attention`).
    """

    embed_dim: int
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    chunk_size: int = 0  # >0: blockwise query chunking (O(chunk*S) memory)
    # Context parallelism: when set (and the mesh's seq axis is >1), the
    # sequence axis stays sharded and K/V rotate around the ICI ring
    # (avsum_tpu.parallel.ring) instead of XLA all-gathering the keys.
    # Exact attention; differentiable (fori_loop has static trip count).
    ring_mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        b, s, e = x.shape
        assert e == self.embed_dim, (e, self.embed_dim)
        h = self.num_heads
        d = e // h
        assert d * h == e, "embed_dim must be divisible by num_heads"

        qkv = nn.DenseGeneral(
            (3, h, d), axis=-1, dtype=self.dtype, name="qkv"
        )(x)  # [B,S,3,H,D]
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B,S,H,D]

        # the flash kernel pads S up to its 512-token blocks; below that the
        # XLA attention is strictly cheaper (and was measured faster until
        # S ~ 7k), so short sequences always take the XLA path. A symbolic
        # S (jax.export shape polymorphism) can't answer the comparison and
        # Pallas needs concrete block shapes anyway -> XLA path for export.
        use_pallas = self.use_pallas and isinstance(s, int) and s >= 512

        if self.ring_mesh is not None:
            from avsum_tpu.parallel.mesh import AXIS_DATA, AXIS_SEQ
            from avsum_tpu.parallel.ring import ring_attention

            ctx = ring_attention(
                q, k, v, self.ring_mesh, mask=mask,
                axis_name=AXIS_SEQ, batch_axis=AXIS_DATA,
            ).astype(self.dtype)
        elif use_pallas:
            from avsum_tpu.ops import flash_attention

            ctx = flash_attention(q, k, v, mask=mask)
        elif self.chunk_size > 0:
            from avsum_tpu.ops.chunked import chunked_attention

            ctx = chunked_attention(q, k, v, mask=mask, chunk_size=self.chunk_size).astype(self.dtype)
        else:
            scale = d ** -0.5
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            bias = attention_bias(mask)
            if bias is not None:
                logits = logits + bias
            probs = nn.softmax(logits, axis=-1).astype(self.dtype)
            ctx = jnp.einsum(
                "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
            ).astype(self.dtype)

        out = nn.DenseGeneral(
            e, axis=(-2, -1), dtype=self.dtype, name="out"
        )(ctx)
        if mask is not None:
            out = out * mask.astype(out.dtype)[..., None]
        return out
