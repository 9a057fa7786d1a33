"""Temporal encoders over the shot sequence.

Three interchangeable families (config ``model.temporal_encoder``):

- ``AttentionEncoder`` (default): pre-norm bidirectional attention blocks.
  TPU-first choice — all work is batched matmuls on the MXU, and the
  sequence axis shards cleanly for long videos (SURVEY.md §5.7).
- ``BiLSTM``: parity variant of the reference's two BiLSTMs
  (/root/reference/models/av_model.py:18-23), implemented as a
  ``jax.lax.scan`` over time. Kept only for fidelity comparisons —
  sequential recurrence is hostile to XLA and to sequence sharding.
- ``TemporalConvEncoder``: dilated temporal convolutions for the
  streaming/long-video path (bounded receptive field, O(S) work).

All are mask-aware: padded timesteps neither contribute to nor perturb
real positions (the reference pads with zeros and no mask,
/root/reference/scripts/train.py:20-29).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from avsum_tpu.models.attention import MultiHeadSelfAttention


class LSTMCellScan(nn.Module):
    """Single-direction LSTM over [B, S, F] via lax.scan (batch-vectorized)."""

    hidden: int
    dtype: jnp.dtype = jnp.float32
    reverse: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        b, s, f = x.shape
        wi = self.param(
            "wi", nn.initializers.xavier_uniform(), (f, 4 * self.hidden), self.dtype
        )
        wh = self.param(
            "wh", nn.initializers.orthogonal(), (self.hidden, 4 * self.hidden), self.dtype
        )
        bias = self.param("b", nn.initializers.zeros, (4 * self.hidden,), self.dtype)

        # Precompute input projections as one big [B,S,4H] matmul (MXU),
        # leaving only the small recurrent matmul inside the scan.
        xw = jnp.einsum("bsf,fg->bsg", x, wi, preferred_element_type=jnp.float32)
        xw = (xw + bias).astype(self.dtype)

        m = (
            jnp.ones((b, s, 1), self.dtype)
            if mask is None
            else mask.astype(self.dtype)[..., None]
        )

        def step(carry, inp):
            h, c = carry
            xt, mt = inp  # [B,4H], [B,1]
            gates = xt + jnp.dot(h, wh, preferred_element_type=jnp.float32).astype(
                self.dtype
            )
            i, fgate, g, o = jnp.split(gates, 4, axis=-1)
            i, fgate, o = nn.sigmoid(i), nn.sigmoid(fgate), nn.sigmoid(o)
            g = nn.tanh(g)
            c_new = fgate * c + i * g
            h_new = o * nn.tanh(c_new)
            # freeze state across padded steps
            h_new = mt * h_new + (1 - mt) * h
            c_new = mt * c_new + (1 - mt) * c
            return (h_new, c_new), h_new

        init = (
            jnp.zeros((b, self.hidden), self.dtype),
            jnp.zeros((b, self.hidden), self.dtype),
        )
        xs = (jnp.swapaxes(xw, 0, 1), jnp.swapaxes(m, 0, 1))  # [S,B,*]
        _, hs = jax.lax.scan(step, init, xs, reverse=self.reverse)
        return jnp.swapaxes(hs, 0, 1)  # [B,S,H]


class BiLSTM(nn.Module):
    """Bidirectional LSTM: forward + backward halves concatenated, matching
    the reference's ``nn.LSTM(hidden, hidden//2, bidirectional=True)``."""

    hidden: int  # total output width (hidden//2 per direction)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        half = self.hidden // 2
        fwd = LSTMCellScan(half, self.dtype, reverse=False, name="fwd")(x, mask)
        bwd = LSTMCellScan(half, self.dtype, reverse=True, name="bwd")(x, mask)
        out = jnp.concatenate([fwd, bwd], axis=-1)
        if mask is not None:
            out = out * mask.astype(out.dtype)[..., None]
        return out


class AttentionBlock(nn.Module):
    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False  # flash-attention kernel (inference dispatch)
    ring_mesh: object = None  # context-parallel ring attention (training)

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = MultiHeadSelfAttention(
            self.dim, self.num_heads, dtype=self.dtype,
            use_pallas=self.use_pallas, ring_mesh=self.ring_mesh,
        )(y, mask)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(4 * self.dim, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = x + y
        if mask is not None:
            x = x * mask.astype(x.dtype)[..., None]
        return x


class AttentionEncoder(nn.Module):
    """Stack of bidirectional attention blocks + sinusoidal positions."""

    hidden: int
    num_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    ring_mesh: object = None
    remat: bool = False  # jax.checkpoint each block (hour-scale training)

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        b, s, f = x.shape
        pos = sinusoidal_positions(s, f, x.dtype)
        x = x + pos[None]
        block_cls = (
            nn.remat(AttentionBlock, static_argnums=(3,))
            if self.remat
            else AttentionBlock
        )
        for i in range(self.num_layers):
            x = block_cls(
                self.hidden,
                self.num_heads,
                self.dropout,
                self.dtype,
                use_pallas=self.use_pallas,
                ring_mesh=self.ring_mesh,
                name=f"block{i}",
            )(x, mask, deterministic)
        return x


class TemporalConvEncoder(nn.Module):
    """Dilated temporal convolutions (streaming-friendly, O(S))."""

    hidden: int
    num_layers: int = 2
    kernel: int = 5
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        m = None if mask is None else mask.astype(x.dtype)[..., None]
        for i in range(self.num_layers):
            y = nn.LayerNorm(dtype=self.dtype)(x)
            if m is not None:
                y = y * m  # keep padding out of the conv window
            y = nn.Conv(
                self.hidden,
                (self.kernel,),
                kernel_dilation=(2**i,),
                padding="SAME",
                dtype=self.dtype,
            )(y)
            y = nn.gelu(y)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            x = x + y
        if m is not None:
            x = x * m
        return x


def sinusoidal_positions(seq_len: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """Standard sinusoidal position embedding table [S, D]."""
    pos = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    angles = pos * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    if emb.shape[-1] < dim:  # odd dim
        emb = jnp.pad(emb, ((0, 0), (0, dim - emb.shape[-1])))
    return emb.astype(dtype)
