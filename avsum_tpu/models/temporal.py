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
        # exact (erf) GELU: matches torch's default, so ported transformer
        # weights (vision/port_torch.py::vit_from_torch) reproduce torch
        # outputs without a tanh-approximation drift across 12 layers
        y = nn.gelu(y, approximate=False)
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


class StageBlocks(nn.Module):
    """``layers`` dropout-free attention blocks — one GPipe *stage*.

    Dropout-free so the stage is a pure ``(params, x, mask) -> y`` function
    the pipeline schedule (:func:`avsum_tpu.parallel.pipeline.pipeline_apply`)
    can trace without rng plumbing; regularization for the deep encoder comes
    from the scorer's modality-MLP dropout and weight decay.
    """

    dim: int
    num_heads: int
    layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        for i in range(self.layers):
            x = AttentionBlock(
                self.dim, self.num_heads, 0.0, self.dtype, name=f"layer{i}"
            )(x, mask, True)
        return x


class PipelinedAttentionEncoder(nn.Module):
    """Deep attention encoder whose block stack runs as GPipe stages.

    The "upgraded encoders" configuration (BASELINE config 4; SURVEY.md §2
    row 19 pp): ``num_layers`` attention blocks are grouped into
    ``n_stages`` stages whose parameters live on a leading ``[n_stages,…]``
    axis. With a mesh whose ``model`` axis is >1 each device materializes
    ONLY its stage's weights (model-memory scaling along depth) and
    microbatches stream through the ICI ring
    (:func:`avsum_tpu.parallel.pipeline.pipeline_apply`). Without a mesh
    the same stacked parameters are applied sequentially via ``lax.scan`` —
    numerically identical, so checkpoints are mesh-portable.
    """

    hidden: int
    num_layers: int = 12
    n_stages: int = 4
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32
    pp_mesh: object = None  # jax.sharding.Mesh or None (sequential fallback)
    remat: bool = False

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        del deterministic  # stages are dropout-free (see StageBlocks)
        if self.num_layers % self.n_stages != 0:
            raise ValueError(
                f"temporal_layers={self.num_layers} must divide into "
                f"pp_stages={self.n_stages} equal stages"
            )
        b, s, f = x.shape
        x = x + sinusoidal_positions(s, f, x.dtype)[None]
        core = StageBlocks(
            self.hidden,
            self.num_heads,
            self.num_layers // self.n_stages,
            self.dtype,
        )

        def init_stages(rng):
            from avsum_tpu.parallel.pipeline import stack_stage_params

            sample = jnp.zeros((1, s, f), x.dtype)
            per_stage = [
                core.init(r, sample, None)["params"]
                for r in jax.random.split(rng, self.n_stages)
            ]
            return stack_stage_params(per_stage)

        stacked = self.param("stages", init_stages)

        def stage_fn(p, xx, mm):
            return core.apply({"params": p}, xx, mm)

        if self.remat:
            stage_fn = jax.checkpoint(stage_fn)

        if self.pp_mesh is not None:
            import math

            from avsum_tpu.parallel.pipeline import pipeline_apply

            n_micro = b if b % self.n_stages == 0 else math.gcd(b, self.n_stages)
            x = pipeline_apply(
                stage_fn,
                stacked,
                x,
                self.pp_mesh,
                mask,
                num_microbatches=min(n_micro, b),
            )
        else:

            def body(carry, p):
                return stage_fn(p, carry, mask), None

            x, _ = jax.lax.scan(body, x, stacked)
        if mask is not None:
            x = x * mask.astype(x.dtype)[..., None]
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
