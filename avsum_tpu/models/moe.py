"""Mixture-of-experts temporal encoder with expert parallelism.

The reference's model family is a single dense scorer
(/root/reference/models/av_model.py:6-46). This module is the rebuild's
"upgraded encoders" growth path (BASELINE config 4): the attention blocks'
dense FFN is replaced by a top-k gated mixture of expert FFNs, and the
expert dimension shards over the mesh's ``model`` axis (**ep** — completing
the parallelism matrix next to dp/sp/tp/pp).

TPU-native design decisions:

- **Dense dispatch**: every expert processes every token; the top-k gate
  zeroes the non-selected combine weights. At this model scale (S = shots
  per video, hundreds; hidden 512) the all-token einsum is a single large
  MXU matmul per expert — far better than gather/scatter token routing,
  which XLA lowers to bandwidth-bound dynamic ops. The sharded and
  unsharded paths are therefore *numerically identical* (exact-tested),
  not capacity-truncated approximations.
- **Expert parallelism via shard_map**: with ``ep_mesh`` set, each device
  materializes only its ``E / n`` local experts (true parameter scaling),
  computes their weighted outputs for all tokens, and a single ``psum``
  over the model axis combines — one collective per MoE layer, riding ICI.
- Gate runs in f32 for a stable softmax regardless of block dtype.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from avsum_tpu.models.attention import MultiHeadSelfAttention
from avsum_tpu.parallel.mesh import AXIS_DATA, AXIS_MODEL, AXIS_SEQ


def _expert_ffn(w1, b1, w2, b2, x, weights):
    """Weighted sum of expert FFNs over the (local) expert axis.

    x [B,S,F], w1 [E,F,G], w2 [E,G,F], weights [B,S,E] -> [B,S,F].
    """
    h = jnp.einsum("bsf,efg->besg", x, w1, preferred_element_type=jnp.float32)
    h = nn.gelu(h.astype(x.dtype) + b1[None, :, None, :])
    y = jnp.einsum("besg,egf->besf", h, w2, preferred_element_type=jnp.float32)
    y = y.astype(x.dtype) + b2[None, :, None, :]
    return jnp.einsum("besf,bse->bsf", y, weights.astype(x.dtype))


def _expert_ffn_sharded(w1, b1, w2, b2, x, weights, axis_name):
    """shard_map body: local experts only, psum-combined over the axis."""
    out = _expert_ffn(w1, b1, w2, b2, x, weights)
    return jax.lax.psum(out, axis_name)


class MoEFFN(nn.Module):
    """Top-k gated expert FFN (drop-in for the dense FFN of a block)."""

    dim: int
    n_experts: int = 4
    top_k: int = 2
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32
    ep_mesh: object = None  # jax.sharding.Mesh with a `model` axis > 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        e, f, g = self.n_experts, self.dim, self.expansion * self.dim
        w1 = self.param("w1", nn.initializers.xavier_uniform(), (e, f, g), self.dtype)
        b1 = self.param("b1", nn.initializers.zeros, (e, g), self.dtype)
        w2 = self.param("w2", nn.initializers.xavier_uniform(), (e, g, f), self.dtype)
        b2 = self.param("b2", nn.initializers.zeros, (e, f), self.dtype)

        # gate: f32 softmax over experts, top-k mask, renormalize so the
        # selected experts' weights sum to 1 per token
        logits = nn.Dense(e, dtype=jnp.float32, name="gate")(
            x.astype(jnp.float32)
        )  # [B,S,E]
        probs = jax.nn.softmax(logits, axis=-1)
        if self.top_k < e:
            kth = jnp.sort(probs, axis=-1)[..., e - self.top_k, None]
            probs = jnp.where(probs >= kth, probs, 0.0)
            probs = probs / jnp.maximum(probs.sum(-1, keepdims=True), 1e-9)

        mesh = self.ep_mesh
        if mesh is not None and dict(mesh.shape).get(AXIS_MODEL, 1) > 1:
            n = dict(mesh.shape)[AXIS_MODEL]
            if e % n == 0:
                shape = dict(mesh.shape)
                # the FFN is pointwise over tokens, so any existing batch/seq
                # sharding flows straight through the shard_map (no forced
                # gather of the activations; the only collective is the
                # expert-axis psum)
                b_ax = (
                    AXIS_DATA
                    if shape.get(AXIS_DATA, 1) > 1
                    and x.shape[0] % shape[AXIS_DATA] == 0
                    else None
                )
                s_ax = (
                    AXIS_SEQ
                    if shape.get(AXIS_SEQ, 1) > 1
                    and x.shape[1] % shape[AXIS_SEQ] == 0
                    else None
                )
                body = functools.partial(
                    _expert_ffn_sharded, axis_name=AXIS_MODEL
                )
                espec = P(AXIS_MODEL)  # leading expert axis sharded
                tok = P(b_ax, s_ax, None)
                return jax.shard_map(
                    body,
                    mesh=mesh,
                    in_specs=(
                        espec,
                        espec,
                        espec,
                        espec,
                        tok,
                        P(b_ax, s_ax, AXIS_MODEL),  # combine weights per expert
                    ),
                    out_specs=tok,
                    check_vma=False,
                )(w1, b1, w2, b2, x, probs)
        return _expert_ffn(w1, b1, w2, b2, x, probs)


class MoEBlock(nn.Module):
    """Pre-norm attention block whose FFN is a gated expert mixture."""

    dim: int
    num_heads: int
    n_experts: int = 4
    top_k: int = 2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    ep_mesh: object = None

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = MultiHeadSelfAttention(self.dim, self.num_heads, dtype=self.dtype)(
            y, mask
        )
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = MoEFFN(
            self.dim,
            n_experts=self.n_experts,
            top_k=self.top_k,
            dtype=self.dtype,
            ep_mesh=self.ep_mesh,
            name="moe_ffn",
        )(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = x + y
        if mask is not None:
            x = x * mask.astype(x.dtype)[..., None]
        return x


class MoEEncoder(nn.Module):
    """Stack of MoE attention blocks (temporal_encoder: "moe")."""

    hidden: int
    num_layers: int = 2
    num_heads: int = 4
    n_experts: int = 4
    top_k: int = 2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    ep_mesh: object = None

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        from avsum_tpu.models.temporal import sinusoidal_positions

        b, s, f = x.shape
        x = x + sinusoidal_positions(s, f, x.dtype)[None]
        for i in range(self.num_layers):
            x = MoEBlock(
                self.hidden,
                self.num_heads,
                n_experts=self.n_experts,
                top_k=self.top_k,
                dropout=self.dropout,
                dtype=self.dtype,
                ep_mesh=self.ep_mesh,
                name=f"block{i}",
            )(x, mask, deterministic)
        return x
