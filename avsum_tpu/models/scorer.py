"""AVScorer — the flagship audio-visual importance scorer.

Capability-parity with the reference's ``AVBiLSTMModel``
(/root/reference/models/av_model.py:6-46):

    visual[B,S,4096], audio[B,S,296]
      -> modality MLPs (Dense 512 + ReLU + Dropout 0.3)      av_model.py:10-15
      -> temporal encoder per modality (BiLSTM in reference)  av_model.py:18-23
      -> concat [B,S,1024] -> cross-modal self-attention      av_model.py:26,43-44
      -> Dense 64 -> ReLU -> Dense 1 -> sigmoid -> [B,S]      av_model.py:29-31,46

TPU-first deltas: mask-aware throughout, strict [B,S,E] layout, selectable
temporal encoder (attention default; BiLSTM kept as a parity variant), and
the whole forward is a single jittable function of (params, batch).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from avsum_tpu.models.attention import (
    MultiHeadCrossAttention,
    MultiHeadSelfAttention,
)
from avsum_tpu.models.temporal import (
    AttentionEncoder,
    BiLSTM,
    TemporalConvEncoder,
)
from avsum_tpu.train.config import ModelConfig

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


class ModalityMLP(nn.Module):
    hidden: int
    dropout: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class AVScorer(nn.Module):
    """Per-shot importance scores in [0, 1] from audio-visual features.

    ``mesh``: when set and its ``seq`` axis is >1, every self-attention in
    the model runs ring-mode (context parallel over the shot/frame axis,
    :mod:`avsum_tpu.parallel.ring`) — the sequence stays sharded end to end
    instead of XLA all-gathering keys per attention. Set by the trainer via
    ``model.clone(mesh=mesh)``; parameters are identical either way.
    """

    config: ModelConfig = ModelConfig()
    mesh: Optional[object] = None  # jax.sharding.Mesh (static metadata)

    def _ring_mesh(self):
        if self.mesh is None:
            return None
        from avsum_tpu.parallel.mesh import AXIS_SEQ

        if dict(self.mesh.shape).get(AXIS_SEQ, 1) <= 1:
            return None
        return self.mesh

    def _ep_mesh(self):
        """Mesh for expert parallelism (model axis shards the experts)."""
        if self.mesh is None:
            return None
        from avsum_tpu.parallel.mesh import AXIS_MODEL

        if dict(self.mesh.shape).get(AXIS_MODEL, 1) <= 1:
            return None
        return self.mesh

    def _pp_mesh(self):
        """Mesh for pipeline parallelism (model axis = GPipe stage ring).
        Requires the axis size to equal ``pp_stages`` so every device holds
        exactly one stage (pipeline_apply validates the leading axis)."""
        if self.mesh is None or self.config.pp_stages <= 1:
            return None
        from avsum_tpu.parallel.mesh import AXIS_MODEL

        m = dict(self.mesh.shape).get(AXIS_MODEL, 1)
        if m <= 1:
            return None
        if m != self.config.pp_stages:
            raise ValueError(
                f"model.pp_stages={self.config.pp_stages} must equal the "
                f"mesh's model axis size {m} (one stage per device)"
            )
        return self.mesh

    def _temporal(self, name: str, use_pallas: bool = False):
        cfg = self.config
        dtype = _DTYPES[cfg.dtype]
        kind = cfg.temporal_encoder
        if kind == "bilstm":
            return BiLSTM(cfg.hidden_dim, dtype=dtype, name=name)
        if kind == "attention":
            if cfg.pp_stages > 1:
                from avsum_tpu.models.temporal import PipelinedAttentionEncoder

                return PipelinedAttentionEncoder(
                    cfg.hidden_dim,
                    num_layers=cfg.temporal_layers,
                    n_stages=cfg.pp_stages,
                    num_heads=cfg.num_heads,
                    dtype=dtype,
                    pp_mesh=self._pp_mesh(),
                    remat=cfg.remat,
                    name=name,
                )
            return AttentionEncoder(
                cfg.hidden_dim,
                num_layers=cfg.temporal_layers,
                num_heads=cfg.num_heads,
                dropout=cfg.dropout,
                dtype=dtype,
                use_pallas=use_pallas,
                ring_mesh=self._ring_mesh(),
                remat=cfg.remat,
                name=name,
            )
        if kind == "moe":
            from avsum_tpu.models.moe import MoEEncoder

            return MoEEncoder(
                cfg.hidden_dim,
                num_layers=cfg.temporal_layers,
                num_heads=cfg.num_heads,
                n_experts=cfg.moe_experts,
                top_k=cfg.moe_topk,
                dropout=cfg.dropout,
                dtype=dtype,
                ep_mesh=self._ep_mesh(),
                name=name,
            )
        if kind == "tcn":
            return TemporalConvEncoder(
                cfg.hidden_dim,
                num_layers=cfg.temporal_layers,
                dropout=cfg.dropout,
                dtype=dtype,
                name=name,
            )
        raise ValueError(f"unknown temporal encoder {kind!r}")

    @nn.compact
    def __call__(
        self,
        visual: jnp.ndarray,
        audio: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        dtype = _DTYPES[cfg.dtype]
        assert visual.ndim == 3 and audio.ndim == 3, "expect [B,S,D] inputs"

        # Flash-attention dispatch (inference AND training — the kernel has
        # a custom-VJP flash backward, so no [S,S] matrix materializes in
        # either direction; golden-tested against the XLA path both ways).
        from avsum_tpu.ops import pallas_enabled

        use_pallas = pallas_enabled(cfg.use_pallas)

        v = ModalityMLP(cfg.hidden_dim, cfg.dropout, dtype, name="visual_fc")(
            visual.astype(dtype), deterministic
        )
        a = ModalityMLP(cfg.hidden_dim, cfg.dropout, dtype, name="audio_fc")(
            audio.astype(dtype), deterministic
        )

        kwargs = (
            {} if cfg.temporal_encoder == "bilstm" else {"deterministic": deterministic}
        )
        v = self._temporal("visual_temporal", use_pallas)(v, mask, **kwargs)
        a = self._temporal("audio_temporal", use_pallas)(a, mask, **kwargs)

        if cfg.fusion == "cross":
            # co-attention: each modality queries the other, residual added
            v = v + MultiHeadCrossAttention(
                cfg.hidden_dim, cfg.num_heads, dtype=dtype, name="v_attends_a"
            )(v, a, mask)
            a = a + MultiHeadCrossAttention(
                cfg.hidden_dim, cfg.num_heads, dtype=dtype, name="a_attends_v"
            )(a, v, mask)
            fused = jnp.concatenate([v, a], axis=-1)  # [B,S,2H]
        else:
            fused = jnp.concatenate([v, a], axis=-1)  # [B,S,2H]
            fused = fused + MultiHeadSelfAttention(
                2 * cfg.hidden_dim,
                cfg.num_heads,
                dtype=dtype,
                use_pallas=use_pallas,
                chunk_size=cfg.chunk_size,
                ring_mesh=self._ring_mesh(),
                name="cross_attention",
            )(fused, mask)

        x = nn.Dense(cfg.scorer_hidden, dtype=dtype, name="scorer_hidden")(fused)
        x = nn.relu(x)
        x = nn.Dense(1, dtype=jnp.float32, name="scorer_out")(x)
        scores = nn.sigmoid(x)[..., 0]  # [B,S]
        if mask is not None:
            scores = scores * mask.astype(scores.dtype)
        return scores


def make_model(config: ModelConfig = ModelConfig(), mesh=None) -> AVScorer:
    """Build the flagship scorer. Pass a mesh with a seq axis >1 to run all
    attention context-parallel (ring); params are identical either way."""
    return AVScorer(config=config, mesh=mesh)
