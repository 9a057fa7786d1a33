"""Scorer model families.

TPU-first re-design of the reference's ``AVBiLSTMModel``
(/root/reference/models/av_model.py:6-46): modality MLPs -> temporal
encoder -> cross-modal self-attention -> sigmoid head. Differences by
design (SURVEY.md §7):

- mask-aware everywhere (the reference has no padding/masking at all)
- explicit [B, S, E] convention (the reference misconfigures
  ``nn.MultiheadAttention`` batch order, SURVEY.md §8.5)
- the default temporal encoder is bidirectional attention blocks
  (XLA/MXU-friendly); a ``lax.scan`` BiLSTM variant is kept for parity
  with the reference and a temporal-conv variant for streaming
"""

from avsum_tpu.models.attention import MultiHeadSelfAttention
from avsum_tpu.models.scorer import AVScorer, make_model
from avsum_tpu.models.temporal import AttentionEncoder, BiLSTM, TemporalConvEncoder

__all__ = [
    "AVScorer",
    "make_model",
    "MultiHeadSelfAttention",
    "BiLSTM",
    "AttentionEncoder",
    "TemporalConvEncoder",
]
