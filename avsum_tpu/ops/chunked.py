"""Chunked (blockwise) exact attention — single-chip memory bounding.

Computes full global attention but iterates the QUERY axis in chunks with
``lax.map``, so peak memory is O(chunk * S) instead of O(S^2). This is the
within-chip companion of :mod:`avsum_tpu.parallel.ring` for long videos
(config model.chunk_size wires it into the scorer's attention).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def chunked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    chunk_size: int = 512,
) -> jnp.ndarray:
    """softmax(QK^T/sqrt(D) + bias) V with query chunking.

    q, k, v: [B, S, H, D]; mask: optional [B, S] key validity.
    Returns [B, S, H, D] f32. S is padded up to a chunk multiple
    internally; results for real positions are exact.
    """
    b, s, h, d = q.shape
    scale = d ** -0.5
    pad = (-s) % chunk_size
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    n_chunks = qp.shape[1] // chunk_size
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    bias = (
        None
        if mask is None
        else jnp.where(jnp.asarray(mask, bool), 0.0, NEG_INF).astype(jnp.float32)
    )

    qc = qp.reshape(b, n_chunks, chunk_size, h, d).astype(jnp.float32)

    def one_chunk(q_chunk):  # [B, C, H, D]
        logits = (
            jnp.einsum(
                "bqhd,bkhd->bhqk", q_chunk, kf, preferred_element_type=jnp.float32
            )
            * scale
        )
        if bias is not None:
            logits = logits + bias[:, None, None, :]
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum(
            "bhqk,bkhd->bqhd", probs, vf, preferred_element_type=jnp.float32
        )

    out = jax.lax.map(one_chunk, jnp.moveaxis(qc, 1, 0))  # [N, B, C, H, D]
    out = jnp.moveaxis(out, 0, 1).reshape(b, n_chunks * chunk_size, h, d)
    return out[:, :s]
