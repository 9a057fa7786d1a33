"""Fused flash attention (Pallas TPU kernel).

The scorer's cross-modal attention (models/attention.py) is the O(S^2) hot
op for hour-scale videos (SURVEY.md §5.7: 1 h at 2 fps = 7200 frame
tokens). This kernel computes softmax(QK^T * scale + bias) V in one pass
with the online-softmax recurrence — the [S, S] probability matrix never
materializes in HBM, so memory is O(S*D) and every block stays in VMEM.

Layout: grid (B, H, nQ, nKV); the innermost (nKV) axis is sequential on
TPU, so running max / denominator / accumulator live in VMEM scratch
across kv steps and the output block is written once on the last step.

Functional contract matches the XLA path in
models/attention.MultiHeadSelfAttention (golden-tested in
tests/test_flash_attention.py, interpret mode on CPU + real compile on TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# Swept on a v5e at S=7168/14336, H=4, D=256 (the hour-scale scorer shapes):
# 128x128 ran 0.85x of XLA attention, 512x512 runs 1.06x/1.28x — bigger
# blocks amortize the grid's sequential kv loop and keep the MXU fed.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512


def _flash_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr, acc_scr, *, scale
):
    ki = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0].astype(jnp.float32)  # [BQ, D]
    k = k_ref[0, 0].astype(jnp.float32)  # [BK, D]
    v = v_ref[0, 0].astype(jnp.float32)  # [BK, D]
    bias = bias_ref[0].astype(jnp.float32)  # [BK]

    s = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
        + bias[None, :]
    )  # [BQ, BK]

    m_prev = m_scr[:, :1]  # [BQ, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)  # [BQ, BK]
    alpha = jnp.exp(m_prev - m_new)  # [BQ, 1]
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == n_kv - 1)
    def _finish():
        # padded query rows see only -inf bias -> l == 0; guard the divide
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(Q K^T / sqrt(D) + mask bias) V.

    Args:
      q, k, v: [B, S, H, D] (same layout the scorer's MHSA uses).
      mask: optional [B, S] key-validity mask (padded keys excluded).
      block_q / block_k: VMEM tile sizes along the sequence axis.
      interpret: run in the Pallas interpreter (CPU tests).

    Returns [B, S, H, D], f32.
    """
    b, s, h, d = q.shape
    scale = d ** -0.5
    s_pad = _round_up(max(s, 1), max(block_q, block_k))

    def pad_seq(x):
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))

    # [B,S,H,D] -> [B,H,S,D] for clean sequence blocking
    qt = jnp.moveaxis(pad_seq(q), 2, 1)
    kt = jnp.moveaxis(pad_seq(k), 2, 1)
    vt = jnp.moveaxis(pad_seq(v), 2, 1)

    key_valid = (
        jnp.ones((b, s), bool) if mask is None else jnp.asarray(mask, bool)
    )
    key_valid = jnp.pad(key_valid, ((0, 0), (0, s_pad - s)))
    bias = jnp.where(key_valid, 0.0, NEG_INF).astype(jnp.float32)  # [B,S']

    n_q = s_pad // block_q
    n_kv = s_pad // block_k

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=(b, h, n_q, n_kv),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d),
                lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k),
                lambda bi, hi, qi, ki: (bi, ki),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d),
            lambda bi, hi, qi, ki: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running denom
            pltpu.VMEM((block_q, d), jnp.float32),  # output accumulator
        ],
        interpret=interpret,
    )(qt, kt, vt, bias)

    return jnp.moveaxis(out, 1, 2)[:, :s]


def reference_attention(q, k, v, mask=None):
    """XLA reference implementation (same math, materialized probs)."""
    d = q.shape[-1]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (d ** -0.5)
    if mask is not None:
        bias = jnp.where(jnp.asarray(mask, bool), 0.0, NEG_INF)
        logits = logits + bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    )
