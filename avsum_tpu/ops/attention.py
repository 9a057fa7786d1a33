"""Fused flash attention (Pallas TPU kernels), forward AND backward.

The scorer's cross-modal attention (models/attention.py) is the O(S^2) hot
op for hour-scale videos (SURVEY.md §5.7: 1 h at 2 fps = 7200 frame
tokens). The forward kernel computes softmax(QK^T * scale + bias) V in one
pass with the online-softmax recurrence — the [S, S] probability matrix
never materializes in HBM, so memory is O(S*D) and every block stays in
VMEM. The backward pass is a custom VJP over two kernels that recompute
the probabilities blockwise from the saved logsumexp (standard
FlashAttention-2 structure): a dK/dV kernel (grid over KV blocks, queries
innermost) and a dQ kernel (grid over Q blocks, keys innermost). Training
therefore never materializes [S, S] either.

Layout: grid (B, H, outer, inner); the innermost axis is sequential on
TPU, so accumulators live in VMEM scratch across inner steps and each
output block is written once on the last step.

Functional contract matches the XLA path in
models/attention.MultiHeadSelfAttention (golden-tested in
tests/test_flash_attention.py, interpret mode on CPU + real compile on
TPU; gradients tested against jax.grad of the XLA reference).
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


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, scale
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
    bias = bias_ref[0, 0].astype(jnp.float32)  # [BK]

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
        l_final = l_scr[:, :1]
        denom = jnp.maximum(l_final, 1e-30)
        o_ref[0, 0] = (acc_scr[:] / denom).astype(o_ref.dtype)
        # lse stored lane-broadcast [BQ, 128] (Mosaic block-shape rule:
        # last two dims must be (8k, 128k) or full)
        lse_ref[0, 0] = jnp.broadcast_to(
            m_scr[:, :1] + jnp.log(denom), lse_ref[0, 0].shape
        ).astype(lse_ref.dtype)


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _qkv_spec(block, d, outer_is_kv: bool):
    """Block over [B, H, S', D]; picked by the grid's outer/inner roles."""
    if outer_is_kv:  # grid (b, h, kv, q): this spec follows the INNER q
        return pl.BlockSpec(
            (1, 1, block, d), lambda bi, hi, oi, ii: (bi, hi, ii, 0),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (1, 1, block, d), lambda bi, hi, oi, ii: (bi, hi, oi, 0),
        memory_space=pltpu.VMEM,
    )


def _bias_spec_sized(block_k: int, inner_is_kv: bool):
    """Bias is carried as [B, 8, S'] (8 copied sublanes — Mosaic requires
    block dims of (8k, 128k) or the full array dim; a bare [B, S'] row
    would violate that for B > 1)."""
    if inner_is_kv:
        return pl.BlockSpec(
            (1, 8, block_k), lambda bi, hi, oi, ii: (bi, 0, ii),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (1, 8, block_k), lambda bi, hi, oi, ii: (bi, 0, oi),
        memory_space=pltpu.VMEM,
    )


def _flash_fwd(q, k, v, bias, block_q, block_k, interpret):
    """Padded [B,H,S',D] + bias [B,8,S'] ->
    (O [B,H,S',D] f32, LSE [B,H,S',128] f32, lane-broadcast)."""
    b, h, s_pad, d = q.shape
    scale = d ** -0.5
    n_q = s_pad // block_q
    n_kv = s_pad // block_k

    return pl.pallas_call(
        functools.partial(_flash_fwd_kernel, scale=scale),
        grid=(b, h, n_q, n_kv),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            _bias_spec_sized(block_k, inner_is_kv=True),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_q, 128), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, s_pad, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running denom
            pltpu.VMEM((block_q, d), jnp.float32),  # output accumulator
        ],
        interpret=interpret,
    )(q, k, v, bias)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dk_scr, dv_scr, *, scale
):
    qi = pl.program_id(3)
    n_q = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0].astype(jnp.float32)  # [BQ, D]
    k = k_ref[0, 0].astype(jnp.float32)  # [BK, D]
    v = v_ref[0, 0].astype(jnp.float32)  # [BK, D]
    bias = bias_ref[0, 0].astype(jnp.float32)  # [BK]
    do = do_ref[0, 0].astype(jnp.float32)  # [BQ, D]
    lse = lse_ref[0, 0][:, :1].astype(jnp.float32)  # [BQ, 1]
    delta = delta_ref[0, 0][:, :1].astype(jnp.float32)  # [BQ, 1]

    s = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
        + bias[None, :]
    )  # [BQ, BK]
    p = jnp.exp(s - lse)  # [BQ, BK]
    # dV += P^T dO
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dS = P * (dO V^T - delta)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)  # [BQ, BK]
    # dK += dS^T Q * scale
    dk_scr[:] = dk_scr[:] + scale * jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == n_q - 1)
    def _finish():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dq_scr, *, scale
):
    ki = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    bias = bias_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, :1].astype(jnp.float32)  # [BQ, 1]
    delta = delta_ref[0, 0][:, :1].astype(jnp.float32)  # [BQ, 1]

    s = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
        + bias[None, :]
    )
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)  # [BQ, BK]
    dq_scr[:] = dq_scr[:] + scale * jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == n_kv - 1)
    def _finish():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd(q, k, v, bias, o, lse, do, block_q, block_k, interpret):
    b, h, s_pad, d = q.shape
    scale = d ** -0.5
    n_q = s_pad // block_q
    n_kv = s_pad // block_k
    # delta[b,h,q] = rowsum(dO * O): tiny elementwise+reduce, XLA fuses it;
    # lane-broadcast to [B,H,S',128] to satisfy Mosaic block-shape rules
    delta = jnp.broadcast_to(
        jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)[
            ..., None
        ],
        (b, h, s_pad, 128),
    )

    q_at_inner = _qkv_spec(block_q, d, outer_is_kv=True)
    kv_at_outer = _qkv_spec(block_k, d, outer_is_kv=False)
    bias_outer = _bias_spec_sized(block_k, inner_is_kv=False)
    row_inner = pl.BlockSpec(
        (1, 1, block_q, 128), lambda bi, hi, oi, ii: (bi, hi, ii, 0),
        memory_space=pltpu.VMEM,
    )
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale),
        grid=(b, h, n_kv, n_q),
        in_specs=[q_at_inner, kv_at_outer, kv_at_outer, bias_outer,
                  q_at_inner, row_inner, row_inner],
        out_specs=(
            pl.BlockSpec(
                (1, 1, block_k, d), lambda bi, hi, oi, ii: (bi, hi, oi, 0),
                memory_space=pltpu.VMEM,
            ),
        ) * 2,
        out_shape=(jax.ShapeDtypeStruct((b, h, s_pad, d), jnp.float32),) * 2,
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias, do, lse, delta)

    q_at_outer = _qkv_spec(block_q, d, outer_is_kv=False)
    kv_at_inner = _qkv_spec(block_k, d, outer_is_kv=True)
    bias_inner = _bias_spec_sized(block_k, inner_is_kv=True)
    row_outer = pl.BlockSpec(
        (1, 1, block_q, 128), lambda bi, hi, oi, ii: (bi, hi, oi, 0),
        memory_space=pltpu.VMEM,
    )
    (dq,) = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale),
        grid=(b, h, n_q, n_kv),
        in_specs=[q_at_outer, kv_at_inner, kv_at_inner, bias_inner,
                  q_at_outer, row_outer, row_outer],
        out_specs=(
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bi, hi, oi, ii: (bi, hi, oi, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(jax.ShapeDtypeStruct((b, h, s_pad, d), jnp.float32),),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(q, k, v, bias, do, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_core(q, k, v, bias, block_q, block_k, interpret):
    """Differentiable core over padded [B,H,S',D] tensors + [B,8,S'] bias."""
    o, _ = _flash_fwd(q, k, v, bias, block_q, block_k, interpret)
    return o


def _flash_core_fwd(q, k, v, bias, block_q, block_k, interpret):
    o, lse = _flash_fwd(q, k, v, bias, block_q, block_k, interpret)
    return o, (q, k, v, bias, o, lse)


def _flash_core_bwd(block_q, block_k, interpret, res, do):
    q, k, v, bias, o, lse = res
    dq, dk, dv = _flash_bwd(
        q, k, v, bias, o, lse, do, block_q, block_k, interpret
    )
    # bias comes from a boolean validity mask — not a trainable input
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), (
        jnp.zeros_like(bias)
    )


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


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
    """softmax(Q K^T / sqrt(D) + mask bias) V — differentiable.

    Args:
      q, k, v: [B, S, H, D] (same layout the scorer's MHSA uses).
      mask: optional [B, S] key-validity mask (padded keys excluded).
      block_q / block_k: VMEM tile sizes along the sequence axis.
      interpret: run in the Pallas interpreter (CPU tests).

    Returns [B, S, H, D], f32. Gradients flow to q/k/v via the custom-VJP
    flash backward kernels (probabilities recomputed blockwise from the
    saved logsumexp — no [S, S] materialization in training either).
    """
    b, s, h, d = q.shape
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
    bias = jnp.broadcast_to(bias[:, None, :], (b, 8, s_pad))  # sublane tile

    out = _flash_core(qt, kt, vt, bias, block_q, block_k, interpret)
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
