"""Ring attention: context parallelism over the sequence axis.

For hour-scale videos the frame-token sequence (1 h @ 2 fps = 7200 tokens,
BASELINE config 5) is sharded across the mesh's ``seq`` axis. Each device
holds a local Q/K/V chunk; K/V chunks rotate around the ring via
``jax.lax.ppermute`` while every device folds each visiting chunk into an
online-softmax accumulator for its local queries. Exact attention, O(S/n)
memory per device, and the K/V transfers ride the ICI ring concurrently
with compute.

This is the TPU-native replacement for distributed attention the reference
could never express (SURVEY.md §5.7: its BiLSTM+full MHA is single-device
only, and recurrence cannot shard over sequence at all).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avsum_tpu.parallel.mesh import AXIS_SEQ

NEG_INF = -1e30


def _ring_attention_local(q, k, v, bias, axis_name: str, vary_axes=None):
    """shard_map body: q/k/v [B, Sl, H, D] local chunks, bias [B, Sl]."""
    n = jax.lax.psum(1, axis_name)
    d = q.shape[-1]
    scale = d ** -0.5
    qf = q.astype(jnp.float32)

    perm = [(j, (j + 1) % n) for j in range(n)]

    def fold(carry, kvb):
        m, l, acc = carry
        k_cur, v_cur, b_cur = kvb
        s = (
            jnp.einsum(
                "bqhd,bkhd->bhqk",
                qf,
                k_cur.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            * scale
            + b_cur[:, None, None, :]
        )  # [B,H,Ql,Kl]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha[..., 0][..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd",
            p,
            v_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    b, sl, h, _ = q.shape
    m0 = jnp.full((b, h, sl, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, sl, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, sl, d), jnp.float32)
    # constants created inside shard_map are unvarying over the mesh axes;
    # the loop carry becomes varying after the first fold (q/k/v are varying
    # over the seq axis AND any batch axis), so mark the initial carry
    # varying over the same axes explicitly (JAX vma typing rule)
    axes = tuple(vary_axes) if vary_axes else (axis_name,)
    m0, l0, acc0 = (
        jax.lax.pcast(x, axes, to="varying") for x in (m0, l0, acc0)
    )

    def body(i, state):
        m, l, acc, k_cur, v_cur, b_cur = state
        m, l, acc = fold((m, l, acc), (k_cur, v_cur, b_cur))
        # rotate K/V/bias to the next device (no-op payload on last step)
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        b_cur = jax.lax.ppermute(b_cur, axis_name, perm)
        return m, l, acc, k_cur, v_cur, b_cur

    m, l, acc, *_ = jax.lax.fori_loop(0, n, body, (m0, l0, acc0, k, v, bias))
    out = acc / jnp.maximum(l, 1e-30)
    return jnp.einsum("bhqd->bqhd", out)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    mask: Optional[jnp.ndarray] = None,
    axis_name: str = AXIS_SEQ,
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Exact attention with the sequence axis sharded over ``axis_name``.

    Args:
      q, k, v: [B, S, H, D]; S must divide by the seq-axis size.
      mesh: mesh containing ``axis_name``.
      mask: optional [B, S] key-validity mask.
      batch_axis: mesh axis the batch dim is sharded over (training batches
        are data-parallel; the ring body needs no collective over it, but
        the shard_map specs must carry it so no resharding is forced).

    Returns [B, S, H, D] f32, sharded like the inputs.
    """
    b, s, h, d = q.shape
    bias = (
        jnp.zeros((b, s), jnp.float32)
        if mask is None
        else jnp.where(jnp.asarray(mask, bool), 0.0, NEG_INF).astype(jnp.float32)
    )
    qkv_spec = P(batch_axis, axis_name, None, None)
    bias_spec = P(batch_axis, axis_name)
    vary = (axis_name,) if batch_axis is None else (batch_axis, axis_name)
    fn = jax.shard_map(
        functools.partial(
            _ring_attention_local, axis_name=axis_name, vary_axes=vary
        ),
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, bias_spec),
        out_specs=qkv_spec,
    )
    return fn(q, k, v, bias)
