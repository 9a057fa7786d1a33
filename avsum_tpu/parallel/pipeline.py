"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

The reference has no distribution of any kind (SURVEY.md §2 row 19); this
module completes the rebuild's parallelism matrix (dp = data axis, sp/cp =
ring attention over the seq axis, tp = model-axis param sharding, **pp** =
this file). It is sized for the "upgraded encoders" configuration
(BASELINE config 4): when a deep temporal-encoder stack no longer fits —
or no longer scales — on one chip, consecutive layer groups become pipeline
*stages*, one stage per device along a mesh axis, and microbatches stream
through the stage ring.

TPU-native design:

- **Stage placement via shard_map**: per-stage parameters are stacked on a
  leading ``n_stages`` axis and sharded over the pipeline axis, so each
  device materializes only its own stage's weights (true model-memory
  scaling, like tensor parallelism but along depth).
- **Activation transport via ``jax.lax.ppermute``**: each pipeline tick
  runs every stage's compute concurrently (SPMD — there is no "bubble
  process"; the bubble is just zero-padded ticks at the ring's head/tail)
  and rotates activations one hop along the ICI ring.
- **Static shapes throughout**: the schedule is a ``lax.fori_loop`` over
  ``n_micro + n_stages - 1`` ticks with ``dynamic_slice``-indexed
  microbatch buffers — one compiled program regardless of batch size.

This is the standard single-direction GPipe schedule; with M microbatches
and K stages, utilization is M/(M+K-1) per device.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from avsum_tpu.parallel.mesh import AXIS_MODEL


def _stage_body(
    stage_params: Any,
    x_micro: jnp.ndarray,
    mask_micro: Optional[jnp.ndarray],
    fn: Callable[..., jnp.ndarray],
    axis_name: str,
    n_stages: int,
    n_micro: int,
):
    """shard_map body. Each device holds ONE stage's params (leading axis of
    the stacked param tree, locally size 1) and the FULL microbatch buffers
    (replicated over the pipeline axis; activations are small relative to
    encoder weights, and replicating the buffer keeps the schedule branch-
    free: every device indexes the same [M, mb, ...] arrays)."""
    idx = jax.lax.axis_index(axis_name)
    params_local = jax.tree.map(lambda p: p[0], stage_params)

    is_first = idx == 0
    is_last = idx == n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    mb_shape = x_micro.shape[1:]  # [mb, S, F]
    zero = jnp.zeros(mb_shape, x_micro.dtype)

    def tick(t, state):
        recv, out_buf = state
        # stage 0 injects microbatch t (zeros once the batch is drained);
        # other stages consume what the previous stage sent last tick
        m_idx = jnp.clip(t, 0, n_micro - 1)
        inject = jax.lax.dynamic_index_in_dim(x_micro, m_idx, keepdims=False)
        inject = jnp.where(t < n_micro, inject, zero)
        cur = jnp.where(is_first, inject, recv)

        mask_cur = None
        if mask_micro is not None:
            # the mask travels with the schedule index, not the ring: tick t
            # has stage k processing microbatch t-k, all shapes static
            mk = jnp.clip(t - idx, 0, n_micro - 1)
            mask_cur = jax.lax.dynamic_index_in_dim(mask_micro, mk, keepdims=False)

        y = fn(params_local, cur, mask_cur)

        # last stage banks microbatch (t - (K-1)) once it's real
        o_idx = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
        bank = jnp.logical_and(is_last, t >= n_stages - 1)
        slot = jax.lax.dynamic_index_in_dim(out_buf, o_idx, keepdims=False)
        out_buf = jax.lax.dynamic_update_index_in_dim(
            out_buf, jnp.where(bank, y.astype(out_buf.dtype), slot), o_idx, 0
        )

        recv = jax.lax.ppermute(y, axis_name, perm)
        return recv, out_buf

    out0 = jnp.zeros((n_micro,) + mb_shape, x_micro.dtype)
    recv0 = zero
    _, out_buf = jax.lax.fori_loop(
        0, n_micro + n_stages - 1, tick, (recv0, out0)
    )
    # only the last stage holds real outputs; psum over the ring replicates
    # them (cheap: [B, S, F] activations once per forward)
    keep = jnp.where(is_last, 1.0, 0.0).astype(out_buf.dtype)
    return jax.lax.psum(out_buf * keep, axis_name)


def stack_stage_params(per_stage_params: list) -> Any:
    """Stack a list of per-stage param pytrees on a new leading axis
    (shard that axis over the pipeline mesh axis)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)


def pipeline_apply(
    fn: Callable[..., jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    mesh: Mesh,
    mask: Optional[jnp.ndarray] = None,
    *,
    axis_name: str = AXIS_MODEL,
    num_microbatches: Optional[int] = None,
) -> jnp.ndarray:
    """Run ``x`` through ``n_stages`` copies of ``fn`` pipelined over
    ``axis_name``.

    Args:
      fn: ``fn(stage_params, x_mb, mask_mb) -> y_mb``, shape-preserving
        (an encoder block). Traced once; must be jit-safe.
      stacked_params: param pytree with leading axis ``n_stages`` (see
        :func:`stack_stage_params`).
      x: [B, S, F] activations. B must divide by ``num_microbatches``.
      mask: optional [B, S] validity mask, microbatched alongside ``x``.
      num_microbatches: defaults to ``n_stages`` (fills the pipe).

    Returns [B, S, F], numerically identical to applying the stages
    sequentially (exact — same ops, same order, no approximation).
    """
    n_stages = int(dict(mesh.shape)[axis_name])
    leaves = jax.tree.leaves(stacked_params)
    if leaves and int(leaves[0].shape[0]) != n_stages:
        # a larger multiple would silently drop every stage after the first
        # on each device (params_local takes p[0] of the local shard)
        raise ValueError(
            f"stacked_params leading axis {int(leaves[0].shape[0])} must equal "
            f"the '{axis_name}' mesh axis size {n_stages}"
        )
    if n_stages == 1:
        params0 = jax.tree.map(lambda p: p[0], stacked_params)
        return fn(params0, x, mask)

    n_micro = num_microbatches or n_stages
    b = x.shape[0]
    if b % n_micro != 0:
        raise ValueError(f"batch {b} not divisible by {n_micro} microbatches")
    mb = b // n_micro
    x_micro = x.reshape((n_micro, mb) + x.shape[1:])
    mask_micro = (
        None if mask is None else mask.reshape((n_micro, mb) + mask.shape[1:])
    )

    body = functools.partial(
        _stage_body,
        fn=fn,
        axis_name=axis_name,
        n_stages=n_stages,
        n_micro=n_micro,
    )
    param_specs = jax.tree.map(lambda _: P(axis_name), stacked_params)
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(param_specs, P(), P()),
        out_specs=P(),
        check_vma=False,  # the schedule mixes replicated buffers with
        # stage-varying compute; correctness is pinned by the exact test
    )
    out = mapped(stacked_params, x_micro, mask_micro)
    return out.reshape((b,) + out.shape[2:])
