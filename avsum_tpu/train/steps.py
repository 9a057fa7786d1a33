"""pjit train / eval steps.

TPU-native replacement of the reference training loop
(/root/reference/scripts/train_av_model.py:70-96), which ran one video per
step with per-tensor ``.cuda()`` copies, no masking, no grad clipping, no
LR schedule and no logging. Here:

- one jit-compiled step over a padded [B, S, ...] batch, sharded over the
  mesh (batch -> ``data`` axis, sequence -> ``seq`` axis, params replicated)
- masked MSE loss (padded shots contribute nothing)
- optax AdamW + warmup-cosine schedule + global-norm clipping
- donated state buffers (no HBM double-allocation per step)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avsum_tpu.parallel.mesh import AXIS_DATA, AXIS_MODEL, AXIS_SEQ
from avsum_tpu.train.config import TrainConfig


class TrainState(train_state.TrainState):
    """Flax TrainState; dropout rng folded in from the step index.

    ``ema_params``: exponential moving average of the parameters
    (Polyak averaging), maintained on device by the train step when
    ``TrainConfig.ema_decay`` > 0 and used for evaluation/scoring — a
    cheap stabilizer for small-data regimes where individual training
    runs are high-variance. ``None`` (the default) disables it with
    zero overhead."""

    ema_params: Optional[dict] = None


Batch = Dict[str, jnp.ndarray]  # visual, audio, targets, mask


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray):
    """Mean squared error over valid positions only (reference uses bare
    ``F.mse_loss``, train_av_model.py:91, with no masking)."""
    m = mask.astype(jnp.float32)
    se = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    return jnp.sum(se * m) / jnp.maximum(jnp.sum(m), 1.0)


def make_optimizer(cfg: TrainConfig, total_steps: int = 10_000):
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.lr,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(total_steps, cfg.warmup_steps + 1),
        end_value=cfg.lr * 0.1,
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )


def create_train_state(
    model, cfg: TrainConfig, sample_batch: Batch, total_steps: int = 10_000
) -> TrainState:
    rng = jax.random.PRNGKey(cfg.seed)
    params = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        sample_batch["visual"],
        sample_batch["audio"],
        sample_batch["mask"],
        deterministic=False,
    )["params"]
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=make_optimizer(cfg, total_steps),
        ema_params=(
            jax.tree.map(jnp.array, params) if cfg.ema_decay > 0 else None
        ),
    )


def batch_shardings(mesh: Mesh) -> Dict[str, NamedSharding]:
    seq = NamedSharding(mesh, P(AXIS_DATA, AXIS_SEQ))
    feat = NamedSharding(mesh, P(AXIS_DATA, AXIS_SEQ, None))
    return {"visual": feat, "audio": feat, "targets": seq, "mask": seq}


def pad_batch_for_mesh(batch: Batch, mesh: Mesh) -> Batch:
    """Pad the batch/sequence axes with masked-out rows so they divide the
    mesh's data/seq axes (padded rows have mask 0 -> contribute nothing to
    the masked loss or metrics)."""
    data_n = mesh.shape[AXIS_DATA]
    seq_n = mesh.shape[AXIS_SEQ]
    b, s = batch["mask"].shape
    pad_b = (-b) % data_n
    pad_s = (-s) % seq_n
    if pad_b == 0 and pad_s == 0:
        return batch
    out = {}
    for key, value in batch.items():
        widths = [(0, pad_b), (0, pad_s)] + [(0, 0)] * (value.ndim - 2)
        out[key] = jnp.pad(jnp.asarray(value), widths)
    return out


def shard_batch_dict(batch: Batch, mesh: Mesh) -> Batch:
    batch = pad_batch_for_mesh(batch, mesh)
    if mesh.size == 1:
        # single-device mesh: plain placement on the mesh's device is
        # semantically identical, and committed NamedSharding inputs hit a
        # pathological per-call reshard on some PJRT backends (measured
        # 13 ms -> 3.7 s/step through the axon remote-TPU tunnel)
        dev = mesh.devices.flat[0]
        return {k: jax.device_put(np.asarray(v), dev) for k, v in batch.items()}
    shardings = batch_shardings(mesh)
    return {k: jax.device_put(np.asarray(v), shardings[k]) for k, v in batch.items()}


def _mesh_model(model, mesh: Optional[Mesh]):
    """Clone the scorer onto the mesh so mesh-dependent execution modes
    activate (params are identical either way): seq axis >1 -> ring
    attention (context parallelism); model axis >1 -> expert parallelism
    (MoE) / GPipe pipeline stages (``model.pp_stages``)."""
    if (
        mesh is not None
        and hasattr(model, "mesh")
        and getattr(model, "mesh", None) is None
        and (
            dict(mesh.shape).get(AXIS_SEQ, 1) > 1
            or dict(mesh.shape).get(AXIS_MODEL, 1) > 1
        )
    ):
        return model.clone(mesh=mesh)
    return model


def param_partition_spec(x, mesh: Mesh) -> P:
    """Tensor-parallel placement of one parameter/optimizer leaf: matrices
    (and DenseGeneral kernels) shard their output dim over the ``model``
    axis when it divides; vectors/scalars replicate. This is the reserved
    TP axis for the upgraded encoders (SURVEY.md §2 #19) — XLA inserts the
    all-gathers/reduce-scatters around the sharded matmuls (GSPMD)."""
    m = dict(mesh.shape).get(AXIS_MODEL, 1)
    ndim = getattr(x, "ndim", 0)
    if m > 1 and ndim >= 2 and x.shape[-1] % m == 0:
        return P(*([None] * (ndim - 1) + [AXIS_MODEL]))
    return P()


def state_shardings(state, mesh: Mesh):
    """NamedSharding pytree for a TrainState (params + mirrored opt state).

    Pipeline-stage parameters (every leaf under a ``stages`` collection,
    :class:`avsum_tpu.models.temporal.PipelinedAttentionEncoder`) shard
    their leading stage axis over ``model`` — each device holds one stage's
    weights; everything else follows the TP rule."""
    m = dict(mesh.shape).get(AXIS_MODEL, 1)

    def spec(path, x):
        ndim = getattr(x, "ndim", 0)
        if any(getattr(k, "key", None) == "stages" for k in path):
            if m > 1 and ndim >= 1 and x.shape[0] % m == 0:
                return P(*([AXIS_MODEL] + [None] * (ndim - 1)))
            return P()
        return param_partition_spec(x, mesh)

    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, spec(p, x)), state
    )


def shard_state(state, mesh: Mesh):
    """Place a TrainState onto the mesh with model-axis tensor parallelism."""
    return jax.device_put(state, state_shardings(state, mesh))


def make_train_step(
    model,
    mesh: Optional[Mesh] = None,
    seed: int = 0,
    state_sharding=None,
    ema_decay: float = 0.0,
):
    """Build the jitted train step. With a mesh, inputs/outputs carry
    NamedShardings so XLA emits the psum for the data/seq-parallel grads,
    and attention over the sharded sequence axis runs as ring attention
    (exact; K/V rotate over ICI instead of being all-gathered)."""

    base_rng = jax.random.PRNGKey(seed)
    model = _mesh_model(model, mesh)

    def train_step(state: TrainState, batch: Batch) -> Tuple[TrainState, Dict]:
        dropout_rng = jax.random.fold_in(base_rng, state.step)

        def loss_fn(params):
            preds = model.apply(
                {"params": params},
                batch["visual"],
                batch["audio"],
                batch["mask"],
                deterministic=False,
                rngs={"dropout": dropout_rng},
            )
            return masked_mse(preds, batch["targets"], batch["mask"]), preds

        (loss, preds), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads)
        if ema_decay > 0:
            new_state = new_state.replace(
                ema_params=jax.tree.map(
                    lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                    state.ema_params,
                    new_state.params,
                )
            )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "pred_mean": jnp.mean(preds),
        }
        return new_state, metrics

    if mesh is None or mesh.size == 1:
        # sharding annotations are meaningless on one device and trigger
        # the same per-call reshard pathology shard_batch_dict documents
        return jax.jit(train_step, donate_argnums=0)

    replicated = NamedSharding(mesh, P())
    bs = batch_shardings(mesh)
    # state_sharding (from state_shardings(state, mesh)) keeps params
    # model-axis tensor-parallel across steps; default is replicated params
    st = state_sharding if state_sharding is not None else replicated
    return jax.jit(
        train_step,
        donate_argnums=0,
        in_shardings=(st, bs),
        out_shardings=(st, replicated),
    )


def make_eval_step(model, mesh: Optional[Mesh] = None):
    model = _mesh_model(model, mesh)

    def eval_step(params, batch: Batch) -> Dict[str, jnp.ndarray]:
        preds = model.apply(
            {"params": params},
            batch["visual"],
            batch["audio"],
            batch["mask"],
            deterministic=True,
        )
        return {
            "preds": preds,
            "loss": masked_mse(preds, batch["targets"], batch["mask"]),
        }

    if mesh is None or mesh.size == 1:
        return jax.jit(eval_step)
    replicated = NamedSharding(mesh, P())
    bs = batch_shardings(mesh)
    return jax.jit(
        eval_step,
        in_shardings=(replicated, bs),
        out_shardings={
            "preds": NamedSharding(mesh, P(AXIS_DATA, AXIS_SEQ)),
            "loss": replicated,
        },
    )
