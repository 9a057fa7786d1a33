"""High-level trainer: epochs over padded batches, eval hook, checkpoints,
structured logging. Fixes every gap in the reference loop (SURVEY.md §3.2:
no checkpoint save, no eval hook, no LR schedule, no logging)."""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, List, Optional

import jax
import numpy as np

from avsum_tpu.parallel.mesh import build_mesh, MeshConfig
from avsum_tpu.summary.metrics import evaluate_scores
from avsum_tpu.train.checkpoint import CheckpointManager
from avsum_tpu.train.config import Config
from avsum_tpu.train.steps import (
    Batch,
    create_train_state,
    make_eval_step,
    make_train_step,
    shard_batch_dict,
)
from avsum_tpu.utils.logging import JsonlLogger, get_logger

log = get_logger("avsum.train")


class Trainer:
    """Drives (model, config) over an iterable of padded batches.

    ``batches`` must yield dicts with keys visual [B,S,Dv], audio [B,S,Da],
    targets [B,S], mask [B,S] — produced by :mod:`avsum_tpu.data.batching`.
    """

    def __init__(
        self,
        model,
        config: Config,
        mesh=None,
        total_steps: int = 10_000,
    ):
        self.model = model
        self.config = config
        self.mesh = mesh if mesh is not None else build_mesh(
            MeshConfig(
                data=config.mesh.data,
                seq=config.mesh.seq,
                model=config.mesh.model,
                auto_data=config.mesh.auto_data,
            )
        )
        if config.train.debug_nans:
            import jax as _jax

            _jax.config.update("jax_debug_nans", True)
        if config.train.matmul_precision != "default":
            # process-wide by nature of the jax config; documented on the
            # TrainConfig field
            jax.config.update(
                "jax_default_matmul_precision", config.train.matmul_precision
            )
        self.train_step = make_train_step(
            model, self.mesh, seed=config.train.seed,
            ema_decay=config.train.ema_decay,
        )
        self.eval_step = make_eval_step(model, self.mesh)
        self.state = None
        self.total_steps = total_steps
        self.ckpt = CheckpointManager(
            config.train.checkpoint_dir, keep=config.train.keep_checkpoints
        )
        self.logger = JsonlLogger(config.train.log_path)
        self.last_meta: Dict = {}

    def init_state(self, sample_batch: Batch):
        self.state = create_train_state(
            self.model, self.config.train, sample_batch, self.total_steps
        )
        return self.state

    def maybe_restore(self) -> Optional[int]:
        """Resume from the latest checkpoint if one exists. The restored
        checkpoint's meta (incl. the epoch it was written at) lands in
        ``self.last_meta`` so callers can continue at the right epoch."""
        if self.state is None:
            raise RuntimeError("call init_state(sample_batch) before restore")
        restored, meta = self.ckpt.restore(self.state)
        if restored is not None:
            self.state = restored
            self.last_meta = meta or {}
            step = int(self.state.step)
            log.info(
                "restored checkpoint at step %d (epoch %s)",
                step,
                self.last_meta.get("epoch"),
            )
            return step
        return None

    def fit(
        self,
        batches_fn: Callable[[], Iterable[Batch]],
        epochs: Optional[int] = None,
        eval_fn: Optional[Callable[[], Dict[str, float]]] = None,
        start_epoch: int = 0,
    ):
        cfg = self.config.train
        epochs = cfg.epochs if epochs is None else epochs

        import inspect

        takes_epoch = len(inspect.signature(batches_fn).parameters) >= 1

        def epoch_batches(epoch: int):
            # per-epoch reshuffle: epoch-aware iterables get the epoch index
            # (fold it into the shuffle seed); legacy zero-arg closures keep
            # working but replay one fixed order
            return batches_fn(epoch) if takes_epoch else batches_fn()

        if self.state is None:
            first = next(iter(epoch_batches(start_epoch)))
            self.init_state(first)

        step = int(self.state.step)
        for epoch in range(start_epoch, epochs):
            t0 = time.perf_counter()
            losses: List = []  # device arrays; synced once per epoch
            for batch in epoch_batches(epoch):
                batch = shard_batch_dict(batch, self.mesh)
                self.state, metrics = self.train_step(self.state, batch)
                step += 1
                if step % cfg.log_every == 0:
                    # the only per-step host sync, at log_every granularity
                    record = self.logger.log(
                        step, epoch=epoch, **jax.device_get(metrics)
                    )
                    log.info(
                        "step %d epoch %d loss %.5f grad %.3f",
                        step,
                        epoch,
                        record["loss"],
                        record["grad_norm"],
                    )
                losses.append(metrics["loss"])
            mean_loss = float(np.mean(jax.device_get(losses)))
            dt = time.perf_counter() - t0
            log.info("epoch %d done: mean loss %.5f (%.2fs)", epoch, mean_loss, dt)
            if eval_fn is not None and (epoch + 1) % cfg.eval_every_epochs == 0:
                scores = eval_fn()
                self.logger.log(int(self.state.step), epoch=epoch, **scores)
                log.info("eval @ epoch %d: %s", epoch, scores)
            if (epoch + 1) % cfg.save_every_epochs == 0 or epoch == epochs - 1:
                self.ckpt.save(
                    int(self.state.step), self.state, {"epoch": epoch}
                )
        return self.state

    def score_video(self, example, base_bucket: Optional[int] = None) -> np.ndarray:
        """Score EVERY shot of one video — no ``max_shots`` truncation.

        The shot axis is padded up a power-of-two bucket ladder (base, 2x,
        4x, ...) so a long video (e.g. 604 shots at hour scale) compiles
        O(log S) eval programs and every shot gets a score; truncating at
        the training bucket would silently drop the tail from evaluation.
        """
        from avsum_tpu.data.batching import pad_batch

        bucket = base_bucket or self.config.data.max_shots
        s = example.n_shots
        while bucket < s:
            bucket *= 2
        batch = pad_batch([example], bucket)
        out = self.eval_step(
            self.eval_params, shard_batch_dict(batch, self.mesh)
        )
        return np.asarray(jax.device_get(out["preds"]))[0, :s]

    @property
    def eval_params(self):
        """Parameters used for evaluation/scoring: the EMA average when
        ``train.ema_decay`` > 0, the raw trained params otherwise."""
        if getattr(self.state, "ema_params", None) is not None:
            return self.state.ema_params
        return self.state.params

    def evaluate_videos(self, batches: Iterable[Batch]) -> Dict[str, float]:
        """Per-video metric means, matching evaluate.py:38-42's protocol
        (each video contributes one F1/rho/tau; dataset value is the mean)."""
        per_video: List[Dict[str, float]] = []
        for batch in batches:
            batch = shard_batch_dict(batch, self.mesh)
            out = self.eval_step(self.eval_params, batch)
            preds = np.asarray(jax.device_get(out["preds"]))
            targets = np.asarray(jax.device_get(batch["targets"]))
            masks = np.asarray(jax.device_get(batch["mask"]))
            for i in range(preds.shape[0]):
                m = masks[i] > 0
                if m.sum() < 2:
                    continue
                per_video.append(evaluate_scores(preds[i], targets[i], m))
        if not per_video:
            return {"f1": 0.0, "spearman": 0.0, "kendall": 0.0}
        keys = per_video[0].keys()
        return {k: float(np.nanmean([v[k] for v in per_video])) for k in keys}
