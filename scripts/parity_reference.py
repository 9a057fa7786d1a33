"""F1-parity harness: the literal reference model (torch, CPU) vs AVScorer.

The north star (BASELINE.md) is canonical F1 within 0.5 pts of the
reference *as re-run* — and until this harness, no number from actual
reference code had ever been produced. This script closes that gap
without network or codecs:

1. Synthesizes a TVSum-format world (scene-structured videos + a
   ydata-tvsum50.mat-shaped annotation file with 20 noisy users/video).
2. Preprocesses it ONCE through the avsum_tpu pipeline into a feature
   cache (visual [S,4096], audio [S,296] — the reference's contract dims,
   with the SURVEY §8.1 fix applied, which both sides then consume
   identically).
3. Trains, per cross-validation fold:
   a. the reference's AVBiLSTMModel re-instantiated in torch on CPU
      (architecture and semantics of /root/reference/models/av_model.py:6-46,
      including the batch_first quirk — see ReferenceAVBiLSTM), with the
      reference's training recipe (/root/reference/scripts/train_av_model.py:
      64-96: AdamW lr=1e-4, MSE, shuffled, effective batch 1, 100 epochs)
      against the shared shot targets (real boundaries + real fps — the
      §8.4 fix, applied identically on both sides);
   b. avsum_tpu's AVScorer with temporal_encoder=bilstm (the torch-exact
      parity variant, tests/test_debug_bilstm.py);
   c. avsum_tpu's AVScorer with temporal_encoder=attention (the flagship).
4. Evaluates all three with the SAME protocol code (canonical
   per-annotator knapsack F1, summary/protocol.py, plus the reference's
   keyframe F1/rho/tau, evaluate.py:26-42) on each fold's test videos.
5. Writes PARITY_F1.json / PARITY_F1.md with per-model means and deltas.

Run: python scripts/parity_reference.py [--out-dir .] [--quick]

Platform: the harness forces JAX onto **CPU at full f32** (set
AVSUM_PLATFORM=tpu to override). Fairness requires it: the torch
reference side always trains in f32 on CPU, and on TPU JAX's DEFAULT
matmul precision runs f32 matmuls as bf16 MXU passes — round-3
diagnosis showed the attention variant trained under that asymmetry
could converge to confidently *inverted* scores on individual held-out
videos (pv18: rho -0.33 on-TPU vs +0.96 on-CPU, same data and seed).
The product path on TPU is covered by bench.py and the e2e suite.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

if os.environ.get("AVSUM_PLATFORM", "cpu").lower() != "tpu":
    # must run before any jax backend initializes (the axon plugin
    # ignores the JAX_PLATFORMS env var once loaded)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")


# ---------------------------------------------------------------------------
# The reference model, re-instantiated (torch, CPU)
# ---------------------------------------------------------------------------


def build_reference_model(visual_dim: int, audio_dim: int, hidden_dim: int):
    """The reference's AVBiLSTMModel (av_model.py:6-46), CPU-adapted.

    Reproduced from its documented architecture — NOT a file copy:
      per-modality Linear(d, H)+ReLU+Dropout(0.3) compressors
        (av_model.py:10-15),
      per-modality BiLSTM H -> H/2 x 2 directions, batch_first
        (av_model.py:18-23),
      concat -> nn.MultiheadAttention(2H, 4 heads) self-attention
        (av_model.py:26) — deliberately WITHOUT batch_first, fed [B,S,E]
        (the reference's §8.5 quirk: torch then reads dim0 as the
        sequence, so with B=1 each shot is its own length-1 "batch" and
        the attention degenerates to a per-shot linear map; re-running
        the reference means re-running that semantics),
      Linear(2H, 64)+ReLU+Linear(64, 1)+Sigmoid scorer, squeezed
        (av_model.py:29-31, 46).
    """
    import torch.nn as tnn

    class ReferenceAVBiLSTM(tnn.Module):
        def __init__(self):
            super().__init__()
            h = hidden_dim
            self.visual_fc = tnn.Sequential(
                tnn.Linear(visual_dim, h), tnn.ReLU(), tnn.Dropout(0.3)
            )
            self.audio_fc = tnn.Sequential(
                tnn.Linear(audio_dim, h), tnn.ReLU(), tnn.Dropout(0.3)
            )
            self.visual_bilstm = tnn.LSTM(
                h, h // 2, bidirectional=True, batch_first=True
            )
            self.audio_bilstm = tnn.LSTM(
                h, h // 2, bidirectional=True, batch_first=True
            )
            # batch_first intentionally unset — reference semantics (§8.5)
            self.attention = tnn.MultiheadAttention(2 * h, num_heads=4)
            self.scorer = tnn.Sequential(
                tnn.Linear(2 * h, 64), tnn.ReLU(), tnn.Linear(64, 1),
                tnn.Sigmoid(),
            )

        def forward(self, visual, audio):
            import torch

            v = self.visual_fc(visual)
            a = self.audio_fc(audio)
            v, _ = self.visual_bilstm(v)
            a, _ = self.audio_bilstm(a)
            fused = torch.cat([v, a], dim=-1)
            attn, _ = self.attention(fused, fused, fused)
            return self.scorer(attn).squeeze()

    return ReferenceAVBiLSTM()


def train_reference_model(
    model,
    train_examples,
    epochs: int = 100,
    lr: float = 1e-4,
    seed: int = 0,
):
    """The reference's loop (train_av_model.py:64-96): shuffled effective
    batch 1, AdamW(lr=1e-4), MSE against aligned shot scores."""
    import torch
    import torch.nn.functional as F

    torch.manual_seed(seed)
    opt = torch.optim.AdamW(model.parameters(), lr=lr)
    rng = np.random.default_rng(seed)
    tensors = [
        (
            torch.from_numpy(np.ascontiguousarray(ex.visual)[None]),
            torch.from_numpy(np.ascontiguousarray(ex.audio)[None]),
            torch.from_numpy(np.ascontiguousarray(ex.targets)),
        )
        for ex in train_examples
    ]
    model.train()
    for _ in range(epochs):
        for i in rng.permutation(len(tensors)):
            visual, audio, target = tensors[i]
            preds = model(visual, audio)
            loss = F.mse_loss(preds, target)
            opt.zero_grad()
            loss.backward()
            opt.step()
    return model


def score_with_reference(model, example) -> np.ndarray:
    import torch

    model.eval()
    with torch.no_grad():
        preds = model(
            torch.from_numpy(np.ascontiguousarray(example.visual)[None]),
            torch.from_numpy(np.ascontiguousarray(example.audio)[None]),
        )
    return np.atleast_1d(preds.numpy().astype(np.float32))


# ---------------------------------------------------------------------------
# Shared world + evaluation
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ParitySettings:
    n_videos: int = 40
    # 16 scenes/video (round 3; was 10): with ~10 coarse shots the 15%
    # knapsack often has two near-equal-value but DISJOINT packings —
    # diagnosis on the old world found held-out videos where rho +0.96
    # predictions still scored canonical F1 0.0 because a <2% value tie
    # flipped the selection to segments sharing no frames with the users'
    # (pv15: {4,9} vs {7}). Finer shot granularity removes the
    # degeneracy so the metric measures ranking quality, not packing
    # coin flips.
    n_scenes: int = 16
    height: int = 48
    width: int = 64
    epochs: int = 100
    hidden_dim: int = 512
    n_folds: int = 5
    seed: int = 0
    # independent model-init/training seeds per contender; the spread of
    # the REFERENCE across its own seeds is the noise floor any parity
    # delta must be read against (4 test videos/fold makes single-seed
    # fold F1 swing by tens of points)
    n_seeds: int = 5
    # Polyak/EMA weight averaging for the avsum contenders
    # (train.ema_decay; round-3 capability built FOR this harness —
    # variance reduction so the CI half-width target below is reachable).
    # The torch reference keeps its literal recipe (no EMA there,
    # train_av_model.py:64-96).
    ema_decay: float = 0.98
    # World hardness (round 4): the round-3 world sat at canonical F1
    # 0.82-0.87 — compressed dynamic range near the ceiling, so deltas
    # shrank and seed noise dominated (VERDICT r3). Two knobs push the
    # absolute F1 into the literature band (~0.55-0.70, BASELINE.md):
    #   signal_alpha — fraction of a scene's true importance that is
    #     content-predictable (brightness rank); the rest is a latent
    #     rank NOT present in the pixels, capping what ANY model learns
    #     (real "importance" is partly editorial, not visual);
    #   scene_noise — per-(user, scene) disagreement sigma: users select
    #     genuinely different scenes (per-frame noise averages out;
    #     scene-level noise does not), capping per-user F1 agreement.
    # Calibrated round 4 (8-video probe, oracle = scoring with the
    # aligned mean-user targets themselves): alpha=0.85/noise=0.08 puts
    # the protocol CEILING at canonical F1 ~0.68 (random ~0.13), so
    # trained models land in the 0.55-0.70 literature band instead of
    # 0.82+ at the old ceiling. Harsher settings sink the ceiling itself
    # below the band (0.6/0.25 -> oracle 0.44).
    signal_alpha: float = 0.85
    scene_noise: float = 0.08
    # "tvsum" (20 noisy frame-score annotators, mean-user knapsack F1) or
    # "summe" (per-user binary ~15%-budget selections, max-over-users F1
    # — the reference's SumMe side, dataset.py:65-68 + gt_score targets)
    dataset: str = "tvsum"
    n_users_summe: int = 15


def build_world(root: str, st: ParitySettings):
    """Synthetic TVSum-50-shaped dataset + ONE shared feature cache.

    Ground truth is CONTENT-CORRELATED and generalizable: a scene's true
    importance is its brightness rank within the video (brighter scene =
    more important), a signal any linear map of the pixels — including
    random-weight backbones — carries into the cached features. A model
    that learns the rule on the train folds scores above chance on the
    test folds, so the reference-vs-rebuild delta measures learning, not
    noise. The 20 annotators are noisy copies of that truth
    (tests/helpers.py::write_fake_tvsum_mat), mirroring TVSum's
    inter-annotator variance.
    """
    from avsum_tpu.data.cache import FeatureCache
    from avsum_tpu.io.synthetic import make_scene_video
    from avsum_tpu.io.wav import write_wav
    from avsum_tpu.io.y4m import write_y4m
    from avsum_tpu.pipeline import AVPipeline
    from avsum_tpu.train.config import load_config
    from tests.helpers import write_fake_tvsum_mat

    video_dir = os.path.join(root, "videos")
    os.makedirs(video_dir, exist_ok=True)
    ids, frame_scores, scene_lists = [], [], []
    for i in range(st.n_videos):
        vid = f"pv{i:02d}"
        video, audio, scenes = make_scene_video(
            n_scenes=st.n_scenes,
            seed=1000 + i,
            height=st.height,
            width=st.width,
        )
        stem = os.path.join(video_dir, vid)
        write_y4m(stem + ".y4m", video, fps=30.0)
        write_wav(stem + ".wav", audio, 16000)
        total = scenes[-1][1]
        # true importance = signal_alpha x brightness rank (content-
        # predictable) + (1 - signal_alpha) x a latent rank that is NOT
        # in the pixels (editorial preference; unlearnable by design —
        # it lowers the achievable ceiling equally for every contender)
        world_rng = np.random.default_rng(5000 + i)
        luma = np.asarray(
            [float(video[s:e].mean()) for (s, e) in scenes], np.float64
        )
        n_sc = len(scenes)
        rank_luma = (np.argsort(np.argsort(luma)) + 0.5) / n_sc
        rank_latent = (
            np.argsort(np.argsort(world_rng.standard_normal(n_sc))) + 0.5
        ) / n_sc
        imp = st.signal_alpha * rank_luma + (1.0 - st.signal_alpha) * rank_latent
        scores = np.zeros(total, np.float32)
        for (start, end), w in zip(scenes, imp):
            scores[start:end] = w
        ids.append(vid)
        frame_scores.append(scores)
        scene_lists.append(scenes)

    if st.dataset == "tvsum":
        anno_path = os.path.join(root, "ydata.mat")
        write_fake_tvsum_mat(
            anno_path,
            ids,
            frame_scores,
            seed=st.seed,
            scene_lists=scene_lists,
            scene_noise=st.scene_noise,
        )
    elif st.dataset == "summe":
        anno_path = os.path.join(root, "GT")
        _write_summe_gt(anno_path, ids, frame_scores, scene_lists, st)
    else:
        raise ValueError(f"unknown dataset {st.dataset!r}")

    cfg = load_config(
        overrides=[
            "visual.backbone=tiny",  # random weights on BOTH sides anyway
            "visual.dtype=float32",
            "audio.silence_fallback=true",
            f"data.dataset={st.dataset}",
            f"data.annotation_path={anno_path}",
            f"data.cache_dir={root}/cache",
            f"model.hidden_dim={st.hidden_dim}",
            f"train.epochs={st.epochs}",
        ]
    )
    cache = FeatureCache(cfg.data.cache_dir)
    AVPipeline(cfg).preprocess_dataset(video_dir, cache)
    return cfg, cache, anno_path


def _write_summe_gt(gt_dir, ids, frame_scores, scene_lists, st):
    """Per-video SumMe-format .mat files (dataset.py:66-68 reads
    gt_score; the canonical protocol reads user_score): gt is the true
    frame importance; each of n_users_summe "users" selects scenes in
    descending noisy-importance order until ~15% of frames are covered —
    mirroring SumMe's recorded binary user summaries."""
    from scipy.io import savemat

    os.makedirs(gt_dir, exist_ok=True)
    rng = np.random.default_rng(st.seed + 77)
    for vid, gt, scenes in zip(ids, frame_scores, scene_lists):
        total = len(gt)
        users = np.zeros((total, st.n_users_summe), np.float32)
        scene_imp = np.asarray([gt[s] for (s, _) in scenes], np.float64)
        budget = 0.15 * total
        for u in range(st.n_users_summe):
            noisy = scene_imp + rng.normal(0.0, st.scene_noise, size=len(scenes))
            taken = 0.0
            for j in np.argsort(-noisy):
                start, end = scenes[j]
                if taken + (end - start) > budget and taken > 0:
                    continue
                users[start:end, u] = 1.0
                taken += end - start
        savemat(
            os.path.join(gt_dir, f"{vid}.mat"),
            {
                "gt_score": np.asarray(gt, np.float32).reshape(-1, 1),
                "user_score": users,
                "nFrames": total,
                "FPS": 30.0,
            },
        )


def evaluate_model(score_fn, test_examples, canon_fn):
    """Same protocol for every contender: the dataset's canonical knapsack
    F1 (``canon_fn``) + the reference's keyframe metrics on shot targets.

    Returns (fold-mean dict, per-video canonical F1 dict) — the per-video
    scores feed the PAIRED delta analysis in run_parity.
    """
    from avsum_tpu.summary.metrics import evaluate_scores

    canon, keyframe = {}, []
    for ex in test_examples:
        preds = np.asarray(score_fn(ex), np.float32)[: ex.n_shots]
        canon[ex.video_id] = float(canon_fn(ex, preds))
        keyframe.append(evaluate_scores(preds, ex.targets))
    vals = list(canon.values())
    out = {
        "canonical_f1": float(np.mean(vals)),
        "f1": float(np.mean([k["f1"] for k in keyframe])),
        "spearman": float(np.mean([k["spearman"] for k in keyframe])),
        "kendall": float(np.mean([k["kendall"] for k in keyframe])),
    }
    return out, canon


def train_avsum(
    cfg,
    train_examples,
    temporal_encoder: str,
    max_shots: int,
    ckpt_dir: str,
    seed: int = 0,
    ema_decay: float = 0.0,
):
    """Train AVScorer through the real Trainer on the shared examples."""
    from avsum_tpu.data.batching import batch_iterator
    from avsum_tpu.models import make_model
    from avsum_tpu.train.trainer import Trainer

    from avsum_tpu.train.config import load_config

    fold_cfg = load_config(
        overrides=[
            f"model.temporal_encoder={temporal_encoder}",
            f"model.hidden_dim={cfg.model.hidden_dim}",
            f"data.max_shots={max_shots}",
            f"train.epochs={cfg.train.epochs}",
            f"train.checkpoint_dir={ckpt_dir}",
            f"train.seed={seed}",
            f"train.ema_decay={ema_decay}",
            "train.save_every_epochs=1000000",  # final state only
            "visual.dtype=float32",
        ]
    )
    trainer = Trainer(make_model(fold_cfg.model), fold_cfg)

    def batches(epoch=0):
        return batch_iterator(
            train_examples,
            batch_size=max(len(train_examples) // 2, 1),
            max_shots=max_shots,
            shuffle=True,
            seed=fold_cfg.train.seed + epoch,
        )

    trainer.fit(batches, epochs=fold_cfg.train.epochs)
    return trainer


def run_parity(
    root: str,
    st: ParitySettings,
    report_cb=None,
    seed_indices=None,
    variants=("bilstm", "attention"),
) -> dict:
    """``variants`` selects which avsum contenders TRAIN (the torch
    reference always trains — it is the pairing arm). Limiting variants
    cuts per-cell cost by ~1/3 per skipped contender; the progress.json
    data structures keep all keys so a variants-limited extension run
    appends to (never drops) raw data restored from a full run."""
    from avsum_tpu.data.datasets import (
        load_summe_examples,
        load_tvsum_examples,
    )
    from avsum_tpu.data.splits import create_kfold_splits
    from avsum_tpu.data.summe import load_summe_dir
    from avsum_tpu.data.tvsum import load_tvsum, tvsum_index
    from avsum_tpu.summary.protocol import (
        canonical_f1_summe,
        canonical_f1_tvsum,
    )

    t0 = time.time()
    cfg, cache, anno_path = build_world(root, st)
    if st.dataset == "tvsum":
        examples = {
            ex.video_id: ex for ex in load_tvsum_examples(cache, anno_path)
        }
        anno = tvsum_index(load_tvsum(anno_path))

        def canon_fn(ex, preds):
            return canonical_f1_tvsum(
                preds,
                ex.shot_boundaries,
                ex.n_frames,
                anno[ex.video_id].user_scores,
                0.15,
            )

    else:
        examples = {
            ex.video_id: ex
            for ex in load_summe_examples(cache, anno_path)
        }
        gt = {v.video_id: v for v in load_summe_dir(anno_path)}

        def canon_fn(ex, preds):
            return canonical_f1_summe(
                preds,
                ex.shot_boundaries,
                ex.n_frames,
                gt[ex.video_id].user_score,
                0.15,
            )

    max_shots = 1
    while max_shots < max(ex.n_shots for ex in examples.values()):
        max_shots *= 2

    import torch

    folds = create_kfold_splits(sorted(examples), st.n_folds, seed=st.seed)
    keys = ("reference_torch_bilstm", "avsum_bilstm", "avsum_attention")
    # fold_means[key][s] -> list of fold-mean dicts; video_f1[key][s][vid]
    fold_means = {k: [[] for _ in range(st.n_seeds)] for k in keys}
    video_f1 = {k: [{} for _ in range(st.n_seeds)] for k in keys}
    vids = sorted(examples)
    # RESUME: the world build is fully seeded and run_seed depends only
    # on (st.seed, s, f_idx), so a cell computed by a prior process is
    # identical to what this process would compute. If a progress.json
    # from the same settings exists in the work dir, restore its raw
    # per-cell data and skip the completed cells — a host restart (the
    # API weather kills hosts regularly) costs at most one cell, not
    # the 6+ hours of a full run.
    progress_path = os.path.join(root, "progress.json")
    done_cells = set()
    n_prefix = 0
    if os.path.exists(progress_path):
        with open(progress_path) as fh:
            prev = json.load(fh)
        if (
            prev.get("settings") == dataclasses.asdict(st)
            and "fold_means" in prev
        ):
            if "cells" in prev:
                # explicit cell list (written by seed-subset runs, where
                # completed cells need not be a seed-major prefix)
                done_cells = {(ss, ff) for ss, ff in prev["cells"]}
            else:
                pf, ps = prev["done_through"]
                done_cells = {
                    (ss, ff)
                    for ss in range(ps + 1)
                    for ff in range(len(folds))
                    if ss < ps or ff <= pf
                }
            for k in keys:
                for ss in range(st.n_seeds):
                    fold_means[k][ss] = list(prev["fold_means"][k][ss])
                    video_f1[k][ss] = dict(prev["video_f1"][k][ss])
            print(
                f"resuming: {len(done_cells)}/{st.n_seeds * len(folds)} "
                "cells restored from progress.json",
                flush=True,
            )
        elif "settings" in prev:
            print(
                "progress.json settings mismatch — starting fresh",
                flush=True,
            )
    # SEED-OUTER iteration: one complete pass over all folds per seed, so
    # every finished seed is a full 5-fold dataset — the report is
    # recomputed (and re-written via report_cb) after each, and a run
    # killed at hour N still leaves a complete, statistically valid
    # N-seed result instead of an unfinishable fold-major triangle.
    for s in (range(st.n_seeds) if seed_indices is None else seed_indices):
        for f_idx, fold in enumerate(folds):
            if (s, f_idx) in done_cells:
                continue
            train_ex = [examples[v] for v in fold["train"]]
            test_ex = [examples[v] for v in fold["test"]]
            dv = train_ex[0].visual.shape[-1]
            da = train_ex[0].audio.shape[-1]
            run_seed = st.seed + 1000 * s + f_idx
            torch.manual_seed(run_seed)  # model INIT, not just the loop
            ref = build_reference_model(dv, da, st.hidden_dim)
            train_reference_model(
                ref, train_ex, epochs=st.epochs, seed=run_seed
            )
            mean, per_vid = evaluate_model(
                lambda ex: score_with_reference(ref, ex), test_ex, canon_fn
            )
            fold_means["reference_torch_bilstm"][s].append(mean)
            video_f1["reference_torch_bilstm"][s].update(per_vid)

            trained_keys = ["reference_torch_bilstm"]
            for encoder, key in (
                ("bilstm", "avsum_bilstm"),
                ("attention", "avsum_attention"),
            ):
                if encoder not in variants:
                    continue
                trained_keys.append(key)
                trainer = train_avsum(
                    cfg, train_ex, encoder, max_shots,
                    os.path.join(root, f"ckpt_{encoder}_f{f_idx}_s{s}"),
                    seed=run_seed,
                    ema_decay=st.ema_decay,
                )
                mean, per_vid = evaluate_model(
                    lambda ex: trainer.score_video(ex, max_shots),
                    test_ex,
                    canon_fn,
                )
                fold_means[key][s].append(mean)
                video_f1[key][s].update(per_vid)
            print(
                f"fold {f_idx} seed {s}: "
                + " ".join(
                    f"{k}={fold_means[k][s][-1]['canonical_f1']:.4f}"
                    for k in trained_keys
                ),
                flush=True,
            )
            # Incremental raw dump so a killed run (the host dies on API
            # weather regularly) still leaves analyzable per-video data.
            done_cells.add((s, f_idx))
            tmp_path = progress_path + ".tmp"
            with open(tmp_path, "w") as fh:
                json.dump(
                    {
                        "done_through": [f_idx, s],
                        "cells": sorted(done_cells),
                        "settings": dataclasses.asdict(st),
                        "video_f1": video_f1,
                        # full fold-mean dicts (canonical + keyframe
                        # metrics) so a resumed process — and
                        # parity_rebuild.py — reconstructs the complete
                        # report, not just the canonical column
                        "fold_means": fold_means,
                        "fold_canonical": {
                            k: [[m["canonical_f1"] for m in fold_means[k][ss]]
                                for ss in range(st.n_seeds)]
                            for k in keys
                        },
                    },
                    fh,
                )
            os.replace(tmp_path, progress_path)  # crash-atomic
        # seeds completed as a PREFIX of 0..n_seeds-1 form a full, valid
        # n-seed result; re-write the reports now. Seed-subset runs (a
        # non-prefix set, e.g. only seed 4 to extend a committed run)
        # leave reporting to scripts/parity_merge.py over progress.json.
        n_prefix = 0
        while n_prefix < st.n_seeds and all(
            (n_prefix, ff) in done_cells for ff in range(len(folds))
        ):
            n_prefix += 1
        if report_cb is not None and n_prefix > 0:
            report_cb(_summarize(st, n_prefix, fold_means, video_f1, vids, t0))

    if n_prefix == 0:
        return None
    return _summarize(st, n_prefix, fold_means, video_f1, vids, t0)


def _summarize(st, n_done, fold_means, video_f1, vids, t0) -> dict:
    """Stats over the first ``n_done`` COMPLETE seeds (all folds run)."""
    # a variants-limited run (run_parity(variants=...)) leaves untrained
    # contenders with empty fold lists — summarize only the trained keys
    keys = tuple(
        k for k in fold_means
        if all(len(fold_means[k][s]) > 0 for s in range(n_done))
    )
    result = {
        "settings": dataclasses.asdict(st),
        "dataset": st.dataset,
        "seeds_done": n_done,
        "protocol": (
            "synthetic TVSum, canonical per-annotator knapsack F1 "
            "(mean over 20 users)"
            if st.dataset == "tvsum"
            else "synthetic SumMe, canonical knapsack F1 "
            f"(max over {st.n_users_summe} user summaries)"
        )
        + f", {st.n_folds}-fold CV x {n_done} seeds, "
        f"paired per-video deltas; avsum EMA decay {st.ema_decay}; "
        f"world hardness: signal_alpha={st.signal_alpha}, "
        f"scene_noise={st.scene_noise}",
        "wall_s": round(time.time() - t0, 1),
        "models": {},
    }
    # per-video F1 averaged over seeds -> one vector per model over all
    # held-out videos (every video is a test video in exactly one fold)
    seed_avg = {
        k: np.asarray(
            [np.mean([video_f1[k][s][v] for s in range(n_done)])
             for v in vids]
        )
        for k in keys
    }
    for key in keys:
        per_seed_means = [
            float(np.mean([f["canonical_f1"] for f in fold_means[key][s]]))
            for s in range(n_done)
        ]
        result["models"][key] = {
            m: float(
                np.mean([f[m] for s in range(n_done)
                         for f in fold_means[key][s]])
            )
            for m in fold_means[key][0][0]
        }
        result["models"][key]["per_seed_canonical_f1"] = [
            round(v, 4) for v in per_seed_means
        ]
        result["models"][key]["seed_std_pts"] = round(
            100.0 * float(np.std(per_seed_means)), 2
        )
    ref_vec = seed_avg["reference_torch_bilstm"]
    ref_f1 = result["models"]["reference_torch_bilstm"]["canonical_f1"]
    for key in ("avsum_bilstm", "avsum_attention"):
        if key not in keys:
            continue
        # paired analysis: both contenders scored the SAME held-out videos
        # with the SAME seeds, so per-video deltas cancel video difficulty
        diffs = seed_avg[key] - ref_vec
        se = float(np.std(diffs, ddof=1) / np.sqrt(len(diffs)))
        r = result["models"][key]
        r["delta_canonical_f1_pts"] = round(
            100.0 * (r["canonical_f1"] - ref_f1), 2
        )
        r["paired_delta_pts"] = round(100.0 * float(np.mean(diffs)), 2)
        r["paired_se_pts"] = round(100.0 * se, 2)
        r["paired_ci95_pts"] = [
            round(100.0 * (float(np.mean(diffs)) - 1.96 * se), 2),
            round(100.0 * (float(np.mean(diffs)) + 1.96 * se), 2),
        ]
        # Variance decomposition + power diagnostics. The canonical
        # knapsack F1 is DISCRETE per video: a tiny score difference can
        # flip which of two near-equal-value disjoint packings wins
        # (PARITY_PROCEDURE.md §6.2), producing ±10-70 pt per-video
        # deltas in both directions. These flips, not seed noise, bound
        # the CI at fixed n_videos — quantified so a power FAIL is
        # attributable rather than mysterious.
        per_seed_delta = [
            100.0 * float(np.mean(
                [video_f1[key][s][v] - video_f1["reference_torch_bilstm"][s][v]
                 for v in vids]
            ))
            for s in range(n_done)
        ]
        r["per_seed_paired_delta_pts"] = [round(d, 2) for d in per_seed_delta]
        # Seed-level paired t CI — the DECISION statistic. Each per-seed
        # delta already averages over ALL n_videos (fully crossed, same
        # videos + same seeds on both sides), so independent training
        # seeds are the replications and inference is conditional on the
        # fixed video set — exactly the claim the real benchmark makes
        # (TVSum is a FIXED 50-video set; "parity on new videos" is a
        # different, stronger claim, kept below as a diagnostic).
        from scipy import stats as sps

        dseed = np.asarray(per_seed_delta, np.float64)
        if len(dseed) > 1:
            se_seed = float(dseed.std(ddof=1) / np.sqrt(len(dseed)))
            tcrit = float(sps.t.ppf(0.975, len(dseed) - 1))
        else:
            se_seed, tcrit = float("nan"), float("inf")
        r["seed_paired_se_pts"] = round(se_seed, 2)
        r["seed_paired_ci95_pts"] = [
            round(float(dseed.mean()) - tcrit * se_seed, 2),
            round(float(dseed.mean()) + tcrit * se_seed, 2),
        ]
        davg = 100.0 * diffs
        r["videos_abs_delta_gt10"] = int((np.abs(davg) > 10.0).sum())
        sd = float(np.std(davg, ddof=1))
        r["videos_needed_for_ci2pts"] = int(np.ceil((1.96 * sd / 2.0) ** 2))
        # one-sided noninferiority: P(mean paired delta >= -0.5) under a
        # 10k-resample paired bootstrap of the seed-averaged deltas
        rng = np.random.default_rng(0)
        boot = rng.choice(davg, size=(10_000, len(davg)), replace=True)
        r["p_noninferior_bootstrap"] = round(
            float((boot.mean(axis=1) >= -0.5).mean()), 4
        )
    return result


def _model_verdict(r: dict) -> str:
    """Round-4 DECISIVE rule (VERDICT r3 item 2): the paired mean delta
    must be >= -0.5 pts AND the 95% CI half-width must be <= 2 pts. The
    round-3 rule ("CI includes 0") was satisfiable by sheer measurement
    noise — a +-9 pt CI includes 0 for free; this one demands both a
    non-inferior point estimate and the statistical power to mean it.

    The CI the rule uses is the SEED-LEVEL paired t CI
    (``seed_paired_ci95_pts``): the benchmark's video set is fixed and
    fully crossed between contenders, so independent training seeds are
    the unit of replication. The video-level CI (``paired_ci95_pts``)
    answers the stronger "parity on videos never seen by this study"
    question and stays in the report as a generalization diagnostic —
    it is power-bounded by the knapsack metric's discreteness
    (``videos_needed_for_ci2pts`` quantifies the bound).

    Three-valued so a power shortfall is reported as what it is:
      PASS            — CI lower bound clears the -0.5 margin (standard
                        noninferiority), OR noninferior point estimate
                        AND half-width <= 2
      FAIL-POWER      — noninferior point estimate, CI too wide; the
                        variance-decomposition fields say why and what
                        n_videos the rule would need
      FAIL-INFERIOR   — the point estimate itself is below -0.5 pts
    """
    ci = r.get("seed_paired_ci95_pts") or r["paired_ci95_pts"]
    half_width = (ci[1] - ci[0]) / 2.0
    if r["paired_delta_pts"] < -0.5:
        return "FAIL-INFERIOR"
    # Standard noninferiority test: the claim "avsum is not worse than
    # the reference by more than 0.5 pts" is ESTABLISHED when the 95% CI
    # lower bound clears the margin, regardless of how wide the interval
    # is above it (PARITY_PROCEDURE.md §7.8). The half-width <= 2 clause
    # remains as the power gate for point estimates sitting near zero.
    if ci[0] >= -0.5:
        return "PASS"
    return "PASS" if half_width <= 2.0 else "FAIL-POWER"


def _dataset_verdict(models: dict) -> str:
    vs = [
        _model_verdict(models[k])
        for k in ("avsum_bilstm", "avsum_attention")
        if k in models
    ]
    if any(v == "FAIL-INFERIOR" for v in vs):
        return "FAIL-INFERIOR"
    if any(v == "FAIL-POWER" for v in vs):
        return "FAIL-POWER"
    return "PASS"


def write_reports(results, out_dir: str) -> None:
    """results: one run_parity() dict, or a list of them (one/dataset)."""
    if isinstance(results, dict):
        results = [results]
    os.makedirs(out_dir, exist_ok=True)
    payload = results[0] if len(results) == 1 else {
        "datasets": {r["dataset"]: r for r in results}
    }
    with open(os.path.join(out_dir, "PARITY_F1.json"), "w") as fh:
        json.dump(payload, fh, indent=1)

    lines = [
        "# PARITY_F1 — measured F1 parity vs the reference as re-run",
        "",
        "Produced by `scripts/parity_reference.py` (see its docstring for "
        "the protocol). The reference side is its literal model + training "
        "recipe executed in torch on CPU (av_model.py:6-46, "
        "train_av_model.py:64-96) on the SAME cached features, targets, "
        "splits, and evaluation code as the rebuild.",
    ]
    verdicts = []
    for result in results:
        m = result["models"]
        lines += [
            "",
            f"## {result.get('dataset', 'tvsum')}",
            "",
            f"Protocol: {result['protocol']}; "
            f"settings: {result['settings']}",
            "",
            "| model | canonical F1 | paired Δ (pts) | seed-level 95% CI "
            "| video-level 95% CI | seed σ (pts) | keyframe F1 | ρ | τ |",
            "|---|---|---|---|---|---|---|---|---|",
        ]
        for key, r in m.items():
            delta = r.get("paired_delta_pts", "—")
            sci = r.get("seed_paired_ci95_pts")
            sci_s = f"[{sci[0]}, {sci[1]}]" if sci else "—"
            ci = r.get("paired_ci95_pts")
            ci_s = f"[{ci[0]}, {ci[1]}]" if ci else "—"
            lines.append(
                f"| {key} | {r['canonical_f1']:.4f} | {delta} | {sci_s} | "
                f"{ci_s} | {r.get('seed_std_pts', '—')} | "
                f"{r['f1']:.4f} | {r['spearman']:.4f} | {r['kendall']:.4f} |"
            )
        for key in ("avsum_bilstm", "avsum_attention"):
            if key not in m:
                continue
            r = m[key]
            if "per_seed_paired_delta_pts" not in r:
                continue
            lines += [
                "",
                f"`{key}` paired-delta diagnostics: per-seed overall Δ = "
                f"{r['per_seed_paired_delta_pts']} pts; "
                f"{r['videos_abs_delta_gt10']}/"
                f"{result['settings']['n_videos']} videos with |Δ|>10 pts "
                "(knapsack packing flips, both directions); CI ≤ ±2 pts "
                f"would need ~{r['videos_needed_for_ci2pts']} videos at "
                "this per-video σ; bootstrap P(mean Δ ≥ −0.5) = "
                f"{r['p_noninferior_bootstrap']}.",
            ]
        if result.get("merge_note"):
            lines += ["", f"Merge provenance: {result['merge_note']}."]
        xh = result.get("cross_host_reproduction")
        if xh:
            parts = []
            for s, mm in xh["drift_by_seed"].items():
                bits = []
                for k, v in mm.items():
                    if "abs_diff_pts" in v:
                        bits.append(f"{k} F1 {v['abs_diff_pts']} pts")
                    if "paired_delta" in v:
                        bits.append(
                            f"{k} δ {v['paired_delta']['abs_diff_pts']} pts"
                        )
                parts.append(f"seed {s}: " + ", ".join(bits))
            drift = "; ".join(parts)
            # Name exactly which models drifted (the sentence must be
            # derived from the recorded drift, not asserted): the torch
            # reference shifts with the host's CPU reduction order, and
            # any contender listed here drifted too.
            drifted = sorted(
                {k for mm in xh["drift_by_seed"].values() for k in mm}
            )
            exact = sorted(set(m) - set(drifted))
            lines += [
                "",
                f"Cross-host reproduction probe ({xh['reason']}): {drift}. "
                + (
                    f"Bit-exact cross-host reproduction held for "
                    f"{', '.join(exact)}; " if exact else ""
                )
                + f"{', '.join(drifted)} shifted with the host "
                "(torch CPU matmul reduction order is host-dependent, and "
                "the drifted contenders' recorded deltas are above). "
                "Paired deltas are computed within one host per "
                "seed, so host effects cancel inside each replication.",
            ]
        verdicts.append(
            "; ".join(
                f"{k} {_model_verdict(m[k])}"
                for k in ("avsum_bilstm", "avsum_attention")
                if "paired_delta_pts" in m.get(k, {})
            )
            or _dataset_verdict(m)
        )
    lines += [
        "",
        "Paired Δ = mean over held-out videos of (avsum − reference) "
        "canonical F1, seed-averaged; both contenders score the SAME videos "
        "with the SAME seeds, so video difficulty cancels. Seed σ = spread "
        "of a model's overall F1 across independent init/training seeds "
        "(the noise floor).",
        "",
        "Two CIs, two questions. The **seed-level** paired t CI treats "
        "the fixed, fully-crossed video set as given (exactly the claim "
        "the real benchmark makes — TVSum is a fixed 50-video set) and "
        "independent training seeds as the replications; it is the "
        "acceptance statistic. The **video-level** CI additionally treats "
        "videos as sampled — parity on videos this study never saw — and "
        "is power-bounded by the knapsack metric's discreteness (the "
        "diagnostics lines quantify the n_videos it would need); it "
        "remains as a generalization diagnostic.",
        "",
        f"Acceptance (seed-level 95% CI lower bound ≥ −0.5 pts — standard "
        f"noninferiority at that margin — or paired Δ ≥ −0.5 pts with CI "
        f"half-width ≤ 2 pts, PARITY_PROCEDURE.md §7.8): "
        f"{verdicts[0] if len(verdicts) == 1 else ''}"
        + (
            ", ".join(
                f"{r.get('dataset', 'tvsum')}: {v}"
                for r, v in zip(results, verdicts)
            )
            if len(results) > 1
            else ""
        ),
        "",
        "FAIL-POWER means the point estimate is noninferior but the "
        "seed-level CI half-width exceeds 2 pts: the contender's "
        "per-seed overall deltas spread too widely for n_seeds "
        "replications to pin the mean within ±2 (the per-seed values are "
        "in the diagnostics lines). The underlying mechanism is the same "
        "knapsack discreteness that bounds the video-level CI: "
        "near-equal disjoint packings flip on tiny score changes "
        "(PARITY_PROCEDURE.md §6.2), and a handful of flipped videos "
        "move a seed's overall mean by a point or more.",
        "",
        "Caveats: synthetic media and random-weight encoders on BOTH sides "
        "(pretrained ports remain the offline step, docs/PARITY_RUNBOOK.md); "
        "what this measures is trainer/model/protocol parity end to end.",
    ]
    with open(os.path.join(out_dir, "PARITY_F1.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out-dir", default=REPO)
    ap.add_argument("--work-dir", default=None)
    ap.add_argument(
        "--quick", action="store_true",
        help="small world (CI-scale smoke, not the reportable run)",
    )
    ap.add_argument("--n-seeds", type=int, default=None)
    ap.add_argument(
        "--seed-indices", default=None,
        help="comma-separated seed indices to run (e.g. '4' or '4,0') — "
        "extends/reproduces specific cells of a committed run; reports "
        "are then assembled by scripts/parity_merge.py from progress.json "
        "(cells are deterministic in (seed, fold), so a subset run is "
        "bit-identical to the corresponding slice of a full run)",
    )
    ap.add_argument(
        "--dataset", choices=("tvsum", "summe", "both"), default="tvsum",
        help="protocol(s) to run; 'both' writes one combined report",
    )
    ap.add_argument(
        "--variants", default="bilstm,attention",
        help="comma list of avsum contenders to train (the torch "
        "reference always trains as the pairing arm) — e.g. "
        "'attention' extends only the attention rows of a committed "
        "run at ~2/3 the per-cell cost",
    )
    args = ap.parse_args(argv)
    st = ParitySettings()
    if args.quick:
        st = ParitySettings(
            n_videos=6, n_scenes=5, epochs=8, hidden_dim=64, n_folds=2,
            n_seeds=1,
        )
    if args.n_seeds is not None:
        st = dataclasses.replace(st, n_seeds=args.n_seeds)
    import tempfile

    work = args.work_dir or tempfile.mkdtemp(prefix="parity_")
    names = (
        ("tvsum", "summe") if args.dataset == "both" else (args.dataset,)
    )
    seed_indices = None
    if args.seed_indices is not None:
        seed_indices = [int(x) for x in args.seed_indices.split(",") if x]
    variants = tuple(v for v in args.variants.split(",") if v)
    assert all(v in ("bilstm", "attention") for v in variants), variants
    results = []
    for name in names:
        ds_st = dataclasses.replace(st, dataset=name)
        results.append(run_parity(
            os.path.join(work, name), ds_st,
            variants=variants,
            # re-write reports after EVERY completed seed so a killed
            # multi-hour run still leaves a complete n-seed report
            report_cb=(
                None if seed_indices is not None
                else lambda r: write_reports(results + [r], args.out_dir)
            ),
            seed_indices=seed_indices,
        ))
        if results[-1] is not None and seed_indices is None:
            write_reports(results, args.out_dir)  # checkpoint after each
    if seed_indices is not None:
        print(f"seed-subset run complete; raw data in {work}/*/progress.json"
              " — assemble reports with scripts/parity_merge.py")
        return 0
    print(
        json.dumps(
            {r["dataset"]: r["models"] for r in results}, indent=1
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
