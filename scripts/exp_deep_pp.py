"""Diagnose the deep_pp canonical-F1 collapse with a training-budget curve.

VERDICT r4 item 1: `configs/deep_pp.yaml` (BASELINE config 4, the
"upgraded encoders" quality configuration — the deep temporal stack
standing in for /root/reference/models/av_model.py:18-26) records
canonical knapsack F1 0.32 vs the flagship's 0.61 on the parity world
(PPEP_BENCH.json), while its RANKING metrics are healthy (keyframe 0.90,
Spearman 0.87). The committed explanation — "100 epochs at lr 1e-4
undertrains a 12-layer stack's score calibration" — was asserted, not
demonstrated.

This script tests that hypothesis directly: train deep_pp (and the
flagship control) on the SAME parity world/fold/seed as the PP/EP bench
and record canonical F1 + predicted-score distribution statistics every
--eval-every epochs. If the hypothesis is right, the curve rises with
budget and the score spread (std over the sigmoid outputs) grows toward
the flagship's; if it is wrong, the curve plateaus low and the collapse
needs a different fix (calibration layer, loss change).

Device note: runs on the DEFAULT jax backend (the real TPU chip when
present) with a 1x1x1 mesh. configs/deep_pp.yaml documents that the
pp_stages=4 model on a model=1 mesh runs its stages sequentially via
lax.scan with identical math, so quality conclusions transfer to the
PP mesh; tests/test_parallel_pp_ep.py pins that equivalence. Step
times here are single-chip and are NOT comparable to PPEP_BENCH's
virtual-CPU ratios.

Run: python scripts/exp_deep_pp.py --config deep_pp --epochs 600 \
         --lr 1e-4 --eval-every 50 --out docs/deep_pp_curve_r05.json
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="deep_pp",
                    help="contender name from scripts/bench_pp_ep.py")
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--warmup-steps", type=int, default=None,
                    help="override train.warmup_steps (default: config)")
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fold", type=int, default=0)
    ap.add_argument(
        "--use-contender-mesh", action="store_true",
        help="train on the contender's own mesh (e.g. deep_pp's "
        "data=2/model=4 GPipe mesh) instead of 1x1x1 — requires the "
        "8-virtual-device CPU env (run WITHOUT AVSUM_PLATFORM=tpu). "
        "Bisects mesh-execution effects out of quality differences.",
    )
    ap.add_argument("--n-videos", type=int, default=20)
    ap.add_argument("--work-dir", default="/tmp/ppep_tpu")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from scripts.bench_pp_ep import contenders
    from scripts.parity_reference import (
        ParitySettings, build_world, evaluate_model,
    )
    from avsum_tpu.data.batching import batch_iterator
    from avsum_tpu.data.datasets import load_tvsum_examples
    from avsum_tpu.data.splits import create_kfold_splits
    from avsum_tpu.data.tvsum import load_tvsum, tvsum_index
    from avsum_tpu.models import make_model
    from avsum_tpu.summary.protocol import canonical_f1_tvsum
    from avsum_tpu.train.config import load_config
    from avsum_tpu.train.trainer import Trainer

    import jax

    from avsum_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    os.makedirs(args.work_dir, exist_ok=True)
    st = ParitySettings(n_videos=args.n_videos, n_seeds=1)
    cfg, cache, anno_path = build_world(
        os.path.join(args.work_dir, "world"), st)
    examples = {
        ex.video_id: ex for ex in load_tvsum_examples(cache, anno_path)
    }
    anno = tvsum_index(load_tvsum(anno_path))

    def canon_fn(ex, preds):
        return canonical_f1_tvsum(
            preds, ex.shot_boundaries, ex.n_frames,
            anno[ex.video_id].user_scores, 0.15,
        )

    folds = create_kfold_splits(sorted(examples), 5, seed=0)
    fold = folds[args.fold]
    train_ex = [examples[v] for v in fold["train"]]
    test_ex = [examples[v] for v in fold["test"]]
    max_shots = 1
    while max_shots < max(ex.n_shots for ex in examples.values()):
        max_shots *= 2

    name, model_ov, mesh_ov = {
        c[0]: c for c in contenders()
    }[args.config]
    if not args.use_contender_mesh:
        mesh_ov = ["mesh.data=1", "mesh.seq=1", "mesh.model=1"]
    overrides = [
        *model_ov,
        *mesh_ov,
        f"model.hidden_dim={cfg.model.hidden_dim}",
        "model.num_heads=4",
        f"data.max_shots={max_shots}",
        "data.batch_videos=8",
        f"train.epochs={args.epochs}",
        f"train.lr={args.lr}",
        f"train.checkpoint_dir={args.work_dir}/ckpt_{name}_s{args.seed}",
        f"train.seed={args.seed}",
        "train.ema_decay=0.98",
        "train.save_every_epochs=1000000",
        "visual.dtype=float32",
    ]
    if args.warmup_steps is not None:
        overrides.append(f"train.warmup_steps={args.warmup_steps}")
    run_cfg = load_config(overrides=overrides)
    trainer = Trainer(make_model(run_cfg.model), run_cfg)

    seed = args.seed

    def batches(epoch=0):
        return batch_iterator(
            train_ex, batch_size=8, max_shots=max_shots, shuffle=True,
            seed=seed + epoch,
        )

    print(json.dumps({
        "config": name, "backend": jax.default_backend(),
        "epochs": args.epochs, "lr": args.lr, "fold": args.fold,
        "seed": seed, "eval_every": args.eval_every,
    }), flush=True)

    curve = []
    done = 0
    t_start = time.perf_counter()
    while done < args.epochs:
        chunk = min(args.eval_every, args.epochs - done)
        # fit()'s epoch loop is range(start_epoch, epochs): pass the
        # ABSOLUTE target, not the chunk size (a chunk-sized target with
        # start_epoch=done trains zero epochs from the second chunk on)
        trainer.fit(batches, epochs=done + chunk, start_epoch=done)
        done += chunk
        mean, per_vid = evaluate_model(
            lambda ex: trainer.score_video(ex, max_shots), test_ex,
            canon_fn,
        )
        # Score-distribution stats over the held-out videos: a knapsack
        # over near-constant sigmoid outputs selects by shot LENGTH, not
        # score — the suspected collapse mechanism.
        all_scores = np.concatenate([
            np.asarray(trainer.score_video(ex, max_shots),
                       np.float32)[: ex.n_shots]
            for ex in test_ex
        ])
        per_video_std = float(np.mean([
            np.std(np.asarray(trainer.score_video(ex, max_shots),
                              np.float32)[: ex.n_shots])
            for ex in test_ex
        ]))
        point = {
            "epoch": done,
            "canonical_f1": round(mean["canonical_f1"], 4),
            "keyframe_f1": round(mean["f1"], 4),
            "spearman": round(mean["spearman"], 4),
            "score_mean": round(float(all_scores.mean()), 4),
            "score_std": round(float(all_scores.std()), 4),
            "score_std_within_video": round(per_video_std, 4),
            "wall_s": round(time.perf_counter() - t_start, 1),
        }
        curve.append(point)
        print(json.dumps(point), flush=True)

    result = {
        "config": name,
        "backend": jax.default_backend(),
        "protocol": (
            f"parity world (alpha={st.signal_alpha}, noise={st.scene_noise},"
            f" {args.n_videos} videos), fold {args.fold} of 5, seed {seed},"
            f" lr {args.lr}, warmup-cosine; mesh overrides {mesh_ov}"
        ),
        "lr": args.lr,
        "warmup_steps": args.warmup_steps,
        "curve": curve,
        "final_per_video_canonical_f1": {
            v: round(f, 4) for v, f in per_vid.items()},
    }
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)
        print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
