"""Quality + throughput data points for the PP and EP configs.

VERDICT r3 item 8: `configs/deep_pp.yaml` and `configs/moe_ep.yaml`
train through the real Trainer in tests, but no recorded run showed the
deep-PP or MoE encoder reaching flagship quality, nor a step-time
comparison. This script trains all three on the SAME parity synthetic
world (scripts/parity_reference.build_world — the calibrated
literature-band-hardness world) on the 8-device virtual CPU mesh and
records canonical F1 (fold-0 held-out videos, the canonical
per-annotator knapsack protocol) plus steady-state step time.

Virtual-CPU caveat stated up front: 8 virtual devices share one physical
core, so ABSOLUTE step times mean little and RELATIVE ones carry the
signal (a config that needs k x the FLOPs should cost ~k x; collective
pathologies show up as far-worse-than-FLOPs ratios). Quality numbers are
real — the protocol math does not care what device trained the weights.

Run: python scripts/bench_pp_ep.py [--epochs 100] [--n-seeds 2]
Writes PPEP_BENCH.json and prints one JSON line per (config, seed).
"""

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

if os.environ.get("AVSUM_PLATFORM", "cpu").lower() != "tpu":
    # The PP/EP throughput rows need the 8-virtual-device CPU mesh.
    # AVSUM_PLATFORM=tpu lets importers (scripts/exp_deep_pp.py) reuse
    # contenders()/training on the real chip with a 1x1x1 mesh instead.
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402  (default platform when AVSUM_PLATFORM=tpu)
import numpy as np


def contenders():
    """(name, model overrides, mesh overrides). All share hidden_dim=512,
    the parity world's feature dims, batch_videos=8."""
    return [
        (
            "flagship_attention",
            ["model.temporal_encoder=attention", "model.temporal_layers=2"],
            ["mesh.data=8", "mesh.seq=1", "mesh.model=1"],
        ),
        (
            "deep_pp",  # configs/deep_pp.yaml: 12 blocks over 4 stages
            [
                "model.temporal_encoder=attention",
                "model.temporal_layers=12",
                "model.pp_stages=4",
            ],
            ["mesh.data=2", "mesh.seq=1", "mesh.model=4"],
        ),
        (
            "moe_ep",  # configs/moe_ep.yaml: 8 experts over 4 devices
            [
                "model.temporal_encoder=moe",
                "model.temporal_layers=2",
                "model.moe_experts=8",
                "model.moe_topk=2",
            ],
            ["mesh.data=2", "mesh.seq=1", "mesh.model=4"],
        ),
    ]


def train_and_eval(cfg, name, model_ov, mesh_ov, train_ex, test_ex,
                   canon_fn, max_shots, epochs, seed, work, fold_idx=0):
    from avsum_tpu.data.batching import batch_iterator
    from avsum_tpu.models import make_model
    from avsum_tpu.train.config import load_config
    from avsum_tpu.train.trainer import Trainer

    from scripts.parity_reference import evaluate_model

    run_cfg = load_config(
        overrides=[
            *model_ov,
            *mesh_ov,
            f"model.hidden_dim={cfg.model.hidden_dim}",
            "model.num_heads=4",
            f"data.max_shots={max_shots}",
            "data.batch_videos=8",
            f"train.epochs={epochs}",
            f"train.checkpoint_dir={work}/ckpt_{name}_f{fold_idx}_s{seed}",
            f"train.seed={seed}",
            "train.ema_decay=0.98",
            "train.save_every_epochs=1000000",
            "visual.dtype=float32",
        ]
    )
    trainer = Trainer(make_model(run_cfg.model), run_cfg)

    def batches(epoch=0):
        return batch_iterator(
            train_ex, batch_size=8, max_shots=max_shots, shuffle=True,
            seed=seed + epoch,
        )

    steps_per_epoch = max(1, -(-len(train_ex) // 8))
    # epoch 1 pays the compile; time the rest
    t0 = time.perf_counter()
    trainer.fit(batches, epochs=1)
    warm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    trainer.fit(batches, epochs=epochs - 1)
    steady = time.perf_counter() - t0
    step_ms = 1e3 * steady / ((epochs - 1) * steps_per_epoch)

    mean, per_vid = evaluate_model(
        lambda ex: trainer.score_video(ex, max_shots), test_ex, canon_fn
    )
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(
            trainer.state.params)
    )
    return {
        "config": name,
        "seed": seed,
        "fold": fold_idx,
        "epochs": epochs,
        "backend": jax.default_backend(),
        "canonical_f1": round(mean["canonical_f1"], 4),
        "keyframe_f1": round(mean["f1"], 4),
        "spearman": round(mean["spearman"], 4),
        # per-video canonical F1 so rows across folds give PAIRED deltas
        # vs flagship (same fold+seed => same held-out videos): the
        # fold-0 means alone tie at identical knapsack packings
        # (VERDICT r4 item 4 — the metric saturates without pairing)
        "video_canonical_f1": {v: round(f, 4) for v, f in per_vid.items()},
        "step_ms_virtual_cpu": round(step_ms, 1),
        "warmup_s": round(warm_s, 1),
        "n_params": n_params,
        "mesh": {o.split("=")[0].split(".")[1]: int(o.split("=")[1])
                 for o in mesh_ov},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--n-seeds", type=int, default=2)
    ap.add_argument("--n-videos", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(REPO, "PPEP_BENCH.json"))
    ap.add_argument("--work-dir", default=None)
    ap.add_argument(
        "--configs", default=None,
        help="comma list of contender names to run, in the given order "
        "(default: all). Lets a budget-bound session run the missing "
        "configs and combine with --append-rows.",
    )
    ap.add_argument(
        "--folds", default="0",
        help="comma list of fold indices (of the canonical 5) to run; "
        "per-(fold,seed) cells give the paired-vs-flagship statistic "
        "discriminative power a single fold's tied means lack",
    )
    ap.add_argument(
        "--seed-offset", type=int, default=0,
        help="first seed to run (seeds seed-offset .. seed-offset+n_seeds-1); "
        "lets a follow-up run add seeds to rows salvaged via --append-rows "
        "without re-training the ones already measured",
    )
    ap.add_argument(
        "--mesh-one", action="store_true",
        help="run every contender on a 1x1x1 mesh (stages/experts execute "
        "sequentially with identical math — pinned in "
        "tests/test_parallel_pp_ep.py). With AVSUM_PLATFORM=tpu this puts "
        "the QUALITY cells on the real chip while the CPU core is busy; "
        "step times are then chip times, excluded from the virtual-CPU "
        "medians (rows carry a 'backend' stamp)",
    )
    ap.add_argument(
        "--append-rows", default=None,
        help="JSONL of already-measured rows (one per line, the same "
        "schema this script prints) to include in the summary and the "
        "output file — e.g. rows salvaged from an interrupted run's log",
    )
    args = ap.parse_args()

    # persistent executable cache: babysitter restarts after a tunnel
    # wedge must not re-pay minutes of remote compile per attempt
    from avsum_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from scripts.parity_reference import ParitySettings, build_world
    from avsum_tpu.data.datasets import load_tvsum_examples
    from avsum_tpu.data.splits import create_kfold_splits
    from avsum_tpu.data.tvsum import load_tvsum, tvsum_index
    from avsum_tpu.summary.protocol import canonical_f1_tvsum

    work = args.work_dir or tempfile.mkdtemp(prefix="ppep_")
    st = ParitySettings(n_videos=args.n_videos, n_seeds=1)
    cfg, cache, anno_path = build_world(os.path.join(work, "world"), st)
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
    fold_idxs = [int(x) for x in args.folds.split(",") if x != ""]
    max_shots = 1
    while max_shots < max(ex.n_shots for ex in examples.values()):
        max_shots *= 2

    rows = []
    if args.append_rows:
        # Salvaged rows merge only if they are well-formed and ran the
        # same protocol (advisor r4: silent mismatches bias the means);
        # rows predating the fold/epochs fields are stamped with the
        # values those runs used (fold 0 was the only fold then).
        with open(args.append_rows) as fh:
            appended = [json.loads(line) for line in fh if line.strip()]
        for i, r in enumerate(appended):
            missing = {"config", "seed", "canonical_f1"} - set(r)
            if missing:
                raise SystemExit(
                    f"--append-rows line {i + 1}: malformed row, missing "
                    f"{sorted(missing)}: {r}"
                )
            r.setdefault("fold", 0)
            r.setdefault("epochs", 100)
            if r["epochs"] != args.epochs:
                raise SystemExit(
                    f"--append-rows line {i + 1}: row trained "
                    f"{r['epochs']} epochs but this run uses "
                    f"{args.epochs} — protocols must match to merge"
                )
        rows += appended

    by_name = {name: (name, m, mo) for name, m, mo in contenders()}
    wanted = (
        [by_name[n] for n in args.configs.split(",")]
        if args.configs else contenders()
    )
    for f_idx in fold_idxs:
        fold = folds[f_idx]
        train_ex = [examples[v] for v in fold["train"]]
        test_ex = [examples[v] for v in fold["test"]]
        for name, model_ov, mesh_ov in wanted:
            if args.mesh_one:
                mesh_ov = ["mesh.data=1", "mesh.seq=1", "mesh.model=1"]
            for seed in range(
                args.seed_offset, args.seed_offset + args.n_seeds
            ):
                if any(
                    r["config"] == name and r["seed"] == seed
                    and r.get("fold", 0) == f_idx for r in rows
                ):
                    print(f"skip {name} fold {f_idx} seed {seed}: already "
                          "present in appended rows", flush=True)
                    continue
                row = train_and_eval(
                    cfg, name, model_ov, mesh_ov, train_ex, test_ex,
                    canon_fn, max_shots, args.epochs, seed, work,
                    fold_idx=f_idx,
                )
                rows.append(row)
                print(json.dumps(row), flush=True)

    dup = {}
    for r in rows:
        k = (r["config"], r.get("fold", 0), r["seed"])
        if k in dup:
            raise SystemExit(f"duplicate (config, fold, seed) row: {k}")
        dup[k] = r

    summary = {}
    for name, _, _ in contenders():
        rs = [r for r in rows if r["config"] == name]
        if not rs:
            continue
        # step times are only comparable within one backend: rows
        # predating the stamp ran on the virtual-CPU mesh
        cpu_steps = [r["step_ms_virtual_cpu"] for r in rs
                     if r.get("backend", "cpu") == "cpu"]
        summary[name] = {
            "canonical_f1_mean": round(
                float(np.mean([r["canonical_f1"] for r in rs])), 4),
            "step_ms_virtual_cpu_median": (
                round(float(np.median(cpu_steps)), 1)
                if cpu_steps else None),
            "n_rows": len(rs),
            "folds": sorted({r.get("fold", 0) for r in rs}),
            "n_params": rs[0]["n_params"],
            "mesh": rs[0]["mesh"],
        }
        # PAIRED vs flagship: for each (fold, seed) where both configs
        # have per-video data, delta per held-out video, then a t CI
        # over the per-(fold,seed) mean deltas — the statistic that can
        # distinguish configs whose single-fold means tie exactly.
        if name != "flagship_attention":
            cell_deltas = []
            for r in rs:
                flag = dup.get(
                    ("flagship_attention", r.get("fold", 0), r["seed"])
                )
                if not (flag and "video_canonical_f1" in r
                        and "video_canonical_f1" in flag):
                    continue
                own, fv = r["video_canonical_f1"], flag["video_canonical_f1"]
                common = sorted(set(own) & set(fv))
                if common:
                    cell_deltas.append(100.0 * float(
                        np.mean([own[v] - fv[v] for v in common])
                    ))
            if cell_deltas:
                from scipy import stats as sps

                d = np.asarray(cell_deltas, np.float64)
                se = (float(d.std(ddof=1) / np.sqrt(len(d)))
                      if len(d) > 1 else float("nan"))
                tcrit = (float(sps.t.ppf(0.975, len(d) - 1))
                         if len(d) > 1 else float("inf"))
                summary[name]["paired_vs_flagship"] = {
                    "per_cell_delta_pts": [round(x, 2) for x in d],
                    "mean_delta_pts": round(float(d.mean()), 2),
                    "ci95_pts": [
                        round(float(d.mean()) - tcrit * se, 2),
                        round(float(d.mean()) + tcrit * se, 2),
                    ],
                    "n_cells": len(d),
                }
    out = {
        "protocol": (
            f"parity world (alpha={st.signal_alpha}, noise={st.scene_noise}"
            f", {args.n_videos} videos), folds {fold_idxs} of 5, "
            f"{args.epochs} epochs, "
            f"seeds {sorted({r['seed'] for r in rows})} (per-config rows may "
            "differ), canonical per-annotator knapsack F1; paired deltas "
            "vs flagship over per-(fold,seed)-cell held-out videos; "
            "step times on an 8-virtual-device CPU mesh (1 physical core: "
            "relative, not absolute)"
            + ("; quality cells from backends "
               f"{sorted({r.get('backend', 'cpu') for r in rows})} — "
               "mesh-one cells run stages/experts sequentially with "
               "identical math (tests/test_parallel_pp_ep.py), only "
               "virtual-CPU rows enter the step medians"
               if {r.get("backend", "cpu") for r in rows} != {"cpu"}
               else "")
        ),
        "rows": rows,
        "summary": summary,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
