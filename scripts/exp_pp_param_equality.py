"""Does GPipe pipeline execution change the TRAINED MATH? (round 5)

Bisect for the deep_pp canonical-F1 collapse (PPEP_BENCH.json: 0.32 on
the CPU PP mesh at 100 epochs vs 0.623 at 50 epochs on a 1x1x1 TPU
mesh): train the deep_pp model for a few epochs twice on the SAME
virtual-CPU backend with the SAME seed/batches — once on the GPipe mesh
(data=2, model=4: microbatched pipeline_apply + stage-sharded params),
once on a data=8, model=1 mesh (stages run sequentially via lax.scan) —
and compare every parameter leaf of the final states.

If the leaves match to numerical tolerance, pipeline execution is
math-equal in training (the collapse must be a trajectory/budget
effect); if they diverge structurally, the PP train path has a real
bug that block-level tests (tests/test_parallel_pp_ep.py) missed.

Run: XLA-forced 8-device CPU (the script sets it up itself).
"""

import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np


def train(mesh_ov, epochs, label, extra_overrides=()):
    from avsum_tpu.data.batching import batch_iterator
    from avsum_tpu.models import make_model
    from avsum_tpu.train.config import load_config
    from avsum_tpu.train.trainer import Trainer
    from avsum_tpu.data.synthetic import make_synthetic_videos

    cfg = load_config(overrides=[
        "model.temporal_encoder=attention",
        "model.temporal_layers=12",
        "model.pp_stages=4",
        "model.hidden_dim=64",       # scaled: equality, not quality
        "model.num_heads=4",
        "model.visual_dim=48",
        "model.audio_dim=24",
        *mesh_ov,
        "data.max_shots=16",
        "data.batch_videos=8",
        f"train.epochs={epochs}",
        "train.lr=1e-4",
        "train.seed=0",
        "train.ema_decay=0.98",
        "train.save_every_epochs=1000000",
        f"train.checkpoint_dir=/tmp/pp_eq_ckpt_{label}",
        *extra_overrides,
    ])
    vids = make_synthetic_videos(
        n_videos=16, min_shots=8, max_shots=14,
        visual_dim=48, audio_dim=24, seed=0,
    )

    def batches(epoch=0):
        return batch_iterator(vids, 8, 16, shuffle=True, seed=epoch)

    tr = Trainer(make_model(cfg.model), cfg)
    tr.fit(batches, epochs=epochs)
    print(f"{label}: trained {epochs} epochs", file=sys.stderr, flush=True)
    params = jax.device_get(tr.state.params)
    ema = jax.device_get(tr.state.ema_params) if getattr(
        tr.state, "ema_params", None) is not None else None
    return params, ema


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    pp_params, pp_ema = train(
        ["mesh.data=2", "mesh.seq=1", "mesh.model=4", "mesh.auto_data=false"],
        epochs, "pp-mesh")
    sq_params, sq_ema = train(
        ["mesh.data=8", "mesh.seq=1", "mesh.model=1", "mesh.auto_data=false"],
        epochs, "seq-mesh")

    report = {}
    worst = (None, 0.0)
    flat_pp = jax.tree_util.tree_leaves_with_path(pp_params)
    flat_sq = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(sq_params)}
    for k, a in flat_pp:
        key = jax.tree_util.keystr(k)
        b = flat_sq[key]
        d = float(np.max(np.abs(np.asarray(a, np.float64)
                                - np.asarray(b, np.float64))))
        scale = float(np.max(np.abs(np.asarray(b, np.float64))) or 1.0)
        rel = d / scale
        if rel > worst[1]:
            worst = (key, rel)
        if rel > 1e-3:
            report[key] = {"max_abs": round(d, 6), "rel": round(rel, 6)}
    out = {
        "epochs": epochs,
        "n_leaves": len(flat_pp),
        "n_leaves_over_1e-3_rel": len(report),
        "worst_leaf": worst[0],
        "worst_rel": round(worst[1], 8),
        "diverged_leaves": dict(sorted(report.items())[:20]),
    }
    print(json.dumps(out, indent=1), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
