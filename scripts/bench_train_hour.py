"""Hour-scale TRAINING step benchmark (SURVEY.md §5.7; VERDICT r2 #8).

Measures one full AVScorer train step at hour scale (S=7168 shot/frame
tokens = 1 h @ 30 fps sampled at 2 fps) in two modes:

- ``--mode chip`` (default on a TPU backend): single-chip, remat +
  flash-attention custom-VJP backward (no [S,S] materialization either
  direction). Reports steady-state step time and the device's HBM
  high-water mark (``device.memory_stats()``), with and without remat so
  the HBM-vs-FLOPs trade is visible.
- ``--mode mesh``: the seq-sharded path — an 8-device mesh with
  ``seq=8``; every self-attention runs ring mode (K/V rotate via
  ppermute, avsum_tpu/parallel/ring.py) and the sequence axis stays
  sharded end to end. On this image the 8 devices are virtual CPU
  (``--xla_force_host_platform_device_count``), so the step time is a
  schedule-correctness number, not a speed claim; on a real v5e slice
  the same code runs over ICI.

Prints one JSON line per measured configuration.
Run: python scripts/bench_train_hour.py [--mode chip|mesh|both] [--seq 7168]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def hbm_high_water(device) -> int:
    try:
        stats = device.memory_stats() or {}
        return int(stats.get("peak_bytes_in_use", 0))
    except Exception:  # noqa: BLE001 — CPU backends have no memory_stats
        return 0


def measure(mesh, model_cfg, train_cfg, seq_len: int, label: str,
            steps: int = 5, batch_videos: int = 1):
    import jax
    import numpy as np

    from avsum_tpu.models import make_model
    from avsum_tpu.train.steps import (
        create_train_state,
        make_train_step,
        shard_batch_dict,
    )

    model = make_model(model_cfg)
    rng = np.random.default_rng(0)
    b = batch_videos
    batch = {
        "visual": rng.standard_normal((b, seq_len, model_cfg.visual_dim)).astype(
            np.float32
        ),
        "audio": rng.standard_normal((b, seq_len, model_cfg.audio_dim)).astype(
            np.float32
        ),
        "targets": rng.random((b, seq_len)).astype(np.float32),
        "mask": np.ones((b, seq_len), np.float32),
    }
    state = create_train_state(model, train_cfg, batch, total_steps=100)
    step = make_train_step(model, mesh, seed=0)
    if mesh is not None:
        batch = shard_batch_dict(batch, mesh)

    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        jax.block_until_ready(metrics["loss"])
        times.append(time.perf_counter() - t0)
    dev = jax.devices()[0]
    result = {
        "bench": "hour_scale_train_step",
        "label": label,
        "seq_len": seq_len,
        "backend": jax.default_backend(),
        "n_devices": 1 if mesh is None else int(mesh.size),
        "step_ms": round(1e3 * min(times), 1),
        "steps_ms": [round(1e3 * t, 1) for t in times],
        "compile_s": round(compile_s, 1),
        "hbm_peak_mib": round(hbm_high_water(dev) / 2**20, 1),
        "loss": float(metrics["loss"]),
        "tokens_per_s": round(seq_len / min(times)),
    }
    log(f"{label}: {result['step_ms']} ms/step, HBM peak {result['hbm_peak_mib']} MiB")
    print(json.dumps(result), flush=True)
    return result


def scaling_tables(args) -> int:
    """VERDICT r3 item 7: DP weak scaling + ring-SP strong scaling over
    1/2/4/8 devices of the virtual CPU mesh. The 8 virtual devices share
    ONE physical core, so the meaningful quantity is the ratio against
    the compute-proportional expectation, not absolute step time:

    - dp-weak: fixed per-device batch; total compute grows with N, so on
      one core the linear-cost expectation is t_N ≈ N * t_1. The row
      reports ``vs_linear_cpu = t_N / (N * t_1)`` — ~1.0 means the only
      cost growth is the compute itself (collectives/resharding add
      nothing pathological); >>1 is a reshard/collective pathology of
      the kind that bit round 2 (48-145x on a 1-device NamedSharding).
    - sp-strong: fixed TOTAL sequence 7168, ring-sharded N ways; total
      compute is ~constant, so flat t_N is ideal and ``vs_flat_cpu =
      t_N / t_1`` exposes ring/transpose overhead directly.
    """
    import jax

    from avsum_tpu.parallel import MeshConfig, build_mesh
    from avsum_tpu.train.config import ModelConfig, TrainConfig

    train_cfg = TrainConfig(lr=1e-4, warmup_steps=5)
    mc = ModelConfig(
        hidden_dim=args.hidden, num_heads=4, temporal_layers=2,
        remat=True, dtype="float32",
    )
    devs = jax.devices()
    rows = []
    if args.mode in ("dp-weak", "scaling"):
        for n in (1, 2, 4, 8):
            mesh = build_mesh(
                MeshConfig(data=n, seq=1, model=1, auto_data=False),
                devices=devs[:n],
            )
            rows.append(
                (n, measure(mesh, mc, train_cfg, args.dp_seq,
                            f"dp_weak_n{n}_b{n}x1", steps=args.steps,
                            batch_videos=n))
            )
        t1 = rows[0][1]["step_ms"]
        for n, r in rows:
            r["vs_linear_cpu"] = round(r["step_ms"] / (n * t1), 2)
            print(json.dumps({"dp_weak": {
                "n_devices": n, "step_ms": r["step_ms"],
                "vs_linear_cpu": r["vs_linear_cpu"]}}), flush=True)
    if args.mode in ("sp-strong", "scaling"):
        sp_rows = []
        for n in (1, 2, 4, 8):
            mesh = build_mesh(
                MeshConfig(data=1, seq=n, model=1, auto_data=False),
                devices=devs[:n],
            )
            sp_rows.append(
                (n, measure(mesh, mc, train_cfg, args.seq,
                            f"sp_strong_n{n}_S{args.seq}",
                            steps=args.steps))
            )
        t1 = sp_rows[0][1]["step_ms"]
        for n, r in sp_rows:
            r["vs_flat_cpu"] = round(r["step_ms"] / t1, 2)
            print(json.dumps({"sp_strong": {
                "n_devices": n, "step_ms": r["step_ms"],
                "vs_flat_cpu": r["vs_flat_cpu"]}}), flush=True)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--mode", default="chip",
        choices=("chip", "mesh", "both", "dp-weak", "sp-strong", "scaling"),
    )
    ap.add_argument("--seq", type=int, default=7168)
    ap.add_argument(
        "--dp-seq", type=int, default=1024,
        help="per-video sequence length for the dp-weak rows (shorter "
        "than --seq so the 8x total-compute row stays tractable on one "
        "physical core)",
    )
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument(
        "--steps", type=int, default=5,
        help="timed steps per row (lower it for the 1-core sp-strong "
        "rows, where one S=7168 step costs minutes)",
    )
    args = ap.parse_args(argv)

    if args.mode in ("mesh", "both", "dp-weak", "sp-strong", "scaling"):
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    import jax

    if args.mode in ("mesh", "dp-weak", "sp-strong", "scaling"):
        jax.config.update("jax_platforms", "cpu")

    if args.mode in ("dp-weak", "sp-strong", "scaling"):
        return scaling_tables(args)

    from avsum_tpu.parallel import MeshConfig, build_mesh
    from avsum_tpu.train.config import ModelConfig, TrainConfig

    train_cfg = TrainConfig(lr=1e-4, warmup_steps=5)

    def model_cfg(remat: bool) -> ModelConfig:
        return ModelConfig(
            hidden_dim=args.hidden,
            num_heads=4,
            temporal_layers=2,
            remat=remat,
            dtype="float32",
        )

    if args.mode in ("chip", "both"):
        measure(None, model_cfg(True), train_cfg, args.seq, "chip_remat_flash")
        measure(None, model_cfg(False), train_cfg, args.seq, "chip_norematerialize")
    if args.mode in ("mesh", "both"):
        mesh = build_mesh(MeshConfig(data=1, seq=8, model=1, auto_data=False))
        measure(mesh, model_cfg(True), train_cfg, args.seq, "mesh_seq8_ring_remat")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
