"""A/B the production embed batch size end-to-end (VERDICT r4 item 7).

The round-4 MFU sweep showed the embed PROGRAM at 30.8/31.4% MFU for
batches 384/512 vs 26.5-30.3% at 256, but production stayed at 256 to
bound tail padding over the link — before tail-bucketed dispatch landed.
With tail buckets, a video's last block ships its power-of-two bucket
regardless of batch size, so the padding argument is gone and a larger
batch means FEWER link transfers (each ~29 ms latency). This script
interleaves full pipeline.summarize runs at the candidate batch sizes on
the bench clip in ONE process/window (A/B/A/B...), so the tunnel weather
that dominates absolute numbers cancels out of the comparison.

Run: python scripts/ab_embed_batch.py --batches 256,512 --rounds 4
Writes one JSON line with per-batch best/median wall seconds and the
per-stage split of each best run; summaries are asserted identical.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="256,512")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    # reuse the bench's media + pipeline construction path
    import bench

    bench.ensure_media()
    video = bench.STEM + ".y4m"
    from avsum_tpu.models import make_model
    from avsum_tpu.train.config import load_config
    from avsum_tpu.pipeline import AVPipeline
    from avsum_tpu.utils.profiling import collect_stages

    results = {b: [] for b in batches}
    stages_best = {}
    segments = {}
    pipelines = {}
    import jax

    for b in batches:
        # identical to bench.build_pipeline() except the embed batch
        cfg = load_config(overrides=[
            "visual.dtype=bfloat16",
            "visual.backbone=dual",
            "audio.dtype=bfloat16",
            f"visual.batch_size={b}",
        ])
        model = make_model(cfg.model)
        import jax.random as jr
        import jax.numpy as jnp

        params = model.init(
            jr.PRNGKey(0),
            jnp.zeros((1, 8, cfg.model.visual_dim)),
            jnp.zeros((1, 8, cfg.model.audio_dim)),
            jnp.ones((1, 8)),
        )["params"]
        pipelines[b] = (AVPipeline(cfg), model, params)
        # warm every program (compile excluded from timing)
        t0 = time.perf_counter()
        r = pipelines[b][0].summarize(video, model, params)
        print(json.dumps({"warm_batch": b,
                          "warmup_s": round(time.perf_counter() - t0, 1)}),
              file=sys.stderr, flush=True)
        segments[b] = np.asarray(r["segments"])

    base = segments[batches[0]]
    for b in batches[1:]:
        assert np.array_equal(segments[b], base), (
            f"segments differ for batch {b}")

    for rnd in range(args.rounds):
        for b in batches:
            pipe, model, params = pipelines[b]
            with collect_stages() as st:
                t0 = time.perf_counter()
                pipe.summarize(video, model, params)
                dt = time.perf_counter() - t0
            results[b].append(dt)
            if (b not in stages_best
                    or dt < min(results[b][:-1], default=1e9)):
                stages_best[b] = {
                    k.split(".")[-1]: round(v, 3) for k, v in st.items()}
            print(json.dumps({"round": rnd, "batch": b,
                              "wall_s": round(dt, 3)}),
                  file=sys.stderr, flush=True)

    out = {
        "backend": jax.default_backend(),
        "rounds": args.rounds,
        "identical_segments": True,
        "per_batch": {
            str(b): {
                "best_s": round(min(ts), 3),
                "median_s": round(float(np.median(ts)), 3),
                "runs_s": [round(t, 3) for t in ts],
                "best_stages_s": stages_best[b],
            }
            for b, ts in results.items()
        },
    }
    line = json.dumps(out)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
