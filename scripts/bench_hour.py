"""Hour-scale north-star measurement (BASELINE config 5).

Generates (once, streamed — bounded memory) a TRUE 1-hour 30 fps 640x360
scene video (~37 GB raw Y4M) with a matching 1-hour PCM16 soundtrack,
then measures the full summarize path end-to-end on the real chip.
Target: < 60 s per hour of source video (BASELINE.md).

Run: python scripts/bench_hour.py  [--seconds 3600]
This is the heavyweight companion of bench.py (which the driver runs on
a 2-minute clip); results land in stderr + one JSON line on stdout.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FPS = 30.0
W, H = 640, 360


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def generate(stem: str, seconds: int, seed: int = 7) -> None:
    from avsum_tpu.io.wav import write_wav
    from avsum_tpu.io.y4m import rgb_to_yuv420

    total = int(seconds * FPS)
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    gradient = ((yy / H + xx / W) / 2.0)[..., None].astype(np.float32)
    grad_term = 0.6 + 0.4 * gradient  # [H, W, 1] f32, scene-invariant

    sr = 16000
    audio = np.zeros(int(seconds * sr), np.float32)

    t0 = time.perf_counter()
    written = 0
    prev_color = None
    scene_id = 0
    with open(stem + ".y4m", "wb") as fh:
        fh.write(f"YUV4MPEG2 W{W} H{H} F30:1 Ip A1:1 C420\n".encode())
        while written < total:
            length = min(int(rng.integers(90, 211)), total - written)
            color = rng.integers(0, 256, 3).astype(np.float32)
            while prev_color is not None and np.abs(color - prev_color).mean() < 80:
                color = rng.integers(0, 256, 3).astype(np.float32)
            prev_color = color
            # scene tone
            s0 = int(written / FPS * sr)
            s1 = min(int((written + length) / FPS * sr), len(audio))
            tone = 220.0 * 2.0 ** (float(rng.integers(0, 12)) / 12.0)  # semitone ladder
            tt = np.arange(s1 - s0, dtype=np.float32) / sr
            audio[s0:s1] = 0.4 * np.sin(2 * np.pi * tone * tt)
            audio[s0:s1] += 0.05 * rng.standard_normal(s1 - s0, dtype=np.float32)
            # frames, in bounded chunks. The composition is algebraically
            # the round-2 original — color*(0.6+0.4*grad) + drift +
            # noise*4, same grouping, f32 throughout — restructured
            # (hoisted scene base, in-place adds/clip) to avoid three
            # 84 MB temporaries per block; IEEE commutativity of the
            # final add keeps every pixel BIT-IDENTICAL to the original
            # generator (verified by hashing a 20 s fixture from each).
            base = color[None, None, :] * grad_term  # [H, W, 3]
            for c0 in range(0, length, 32):
                n = min(32, length - c0)
                f_idx = np.arange(c0, c0 + n, dtype=np.float32)
                drift = 10.0 * np.sin(2 * np.pi * f_idx / max(length, 1))
                ab = base[None] + drift[:, None, None, None]
                noise = rng.standard_normal((n, H, W, 3), dtype=np.float32)
                noise *= 4.0
                np.add(noise, ab, out=noise)
                np.clip(noise, 0, 255, out=noise)
                block = noise.astype(np.uint8)
                for i in range(n):
                    yp, up, vp = rgb_to_yuv420(block[i])
                    fh.write(b"FRAME\n")
                    fh.write(yp.tobytes())
                    fh.write(up.tobytes())
                    fh.write(vp.tobytes())
            written += length
            scene_id += 1
            if scene_id % 50 == 0:
                log(
                    f"  gen: {written}/{total} frames "
                    f"({time.perf_counter() - t0:.0f}s)"
                )
    write_wav(stem + ".wav", np.clip(audio, -1, 1), sr)
    log(
        f"generated {written} frames / {scene_id} scenes in "
        f"{time.perf_counter() - t0:.0f}s"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=3600)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    bench_dir = os.path.join(REPO, "bench_data")
    os.makedirs(bench_dir, exist_ok=True)
    stem = os.path.join(bench_dir, f"hour_640x360_{args.seconds}s")
    if not (os.path.exists(stem + ".y4m") and os.path.exists(stem + ".wav")):
        log("generating hour-scale media (one-time, ~30 min)...")
        generate(stem, args.seconds)

    import subprocess

    subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=False)

    import jax

    from avsum_tpu.models import make_model
    from avsum_tpu.pipeline import AVPipeline
    from avsum_tpu.train.config import load_config
    from avsum_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")

    cfg = load_config(
        overrides=["visual.dtype=bfloat16", "visual.backbone=dual"]
    )
    pipeline = AVPipeline(cfg)
    # embed batch: visual.batch_size config default (256, the measured
    # MXU sweet spot — scripts/sweep_embed_mfu.py)

    import jax.numpy as jnp

    model = make_model(cfg.model)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, cfg.model.visual_dim)),
        jnp.zeros((1, 8, cfg.model.audio_dim)),
        jnp.ones((1, 8)),
    )["params"]

    video = stem + ".y4m"
    runs = []
    for i in range(args.runs):
        t0 = time.perf_counter()
        result = pipeline.summarize(video, model, params)
        dt = time.perf_counter() - t0
        runs.append(dt)
        log(
            f"run {i}: {dt:.1f}s ({int(result['n_frames'])} frames, "
            f"{len(result['boundaries'])} shots, "
            f"{len(result['segments'])} summary segments)"
        )
    best = min(runs)
    n = int(result["n_frames"])
    print(
        json.dumps(
            {
                "metric": "hour_scale_wall_s",
                "value": round(best / (n / FPS) * 3600, 1),
                "unit": "s_per_source_hour",
                "vs_baseline": round(60.0 / (best / (n / FPS) * 3600), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
