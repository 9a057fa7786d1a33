"""End-to-end benchmark: decode -> shots -> features -> score -> summary.

Prints ONE JSON line:
  {"metric": "e2e_video_fps", "value": N, "unit": "frames/sec",
   "vs_baseline": N / 1800}

The north-star target (BASELINE.md) is 1 hour of 30 fps video end-to-end
in < 60 s on one v5e chip = 1800 source frames/sec; vs_baseline is the
ratio against that target. The measured pipeline is the real one
(full ResNet50+InceptionV3 dual backbone in bf16, 296-d audio features,
flagship AVScorer, knapsack selection), on a cached synthetic 640x360
(TVSum-class resolution) 2-minute scene video. Detailed stage timings go
to stderr.
"""

import json
import os
import sys
import time

BENCH_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_data")
STEM = os.path.join(BENCH_DIR, "bench_640x360_120s")
FPS = 30.0
SECONDS = 120
TARGET_FPS = 1800.0  # 1 h in 60 s


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def ensure_native():
    """Build libavsumio.so if missing/stale (the committed binary may not
    match this machine)."""
    import subprocess

    native_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
    so = os.path.join(native_dir, "libavsumio.so")
    src = os.path.join(native_dir, "avsumio.cc")
    # rebuild decision BEFORE any ctypes load caches a stale library
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        log("building native/libavsumio.so ...")
        subprocess.run(["make", "-C", native_dir], check=False)


def ensure_media():
    os.makedirs(BENCH_DIR, exist_ok=True)
    if os.path.exists(STEM + ".y4m") and os.path.exists(STEM + ".wav"):
        return
    log("generating bench media (one-time)...")
    from avsum_tpu.io.synthetic import write_scene_video

    t0 = time.perf_counter()
    write_scene_video(
        STEM,
        n_scenes=25,
        seed=123,
        fps=FPS,
        height=360,
        width=640,
        scene_len_frames=(90, 210),
    )
    log(f"bench media written in {time.perf_counter() - t0:.1f}s")


def main():
    ensure_native()
    ensure_media()

    import jax

    from avsum_tpu.models import make_model
    from avsum_tpu.pipeline import AVPipeline
    from avsum_tpu.train.config import load_config
    from avsum_tpu.utils.jaxcache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    log(f"compilation cache: {cache_dir}")

    cfg = load_config(
        overrides=[
            "visual.dtype=bfloat16",
            "visual.backbone=dual",
        ]
    )
    pipeline = AVPipeline(cfg)
    pipeline.visual.batch_size = 128

    model = make_model(cfg.model)
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng,
        jnp.zeros((1, 8, cfg.model.visual_dim)),
        jnp.zeros((1, 8, cfg.model.audio_dim)),
        jnp.ones((1, 8)),
    )["params"]

    video = STEM + ".y4m"

    # warmup pass: compiles every jit program (content scores, backbone
    # batches, audio front-end, scorer)
    t0 = time.perf_counter()
    pipeline.summarize(video, model, params)
    log(f"warmup (incl. compile): {time.perf_counter() - t0:.1f}s")

    # measured pass
    runs = []
    for i in range(4):
        t0 = time.perf_counter()
        result = pipeline.summarize(video, model, params)
        dt = time.perf_counter() - t0
        runs.append(dt)
        log(f"run {i}: {dt:.2f}s")

    best = min(runs)
    n_frames = int(result["n_frames"])
    fps = n_frames / best
    log(
        f"{n_frames} frames in {best:.2f}s -> {fps:.0f} eff fps; "
        f"summary {len(result['segments'])} segments"
    )
    print(
        json.dumps(
            {
                "metric": "e2e_video_fps",
                "value": round(fps, 1),
                "unit": "frames/sec",
                "vs_baseline": round(fps / TARGET_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
