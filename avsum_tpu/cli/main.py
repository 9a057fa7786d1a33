"""CLI entry points: preprocess | train | evaluate | summarize | splits.

Real argparse + config-file + overrides, replacing the reference's
hardcoded, import-time-executing scripts (SURVEY.md §1 L6: preprocess.py
runs at import, train_av_model.py has no __main__ guard, nothing takes
arguments).
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List, Optional

from avsum_tpu.train.config import Config, load_config
from avsum_tpu.utils.logging import get_logger

log = get_logger("avsum.cli")


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument(
        "--set",
        dest="overrides",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="config override, e.g. --set train.lr=3e-4 (repeatable)",
    )


def _config(args) -> Config:
    return load_config(args.config, args.overrides)


def cmd_preprocess(args) -> int:
    cfg = _config(args)
    from avsum_tpu.data.cache import FeatureCache
    from avsum_tpu.pipeline import AVPipeline

    pipeline = AVPipeline(cfg)
    cache = FeatureCache(args.cache_dir or cfg.data.cache_dir)
    done = pipeline.preprocess_dataset(args.input_dir or cfg.data.video_dir, cache)
    log.info("preprocessed %d videos", len(done))
    return 0


def cmd_splits(args) -> int:
    cfg = _config(args)
    from avsum_tpu.data.cache import FeatureCache
    from avsum_tpu.data.splits import create_kfold_splits, create_split, save_splits

    cache = FeatureCache(args.cache_dir or cfg.data.cache_dir)
    ids = cache.video_ids()
    if not ids:
        log.error("no cached videos in %s", cache.cache_dir)
        return 1
    if args.kfold:
        splits = create_kfold_splits(ids, cfg.data.n_folds, cfg.data.split_seed)
    else:
        splits = create_split(ids, seed=cfg.data.split_seed)
    out = args.output or cfg.data.splits_path
    save_splits(splits, out)
    log.info("wrote %s (%d videos)", out, len(ids))
    return 0


def _load_examples(cfg: Config, video_ids=None):
    from avsum_tpu.data.cache import FeatureCache
    from avsum_tpu.data.datasets import (
        load_cached_examples,
        load_summe_examples,
        load_tvsum_examples,
    )

    cache = FeatureCache(cfg.data.cache_dir)
    if cfg.data.dataset == "tvsum":
        return load_tvsum_examples(cache, cfg.data.annotation_path, video_ids)
    if cfg.data.dataset == "summe":
        return load_summe_examples(cache, cfg.data.annotation_path, video_ids)
    return load_cached_examples(cache, video_ids=video_ids)


def cmd_train(args) -> int:
    cfg = _config(args)
    from avsum_tpu.data.batching import batch_iterator
    from avsum_tpu.data.splits import load_splits
    from avsum_tpu.models import make_model
    from avsum_tpu.train.trainer import Trainer

    split = None
    if args.splits:
        splits = load_splits(args.splits)
        split = splits[args.fold] if isinstance(splits, list) else splits
    train_ids = split["train"] if split else None
    examples = _load_examples(cfg, train_ids)
    if not examples:
        log.error("no training examples found (cache empty or ids mismatch)")
        return 1
    log.info("training on %d videos", len(examples))

    steps_per_epoch = max(1, len(examples) // cfg.data.batch_videos)
    trainer = Trainer(
        make_model(cfg.model),
        cfg,
        total_steps=steps_per_epoch * cfg.train.epochs,
    )

    def batches(epoch: int = 0):
        # fold the epoch into the shuffle seed: fresh batch order per epoch
        return batch_iterator(
            examples,
            cfg.data.batch_videos,
            cfg.data.max_shots,
            seed=cfg.train.seed + epoch,
        )

    eval_fn = None
    if split:
        test_examples = _load_examples(cfg, split["test"])
        if test_examples:
            eval_fn = lambda: trainer.evaluate_videos(  # noqa: E731
                batch_iterator(
                    test_examples,
                    cfg.data.batch_videos,
                    cfg.data.max_shots,
                    shuffle=False,
                )
            )
    trainer.init_state(next(iter(batches())))
    start_epoch = 0
    if args.resume and trainer.maybe_restore() is not None:
        start_epoch = int(trainer.last_meta.get("epoch", -1)) + 1
    trainer.fit(batches, eval_fn=eval_fn, start_epoch=start_epoch)
    return 0


def cmd_evaluate(args) -> int:
    cfg = _config(args)
    from avsum_tpu.data.batching import batch_iterator
    from avsum_tpu.data.splits import load_splits
    from avsum_tpu.models import make_model
    from avsum_tpu.train.trainer import Trainer

    video_ids = None
    if args.splits:
        splits = load_splits(args.splits)
        split = splits[args.fold] if isinstance(splits, list) else splits
        video_ids = split["test"]
    examples = _load_examples(cfg, video_ids)
    if not examples:
        log.error("no eval examples found")
        return 1
    trainer = Trainer(make_model(cfg.model), cfg)
    trainer.init_state(
        next(
            iter(
                batch_iterator(
                    examples, cfg.data.batch_videos, cfg.data.max_shots, False
                )
            )
        )
    )
    if trainer.maybe_restore() is None:
        log.warning("no checkpoint found in %s; evaluating random init",
                    cfg.train.checkpoint_dir)
    metrics = trainer.evaluate_videos(
        batch_iterator(examples, cfg.data.batch_videos, cfg.data.max_shots, False)
    )
    if args.canonical:
        metrics.update(_canonical_eval(cfg, trainer, examples))
    print(json.dumps(metrics))
    return 0


def _canonical_eval(cfg: Config, trainer, examples) -> dict:
    """Canonical per-annotator knapsack F1 (summary/protocol.py)."""
    import numpy as np

    from avsum_tpu.summary.protocol import evaluate_canonical

    if cfg.data.dataset == "tvsum":
        from avsum_tpu.data.tvsum import load_tvsum, tvsum_index

        anno = tvsum_index(load_tvsum(cfg.data.annotation_path))
        user_key = "user_frame_scores"
        get_users = lambda v: anno[v].user_scores  # noqa: E731
    elif cfg.data.dataset == "summe":
        from avsum_tpu.data.summe import load_summe_dir

        anno = {v.video_id: v for v in load_summe_dir(cfg.data.annotation_path)}
        user_key = "user_masks"
        get_users = lambda v: anno[v].user_score  # noqa: E731
    else:
        return {}

    videos = []
    for ex in examples:
        if ex.video_id not in anno:
            continue
        # every shot is scored, even past the training bucket: long videos
        # climb the power-of-two bucket ladder inside score_video
        preds = trainer.score_video(ex, cfg.data.max_shots)
        videos.append(
            {
                "pred_shot_scores": preds,
                "boundaries": ex.shot_boundaries,
                "n_frames": ex.n_frames,
                user_key: get_users(ex.video_id),
            }
        )
    return evaluate_canonical(
        videos, cfg.data.dataset, cfg.summary.budget_fraction
    )


def _load_scorer(cfg: Config, checkpoint_dir: str):
    """Restore (model, params) from a checkpoint dir; (None, None) if empty."""
    from avsum_tpu.data.batching import pad_batch
    from avsum_tpu.data.synthetic import make_synthetic_videos
    from avsum_tpu.models import make_model
    from avsum_tpu.train.checkpoint import CheckpointManager
    from avsum_tpu.train.steps import create_train_state

    model = make_model(cfg.model)
    sample = pad_batch(
        make_synthetic_videos(
            1, visual_dim=cfg.model.visual_dim, audio_dim=cfg.model.audio_dim
        ),
        cfg.data.max_shots,
    )
    template = create_train_state(model, cfg.train, sample)
    state, _ = CheckpointManager(checkpoint_dir).restore(template)
    if state is None:
        return None, None
    return model, state.params


def cmd_summarize(args) -> int:
    cfg = _config(args)
    from avsum_tpu.pipeline import AVPipeline

    pipeline = AVPipeline(cfg)
    if getattr(args, "programs", None):
        from avsum_tpu.serve.aot import load_pipeline_programs

        n = load_pipeline_programs(pipeline, args.programs)
        log.info("AOT programs: installed %d from %s", n, args.programs)
    model = params = None
    if args.checkpoint:
        model, params = _load_scorer(cfg, args.checkpoint)
        if model is None:
            log.error("no checkpoint in %s", args.checkpoint)
            return 1
    import os

    def run_one(path):
        result = pipeline.summarize(path, model, params)
        return {
            "video_id": result["video_id"],
            "n_frames": int(result["n_frames"]),
            "fps": float(result["fps"]),
            "segments": [[int(a), int(b)] for a, b in result["segments"]],
            "shot_scores": [float(s) for s in result["scores"]],
        }

    if os.path.isdir(args.video):
        # batch/serving mode: one summary json per video in the directory
        out_dir = args.output or "summaries"
        os.makedirs(out_dir, exist_ok=True)
        n_ok = 0
        for name in sorted(os.listdir(args.video)):
            if not name.lower().endswith((".y4m", ".mp4")):
                continue
            try:
                out = run_one(os.path.join(args.video, name))
                with open(
                    os.path.join(out_dir, out["video_id"] + ".json"), "w"
                ) as fh:
                    json.dump(out, fh, indent=1)
                n_ok += 1
            except Exception as e:  # noqa: BLE001 — per-item isolation
                log.error("failed %s: %s", name, e)
        log.info("summarized %d videos -> %s", n_ok, out_dir)
        return 0 if n_ok else 1

    out = run_one(args.video)
    if args.render:
        from avsum_tpu.summary.render import render_summary

        stem, ext = os.path.splitext(args.render)
        if ext.lower() == ".mp4":
            render_summary(
                args.video, out["segments"], stem, container="mp4")
        else:
            render_summary(args.video, out["segments"], args.render)
    if args.output:
        with open(args.output, "w") as fh:
            json.dump(out, fh, indent=1)
        log.info("wrote %s", args.output)
    else:
        print(json.dumps(out))
    return 0


def cmd_serve(args) -> int:
    cfg = _config(args)
    from avsum_tpu.serve import ServeConfig, SummarizeServer

    model = params = None
    if args.artifact:
        from avsum_tpu.serve.export import load_scorer

        with open(args.artifact, "rb") as fh:
            model = load_scorer(fh.read())  # params stay None: baked in
    elif args.checkpoint:
        model, params = _load_scorer(cfg, args.checkpoint)
        if model is None:
            log.error("no checkpoint in %s", args.checkpoint)
            return 1
    server = SummarizeServer(
        cfg,
        ServeConfig(
            host=args.host,
            port=args.port,
            warmup=not args.no_warmup,
            access_log=args.access_log or "",
            media_root=args.media_root or "",
            max_queue=args.max_queue,
            request_timeout_s=args.request_timeout,
            max_upload_mb=args.max_upload_mb,
            programs_dir=args.programs or "",
        ),
        model=model,
        params=params,
    )
    server.start(block=True)
    return 0


def cmd_export(args) -> int:
    cfg = _config(args)
    from avsum_tpu.serve.export import export_scorer

    if args.checkpoint:
        model, params = _load_scorer(cfg, args.checkpoint)
        if model is None:
            log.error("no checkpoint in %s", args.checkpoint)
            return 1
    elif args.random_init:
        import jax
        import jax.numpy as jnp

        from avsum_tpu.models import make_model

        model = make_model(cfg.model)
        params = model.init(
            jax.random.PRNGKey(cfg.train.seed),
            jnp.zeros((1, 8, cfg.model.visual_dim)),
            jnp.zeros((1, 8, cfg.model.audio_dim)),
            jnp.ones((1, 8)),
        )["params"]
        log.warning("exporting RANDOM-INIT weights (--random-init)")
    else:
        log.error("pass --checkpoint (or --random-init for a smoke artifact)")
        return 1
    blob = export_scorer(
        model, params, cfg.model.visual_dim, cfg.model.audio_dim,
        platforms=tuple(args.platforms.split(",")),
    )
    with open(args.output, "wb") as fh:
        fh.write(blob)
    log.info("wrote %s (%d bytes)", args.output, len(blob))
    return 0


def cmd_export_programs(args) -> int:
    """AOT-export the expensive pipeline programs (embed + audio frontend)
    so fresh processes skip trace/lower (and, where the PjRt plugin
    supports executable serialization, the backend compile too). The
    reference recompiles nothing because it has no compiler — its cost is
    paid per frame forever (/root/reference/features/extractors.py:43-115);
    ours is paid once here."""
    cfg = _config(args)
    from avsum_tpu.pipeline import AVPipeline
    from avsum_tpu.serve.aot import export_pipeline_programs

    pipeline = AVPipeline(cfg)
    plane_shapes = None
    if args.plane_shapes:
        plane_shapes = []
        for tok in args.plane_shapes.split(","):
            h, w = tok.lower().split("x")
            plane_shapes.append((int(h), int(w)))
    wave_seconds = [float(t) for t in args.wave_seconds.split(",")]
    manifest = export_pipeline_programs(
        pipeline,
        args.output,
        plane_shapes=plane_shapes,
        wave_seconds=wave_seconds,
        platforms=tuple(args.platforms.split(",")),
        mode=args.mode,
    )
    log.info(
        "wrote %d program artifacts (mode=%s) -> %s",
        len(manifest["programs"]), manifest["mode"], args.output,
    )
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        prog="avsum",
        description="TPU-native audio-visual video summarization framework",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("preprocess", help="extract features into the cache")
    _add_common(p)
    p.add_argument("--input-dir", default=None)
    p.add_argument("--cache-dir", default=None)
    p.set_defaults(fn=cmd_preprocess)

    p = sub.add_parser("splits", help="create seeded train/test splits")
    _add_common(p)
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--output", default=None)
    p.add_argument("--kfold", action="store_true", help="canonical k-fold")
    p.set_defaults(fn=cmd_splits)

    p = sub.add_parser("train", help="train the scorer")
    _add_common(p)
    p.add_argument("--splits", default=None)
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("evaluate", help="evaluate a checkpoint")
    _add_common(p)
    p.add_argument("--splits", default=None)
    p.add_argument("--fold", type=int, default=0)
    p.add_argument(
        "--canonical",
        action="store_true",
        help="also compute the canonical per-annotator knapsack F1",
    )
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser(
        "summarize", help="summarize a video (or a directory of videos)"
    )
    _add_common(p)
    p.add_argument("video", help="video file or directory (batch mode)")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", default=None)
    p.add_argument(
        "--render",
        default=None,
        metavar="OUT_STEM",
        help="also write the summary media to OUT_STEM.y4m/.wav, or to a "
        "single shareable mp4 (MJPEG + AAC) when OUT_STEM ends in .mp4",
    )
    p.add_argument(
        "--programs",
        default=None,
        metavar="DIR",
        help="load AOT pipeline-program artifacts (avsum export-programs) "
        "instead of compiling the embed/audio programs from scratch",
    )
    p.set_defaults(fn=cmd_summarize)

    p = sub.add_parser(
        "serve", help="run the HTTP summarization service (avsum_tpu.serve)"
    )
    _add_common(p)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--checkpoint", default=None)
    p.add_argument(
        "--artifact",
        default=None,
        help="serve from an exported StableHLO scorer (avsum export) "
        "instead of a checkpoint — no model code or restore needed",
    )
    p.add_argument(
        "--no-warmup",
        action="store_true",
        help="skip the synthetic pre-compile warmup before readiness",
    )
    p.add_argument(
        "--access-log",
        default=None,
        metavar="PATH",
        help="JSONL access log (one line per summarize request)",
    )
    p.add_argument(
        "--media-root",
        default=None,
        metavar="DIR",
        help="only serve media under this directory (required practice "
        "for non-loopback --host; 403 outside it)",
    )
    p.add_argument(
        "--max-queue",
        type=int,
        default=64,
        help="admission-control bound on queued requests (429 beyond; "
        "0 = unbounded)",
    )
    p.add_argument(
        "--request-timeout",
        type=float,
        default=0.0,
        metavar="SECONDS",
        help="per-request wall-clock budget (504 past it; 0 = none)",
    )
    p.add_argument(
        "--max-upload-mb",
        type=int,
        default=512,
        help="largest media body for POST /v1/summarize/upload "
        "(413 beyond; 0 disables the upload endpoint)",
    )
    p.add_argument(
        "--programs",
        default=None,
        metavar="DIR",
        help="load AOT pipeline-program artifacts (avsum export-programs) "
        "at startup — cuts cold-start compile time for fresh server "
        "processes",
    )
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser(
        "export",
        help="export the scorer as a serialized StableHLO artifact "
        "(weights baked in, symbolic batch/shot axes)",
    )
    _add_common(p)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--platforms", default="cpu,tpu")
    p.add_argument("--random-init", action="store_true")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser(
        "export-programs",
        help="AOT-export the expensive pipeline programs (dual-backbone "
        "embed + audio front-end) as jax.export / serialized-executable "
        "artifacts for fast fresh-process starts",
    )
    _add_common(p)
    p.add_argument("--output", required=True, metavar="DIR")
    p.add_argument(
        "--plane-shapes",
        default=None,
        help="comma list of HxW shipped-plane shapes (default: the "
        "config's ship bucket, e.g. 304x304)",
    )
    p.add_argument(
        "--wave-seconds",
        default="120",
        help="comma list of media durations (s); each becomes a pow2 "
        "waveform bucket artifact",
    )
    p.add_argument("--platforms", default="cpu,tpu")
    p.add_argument(
        "--mode",
        default="auto",
        choices=["auto", "stablehlo", "exec"],
        help="exec = pickle the compiled executable (true warm start; "
        "needs plugin support, probed when auto)",
    )
    p.set_defaults(fn=cmd_export_programs)

    args = parser.parse_args(argv)
    import os

    plat = os.environ.get("AVSUM_PLATFORM")
    if plat:
        # unlike the JAX_PLATFORMS env var (which some PJRT plugins ignore),
        # the config API reliably selects the platform pre-initialization
        import jax

        jax.config.update("jax_platforms", plat)
    from avsum_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
