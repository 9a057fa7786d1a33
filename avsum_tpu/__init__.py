"""avsum_tpu — TPU-native audio-visual video summarization framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
``Research-Implementation/AudioVidSum-A-Multi-Modal-Approach-to-Video-Summarization``
(see SURVEY.md). The reference is a single-GPU PyTorch research pipeline;
this framework re-designs every component TPU-first:

- ``parallel/``  device mesh + sharding policy (SPMD; DP over videos,
  SP/CP over the shot/frame sequence axis, reserved model axis)
- ``ops/``       Pallas kernels + jittable primitives (fused STFT->log-mel,
  flash attention, knapsack DP, DTW, resize, shot-content scoring)
- ``audio/``     audio front-end (log-mel / MFCC / VGGish-style encoder)
- ``vision/``    Flax backbones (ResNet50, InceptionV3, ViT)
- ``temporal/``  shot detection, shot<->annotation alignment, resampling
- ``models/``    attention scorer model families
- ``data/``      TVSum/SumMe parsers, feature cache, splits, batching
- ``train/``     pjit train/eval steps, checkpointing, config
- ``summary/``   knapsack summary selection + evaluation protocol
- ``io/``        media I/O (WAV/Y4M/mp4/AVSB) incl. native C++ fast path
- ``serve/``     HTTP summarization service (production serving surface)
- ``utils/``     logging, profiling, checkify, weight serialization,
  persistent-compilation-cache helpers
- ``cli/``       preprocess | train | evaluate | summarize | serve

Top-level distribution name:
``audiovidsum-a-multi-modal-approach-to-video-summarization-tpu``.
"""

__version__ = "0.1.0"

# Lazy top-level convenience API (keeps `import avsum_tpu` dependency-light)
_EXPORTS = {
    "AVPipeline": ("avsum_tpu.pipeline", "AVPipeline"),
    "AVScorer": ("avsum_tpu.models", "AVScorer"),
    "make_model": ("avsum_tpu.models", "make_model"),
    "Trainer": ("avsum_tpu.train.trainer", "Trainer"),
    "Config": ("avsum_tpu.train.config", "Config"),
    "load_config": ("avsum_tpu.train.config", "load_config"),
    "FeatureCache": ("avsum_tpu.data.cache", "FeatureCache"),
    "build_mesh": ("avsum_tpu.parallel.mesh", "build_mesh"),
    "MeshConfig": ("avsum_tpu.parallel.mesh", "MeshConfig"),
    "select_summary": ("avsum_tpu.summary.knapsack", "select_summary"),
    "evaluate_scores": ("avsum_tpu.summary.metrics", "evaluate_scores"),
    "SummarizeServer": ("avsum_tpu.serve", "SummarizeServer"),
    "ServeConfig": ("avsum_tpu.serve", "ServeConfig"),
    "save_params": ("avsum_tpu.utils.serialization", "save_params"),
    "load_params": ("avsum_tpu.utils.serialization", "load_params"),
}


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        module, attr = _EXPORTS[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'avsum_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_EXPORTS))
