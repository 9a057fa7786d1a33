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
- ``io/``        media I/O (WAV/Y4M/AVSB) incl. native C++ fast path
- ``utils/``     logging, profiling, checkify helpers
- ``cli/``       preprocess | train | evaluate | summarize entry points

Top-level distribution name:
``audiovidsum-a-multi-modal-approach-to-video-summarization-tpu``.
"""

__version__ = "0.1.0"
