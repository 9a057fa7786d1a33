"""Frame preprocessing + dual-backbone feature extraction + shot pooling.

Reference behavior (/root/reference/features/extractors.py:43-115): per
shot, loop over frames in micro-batches of 4 on CPU, run ResNet50 and
InceptionV3, mean each stream over frames, concat -> 4096. Known reference
bugs consciously fixed (SURVEY.md §8.3): frames here are RGB (not BGR) and
BOTH backbones get /255 + ImageNet mean/std (the reference skips /255 for
ResNet).

TPU-first structure: all sampled frames of a video form one [F, H, W, 3]
array, embedded in fixed-size jit batches (bf16 convs on the MXU), then
per-shot means are a single ``segment_sum`` — no Python-per-shot loop, no
micro-batch GC churn (extractors.py:94).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from avsum_tpu.train.config import VisualFeatConfig
from avsum_tpu.vision.inception import InceptionV3
from avsum_tpu.vision.resnet import ResNet50

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class TinyBackbone(nn.Module):
    """Small conv stand-in for the dual backbone (same 4096-d contract) —
    used by CPU tests and as a cheap-encoder option; NOT a quality model."""

    out_dim: int = 4096
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = preprocess_frames(frames, 64, self.dtype)
        x = nn.relu(nn.Conv(32, (5, 5), strides=(4, 4), dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), dtype=self.dtype)(x))
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.out_dim, dtype=jnp.float32)(x)


def normalize_frames(frames: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, H, W, 3] RGB (uint8 or [0,255] float) -> /255 + ImageNet
    mean/std, computed in ``dtype``. Normalizing BEFORE the resize is
    mathematically identical (a per-channel affine map commutes with
    bilinear interpolation, whose weights sum to 1) but lets the resize
    run in bf16 — half the HBM traffic on the embed program's biggest
    non-conv op (measured: 21.2% -> 26.5% embed MFU at batch 256,
    scripts/sweep_embed_mfu.py)."""
    x = frames.astype(dtype) / jnp.asarray(255.0, dtype)
    x = x - IMAGENET_MEAN.astype(np.float32)
    x = x / IMAGENET_STD
    return x.astype(dtype)


def preprocess_frames(
    frames: jnp.ndarray, size: int, dtype=jnp.float32
) -> jnp.ndarray:
    """[B, H, W, 3] RGB (uint8 or [0,255] float) -> normalized [B,size,size,3]."""
    x = normalize_frames(frames, dtype)
    b, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (b, size, size, c), method="bilinear")
    return x


class DualBackbone(nn.Module):
    """ResNet50 ‖ InceptionV3 -> [B, 4096] (the visual feature contract,
    extractors.py:108-110). Normalization runs ONCE at the shipped
    resolution and the two per-backbone resizes run in ``dtype`` (see
    normalize_frames for why that's exact and faster)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = normalize_frames(frames, self.dtype)
        b, h, w, c = x.shape

        def rs(t, size):
            if (h, w) == (size, size):
                return t
            return jax.image.resize(t, (b, size, size, c), method="bilinear")

        r = ResNet50(dtype=self.dtype, name="resnet")(rs(x, 224), train)
        i = InceptionV3(dtype=self.dtype, name="inception")(rs(x, 299), train)
        return jnp.concatenate([r, i], axis=-1)


_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def fast_init(model, sample_input, seed: int = 0):
    """Initialize module variables with host-side numpy RNG.

    ``model.init`` traces + compiles an init program; for the dual backbone
    (hundreds of convs) that compile takes minutes on this host. Since the
    backbone weights are random anyway unless a torchvision port is loaded,
    build the pytree from ``jax.eval_shape`` and fill it with fan-in-scaled
    normals (BN scale=1/bias=0/mean=0/var=1) — milliseconds, no compile.
    """
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), sample_input)
    )
    rng = np.random.default_rng(seed)

    def fill(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        shape, dtype = leaf.shape, leaf.dtype
        if name in ("scale", "var"):
            return np.ones(shape, dtype)
        if name in ("bias", "mean"):
            return np.zeros(shape, dtype)
        fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else int(shape[0])
        return (rng.standard_normal(shape) / np.sqrt(max(fan_in, 1))).astype(dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)


def ship_dtype_cast(variables, dtype):
    """Cast float32 leaves to ``dtype`` host-side before shipping.

    With bf16 compute, flax's ``promote_dtype`` casts every f32 param to
    bf16 at use anyway; numpy rounds to nearest even exactly like XLA's
    ConvertElementType, so the shipped values are the same bf16 values
    the compute path declares. (Under jit, XLA's excess-precision folding
    may keep the f32 originals through a cast-at-use conv, so outputs can
    differ from the f32-shipped program within bf16 rounding — inside the
    declared precision of a bf16 path, tests/test_ship_dtype.py.) The
    payoff: half the host->device bytes. On the slow tunnel link the f32
    weight transfer (~210 MB dual backbone, ~290 MB VGGish) dominates
    fresh-process warmup; this cast is where those seconds go. No-op for
    f32 compute or non-f32 leaves.

    ONLY valid for uniform-dtype models (DualBackbone, VGGish) whose
    every layer declares ``dtype``: a mixed-precision module (e.g.
    TinyBackbone's deliberately-f32 Dense head) would have its f32-by-
    design weights silently rounded beyond their declared precision —
    VisualFrontend gates the cast on the model class for that reason.
    """
    if dtype == jnp.float32:
        return variables

    def cast(leaf):
        arr = np.asarray(leaf)
        if arr.dtype == np.float32:
            return arr.astype(dtype)
        return leaf

    return jax.tree_util.tree_map(cast, variables)


class VisualFrontend:
    """Whole-video frame embedding + per-shot mean pooling."""

    def __init__(
        self,
        config: VisualFeatConfig = VisualFeatConfig(),
        variables=None,
        seed: int = 0,
        batch_size: int = 32,
        input_size: int = 224,
        model=None,
        ship_cast: Optional[bool] = None,
    ):
        self.config = config
        self.batch_size = batch_size
        dtype = _DTYPES[config.dtype]
        self.model = model if model is not None else DualBackbone(dtype=dtype)
        if variables is None:
            variables = fast_init(
                self.model,
                np.zeros((1, input_size, input_size, 3), np.float32),
                seed=seed,
            )
        # Pin variables on device ONCE. Passing a host pytree into every
        # jit call re-ships ~hundreds of MB of weights per call — through a
        # slow host link that dominates everything else. For bf16 compute,
        # cast to bf16 BEFORE shipping (same declared precision, half the
        # bytes — see ship_dtype_cast). Gated to uniform-dtype models:
        # mixed-precision ones (TinyBackbone's and ViTBackbone's f32
        # Dense heads, any custom module) keep their f32-by-design
        # leaves intact. make_visual_frontend sets ship_cast per
        # backbone; the default covers direct construction.
        if ship_cast is None:
            ship_cast = isinstance(self.model, DualBackbone)
        if ship_cast:
            variables = ship_dtype_cast(variables, dtype)
        self.variables = jax.device_put(variables)
        self._embed = jax.jit(
            lambda v, f: self.model.apply(v, f, train=False)
        )

        def embed_yuv(variables, y, u, v):
            from avsum_tpu.ops.color import yuv420_to_rgb_device

            r, g, b = yuv420_to_rgb_device(y, u, v)
            frames = jnp.stack([r, g, b], axis=-1)
            return self.model.apply(variables, frames, train=False)

        self._embed_yuv = jax.jit(embed_yuv)

        def embed_packed(variables, buf, h, w):
            # one flat uint8 buffer = [B*h*w | B*(h//2)*(w//2) | same] —
            # a single host->device transfer per batch. Post-execution the
            # axon tunnel serializes transfers at ~40 MB/s with ~29 ms
            # latency EACH; packing 3 plane arrays into one buffer saves
            # two latency hits per batch and one RPC round per plane.
            # The batch is derived from the (static) buffer length, so the
            # same program body serves the full batch AND the power-of-two
            # tail buckets (tail_bucket) — a partial last block pads to
            # its bucket, not to batch_size, keeping shipped bytes tight
            # on the link-bound path.
            per = h * w + 2 * (h // 2) * (w // 2)
            b = buf.shape[0] // per
            ny = b * h * w
            nc = b * (h // 2) * (w // 2)
            y = buf[:ny].reshape(b, h, w)
            u = buf[ny : ny + nc].reshape(b, h // 2, w // 2)
            v = buf[ny + nc : ny + 2 * nc].reshape(b, h // 2, w // 2)
            return embed_yuv(variables, y, u, v)

        self._embed_packed = jax.jit(embed_packed, static_argnums=(2, 3))

    MIN_BUCKET = 32

    def tail_bucket(self, n: int) -> int:
        """Batch bucket for a block of ``n`` frames: ``batch_size`` for
        full blocks, else the smallest power-of-two fraction of it (>=
        MIN_BUCKET) that fits ``n``. Full blocks keep the big-batch MXU
        occupancy (scripts/sweep_embed_mfu.py); the tail block stops
        shipping up to batch_size-1 frames of zero padding over a ~40 MB/s
        link (~0.14 MB/frame at ship 304). At most log2(batch/32)+1
        programs per plane shape ever compile."""
        b = self.batch_size
        while b // 2 >= max(n, self.MIN_BUCKET):
            b //= 2
        return b

    def frame_features(self, frames: np.ndarray) -> np.ndarray:
        """[F, H, W, 3] RGB frames -> [F, 4096], in fixed-size jit batches
        (tail padded to its power-of-two bucket so only O(log batch)
        shapes ever compile). Dispatches stay async on device; a single
        host readback at the end (the per-batch sync would pay the
        host<->device latency ~30x per video)."""
        f = frames.shape[0]
        pending = []
        for i in range(0, f, self.batch_size):
            chunk = frames[i : i + self.batch_size]
            n = chunk.shape[0]
            bucket = self.tail_bucket(n)
            if n < bucket:
                chunk = np.concatenate(
                    [chunk, np.zeros((bucket - n, *chunk.shape[1:]),
                                     chunk.dtype)]
                )
            pending.append(self._embed(self.variables, jnp.asarray(chunk)))
        if not pending:
            return np.zeros((0, self.config.feature_dim), np.float32)
        stacked = jax.device_get(pending)
        return np.concatenate(stacked, axis=0)[:f]

    def dispatch_yuv(self, y: np.ndarray, u: np.ndarray, v: np.ndarray):
        """Enqueue YUV embedding batches asynchronously; returns pending
        device arrays. Host work (e.g. C++ shot detection) can proceed
        while the device computes; collect with :meth:`collect`."""
        f = y.shape[0]
        h, w = y.shape[1], y.shape[2]
        b = self.batch_size
        ny, nc = h * w, (h // 2) * (w // 2)
        pending = []
        for i in range(0, f, b):
            sl = slice(i, i + b)
            yc, uc, vc = y[sl], u[sl], v[sl]
            n = yc.shape[0]
            bb = self.tail_bucket(n)
            # pack the three planes (zero-padded to the block's bucket)
            # into ONE flat uint8 buffer: a single transfer instead of
            # three (see _embed_packed for why that matters on a
            # serialized link)
            buf = np.zeros(bb * (ny + 2 * nc), np.uint8)
            buf[: n * ny] = yc.reshape(-1)
            buf[bb * ny : bb * ny + n * nc] = uc.reshape(-1)
            buf[bb * (ny + nc) : bb * (ny + nc) + n * nc] = vc.reshape(-1)
            pending.append(
                self._embed_packed(self.variables, jnp.asarray(buf), h, w)
            )
        return pending, f

    def dispatch_packed(self, buf: np.ndarray, h: int, w: int):
        """Enqueue ONE pre-packed plane buffer (io.native
        ``read_yuv420_packed`` layout, length ``bucket * (h*w +
        2*(h//2 * w//2))`` for a tail_bucket-valid bucket) — the
        zero-repack fast path: the C++ reader wrote the planes straight
        into this single-transfer layout."""
        per = h * w + 2 * (h // 2) * (w // 2)
        b, rem = divmod(buf.shape[0], per) if buf.ndim == 1 else (0, 1)
        if rem or b <= 0 or (b != self.batch_size and b != self.tail_bucket(b)):
            expect = self.batch_size * per
            raise ValueError(
                f"packed buffer shape {buf.shape} is not a bucket multiple "
                f"of the {h}x{w} plane layout (full batch = ({expect},))"
            )
        return self._embed_packed(self.variables, jnp.asarray(buf), h, w)

    def collect(self, pending, n_frames: int) -> np.ndarray:
        if not pending:
            return np.zeros((0, self.config.feature_dim), np.float32)
        return np.concatenate(jax.device_get(pending), axis=0)[:n_frames]

    def pool_on_device(
        self,
        pending,
        n_frames: int,
        shot_ids: np.ndarray,
        keep: np.ndarray,
        n_shots: int,
        run_ids: Optional[np.ndarray] = None,
        return_device: bool = False,
    ):
        """Segment-pool dispatched frame features ON DEVICE and ship only
        the [n_shots, D] result (+counts) — for long videos the raw
        [F, D] feature readback dominates the pipeline on a slow link.

        shot_ids/keep: per-sampled-frame shot assignment and cap mask.
        run_ids: optional per-sampled-frame index into the (deduplicated)
        embedded frames — frame f pools run_ids[f]'s embedding, so pooling
        stays exact over frame counts when only unique frames were shipped
        (visual.dedup_threshold). None = identity (frame f == embedding f).
        Returns (pooled [n_shots, D] f32, counts [n_shots]); with
        ``return_device=True`` the pooled features stay ON device as the
        full bucket-padded [n_bucket+1, D] array (rows >= n_shots are
        padding; the last row is the overflow bin) and only the small
        counts vector is read back — the device-resident scoring fast
        path consumes them without the 2x ~1 MB pooled-feature round
        trip over the link.
        """
        if not pending:
            return (
                np.zeros((n_shots, self.config.feature_dim), np.float32),
                np.zeros(n_shots, np.float32),
            )
        if not hasattr(self, "_pool_jit"):
            def _pool(feats_list, ids, keep_mask, n_seg):
                feats = jnp.concatenate(feats_list, axis=0)
                w = keep_mask.astype(jnp.float32)[:, None]
                sums = jax.ops.segment_sum(
                    feats.astype(jnp.float32) * w, ids, num_segments=n_seg
                )
                counts = jax.ops.segment_sum(
                    w[:, 0], ids, num_segments=n_seg
                )
                return sums / jnp.maximum(counts, 1.0)[:, None], counts

            def _pool_runs(feats_list, runs, ids, keep_mask, n_seg):
                feats = jnp.concatenate(feats_list, axis=0)[runs]
                w = keep_mask.astype(jnp.float32)[:, None]
                sums = jax.ops.segment_sum(
                    feats.astype(jnp.float32) * w, ids, num_segments=n_seg
                )
                counts = jax.ops.segment_sum(
                    w[:, 0], ids, num_segments=n_seg
                )
                return sums / jnp.maximum(counts, 1.0)[:, None], counts

            self._pool_jit = jax.jit(_pool, static_argnames=("n_seg",))
            self._pool_runs_jit = jax.jit(
                _pool_runs, static_argnames=("n_seg",)
            )
        f_pad = sum(p.shape[0] for p in pending)
        # bucket the shot count so one program serves many videos
        n_bucket = max(64, -(-n_shots // 64) * 64)
        if run_ids is None:
            ids = np.full(f_pad, n_bucket, np.int32)  # padding -> overflow bin
            ids[:n_frames] = np.asarray(shot_ids, np.int32)
            keep_p = np.zeros(f_pad, np.float32)
            keep_p[:n_frames] = np.asarray(keep, np.float32)
            pooled, counts = self._pool_jit(
                tuple(pending), jnp.asarray(ids), jnp.asarray(keep_p),
                n_bucket + 1,
            )
        else:
            # original-frame axis padded to its own bucket (batch_size
            # multiples) so program count stays O(log F) per dataset
            g_pad = max(self.batch_size, -(-n_frames // self.batch_size) * self.batch_size)
            runs = np.zeros(g_pad, np.int32)
            runs[:n_frames] = np.asarray(run_ids, np.int32)
            ids = np.full(g_pad, n_bucket, np.int32)
            ids[:n_frames] = np.asarray(shot_ids, np.int32)
            keep_p = np.zeros(g_pad, np.float32)
            keep_p[:n_frames] = np.asarray(keep, np.float32)
            pooled, counts = self._pool_runs_jit(
                tuple(pending), jnp.asarray(runs), jnp.asarray(ids),
                jnp.asarray(keep_p), n_bucket + 1,
            )
        if return_device:
            # hand back DEVICE counts with the host copy already in
            # flight: the caller can dispatch more device work (audio
            # pool, scorer) under the pool program + readback latency
            # instead of blocking here (counts is the only host-side
            # dependency, and only for the rare missing-shot repair)
            try:
                counts.copy_to_host_async()
            except AttributeError:  # non-jax array (tests/stubs)
                pass
            return pooled, counts
        counts = np.asarray(counts)[:n_shots]
        pooled = np.asarray(pooled)[:n_shots]
        return pooled, counts

    def frame_features_yuv(self, y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
        """YUV420-plane variant of frame_features (half the shipped bytes)."""
        pending, f = self.dispatch_yuv(y, u, v)
        return self.collect(pending, f)

    def shot_features(
        self,
        frames: np.ndarray,
        frame_shot_ids: np.ndarray,
        n_shots: int,
        yuv=None,
    ) -> np.ndarray:
        """Frames tagged with their shot id -> [n_shots, 4096] mean-pooled.
        Shots with no sampled frames get zeros (the reference's empty-shot
        fallback, extractors.py:44-45). Pass ``yuv=(y,u,v)`` planes (and
        frames=None) to use the cheap-transfer YUV path."""
        feats = (
            self.frame_features_yuv(*yuv)
            if yuv is not None
            else self.frame_features(frames)
        )
        ids = np.asarray(frame_shot_ids, np.int64)
        sums = np.zeros((n_shots, feats.shape[1]), np.float32)
        counts = np.zeros(n_shots, np.float32)
        np.add.at(sums, ids, feats)
        np.add.at(counts, ids, 1.0)
        return sums / np.maximum(counts, 1.0)[:, None]


def make_visual_frontend(
    config: VisualFeatConfig = VisualFeatConfig(), **kwargs
) -> "VisualFrontend":
    """Build the frontend for config.backbone: dual | resnet50 | tiny."""
    dtype = _DTYPES[config.dtype]
    if config.backbone == "dual":
        model = None  # DualBackbone default
    elif config.backbone == "resnet50":
        from avsum_tpu.vision.resnet import ResNet50

        if config.feature_dim != 2048:
            raise ValueError(
                "backbone 'resnet50' natively emits 2048-d features; set "
                "visual.feature_dim=2048 and model.visual_dim=2048 (done "
                "automatically by load_config when left at defaults) — the "
                "4096 contract is the dual-backbone concat (extractors.py:108)"
            )

        class _ResNetOnly(nn.Module):
            @nn.compact
            def __call__(self, frames, train: bool = False):
                x = preprocess_frames(frames, 224, dtype)
                return ResNet50(dtype=dtype, name="resnet")(x, train)

        model = _ResNetOnly()
    elif config.backbone == "vit":
        from avsum_tpu.vision.vit import VIT_VARIANTS, ViTBackbone

        if config.vit_variant not in VIT_VARIANTS:
            raise ValueError(
                f"unknown vit_variant {config.vit_variant!r}; "
                f"options: {sorted(VIT_VARIANTS)}"
            )
        embed, depth, heads, cls = VIT_VARIANTS[config.vit_variant]
        model = ViTBackbone(
            out_dim=config.feature_dim,
            embed_dim=embed,
            depth=depth,
            num_heads=heads,
            cls_token=cls,
            image_size=config.resnet_size,
            dtype=dtype,
        )
    elif config.backbone == "tiny":
        model = TinyBackbone(config.feature_dim, dtype)
    else:
        raise ValueError(f"unknown visual backbone {config.backbone!r}")
    if config.weights and kwargs.get("variables") is None:
        from avsum_tpu.utils.serialization import load_params

        kwargs["variables"] = load_params(config.weights)
    kwargs.setdefault("batch_size", config.batch_size)
    # bf16 weight shipping is exact only for uniform-dtype models;
    # tiny/vit carry deliberately-f32 heads (see ship_dtype_cast)
    kwargs.setdefault("ship_cast", config.backbone in ("dual", "resnet50"))
    return VisualFrontend(config, model=model, **kwargs)


def sample_shot_frames(
    shot_boundaries: np.ndarray,
    frame_stride: int = 3,
    max_frames_per_shot: int = 96,
) -> Tuple[np.ndarray, np.ndarray]:
    """Frame indices to decode for each shot + their shot ids.

    Matches the reference's sampling (every ``frame_stride``-th frame from
    shot start, capped per shot — extractors.py:395-413) without the
    sequential cap-after-read quirk.
    """
    frame_idx, shot_ids = [], []
    for s, (start, end) in enumerate(np.asarray(shot_boundaries, np.int64)):
        idx = np.arange(start, end)[::frame_stride][:max_frames_per_shot]
        frame_idx.append(idx)
        shot_ids.append(np.full(len(idx), s, np.int64))
    if not frame_idx:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(frame_idx), np.concatenate(shot_ids)
