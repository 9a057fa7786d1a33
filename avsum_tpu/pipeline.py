"""End-to-end pipeline: decode -> shots -> features -> score -> summary.

TPU-native rebuild of the reference's ``AVProcessor.process_video``
(/root/reference/features/extractors.py:298-362) and the preprocess driver
(/root/reference/scripts/preprocess.py:32-89), plus the on-the-fly
summarize path the reference never had (BASELINE config 3).

Structure (host/device split, SURVEY.md §7 hard parts):
- decode happens on host (native C++ prefetch thread when built), frames
  stream to device in blocks
- shot scoring, feature extraction and the scorer model run under jit on
  device with fixed batch shapes
- per-shot pooling is segment arithmetic, not Python loops
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from avsum_tpu.audio.frontend import AudioFrontend
from avsum_tpu.data.cache import FeatureCache
from avsum_tpu.io.video import audio_path_for, open_video
from avsum_tpu.io.wav import load_audio_mono_16k_ship
from avsum_tpu.summary.knapsack import select_summary
from avsum_tpu.temporal.shots import (
    ContentDetectorConfig,
    detect_shots_streaming,
)
from avsum_tpu.train.config import Config
from avsum_tpu.utils.logging import get_logger
from avsum_tpu.utils.profiling import annotate
from avsum_tpu.vision.backbone import (
    VisualFrontend,
    make_visual_frontend,
    sample_shot_frames,
)

log = get_logger("avsum.pipeline")


def _dedup_select(flat, anchor, threshold):
    """Exact greedy dedup over one block of flattened luma frames.

    Keeps frame j iff mean |Δluma| vs the LAST KEPT frame >= threshold
    (identical semantics to a per-frame scan). Vectorized with galloping
    doubling windows per anchor run, so total elementwise work stays
    within 2x one pass over the block whether keeps are sparse (long
    static runs: one window per run) or dense (every frame changes).

    Returns (kept indices list, new anchor or the incoming one).
    """
    n = flat.shape[0]
    keep = []
    j = 0
    while j < n:
        if anchor is None:
            keep.append(j)
            anchor = flat[j]
            j += 1
            continue
        base, w, hit = j, 4, -1
        while base < n:
            end = min(base + w, n)
            d = np.abs(flat[base:end] - anchor).mean(
                axis=1, dtype=np.float32
            )
            h = np.nonzero(d >= threshold)[0]
            if h.size:
                hit = base + int(h[0])
                break
            base, w = end, w * 2
        if hit < 0:
            break  # rest of the block pools into the current run
        keep.append(hit)
        anchor = flat[hit]
        j = hit + 1
    return keep, anchor


@dataclasses.dataclass
class ProcessedVideo:
    video_id: str
    visual: np.ndarray  # [S, 4096]
    audio: np.ndarray  # [S, 296]
    boundaries: np.ndarray  # [S, 2] frames
    fps: float
    n_frames: int


class AVPipeline:
    def __init__(
        self,
        config: Config = Config(),
        visual_frontend: Optional[VisualFrontend] = None,
        audio_frontend: Optional[AudioFrontend] = None,
        detector: Optional[ContentDetectorConfig] = None,
    ):
        self.config = config
        self.visual = visual_frontend or make_visual_frontend(config.visual)
        self.audio = audio_frontend or AudioFrontend(config.audio)
        self.detector = detector or ContentDetectorConfig()
        self._scorer_jit = None
        self._scorer_model = None  # identity key for the cached jit
        self._scorer_fast_jit = None  # device-resident scoring fast path
        self._scorer_fast_model = None

    # ------------------------------------------------------------------
    # decode helpers
    # ------------------------------------------------------------------

    def _stream_blocks(self, reader, block: int = 256) -> Iterator[np.ndarray]:
        if hasattr(reader, "iter_blocks"):  # native prefetched path
            for _, frames in reader.iter_blocks(block_frames=block):
                yield frames
        else:
            buf = []
            for frame in reader.iter_frames():
                buf.append(frame)
                if len(buf) == block:
                    yield np.stack(buf)
                    buf = []
            if buf:
                yield np.stack(buf)

    @staticmethod
    def _detect_downscale(width: int) -> int:
        """Auto-downscale for content scoring, matching PySceneDetect's
        ``compute_downscale_factor`` policy (effective width >= 256 px,
        integer-strided subsampling — the same subsample PySceneDetect
        applies). Round 1 targeted ~100 px effective width; that risked
        flipping borderline low-contrast cuts vs the reference detector
        (extractors.py:388-393 runs ContentDetector defaults), so the
        policy now tracks the reference's. Full-res cut agreement is
        pinned in tests/test_shots.py::test_downscale_cut_fidelity."""
        return max(1, width // 256)

    def _stream_scaled_blocks(
        self, reader, scale: int, block: int = 512
    ) -> Iterator[np.ndarray]:
        if scale > 1 and hasattr(reader, "read_frames_scaled"):
            for start in range(0, reader.n_frames, block):
                idx = range(start, min(start + block, reader.n_frames))
                yield reader.read_frames_scaled(idx, scale)
        else:
            yield from self._stream_blocks(reader, block)

    def _read_yuv(self, reader, idx):
        """Read sampled frames as YUV420 planes, host-resized to
        visual.ship_size when the source is larger (fewer bytes over the
        link; the backbones resize to 224/299 on device regardless)."""
        ship = self.config.visual.ship_size
        if (
            ship
            and hasattr(reader, "read_yuv420_resized")
            and reader.width * reader.height > ship * ship
        ):
            return reader.read_yuv420_resized(idx, ship, ship)
        return reader.read_yuv420(idx)

    def _load_audio(self, video_path: str, duration_s: float) -> np.ndarray:
        """Soundtrack resolution order (extractors.py:364-386 parity):
        <stem>.wav sidecar, then the container's own audio track (PCM mp4
        demuxes natively; compressed codecs — AAC/MP3/... — decode through
        the ffmpeg libraries bundled with OpenCV when present), then the
        config-gated silence substitute."""
        wav_path = audio_path_for(video_path)
        if wav_path is not None:
            return load_audio_mono_16k_ship(wav_path)

        sr = self.config.audio.sample_rate
        silence = np.zeros(max(int(duration_s * sr), sr), np.float32)
        ext = os.path.splitext(video_path)[1].lower()
        if ext in (".mp4", ".mov", ".m4v"):
            from avsum_tpu.io.mp4 import (
                Mp4NoAudioTrack,
                Mp4UnsupportedCodec,
                load_mp4_audio_mono_16k,
            )

            try:
                return load_mp4_audio_mono_16k(video_path)
            except Mp4NoAudioTrack:
                # a video genuinely without a soundtrack: silence is correct
                log.warning("%s has no audio track; using silence", video_path)
                return silence
            except Mp4UnsupportedCodec as e:
                got = self._container_audio(video_path)
                if got is not None:
                    return got
                if self.config.audio.silence_fallback:
                    log.warning("%s; using silence (audio.silence_fallback)", e)
                    return silence
                raise
        elif ext != ".y4m":
            # other containers cv2 can open (avi/mkv/webm/...): the only
            # audio channel is the container itself
            got = self._container_audio(video_path, silence=silence)
            if got is not None:
                return got
        # Y4M cannot carry audio — the sidecar IS the channel
        if self.config.audio.silence_fallback:
            log.warning("no paired audio for %s; using silence", video_path)
            return silence
        raise RuntimeError(
            f"no audio for {video_path!r}: add a <stem>.wav sidecar or set "
            "audio.silence_fallback=true to run video-only"
        )

    @staticmethod
    def _container_audio(
        video_path: str, silence: Optional[np.ndarray] = None
    ) -> Optional[np.ndarray]:
        """Compressed in-container audio via the bundled-ffmpeg backend;
        None when the backend is unavailable or cannot decode (callers
        then apply their own fallback policy)."""
        from avsum_tpu.io.ffaudio import (
            FFAudioError,
            FFNoAudioStream,
            ffmpeg_audio_available,
            load_audio_mono_16k_ff,
        )

        if not ffmpeg_audio_available():
            return None
        try:
            return load_audio_mono_16k_ff(video_path)
        except FFNoAudioStream:
            if silence is not None:
                log.warning(
                    "%s has no audio track; using silence", video_path)
                return silence
            return None
        except FFAudioError as e:
            log.warning("bundled-ffmpeg audio decode failed: %s", e)
            return None

    # ------------------------------------------------------------------
    # feature extraction (the preprocess hot path)
    # ------------------------------------------------------------------

    def process_video(self, video_path: str) -> ProcessedVideo:
        return self._begin_processed(video_path)()

    def _fast_capable(self, reader) -> bool:
        return (
            self.config.visual.sample_fps > 0
            and hasattr(reader, "content_scores")
            and hasattr(reader, "read_yuv420")
        )

    def _begin_processed(self, video_path: str):
        """Open one video and start its processing; returns a zero-arg
        finisher producing the ProcessedVideo. On the native fast path the
        host threads + device dispatch begin NOW (so callers can pipeline
        video i+1 under video i — preprocess sweep, serving worker); other
        readers defer to a synchronous finisher on the already-open reader.
        """
        reader = open_video(video_path)
        video_id = os.path.splitext(os.path.basename(video_path))[0]
        if self._fast_capable(reader):
            try:
                st = self._begin_video(reader, video_id)
            except Exception:
                reader.close()  # _begin_video joined its own threads
                raise

            def _finish():
                try:
                    return self._finish_video(st)
                finally:
                    reader.close()

            return _finish

        def _finish_sync():
            try:
                return self._process_video_classic(reader, video_id)
            finally:
                reader.close()

        return _finish_sync

    def _process_video_classic(self, reader, video_id: str) -> ProcessedVideo:
        """Synchronous decode->detect->features path for readers without the
        native fast interface (streaming detection, whole-read features)."""
        fps, n_frames = reader.fps, reader.n_frames
        with annotate("avsum.shot_detect"):
            scale = self._detect_downscale(reader.width)
            if hasattr(reader, "content_scores"):
                # native host-side path: zero bytes cross the host->TPU
                # link for detection; hierarchical two-pass scoring
                # (exact cuts at ~1/5 the cost of a full fine pass)
                from avsum_tpu.temporal.shots import (
                    boundaries_from_cuts,
                    cuts_from_scores,
                    refined_content_scores,
                )

                scores = refined_content_scores(
                    reader, scale, self.detector.threshold
                )
                cuts = cuts_from_scores(
                    scores, self.detector.threshold, self.detector.min_scene_len
                )
                boundaries = boundaries_from_cuts(cuts, n_frames)
                total = n_frames
            else:
                boundaries, total = detect_shots_streaming(
                    self._stream_scaled_blocks(reader, scale), self.detector
                )
        if total != n_frames:
            n_frames = total
        if len(boundaries) == 0:
            boundaries = np.array([[0, n_frames]], np.int64)

        with annotate("avsum.visual_features"):
            if self.config.visual.sample_fps > 0:
                stride = max(1, round(fps / self.config.visual.sample_fps))
            else:
                stride = self.config.visual.frame_stride
            frame_idx, shot_ids = sample_shot_frames(
                boundaries,
                stride,
                self.config.visual.max_frames_per_shot,
            )
            if hasattr(reader, "read_yuv420"):
                # ship raw YUV420 planes (half the bytes of RGB) and
                # convert on device
                yuv = self._read_yuv(reader, frame_idx)
                visual = self.visual.shot_features(
                    None, shot_ids, len(boundaries), yuv=yuv
                )
            else:
                frames = reader.read_frames(frame_idx)
                visual = self.visual.shot_features(
                    frames, shot_ids, len(boundaries)
                )

        with annotate("avsum.audio_features"):
            waveform = self._load_audio(reader.path, n_frames / fps)
            sr = self.config.audio.sample_rate
            sample_bounds = boundaries.astype(np.float64) / fps * sr
            audio = np.asarray(
                self.audio.shot_features(waveform, sample_bounds)
            )
        return ProcessedVideo(
            video_id=video_id,
            visual=visual.astype(np.float32),
            audio=audio.astype(np.float32),
            boundaries=np.asarray(boundaries, np.int64),
            fps=fps,
            n_frames=n_frames,
        )

    def _process_video_overlapped(self, reader, video_id: str) -> ProcessedVideo:
        """Fast path: uniform sample_fps sampling makes the frame set
        independent of shot boundaries, so the device embeds frames WHILE
        the host C++ computes detection scores. Shot assignment + pooling
        happen after both finish (overlap hides whichever side is shorter).
        """
        return self._finish_video(self._begin_video(reader, video_id))

    def _begin_video(self, reader, video_id: str) -> Dict:
        """Start one video's host threads (detection, wav) and enqueue its
        visual dispatch; returns the in-flight state for _finish_video.
        Splitting begin/finish lets the dataset sweep pipeline video i+1's
        host work under video i's device work (cross-video overlap)."""
        import threading

        from avsum_tpu.temporal.shots import refined_content_scores

        fps, n_frames = reader.fps, reader.n_frames
        stride = max(1, round(fps / self.config.visual.sample_fps))
        frame_idx = np.arange(0, n_frames, stride, dtype=np.int64)
        scale = self._detect_downscale(reader.width)

        # host detection (C++ — releases the GIL) and wav loading run in
        # threads CONCURRENTLY with the device dispatch loop below
        host_work: Dict = {}

        def _detect():
            with annotate("avsum.detect_thread"):
                host_work["scores"] = refined_content_scores(
                    reader, scale, self.detector.threshold
                )

        def _wav():
            try:
                host_work["waveform"] = self._load_audio(reader.path, n_frames / fps)
            except Exception as e:  # propagate across the thread join
                host_work["wav_error"] = e

        det_thread = threading.Thread(target=_detect)
        wav_thread = threading.Thread(target=_wav)
        det_thread.start()
        wav_thread.start()

        try:
            return self._dispatch_visual(reader, video_id, frame_idx, host_work,
                                         det_thread, wav_thread, fps, n_frames)
        except Exception:
            # a failed dispatch must not orphan the host threads (they hold
            # the reader); join before the caller closes it
            det_thread.join()
            wav_thread.join()
            raise

    def _dispatch_visual(
        self, reader, video_id, frame_idx, host_work, det_thread, wav_thread,
        fps, n_frames,
    ) -> Dict:
        with annotate("avsum.visual_dispatch"):
            # block-streamed dispatch: decode/resize block i+1 on host while
            # the device consumes block i (enqueued async). Host memory stays
            # bounded at one block of planes regardless of video length
            # (ROADMAP round-1 deferral 6: true streaming hour-scale ingest).
            bs = self.visual.batch_size
            pending = []
            ded = self.config.visual.dedup_threshold
            run_ids = None
            if ded > 0:
                # adaptive sampling: embed (and ship) a frame only when its
                # luma moved >= threshold vs the last embedded frame; other
                # frames pool their run's embedding (run_ids gather in
                # pool_on_device). Cuts always exceed any sane threshold,
                # so shot structure is preserved. The greedy chain is exact
                # but vectorized per anchor run (_dedup_select) — no
                # per-frame Python loop on the critical path.
                run_ids = np.empty(len(frame_idx), np.int32)
                n_unique = 0
                anchor = None
                bufs: list = []  # [(y, u, v)] kept-plane chunks
                cnt = 0

                def _flush(force=False):
                    nonlocal bufs, cnt
                    while cnt >= bs or (force and cnt > 0):
                        take = min(bs, cnt)
                        ycat = np.concatenate([b[0] for b in bufs])
                        ucat = np.concatenate([b[1] for b in bufs])
                        vcat = np.concatenate([b[2] for b in bufs])
                        block_pending, _ = self.visual.dispatch_yuv(
                            ycat[:take], ucat[:take], vcat[:take]
                        )
                        pending.extend(block_pending)
                        rest = (ycat[take:], ucat[take:], vcat[take:])
                        bufs = [rest] if rest[0].shape[0] else []
                        cnt -= take

                for i in range(0, len(frame_idx), bs):
                    y, u, v = self._read_yuv(reader, frame_idx[i : i + bs])
                    n = y.shape[0]
                    flat = y.reshape(n, -1).astype(np.int16)
                    keep, anchor = _dedup_select(flat, anchor, ded)
                    karr = np.asarray(keep, np.int64)
                    # run id = index of the kept frame this one pools into
                    run_ids[i : i + n] = n_unique - 1 + np.searchsorted(
                        karr, np.arange(n), side="right"
                    )
                    n_unique += len(keep)
                    if len(keep):
                        bufs.append((y[karr], u[karr], v[karr]))
                        cnt += len(keep)
                        _flush()
                _flush(force=True)
                log.debug(
                    "dedup: %d/%d frames shipped", n_unique, len(frame_idx)
                )
            else:
                ship = self.config.visual.ship_size
                packed = (
                    ship
                    and hasattr(reader, "read_yuv420_packed")
                    and reader.width * reader.height > ship * ship
                )
                for i in range(0, len(frame_idx), bs):
                    if packed:
                        # C++ writes the resized planes straight into the
                        # single-transfer packed layout — no host repack.
                        # The tail block packs (and ships) only its
                        # power-of-two bucket, not the full batch.
                        idx_blk = frame_idx[i : i + bs]
                        bkt = self.visual.tail_bucket(len(idx_blk))
                        buf = reader.read_yuv420_packed(
                            idx_blk, ship, ship, bkt
                        )
                        pending.append(
                            self.visual.dispatch_packed(buf, ship, ship)
                        )
                    else:
                        yuv = self._read_yuv(reader, frame_idx[i : i + bs])
                        block_pending, _ = self.visual.dispatch_yuv(*yuv)
                        pending.extend(block_pending)

        return {
            "reader": reader,
            "video_id": video_id,
            "fps": fps,
            "n_frames": n_frames,
            "frame_idx": frame_idx,
            "host_work": host_work,
            "det_thread": det_thread,
            "wav_thread": wav_thread,
            "pending": pending,
            "run_ids": run_ids,
        }

    def _finish_prep(self, st: Dict) -> Dict:
        """Join host threads, dispatch audio, turn detection scores into
        shot boundaries + per-frame shot assignment. Shared by the
        materializing finisher and the device-resident scoring path."""
        from avsum_tpu.temporal.shots import boundaries_from_cuts, cuts_from_scores

        host_work = st["host_work"]
        det_thread, wav_thread = st["det_thread"], st["wav_thread"]
        n_frames, frame_idx = st["n_frames"], st["frame_idx"]

        with annotate("avsum.audio_dispatch"):
            wav_thread.join()
            if "wav_error" in host_work:
                det_thread.join()
                raise host_work["wav_error"]
            audio_full = self.audio.dispatch_full(host_work["waveform"])

        with annotate("avsum.shot_detect_host"):
            det_thread.join()
            cuts = cuts_from_scores(
                host_work["scores"],
                self.detector.threshold,
                self.detector.min_scene_len,
            )
            boundaries = boundaries_from_cuts(cuts, n_frames)
            if len(boundaries) == 0:
                boundaries = np.array([[0, n_frames]], np.int64)

        starts = boundaries[:, 0]
        shot_ids = np.searchsorted(starts, frame_idx, side="right") - 1
        # per-shot cap (reference caps frames per shot, extractors.py:400)
        cap = self.config.visual.max_frames_per_shot
        first_of_shot = np.searchsorted(shot_ids, np.arange(len(boundaries)))
        rank = np.arange(len(frame_idx)) - first_of_shot[shot_ids]
        keep = rank < cap
        return {
            "audio_full": audio_full,
            "boundaries": boundaries,
            "shot_ids": shot_ids,
            "keep": keep,
        }

    def _sample_bounds(self, boundaries: np.ndarray, fps: float) -> np.ndarray:
        sr = self.config.audio.sample_rate
        return boundaries.astype(np.float64) / fps * sr

    def _finish_video(self, st: Dict) -> ProcessedVideo:
        reader = st["reader"]
        fps = st["fps"]
        c = self._finish_prep(st)
        boundaries = c["boundaries"]

        with annotate("avsum.visual_pool"):
            # pooling happens ON DEVICE: only the [S, D] pooled features
            # cross the link instead of the [F, D] raw frame features
            visual, counts = self.visual.pool_on_device(
                st["pending"], len(st["frame_idx"]), c["shot_ids"],
                c["keep"], len(boundaries), run_ids=st["run_ids"],
            )
            # shots shorter than the sampling stride caught no uniform
            # sample; embed their start frames so every shot has at least
            # one (matching the classic path, extractors.py:399-400)
            missing = counts <= 0
            if missing.any():
                extra_idx = boundaries[missing, 0]
                extra_yuv = self._read_yuv(reader, extra_idx)
                visual[missing] = self.visual.frame_features_yuv(*extra_yuv)

        with annotate("avsum.audio_pool"):
            audio = np.asarray(
                self.audio.pool(
                    c["audio_full"], self._sample_bounds(boundaries, fps)
                )
            )

        return ProcessedVideo(
            video_id=st["video_id"],
            visual=visual.astype(np.float32),
            audio=audio.astype(np.float32),
            boundaries=np.asarray(boundaries, np.int64),
            fps=fps,
            n_frames=st["n_frames"],
        )

    def _finish_summary_fast(
        self, st: Dict, model, params, budget_fraction: Optional[float]
    ) -> Dict:
        """Device-resident scoring: pooled features never leave the chip.

        The materializing path round-trips ~2x [S, 4096] over the host
        link (pool readback, then scorer upload); post-execution the axon
        tunnel serializes transfers at ~40 MB/s with ~29 ms latency each,
        so those round trips cost real wall time. Here the bucket-padded
        pooled visual/audio stay on device and feed the scorer directly —
        only the counts vector and the final [S] scores cross the link.
        Falls back to the materializing path when a shot needs the
        missing-sample repair (host decode required).
        """
        import jax

        reader = st["reader"]
        fps, n_frames = st["fps"], st["n_frames"]
        c = self._finish_prep(st)
        boundaries = c["boundaries"]
        n_shots = len(boundaries)

        with annotate("avsum.visual_pool"):
            # counts stays a DEVICE array (host copy in flight): the
            # host thread keeps enqueueing (audio pool, scorer) under
            # the pool program + counts readback latency instead of
            # blocking here — counts only gates the rare repair path
            pooled_dev, counts_dev = self.visual.pool_on_device(
                st["pending"], len(st["frame_idx"]), c["shot_ids"],
                c["keep"], n_shots, run_ids=st["run_ids"],
                return_device=True,
            )
        sb = pooled_dev.shape[0] - 1  # visual pool bucket (64-multiple)

        with annotate("avsum.audio_pool"):
            audio_dev = self.audio.pool(
                c["audio_full"], self._sample_bounds(boundaries, fps),
                s_bucket=sb, return_device=True,
            )

        with annotate("avsum.score_select"):
            params = jax.device_put(params)  # no-op if already resident
            if (self._scorer_fast_jit is None
                    or self._scorer_fast_model is not model):
                import jax.numpy as jnp

                self._scorer_fast_jit = jax.jit(
                    lambda pr, v, a, m: model.apply(
                        {"params": pr},
                        v[None, :-1].astype(jnp.float32),
                        a[None].astype(jnp.float32),
                        m[None],
                    )[0]
                )
                self._scorer_fast_model = model
            mask = np.zeros(sb, np.float32)
            mask[:n_shots] = 1.0
            # dispatch the scorer SPECULATIVELY (missing shots are rare),
            # then materialize counts — the readback rides under the
            # scorer's device time
            scores_dev = self._scorer_fast_jit(
                params, pooled_dev, audio_dev, mask)
            counts = np.asarray(counts_dev)[:n_shots]
            missing = counts <= 0
            if missing.any():
                # rare repair path: materialize, rejoin the classic road
                # (the speculative scores are discarded)
                visual = np.asarray(pooled_dev)[:n_shots]
                extra_idx = boundaries[missing, 0]
                extra_yuv = self._read_yuv(reader, extra_idx)
                visual[missing] = self.visual.frame_features_yuv(*extra_yuv)
                p = ProcessedVideo(
                    video_id=st["video_id"],
                    visual=visual.astype(np.float32),
                    audio=np.asarray(audio_dev)[:n_shots].astype(np.float32),
                    boundaries=np.asarray(boundaries, np.int64),
                    fps=fps,
                    n_frames=n_frames,
                )
                return self._score_summary(p, model, params, budget_fraction)
            scores = np.asarray(scores_dev)[:n_shots]
            return self._select_from_scores(
                st["video_id"], scores, boundaries, fps, n_frames,
                budget_fraction,
            )

    def preprocess_dataset(
        self,
        input_dir: str,
        cache: FeatureCache,
        extensions=(".y4m", ".mp4", ".mov", ".m4v"),
    ) -> List[str]:
        """Sweep a directory into the feature cache. Per-item isolation:
        a failing video is logged and dropped, the sweep continues
        (preprocess.py:60-85 semantics, minus the import-time execution)."""
        from avsum_tpu.data.cache import config_fingerprint

        fp = config_fingerprint(self.config.visual, self.config.audio, self.detector)
        done = []
        names = sorted(
            f for f in os.listdir(input_dir) if f.lower().endswith(extensions)
        )

        def _complete(video_id, finisher):
            import time

            t0 = time.perf_counter()
            try:
                p = finisher()
                self._validate_dims(p)
                cache.put(
                    p.video_id, p.visual, p.audio, p.boundaries, p.fps,
                    p.n_frames, fingerprint=fp,
                )
                done.append(video_id)
                log.info(
                    "cached %s: %d shots (%.1fs, %.0f src fps)",
                    video_id, len(p.boundaries),
                    time.perf_counter() - t0,
                    p.n_frames / max(time.perf_counter() - t0, 1e-9),
                )
            except Exception as e:  # noqa: BLE001 — per-item isolation
                cache.drop(video_id)
                log.error("failed %s: %s", video_id, e)

        in_flight = None  # (video_id, finisher)
        for name in names:
            video_id = os.path.splitext(name)[0]
            if cache.matches(video_id, fp):
                log.info("skip %s (cached)", video_id)
                done.append(video_id)
                continue
            if cache.has(video_id):
                log.info("re-extracting %s (feature config changed)", video_id)
                cache.drop(video_id)
            path = os.path.join(input_dir, name)
            try:
                # fast-path videos begin host threads + device dispatch NOW,
                # so video i+1's host work runs under video i's device work
                finisher = self._begin_processed(path)
            except Exception as e:  # noqa: BLE001 — per-item isolation
                cache.drop(video_id)
                log.error("failed %s: %s", video_id, e)
                continue
            if in_flight is not None:
                _complete(*in_flight)
            in_flight = (video_id, finisher)
        if in_flight is not None:
            _complete(*in_flight)
        return done

    def _validate_dims(self, p: ProcessedVideo) -> None:
        """The reference's dim check (preprocess.py:66-72), with the 296
        contract it declared but could not meet (SURVEY.md §8.1)."""
        if (
            len(p.visual) == 0
            or p.visual.shape[1] != self.config.visual.feature_dim
            or p.audio.shape[1] != self.config.audio.feature_dim
        ):
            raise ValueError(
                f"invalid feature dims {p.visual.shape}/{p.audio.shape}"
            )

    # ------------------------------------------------------------------
    # on-the-fly summarization (no cache, BASELINE config 3)
    # ------------------------------------------------------------------

    def summarize(
        self,
        video_path: str,
        model=None,
        params=None,
        budget_fraction: Optional[float] = None,
    ) -> Dict:
        """raw video -> shot scores -> knapsack summary segments."""
        return self.summarize_begin(
            video_path, model, params, budget_fraction
        )()

    def summarize_begin(
        self,
        video_path: str,
        model=None,
        params=None,
        budget_fraction: Optional[float] = None,
    ):
        """Start one video's summarize (decode dispatch + host threads) and
        return a zero-arg finisher producing the summary dict — so a serving
        loop can overlap video i+1's host work under video i's device work
        (the same begin/finish pipelining preprocess_dataset uses).

        With a Flax model + params on the native fast path, scoring stays
        device-resident (:meth:`_finish_summary_fast`); artifacts and
        scoreless runs take the materializing path."""
        fast_model = (
            model is not None and params is not None
            and hasattr(model, "apply")
        )
        if fast_model:
            reader = open_video(video_path)
            video_id = os.path.splitext(os.path.basename(video_path))[0]
            if self._fast_capable(reader):
                try:
                    st = self._begin_video(reader, video_id)
                except Exception:
                    reader.close()
                    raise

                def _finish_fast():
                    try:
                        return self._finish_summary_fast(
                            st, model, params, budget_fraction
                        )
                    finally:
                        reader.close()

                return _finish_fast
            reader.close()
        fin = self._begin_processed(video_path)
        return lambda: self._score_summary(fin(), model, params, budget_fraction)

    @staticmethod
    def _pad_scorer_inputs(p: ProcessedVideo):
        """Pad the shot axis to a small set of buckets so different videos
        reuse the same compiled scorer program. -> (s, visual, audio, mask)."""
        from avsum_tpu.parallel.mesh import pad_to_multiple

        s = len(p.visual)
        s_pad = pad_to_multiple(s, 32)
        visual = np.zeros((1, s_pad, p.visual.shape[1]), np.float32)
        audio = np.zeros((1, s_pad, p.audio.shape[1]), np.float32)
        mask = np.zeros((1, s_pad), np.float32)
        visual[0, :s] = p.visual
        audio[0, :s] = p.audio
        mask[0, :s] = 1.0
        return s, visual, audio, mask

    def _score_summary(
        self, p: ProcessedVideo, model, params, budget_fraction: Optional[float]
    ) -> Dict:
        with annotate("avsum.score_select"):
            return self._score_summary_impl(p, model, params, budget_fraction)

    def _score_summary_impl(
        self, p: ProcessedVideo, model, params, budget_fraction: Optional[float]
    ) -> Dict:
        import jax

        # an exported artifact (serve/export.py::load_scorer) is a plain
        # callable WITHOUT .apply; a Flax module without params falls through
        # to the scoreless branch (it cannot be called unbound)
        is_artifact = (
            model is not None and params is None
            and callable(model) and not hasattr(model, "apply")
        )
        if is_artifact:
            # weights are baked in, axes are symbolic, so the same padded
            # buckets reuse the artifact's compilation cache
            s, visual, audio, mask = self._pad_scorer_inputs(p)
            scores = np.asarray(model(visual, audio, mask))[0, :s]
        elif model is not None and params is not None:
            params = jax.device_put(params)  # no-op if already resident
            if self._scorer_jit is None or self._scorer_model is not model:
                self._scorer_jit = jax.jit(
                    lambda pr, v, a, m: model.apply({"params": pr}, v, a, m)
                )
                self._scorer_model = model
            s, visual, audio, mask = self._pad_scorer_inputs(p)
            scores = np.asarray(
                self._scorer_jit(params, visual, audio, mask)
            )[0, :s]
        else:
            # scoreless fallback: uniform scores -> summary = longest-fit
            scores = np.ones(len(p.visual), np.float32)
        return self._select_from_scores(
            p.video_id, scores, p.boundaries, p.fps, p.n_frames,
            budget_fraction,
        )

    def _select_from_scores(
        self,
        video_id: str,
        scores: np.ndarray,
        boundaries: np.ndarray,
        fps: float,
        n_frames: int,
        budget_fraction: Optional[float],
    ) -> Dict:
        budget = (
            self.config.summary.budget_fraction
            if budget_fraction is None
            else budget_fraction
        )
        selected, segments = select_summary(
            scores, boundaries, n_frames, budget
        )
        if len(segments) == 0 and len(boundaries) > 0:
            # every shot exceeds the budget (short video / long takes):
            # fall back to the best-scoring shot truncated to the budget
            best = int(np.argmax(scores))
            start = int(boundaries[best, 0])
            end = min(
                int(boundaries[best, 1]),
                start + max(int(budget * n_frames), 1),
            )
            selected = np.zeros(len(boundaries), bool)
            selected[best] = True
            segments = np.array([[start, end]], np.int64)
        return {
            "video_id": video_id,
            "scores": scores,
            "boundaries": np.asarray(boundaries, np.int64),
            "selected": selected,
            "segments": segments,
            "fps": fps,
            "n_frames": n_frames,
        }
