"""Adaptive near-duplicate sampling (visual.dedup_threshold).

Fidelity contract: dedup never changes shot boundaries (cuts exceed any
sane threshold), keeps per-shot frame counts exact (run-gather pooling),
and only swaps a run of near-identical embeddings for one representative.
"""

import numpy as np
import pytest

from avsum_tpu.io.native import native_available
from avsum_tpu.io.synthetic import write_scene_video
from avsum_tpu.pipeline import AVPipeline
from avsum_tpu.train.config import load_config

needs_native = pytest.mark.skipif(
    not native_available(), reason="libavsumio.so not built"
)


def _pipeline(threshold, batch_size=8):
    cfg = load_config(
        overrides=[
            "visual.backbone=tiny",
            "visual.dtype=float32",
            "audio.silence_fallback=true",
            f"visual.dedup_threshold={threshold}",
        ]
    )
    p = AVPipeline(cfg)
    p.visual.batch_size = batch_size  # force multi-batch dispatch
    return p


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    stem = str(tmp_path_factory.mktemp("dedup") / "clip")
    write_scene_video(
        stem, n_scenes=4, seed=17, fps=8.0, height=64, width=96,
        scene_len_frames=(24, 40),
    )
    return stem + ".y4m"


@pytest.mark.slow
@needs_native
def test_tiny_threshold_is_exact(video):
    """Per-frame noise always exceeds a tiny threshold -> every frame is
    its own run -> identical features to dedup off (same programs,
    identity gather)."""
    off = _pipeline(0.0).process_video(video)
    tiny = _pipeline(1e-6).process_video(video)
    np.testing.assert_array_equal(off.boundaries, tiny.boundaries)
    np.testing.assert_allclose(off.visual, tiny.visual, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(off.audio, tiny.audio)


@needs_native
def test_moderate_threshold_close_and_same_boundaries(video):
    """A threshold above the noise floor merges intra-scene runs: shot
    boundaries identical, pooled features close (one noise realization
    per run instead of several)."""
    off = _pipeline(0.0).process_video(video)
    ded = _pipeline(12.0).process_video(video)
    np.testing.assert_array_equal(off.boundaries, ded.boundaries)
    assert off.visual.shape == ded.visual.shape
    # cosine similarity per shot stays high
    a = off.visual / np.maximum(np.linalg.norm(off.visual, axis=1, keepdims=True), 1e-9)
    b = ded.visual / np.maximum(np.linalg.norm(ded.visual, axis=1, keepdims=True), 1e-9)
    cos = (a * b).sum(1)
    assert cos.min() > 0.98, cos


@needs_native
def test_dedup_actually_skips_shipping(video, monkeypatch):
    """With a threshold above the noise floor, fewer frames are embedded."""
    p_off = _pipeline(0.0)
    p_on = _pipeline(12.0)
    shipped = {"off": 0, "on": 0}

    def counting(p, key):
        orig = p.visual.dispatch_yuv

        def wrapper(y, u, v):
            shipped[key] += y.shape[0]
            return orig(y, u, v)

        p.visual.dispatch_yuv = wrapper

    counting(p_off, "off")
    counting(p_on, "on")
    p_off.process_video(video)
    p_on.process_video(video)
    assert 0 < shipped["on"] < shipped["off"]


@needs_native
def test_dedup_run_crossing_shot_boundary_pools_correctly(video):
    """Even a huge threshold (everything merges into one run) must keep
    per-shot pooling well-formed: every shot pools ITS frames' run
    embeddings (here: all equal to the single representative)."""
    p = _pipeline(1e9)
    out = p.process_video(video)
    assert np.isfinite(out.visual).all()
    # every shot's pooled feature equals the single run embedding
    ref = out.visual[0]
    for row in out.visual:
        np.testing.assert_allclose(row, ref, rtol=1e-5, atol=1e-5)


def test_dedup_select_matches_naive_chain():
    """The galloping-window selection is exactly the per-frame greedy scan."""
    from avsum_tpu.pipeline import _dedup_select

    rng = np.random.default_rng(7)
    for density in (0.0, 0.1, 0.5, 1.0):
        # build frames whose consecutive diffs cross the threshold with the
        # given density (includes the all-static and all-changing extremes)
        n, hw, thr = 97, 64, 10.0
        frames = np.zeros((n, hw), np.int16)
        level = 0
        for i in range(n):
            if rng.random() < density:
                level += 40
            frames[i] = level + rng.integers(0, 3, hw)

        # naive reference chain
        naive, anchor = [], None
        for j in range(n):
            if anchor is None or float(
                np.mean(np.abs(frames[j] - anchor))
            ) >= thr:
                naive.append(j)
                anchor = frames[j]

        got, _ = _dedup_select(frames, None, thr)
        assert got == naive, (density, got[:10], naive[:10])

        # and with blocks: a carried anchor across block boundaries
        got_blocks, anc = [], None
        for s in range(0, n, 16):
            k, anc = _dedup_select(frames[s : s + 16], anc, thr)
            got_blocks.extend(s + j for j in k)
        assert got_blocks == naive
