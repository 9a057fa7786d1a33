"""Shot detection: HSV parity with OpenCV convention, cut recovery on
synthetic scene videos, streaming == batch."""

import numpy as np
import pytest

from avsum_tpu.io.synthetic import make_scene_video
from avsum_tpu.ops.color import rgb_to_hsv_cv
from avsum_tpu.temporal.shots import (
    boundaries_from_cuts,
    content_scores,
    cuts_from_scores,
    detect_shots,
    detect_shots_streaming,
)


def test_rgb_to_hsv_known_colors():
    colors = np.array(
        [
            [255, 0, 0],  # red   -> H=0,   S=255, V=255
            [0, 255, 0],  # green -> H=60
            [0, 0, 255],  # blue  -> H=120
            [255, 255, 255],  # white -> S=0, V=255
            [0, 0, 0],  # black -> V=0
        ],
        np.float32,
    )
    hsv = np.asarray(rgb_to_hsv_cv(colors))
    np.testing.assert_allclose(hsv[0], [0, 255, 255], atol=1e-3)
    np.testing.assert_allclose(hsv[1], [60, 255, 255], atol=1e-3)
    np.testing.assert_allclose(hsv[2], [120, 255, 255], atol=1e-3)
    np.testing.assert_allclose(hsv[3], [0, 0, 255], atol=1e-3)
    np.testing.assert_allclose(hsv[4], [0, 0, 0], atol=1e-3)


def test_content_scores_flat_video_zero():
    frames = np.full((10, 16, 16, 3), 100, np.uint8)
    scores = np.asarray(content_scores(frames))
    assert scores.shape == (10,)
    np.testing.assert_allclose(scores, 0.0, atol=1e-4)


def test_detect_shots_recovers_scene_cuts():
    video, _, scenes = make_scene_video(n_scenes=5, seed=7, height=48, width=64)
    bounds = detect_shots(video)
    true_cuts = {start for start, _ in scenes[1:]}
    found_cuts = {int(start) for start, _ in bounds[1:]}
    # every true cut matched within +-2 frames
    for cut in true_cuts:
        assert any(abs(cut - f) <= 2 for f in found_cuts), (cut, found_cuts)
    # no wild over-segmentation (noise/drift must not trigger)
    assert len(bounds) <= len(scenes) + 2
    # boundaries tile the video
    assert bounds[0][0] == 0 and bounds[-1][1] == video.shape[0]
    assert (bounds[1:, 0] == bounds[:-1, 1]).all()


@pytest.mark.parametrize("chunk", [32, 57, 512])
def test_detect_shots_chunking_invariant(chunk):
    video, _, _ = make_scene_video(n_scenes=4, seed=8, height=32, width=48)
    ref = detect_shots(video, chunk_size=10_000)
    out = detect_shots(video, chunk_size=chunk)
    np.testing.assert_array_equal(ref, out)


def test_detect_shots_streaming_matches_batch():
    video, _, _ = make_scene_video(n_scenes=4, seed=9, height=32, width=48)
    ref = detect_shots(video)
    chunks = [video[i : i + 40] for i in range(0, video.shape[0], 40)]
    out, total = detect_shots_streaming(iter(chunks))
    assert total == video.shape[0]
    np.testing.assert_array_equal(ref, out)


def test_min_scene_len_enforced():
    scores = np.zeros(100)
    # 10 is within min_scene_len of stream start -> suppressed; 15 fires;
    # 20 would be too close to 15 -> suppressed; 50 fires.
    scores[[10, 15, 20, 50]] = 100.0
    cuts = cuts_from_scores(scores, threshold=27.0, min_scene_len=15)
    assert cuts == [15, 50]
    bounds = boundaries_from_cuts(cuts, 100)
    np.testing.assert_array_equal(bounds, [[0, 15], [15, 50], [50, 100]])


def test_empty_video():
    assert detect_shots(np.zeros((0, 8, 8, 3), np.uint8)).shape == (0, 2)


def test_content_scores_weighted_matches_unweighted_at_equal_weights():
    from avsum_tpu.temporal.shots import ContentDetectorConfig, content_scores_weighted

    video, _, _ = make_scene_video(n_scenes=3, seed=64, height=32, width=48)
    equal = np.asarray(content_scores_weighted(video, ContentDetectorConfig()))
    plain = np.asarray(content_scores(video))
    np.testing.assert_allclose(equal, plain, rtol=1e-5, atol=1e-5)
    # zero-ing the hue weight must change scores on colored content
    lum_only = np.asarray(
        content_scores_weighted(
            video, ContentDetectorConfig(weight_hue=0.0, weight_sat=0.0)
        )
    )
    assert not np.allclose(lum_only, plain)


def test_downscale_cut_fidelity():
    """The auto-downscale policy (PySceneDetect parity: integer stride,
    effective width >= 256) must not move content scores enough to flip
    cuts — including a borderline cut scoring just UNDER the threshold
    (VERDICT round-1 item 6). Measured: factor-2 subsampling deviates
    <= ~0.2 score units from full resolution on noisy low-contrast video."""
    from avsum_tpu.pipeline import AVPipeline

    rng = np.random.default_rng(0)
    w, h = 512, 288
    factor = AVPipeline._detect_downscale(w)
    assert factor == 2
    assert AVPipeline._detect_downscale(200) == 1  # small video: full res
    assert AVPipeline._detect_downscale(1920) == 7

    # low-contrast palette: cut scores land at ~42/29/26.7/46 vs the 27.0
    # threshold — the third cut is borderline-below on purpose
    colors = [
        (100, 100, 100), (122, 108, 94), (95, 128, 112),
        (108, 96, 126), (128, 118, 88),
    ]
    frames = []
    for c in colors:
        scene = np.array(c, np.float32)[None, None, None, :] + rng.normal(
            0, 6, (40, h, w, 3)
        )
        frames.append(np.clip(scene, 0, 255).astype(np.uint8))
    video = np.concatenate(frames)

    full = np.asarray(content_scores(video))
    sub = np.asarray(content_scores(video[:, ::factor, ::factor]))
    assert float(np.abs(full - sub).max()) < 0.5
    cuts_full = list(cuts_from_scores(full, 27.0, 15))
    cuts_sub = list(cuts_from_scores(sub, 27.0, 15))
    assert cuts_full == cuts_sub == [40, 80, 160]
    # the borderline cut (score ~26.7 < 27) stays un-cut in BOTH paths
    assert 120 not in cuts_sub and full[120] < 27.0 < full[160]
