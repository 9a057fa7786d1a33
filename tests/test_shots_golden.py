"""Golden shot-detection fidelity (VERDICT r2 #6).

Pins the production detectors — the JAX ``content_scores`` and the native
C++ reader path — against ContentDetector semantics from an INDEPENDENT
oracle (tests/oracle_scenedetect.py: OpenCV's own cvtColor + PySceneDetect's
quantized diff math; the detector the reference runs,
/root/reference/features/extractors.py:388-393):

1. committed golden fixtures (tests/fixtures/shots_golden.npz) so the pin
   holds on hosts with neither cv2 nor scenedetect;
2. a live cv2 cross-check when cv2 is importable.

The oracle quantizes HSV to uint8 (PySceneDetect feeds uint8 planes to
its diff); production scores are float. On saturated content the gap is
<1.0; on noisy near-gray content hue is ill-conditioned and uint8
rounding amplifies, so scores carry an extra 20% relative slack there —
while CUT DECISIONS must match exactly (the pin that matters; fixture
content has clear margins at the threshold).
"""

import os

import numpy as np
import pytest

from avsum_tpu.io.synthetic import make_scene_video
from avsum_tpu.temporal.shots import content_scores, cuts_from_scores

from scripts.gen_shot_fixtures import CLIPS, FIXTURE_PATH, roundtrip_420

SCORE_TOL = 1.0  # uint8 HSV quantization bound (see module docstring)


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(FIXTURE_PATH), (
        "golden fixtures missing — run scripts/gen_shot_fixtures.py"
    )
    return dict(np.load(FIXTURE_PATH, allow_pickle=False))


@pytest.mark.parametrize("name,kwargs", CLIPS)
def test_jax_scores_match_golden(golden, name, kwargs):
    video, _, _ = make_scene_video(**kwargs)
    video = roundtrip_420(video)  # fixtures score container output (4:2:0)
    scores = np.asarray(content_scores(video))
    ref = golden[f"{name}/scores"]
    assert scores.shape == ref.shape
    np.testing.assert_allclose(scores, ref, atol=SCORE_TOL, rtol=0.2)
    assert cuts_from_scores(scores) == golden[f"{name}/cuts"].tolist()


@pytest.mark.parametrize("name,kwargs", CLIPS)
def test_native_scores_match_golden(golden, name, kwargs, tmp_path):
    from avsum_tpu.io.native import NativeY4MReader, native_available
    from avsum_tpu.io.y4m import write_y4m

    if not native_available():
        pytest.skip("libavsumio not built")
    video, _, _ = make_scene_video(**kwargs)
    path = str(tmp_path / "clip.y4m")
    write_y4m(path, video, fps=30.0)
    reader = NativeY4MReader(path)
    try:
        scores = np.asarray(reader.content_scores(scale=1))
    finally:
        reader.close()
    ref = golden[f"{name}/scores"]
    # the native path re-derives RGB from Y4M's 4:2:0 chroma (lossy
    # subsampling on write: per-pixel noise loses half its chroma detail),
    # so mid-scene noise scores shift systematically; the cut pin is exact
    np.testing.assert_allclose(scores, ref, atol=2 * SCORE_TOL, rtol=0.35)
    assert cuts_from_scores(scores) == golden[f"{name}/cuts"].tolist()


def test_golden_cuts_track_true_scene_transitions(golden):
    """The fixtures themselves are sane: every true scene transition is
    detected and every oracle cut sits within 3 frames of a true
    transition (min_scene_len can pull a cut a few frames early on short
    noisy scenes — PySceneDetect semantics, not an error)."""
    for name, _ in CLIPS:
        cuts = golden[f"{name}/cuts"]
        trans = np.asarray(
            [int(s) for (s, _e) in golden[f"{name}/true_bounds"][1:]]
        )
        assert len(cuts) == len(trans), name
        for c in cuts:
            assert np.abs(trans - int(c)).min() <= 3, (name, int(c))
        for t in trans:
            assert np.abs(np.asarray(cuts) - t).min() <= 3, (name, int(t))


def test_live_cv2_oracle_agrees():
    """Live cross-check against OpenCV where available (independent of the
    committed fixtures)."""
    cv2 = pytest.importorskip("cv2")
    del cv2
    from tests.oracle_scenedetect import content_scores_oracle, cuts_oracle

    video, _, scenes = make_scene_video(n_scenes=7, seed=99, height=90, width=120)
    oracle = content_scores_oracle(video)
    ours = np.asarray(content_scores(video))
    np.testing.assert_allclose(ours, oracle, atol=SCORE_TOL)
    assert cuts_from_scores(ours) == cuts_oracle(oracle)
    assert cuts_oracle(oracle) == [int(s) for (s, _e) in scenes[1:]]
