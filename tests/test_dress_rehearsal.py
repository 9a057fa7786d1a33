"""Real-data dress rehearsal: the FULL CLI protocol on compressed media.

VERDICT r3 item 6: compressed-codec ingest (mp4v video via the cv2
fallback, AAC audio via the bundled-ffmpeg ctypes binding) had only been
exercised at the single-video level; the protocol e2e ran on Y4M+WAV.
This test generates a mini TVSum-shaped dataset in the REAL formats —
one mp4 per video holding an mp4v track the native demuxer rejects plus
an in-container AAC-LC 'mp4a' track, and a real ydata-tvsum50.mat HDF5
layout — then runs preprocess -> kfold splits -> train -> evaluate
--canonical as ONE protocol run, exactly what the day real TVSum data
drops will require (reference ingest: extractors.py:307-309, 364-386;
.mat layout: train_av_model.py:13-35).
"""

import json

import numpy as np
import pytest

from avsum_tpu.io.cv2video import cv2_available
from avsum_tpu.io.ffaudio import aac_encode_available

pytestmark = [
    pytest.mark.skipif(
        not cv2_available(), reason="opencv-python not importable"
    ),
    pytest.mark.skipif(
        not aac_encode_available(),
        reason="bundled-ffmpeg AAC encoder unavailable",
    ),
]


def _write_compressed_video(stem, n_scenes, seed, height=48, width=64):
    """One real-format dataset file: mp4v video + AAC audio in one mp4."""
    import cv2

    from avsum_tpu.io.mp4_mux import remux_video_with_aac
    from avsum_tpu.io.synthetic import make_scene_video

    frames, audio, scenes = make_scene_video(
        n_scenes=n_scenes, seed=seed, height=height, width=width
    )
    tmp = stem + ".video_only.mp4"
    writer = cv2.VideoWriter(
        tmp, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (width, height)
    )
    assert writer.isOpened()
    for frame in frames:
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()
    remux_video_with_aac(tmp, stem + ".mp4", audio, rate=16000)
    import os

    os.remove(tmp)
    return frames, audio, scenes


def test_remux_video_with_aac_round_trip(tmp_path):
    """The remuxed container must route video through the cv2 fallback
    (native demuxer rejects mp4v) and audio through the bundled-ffmpeg
    decoder, with frame count and duration preserved."""
    from avsum_tpu.io.ffaudio import decode_audio
    from avsum_tpu.io.mp4 import Mp4UnsupportedCodec, Mp4VideoReader
    from avsum_tpu.io.video import open_video

    stem = str(tmp_path / "clip")
    frames, audio, _ = _write_compressed_video(stem, n_scenes=3, seed=11)

    with pytest.raises(Mp4UnsupportedCodec):
        Mp4VideoReader(stem + ".mp4")

    reader = open_video(stem + ".mp4")
    try:
        assert type(reader).__module__.endswith("cv2video")
        assert reader.n_frames == frames.shape[0]
        assert (reader.height, reader.width) == frames.shape[1:3]
        got = reader.read_frame(frames.shape[0] // 2)
        # lossy mp4v: right shape, roughly right content
        assert got.shape == frames.shape[1:]
    finally:
        reader.close()

    decoded, rate = decode_audio(stem + ".mp4")
    # AAC pads to 1024-sample frames and adds encoder delay; duration
    # must match within two codec frames
    assert abs(len(decoded) / rate - len(audio) / 16000.0) < 2 * 1024 / 16000.0


@pytest.fixture(scope="module")
def compressed_tvsum_world(tmp_path_factory):
    from tests.helpers import write_fake_tvsum_mat

    root = tmp_path_factory.mktemp("ctvsum")
    video_dir = root / "videos"
    video_dir.mkdir()
    ids, scores, scene_lists = [], [], []
    rng = np.random.default_rng(0)
    for i in range(6):
        vid = f"cv{i:02d}"
        _, _, scenes = _write_compressed_video(
            str(video_dir / vid), n_scenes=4, seed=300 + i
        )
        total = scenes[-1][1]
        frame_scores = np.zeros(total, np.float32)
        for (start, end) in scenes:
            frame_scores[start:end] = rng.random()
        ids.append(vid)
        scores.append(frame_scores)
        scene_lists.append(scenes)
    mat_path = str(root / "ydata.mat")
    write_fake_tvsum_mat(
        mat_path, ids, scores, scene_lists=scene_lists, scene_noise=0.05
    )
    return root, video_dir, mat_path


SETS = [
    "--set", "visual.backbone=tiny",
    "--set", "model.hidden_dim=32",
    "--set", "model.scorer_hidden=8",
    "--set", "data.dataset=tvsum",
    "--set", "data.batch_videos=2",
    "--set", "data.max_shots=8",
    "--set", "train.epochs=2",
    "--set", "train.eval_every_epochs=10",
]


def _sets(root):
    return SETS + [
        "--set", f"data.cache_dir={root}/cache",
        "--set", f"data.annotation_path={root}/ydata.mat",
        "--set", f"train.checkpoint_dir={root}/ckpt",
    ]


@pytest.mark.slow
def test_full_protocol_on_compressed_media(compressed_tvsum_world, capsys):
    from avsum_tpu.cli.main import main

    root, video_dir, mat_path = compressed_tvsum_world
    assert main(["preprocess", "--input-dir", str(video_dir),
                 "--cache-dir", f"{root}/cache"] + _sets(root)) == 0
    # every video must have made it through the compressed chain
    import os

    cached = [
        d for d in os.listdir(f"{root}/cache")
        if os.path.exists(f"{root}/cache/{d}/meta.json")
    ]
    assert len(cached) == 6, cached
    assert main(["splits", "--cache-dir", f"{root}/cache", "--kfold",
                 "--output", f"{root}/splits.json"] + _sets(root)) == 0
    folds = json.load(open(f"{root}/splits.json"))
    assert len(folds) == 5
    assert main(["train", "--splits", f"{root}/splits.json", "--fold", "0"]
                + _sets(root)) == 0
    capsys.readouterr()
    assert main(["evaluate", "--splits", f"{root}/splits.json", "--fold", "0",
                 "--canonical"] + _sets(root)) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert {"f1", "spearman", "kendall", "canonical_f1", "n_videos"} <= set(
        metrics
    )
    assert metrics["n_videos"] >= 1
    assert 0.0 <= metrics["canonical_f1"] <= 1.0
