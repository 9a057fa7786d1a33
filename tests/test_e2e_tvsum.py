"""Full TVSum-protocol end-to-end run on synthetic media, via the CLI:

media generation -> preprocess -> kfold splits -> train -> evaluate
(reference metrics + canonical per-annotator knapsack F1). This is the
offline stand-in for the real TVSum-50 parity run (SURVEY.md §6: the F1
baseline must be *established* by running the protocol; real videos are
not available in this environment)."""

import json
import os

import numpy as np
import pytest

from avsum_tpu.cli.main import main
from avsum_tpu.io.synthetic import write_scene_video
from tests.helpers import write_fake_tvsum_mat


@pytest.fixture(scope="module")
def tvsum_world(tmp_path_factory):
    root = tmp_path_factory.mktemp("tvsum")
    video_dir = root / "videos"
    video_dir.mkdir()
    ids, scores = [], []
    rng = np.random.default_rng(0)
    for i in range(4):
        vid = f"tv{i:02d}"
        scenes = write_scene_video(
            str(video_dir / vid), n_scenes=4, seed=100 + i, height=48, width=64
        )
        total = scenes[-1][1]
        # content-correlated ground truth: one importance level per scene
        frame_scores = np.zeros(total, np.float32)
        for (start, end) in scenes:
            frame_scores[start:end] = rng.random()
        ids.append(vid)
        scores.append(frame_scores)
    mat_path = str(root / "ydata.mat")
    write_fake_tvsum_mat(mat_path, ids, scores)
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
        "--set", f"data.annotation_path={root.name and str(root)}/ydata.mat",
        "--set", f"train.checkpoint_dir={root}/ckpt",
    ]


@pytest.mark.slow
def test_full_protocol(tvsum_world, capsys):
    root, video_dir, mat_path = tvsum_world
    assert main(["preprocess", "--input-dir", str(video_dir),
                 "--cache-dir", f"{root}/cache"] + _sets(root)) == 0
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
    assert {"f1", "spearman", "kendall", "canonical_f1", "n_videos"} <= set(metrics)
    assert metrics["n_videos"] >= 1
    assert 0.0 <= metrics["canonical_f1"] <= 1.0
    # with content-correlated targets even 3 epochs must beat all-zero
    assert metrics["f1"] > 0.0
