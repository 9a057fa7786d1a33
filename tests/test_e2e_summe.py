"""Full SumMe-protocol end-to-end run on synthetic media, via the CLI:

media generation -> preprocess -> splits -> train -> evaluate (reference
metrics + canonical SumMe max-over-users F1). Companion of
tests/test_e2e_tvsum.py — the SumMe side of the offline parity protocol
(reference: dataset.py:65-68 loads per-video .mat gt_score; the
canonical protocol additionally needs user_score).
"""

import json

import numpy as np
import pytest
from scipy.io import savemat

from avsum_tpu.cli.main import main
from avsum_tpu.io.synthetic import write_scene_video


@pytest.fixture(scope="module")
def summe_world(tmp_path_factory):
    root = tmp_path_factory.mktemp("summe")
    video_dir = root / "videos"
    gt_dir = root / "GT"
    video_dir.mkdir()
    gt_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(4):
        vid = f"sm{i:02d}"
        scenes = write_scene_video(
            str(video_dir / vid), n_scenes=4, seed=200 + i, height=48, width=64
        )
        total = scenes[-1][1]
        gt = np.zeros(total, np.float32)
        users = np.zeros((total, 5), np.float32)
        for (start, end) in scenes:
            level = rng.random()
            gt[start:end] = level
            # each user "selects" the scenes they rate above their bar
            for u in range(5):
                if level > 0.3 + 0.1 * u:
                    users[start:end, u] = 1.0
        savemat(
            str(gt_dir / f"{vid}.mat"),
            {
                "gt_score": gt.reshape(-1, 1),
                "user_score": users,
                "nFrames": total,
                "FPS": 30.0,
            },
        )
    return root, video_dir, gt_dir


SETS = [
    "--set", "visual.backbone=tiny",
    "--set", "model.hidden_dim=32",
    "--set", "model.scorer_hidden=8",
    "--set", "data.dataset=summe",
    "--set", "data.batch_videos=2",
    "--set", "data.max_shots=8",
    "--set", "train.epochs=2",
    "--set", "train.eval_every_epochs=10",
]


@pytest.mark.slow
def test_full_summe_protocol(summe_world, capsys):
    root, video_dir, gt_dir = summe_world
    sets = SETS + [
        "--set", f"data.cache_dir={root}/cache",
        "--set", f"data.annotation_path={gt_dir}",
        "--set", f"train.checkpoint_dir={root}/ckpt",
        "--set", f"data.splits_path={root}/splits.json",
    ]
    assert main(["preprocess", "--input-dir", str(video_dir),
                 "--cache-dir", f"{root}/cache"] + sets) == 0
    assert main(["splits", "--cache-dir", f"{root}/cache", "--kfold",
                 "--output", f"{root}/splits.json"] + sets) == 0
    assert main(["train", "--splits", f"{root}/splits.json", "--fold", "0"]
                + sets) == 0
    capsys.readouterr()
    assert main(["evaluate", "--splits", f"{root}/splits.json", "--fold", "0",
                 "--canonical"] + sets) == 0
    out = capsys.readouterr().out
    metrics = json.loads(out.strip().splitlines()[-1])
    assert {"f1", "spearman", "kendall", "canonical_f1"} <= set(metrics)
    for key in ("f1", "spearman", "kendall"):
        assert np.isfinite(metrics[key]), metrics
    assert 0.0 <= metrics["canonical_f1"] <= 1.0
