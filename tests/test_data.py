"""Data layer: cache roundtrip, splits determinism, TVSum/SumMe parsers."""

import numpy as np
import pytest

from avsum_tpu.data.cache import FeatureCache
from avsum_tpu.data.splits import (
    create_kfold_splits,
    create_split,
    load_splits,
    save_splits,
)
from avsum_tpu.data.summe import load_summe_mat
from avsum_tpu.data.tvsum import load_tvsum


def _fake_features(s=7, seed=0):
    rng = np.random.default_rng(seed)
    visual = rng.standard_normal((s, 4096)).astype(np.float32)
    audio = rng.standard_normal((s, 296)).astype(np.float32)
    ends = np.cumsum(rng.integers(20, 100, s))
    bounds = np.stack([np.r_[0, ends[:-1]], ends], 1)
    return visual, audio, bounds, int(ends[-1])


def test_cache_roundtrip(tmp_path):
    cache = FeatureCache(str(tmp_path / "cache"))
    visual, audio, bounds, n = _fake_features()
    assert not cache.has("vid1")
    cache.put("vid1", visual, audio, bounds, fps=29.97, n_frames=n)
    assert cache.has("vid1")
    ex = cache.get("vid1")
    np.testing.assert_array_equal(ex.visual, visual)
    np.testing.assert_array_equal(ex.audio, audio)
    np.testing.assert_array_equal(ex.shot_boundaries, bounds)
    assert ex.fps == pytest.approx(29.97)
    assert ex.n_frames == n
    assert cache.video_ids() == ["vid1"]
    cache.drop("vid1")
    assert not cache.has("vid1")


def test_cache_rejects_inconsistent_counts(tmp_path):
    cache = FeatureCache(str(tmp_path / "cache"))
    visual, audio, bounds, n = _fake_features()
    with pytest.raises(ValueError, match="inconsistent shot counts"):
        cache.put("bad", visual[:-1], audio, bounds, 30.0, n)
    assert not cache.has("bad")


def test_splits_deterministic_and_disjoint(tmp_path):
    ids = [f"v{i:02d}" for i in range(50)]
    s1 = create_split(ids, seed=7)
    s2 = create_split(ids, seed=7)
    assert s1 == s2
    assert create_split(ids, seed=8) != s1
    assert len(s1["train"]) == 40 and len(s1["test"]) == 10
    assert set(s1["train"]) | set(s1["test"]) == set(ids)
    assert not set(s1["train"]) & set(s1["test"])

    path = str(tmp_path / "splits.json")
    save_splits(s1, path)
    assert load_splits(path) == s1


def test_kfold_partition_property():
    ids = [f"v{i:02d}" for i in range(50)]
    folds = create_kfold_splits(ids, n_folds=5, seed=0)
    assert len(folds) == 5
    all_test = [v for f in folds for v in f["test"]]
    assert sorted(all_test) == sorted(ids)  # each video tests exactly once
    for f in folds:
        assert not set(f["train"]) & set(f["test"])
        assert sorted(f["train"] + f["test"]) == sorted(ids)


def _write_fake_tvsum_mat(path, n_videos=3, seed=0):
    """Replicates ydata-tvsum50.mat's HDF5 structure: object-ref arrays of
    uint16 char codes + (N,1) refs to (20, n_frames) user annotations
    (the structure train_av_model.py:13-58 decodes)."""
    import h5py

    rng = np.random.default_rng(seed)
    nframes = rng.integers(300, 900, n_videos)
    with h5py.File(path, "w") as f:
        grp = f.create_group("tvsum50")

        def make_str_refs(strings, name):
            refs = []
            for i, s in enumerate(strings):
                codes = np.array([[ord(c)] for c in s], np.uint16)
                ds = f.create_dataset(f"/refs/{name}_{i}", data=codes)
                refs.append(ds.ref)
            grp.create_dataset(
                name, data=np.array(refs, h5py.ref_dtype).reshape(1, -1)
            )

        ids = [f"video_{i:02d}" for i in range(n_videos)]
        make_str_refs([f"Title {i}" for i in range(n_videos)], "title")
        make_str_refs(ids, "video")
        make_str_refs(["VT"] * n_videos, "category")
        grp.create_dataset(
            "length", data=(nframes / 30.0).reshape(1, -1).astype(np.float64)
        )
        grp.create_dataset(
            "nframes", data=nframes.reshape(1, -1).astype(np.float64)
        )
        anno_refs = []
        for i in range(n_videos):
            scores = rng.integers(1, 6, (20, nframes[i])).astype(np.float64)
            ds = f.create_dataset(f"/refs/anno_{i}", data=scores)
            anno_refs.append(ds.ref)
        grp.create_dataset(
            "user_anno",
            data=np.array(anno_refs, h5py.ref_dtype).reshape(-1, 1),
        )
    return ids, nframes


def test_tvsum_parser(tmp_path):
    path = str(tmp_path / "ydata-tvsum50.mat")
    ids, nframes = _write_fake_tvsum_mat(path)
    videos = load_tvsum(path)
    assert [v.video_id for v in videos] == ids
    for v, nf in zip(videos, nframes):
        assert v.user_scores.shape == (20, nf)
        assert v.n_frames == nf
        mean = v.mean_scores()
        assert mean.shape == (nf,)
        np.testing.assert_allclose(mean, v.user_scores.mean(0), rtol=1e-6)
        assert 1.0 <= mean.mean() <= 5.0
    assert videos[0].title == "Title 0"
    assert videos[0].category == "VT"


def test_summe_parser(tmp_path):
    from scipy.io import savemat

    rng = np.random.default_rng(1)
    n = 500
    gt = rng.random(n).astype(np.float64)
    user = (rng.random((n, 15)) > 0.8).astype(np.float64)
    path = str(tmp_path / "Cooking.mat")
    savemat(path, {"gt_score": gt.reshape(-1, 1), "user_score": user,
                   "nFrames": n, "FPS": 25.0})
    video = load_summe_mat(path)
    assert video.video_id == "Cooking"
    np.testing.assert_allclose(video.gt_score, gt, rtol=1e-6)
    assert video.user_score.shape == (n, 15)
    assert video.fps == 25.0


def test_cache_fingerprint_guard(tmp_path):
    from avsum_tpu.data.cache import config_fingerprint
    from avsum_tpu.train.config import AudioFeatConfig, VisualFeatConfig

    cache = FeatureCache(str(tmp_path / "cache"))
    visual, audio, bounds, n = _fake_features()
    fp1 = config_fingerprint(VisualFeatConfig(), AudioFeatConfig())
    fp2 = config_fingerprint(VisualFeatConfig(sample_fps=1.0), AudioFeatConfig())
    assert fp1 != fp2
    cache.put("v", visual, audio, bounds, 30.0, n, fingerprint=fp1)
    assert cache.matches("v", fp1)
    assert not cache.matches("v", fp2)
    assert cache.matches("v", None)  # no-fingerprint callers accept any
    # entries without a recorded fingerprint are accepted (compat)
    cache.put("old", visual, audio, bounds, 30.0, n)
    assert cache.matches("old", fp1)
