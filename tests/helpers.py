"""Shared test fixtures: synthetic TVSum-format annotation files."""

import numpy as np


def write_fake_tvsum_mat(
    path,
    video_ids,
    frame_scores_per_video,
    seed=0,
    scene_lists=None,
    scene_noise=0.0,
):
    """Write a ydata-tvsum50.mat-shaped HDF5 file.

    Replicates the structure train_av_model.py:13-58 decodes: object-ref
    arrays of uint16 char codes for title/video/category; user_anno as a
    (N, 1) ref array whose entries are (20, n_frames) matrices.

    frame_scores_per_video: list of [n_frames] base scores in [0, 1];
    the 20 users get noisy copies scaled to TVSum's 1-5 range.

    ``scene_lists`` + ``scene_noise`` model real inter-annotator
    DISAGREEMENT: each user perceives each scene's importance shifted by
    an independent N(0, scene_noise) offset that is constant across the
    scene's frames — unlike per-frame noise, it does not average out, so
    users genuinely select different scenes (real TVSum's per-user
    knapsack agreement ceiling). ``scene_lists[i]`` is ``[(start, end)]``
    for video i.
    """
    import h5py

    rng = np.random.default_rng(seed)
    n = len(video_ids)
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

        make_str_refs([f"Title {v}" for v in video_ids], "title")
        make_str_refs(list(video_ids), "video")
        make_str_refs(["VT"] * n, "category")
        nframes = np.array([len(s) for s in frame_scores_per_video], np.float64)
        grp.create_dataset("length", data=(nframes / 30.0).reshape(1, -1))
        grp.create_dataset("nframes", data=nframes.reshape(1, -1))
        anno_refs = []
        for i, base in enumerate(frame_scores_per_video):
            base = np.asarray(base, np.float64)
            users = base[None] + 0.08 * rng.standard_normal((20, len(base)))
            if scene_lists is not None and scene_noise > 0:
                for start, end in scene_lists[i]:
                    users[:, start:end] += scene_noise * rng.standard_normal(
                        (20, 1)
                    )
            users = np.clip(users, 0, 1)
            scores = 1.0 + 4.0 * users  # TVSum 1-5 importance range
            ds = f.create_dataset(f"/refs/anno_{i}", data=scores)
            anno_refs.append(ds.ref)
        grp.create_dataset(
            "user_anno", data=np.array(anno_refs, h5py.ref_dtype).reshape(-1, 1)
        )
