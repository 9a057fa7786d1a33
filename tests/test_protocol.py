"""Canonical protocol + ViT backbone tests."""

import numpy as np
import pytest

from avsum_tpu.summary.protocol import (
    binary_f1,
    canonical_f1_summe,
    canonical_f1_tvsum,
    evaluate_canonical,
    summary_mask_from_shot_scores,
)


def _video(seed=0, n_shots=12, total=3000):
    rng = np.random.default_rng(seed)
    cuts = np.sort(rng.choice(np.arange(50, total - 50), n_shots - 1, replace=False))
    bounds = np.stack([np.r_[0, cuts], np.r_[cuts, total]], 1)
    return bounds, total


def test_binary_f1_extremes():
    a = np.array([1, 1, 0, 0], bool)
    assert binary_f1(a, a) == pytest.approx(1.0, abs=1e-6)
    assert binary_f1(a, ~a) == pytest.approx(0.0, abs=1e-6)


def test_summary_mask_budget():
    bounds, total = _video(1)
    scores = np.random.default_rng(1).random(len(bounds)).astype(np.float32)
    mask = summary_mask_from_shot_scores(scores, bounds, total, 0.15)
    assert mask.sum() <= int(0.15 * total)


def test_tvsum_oracle_scores_high_f1():
    """Predicting the users' own mean scores must yield high canonical F1."""
    bounds, total = _video(2)
    rng = np.random.default_rng(2)
    # 20 users with correlated scores around a shared base
    base = rng.random(total).astype(np.float32)
    users = np.clip(base[None] + 0.1 * rng.standard_normal((20, total)), 0, 1)
    from avsum_tpu.temporal.align import frame_scores_to_shot_scores

    oracle = frame_scores_to_shot_scores(users.mean(0), bounds)
    f1_oracle = canonical_f1_tvsum(oracle, bounds, total, users)
    f1_random = canonical_f1_tvsum(
        rng.random(len(bounds)).astype(np.float32), bounds, total, users
    )
    assert f1_oracle > 0.6
    assert f1_oracle > f1_random


def test_summe_max_aggregate():
    bounds, total = _video(3)
    rng = np.random.default_rng(3)
    user_masks = np.zeros((total, 5))
    # user 3 selects exactly shots 0 and 4
    gt_frames = np.r_[np.arange(*bounds[0]), np.arange(*bounds[4])]
    user_masks[gt_frames, 3] = 1.0
    scores = np.zeros(len(bounds), np.float32)
    scores[[0, 4]] = 1.0
    f1 = canonical_f1_summe(scores, bounds, total, user_masks)
    assert f1 > 0.5  # matches user 3 well (subject to budget truncation)


def test_evaluate_canonical_bundle():
    bounds, total = _video(4)
    rng = np.random.default_rng(4)
    users = rng.random((20, total)).astype(np.float32)
    out = evaluate_canonical(
        [
            {
                "pred_shot_scores": rng.random(len(bounds)).astype(np.float32),
                "boundaries": bounds,
                "n_frames": total,
                "user_frame_scores": users,
            }
        ],
        dataset="tvsum",
    )
    assert out["n_videos"] == 1
    assert 0.0 <= out["canonical_f1"] <= 1.0


def test_vit_backbone_contract():
    import jax

    from avsum_tpu.vision.backbone import fast_init
    from avsum_tpu.vision.vit import ViTBackbone

    model = ViTBackbone(out_dim=4096, embed_dim=64, depth=2, num_heads=2,
                        image_size=32)
    x = np.random.default_rng(5).standard_normal((2, 48, 64, 3)).astype(np.float32)
    variables = fast_init(model, x)
    out = model.apply(variables, x)
    assert out.shape == (2, 4096)
    assert np.isfinite(np.asarray(out)).all()


def test_make_visual_frontend_vit():
    from avsum_tpu.train.config import VisualFeatConfig
    from avsum_tpu.vision.backbone import make_visual_frontend

    cfg = VisualFeatConfig(backbone="vit", resnet_size=32)
    fe = make_visual_frontend(cfg, batch_size=4)
    frames = np.random.default_rng(6).integers(
        0, 255, (6, 48, 64, 3), dtype=np.uint8
    )
    feats = fe.frame_features(frames)
    assert feats.shape == (6, 4096)
