"""Parity harness smoke: the literal reference model trains and the full
reference-vs-rebuild comparison runs end to end (CI scale).

The reportable run (full settings) writes PARITY_F1.md / PARITY_F1.json at
the repo root; this test pins the machinery: reference-model semantics,
shared features/targets/splits, one-protocol evaluation, report writing.
"""

import json
import os

import numpy as np
import pytest

from scripts.parity_reference import (
    ParitySettings,
    build_reference_model,
    run_parity,
    score_with_reference,
    train_reference_model,
    write_reports,
)


def test_reference_model_semantics():
    """The re-instantiated reference model must reproduce av_model.py's
    forward contract: [1,S,Dv]x[1,S,Da] -> [S] sigmoid scores, and the
    §8.5 batch_first quirk (attention over a length-1 sequence = a
    per-shot map, so permuting shots permutes scores identically)."""
    import torch

    torch.manual_seed(0)
    dv, da, s = 32, 12, 9
    model = build_reference_model(dv, da, hidden_dim=16)
    model.eval()
    v = torch.randn(1, s, dv)
    a = torch.randn(1, s, da)
    with torch.no_grad():
        out = model(v, a)
    assert out.shape == (s,)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_reference_training_reduces_loss():
    import torch
    import torch.nn.functional as F

    from avsum_tpu.data.batching import VideoExample

    rng = np.random.default_rng(0)
    examples = []
    for i in range(3):
        s = 8
        visual = rng.standard_normal((s, 24)).astype(np.float32)
        targets = (visual[:, 0] > 0).astype(np.float32)
        examples.append(
            VideoExample(
                video_id=f"v{i}",
                visual=visual,
                audio=rng.standard_normal((s, 10)).astype(np.float32),
                targets=targets,
            )
        )

    model = build_reference_model(24, 10, hidden_dim=32)

    def total_loss():
        model.eval()
        with torch.no_grad():
            return sum(
                float(
                    F.mse_loss(
                        torch.from_numpy(
                            score_with_reference(model, ex)
                        ),
                        torch.from_numpy(ex.targets),
                    )
                )
                for ex in examples
            )

    before = total_loss()
    train_reference_model(model, examples, epochs=60, lr=1e-3)
    after = total_loss()
    assert after < before * 0.5, (before, after)


@pytest.mark.slow
def test_parity_run_summe(tmp_path):
    """The SumMe side: per-user binary ~15%-budget selections, canonical
    max-over-users F1 (reference: dataset.py:65-68 gt_score targets)."""
    st = ParitySettings(
        n_videos=4, n_scenes=5, epochs=4, hidden_dim=32, n_folds=2,
        n_seeds=1, dataset="summe", n_users_summe=4,
    )
    result = run_parity(str(tmp_path / "work"), st)
    assert result["dataset"] == "summe"
    assert "max over 4 user summaries" in result["protocol"]
    for r in result["models"].values():
        assert 0.0 <= r["canonical_f1"] <= 1.0
    # combined report: one md with both dataset sections
    tvsum_like = dict(result, dataset="tvsum")
    write_reports([tvsum_like, result], str(tmp_path))
    md = open(tmp_path / "PARITY_F1.md").read()
    assert "## tvsum" in md and "## summe" in md
    loaded = json.load(open(tmp_path / "PARITY_F1.json"))
    assert set(loaded["datasets"]) == {"tvsum", "summe"}


@pytest.mark.slow
def test_parity_run_end_to_end(tmp_path):
    st = ParitySettings(
        n_videos=6, n_scenes=6, epochs=6, hidden_dim=32, n_folds=2,
        n_seeds=2,
    )
    result = run_parity(str(tmp_path / "work"), st)
    models = result["models"]
    assert set(models) == {
        "reference_torch_bilstm", "avsum_bilstm", "avsum_attention"
    }
    for r in models.values():
        assert 0.0 <= r["canonical_f1"] <= 1.0
        assert len(r["per_seed_canonical_f1"]) == 2
    att = models["avsum_attention"]
    assert "delta_canonical_f1_pts" in att
    # paired stats: CI brackets the mean delta
    lo, hi = att["paired_ci95_pts"]
    assert lo <= att["paired_delta_pts"] <= hi
    write_reports(result, str(tmp_path))
    assert os.path.exists(tmp_path / "PARITY_F1.md")
    loaded = json.load(open(tmp_path / "PARITY_F1.json"))
    assert loaded["models"].keys() == models.keys()


def test_seed_level_paired_ci_math():
    """Pin the seed-level paired t CI (the round-4 acceptance statistic)
    against a hand-computed value, and the verdict rule on both sides of
    the 2-pt half-width threshold."""
    from scipy import stats as sps

    from scripts.parity_reference import _model_verdict, _summarize

    st = ParitySettings(n_videos=4, n_seeds=3, n_folds=2, epochs=1)
    vids = [f"v{i}" for i in range(4)]
    rng = np.random.default_rng(7)

    def per_seed_videos(offsets):
        """video_f1[model][seed] dicts with controlled per-seed mean delta."""
        base = {s: {v: float(rng.uniform(0.4, 0.6)) for v in vids}
                for s in range(3)}
        ref = {s: dict(base[s]) for s in range(3)}
        avs = {s: {v: base[s][v] + offsets[s] for v in vids} for s in range(3)}
        return ref, avs

    # tight: per-seed deltas exactly [0.01, 0.02, 0.015] -> CI from those 3
    ref, avs = per_seed_videos([0.01, 0.02, 0.015])
    video_f1 = {
        "reference_torch_bilstm": ref,
        "avsum_bilstm": avs,
        "avsum_attention": {s: dict(ref[s]) for s in range(3)},
    }
    fold_means = {
        k: [[{"canonical_f1": float(np.mean(list(video_f1[k][s].values())))}]
            for s in range(3)]
        for k in video_f1
    }
    result = _summarize(st, 3, fold_means, video_f1, vids, 0.0)
    r = result["models"]["avsum_bilstm"]
    d = np.array([1.0, 2.0, 1.5])  # pts
    se = d.std(ddof=1) / np.sqrt(3)
    tcrit = sps.t.ppf(0.975, 2)
    np.testing.assert_allclose(
        r["seed_paired_ci95_pts"],
        [round(d.mean() - tcrit * se, 2), round(d.mean() + tcrit * se, 2)],
        atol=0.015,
    )
    assert _model_verdict(r) == "PASS"  # half-width ~1.25 pts

    # wide: per-seed deltas [-0.03, 0.05, 0.01] -> sigma 4 pts -> FAIL-POWER
    ref2, avs2 = per_seed_videos([-0.03, 0.05, 0.01])
    video_f1["avsum_attention"] = avs2
    video_f1["reference_torch_bilstm"] = ref2
    fold_means = {
        k: [[{"canonical_f1": float(np.mean(list(video_f1[k][s].values())))}]
            for s in range(3)]
        for k in video_f1
    }
    result = _summarize(st, 3, fold_means, video_f1, vids, 0.0)
    r2 = result["models"]["avsum_attention"]
    assert _model_verdict(r2) == "FAIL-POWER"
    # the point estimate is noninferior, so never FAIL-INFERIOR
    assert r2["paired_delta_pts"] >= -0.5


def test_noninferiority_clause_passes_wide_positive_ci():
    """PARITY_PROCEDURE.md §7.8: a CI whose LOWER bound clears the −0.5
    margin establishes noninferiority outright, even when the half-width
    exceeds 2 pts (the round-4 bilstm outcome, CI [0.15, 4.68])."""
    from scripts.parity_reference import _model_verdict

    # per-seed deltas [2,4,6,8,10] pts -> mean 6, CI [2.08, 9.92]:
    # half-width 3.9 > 2 (old rule: FAIL-POWER) but lo >= -0.5 -> PASS
    r = {"paired_delta_pts": 6.0, "seed_paired_ci95_pts": [2.08, 9.92]}
    assert _model_verdict(r) == "PASS"
    # lower bound below the margin with a wide CI stays FAIL-POWER
    r2 = {"paired_delta_pts": 1.12, "seed_paired_ci95_pts": [-1.73, 3.96]}
    assert _model_verdict(r2) == "FAIL-POWER"
    # an inferior point estimate is FAIL-INFERIOR regardless of the CI
    r3 = {"paired_delta_pts": -0.9, "seed_paired_ci95_pts": [-1.9, 0.1]}
    assert _model_verdict(r3) == "FAIL-INFERIOR"
