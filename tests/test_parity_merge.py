"""Pin scripts/parity_merge.py: exact-merge math + determinism gate.

The merge claims two things that must hold to the digit: (1) per-seed
statistics concatenate and aggregates weighted-merge EXACTLY as a full
run would have computed them, and (2) a reproduced seed that fails to
match the committed report aborts the merge instead of quietly
manufacturing a hybrid statistic.
"""

import numpy as np
import pytest
from scipy import stats as sps

from scripts.parity_merge import KEYS, _complete_seeds, merge


def _fold_mean(canon, f1=0.9, rho=0.95, tau=0.85):
    return {"canonical_f1": canon, "f1": f1, "spearman": rho,
            "kendall": tau}


def _world(n_folds=2, n_seeds=3):
    """A tiny 2-video world with hand-checkable numbers."""
    settings = {
        "n_videos": 2, "n_folds": n_folds, "n_seeds": n_seeds,
        "seed": 0, "dataset": "tvsum",
    }
    # committed report over seeds {0, 1}
    prev = {
        "settings": settings,
        "dataset": "tvsum",
        "seeds_done": 2,
        "protocol": "synthetic TVSum, 2-fold CV x 2 seeds, paired",
        "wall_s": 100.0,
        "models": {},
    }
    for key in KEYS:
        base = {"reference_torch_bilstm": 0.60, "avsum_bilstm": 0.62,
                "avsum_attention": 0.61}[key]
        per_seed = [round(base, 4), round(base + 0.02, 4)]
        prev["models"][key] = {
            "canonical_f1": float(np.mean(per_seed)),
            "f1": 0.9, "spearman": 0.95, "kendall": 0.85,
            "per_seed_canonical_f1": per_seed,
            "seed_std_pts": round(100 * float(np.std(per_seed)), 2),
        }
    for key in ("avsum_bilstm", "avsum_attention"):
        d = 2.0 if key == "avsum_bilstm" else 1.0
        prev["models"][key].update({
            "per_seed_paired_delta_pts": [d, d + 1.0],
            "paired_delta_pts": d + 0.5,
            "paired_ci95_pts": [-5.0, 9.0],
            "paired_se_pts": 3.0,
            "videos_abs_delta_gt10": 1,
            "videos_needed_for_ci2pts": 300,
            "p_noninferior_bootstrap": 0.7,
        })
    # fresh subset run: seed 2 complete (2 folds), per-video data such
    # that canonical means and paired deltas are exact round numbers
    prog = {
        "settings": settings,
        "cells": [[2, 0], [2, 1]],
        "fold_means": {
            k: [[], [], [_fold_mean(c1), _fold_mean(c2)]]
            for k, (c1, c2) in {
                "reference_torch_bilstm": (0.58, 0.62),
                "avsum_bilstm": (0.62, 0.66),
                "avsum_attention": (0.60, 0.64),
            }.items()
        },
        "video_f1": {
            "reference_torch_bilstm": [{}, {}, {"v0": 0.58, "v1": 0.62}],
            "avsum_bilstm": [{}, {}, {"v0": 0.62, "v1": 0.66}],
            "avsum_attention": [{}, {}, {"v0": 0.60, "v1": 0.64}],
        },
    }
    return prev, prog


def test_complete_seeds_from_cells():
    _, prog = _world()
    assert _complete_seeds(prog, 2) == [2]
    prog["cells"] = [[2, 0]]  # half a seed -> not complete
    assert _complete_seeds(prog, 2) == []


def test_merge_extends_per_seed_and_recomputes_decision_ci():
    prev, prog = _world()
    out = merge(prev, prog)
    assert out["seeds_done"] == 3
    m = out["models"]["avsum_bilstm"]
    # concat: committed [2.0, 3.0] + fresh seed-2 delta 4.0 pts
    assert m["per_seed_paired_delta_pts"] == [2.0, 3.0, 4.0]
    assert m["paired_delta_pts"] == 3.0  # mean of per-seed deltas
    # seed-level t CI over [2,3,4]: mean 3, sd 1, se 1/sqrt(3), t(2)
    tcrit = float(sps.t.ppf(0.975, 2))
    hw = tcrit * 1.0 / np.sqrt(3.0)
    assert m["seed_paired_ci95_pts"] == [round(3 - hw, 2), round(3 + hw, 2)]
    # per-seed canonical concatenates; aggregate is the weighted mean
    assert m["per_seed_canonical_f1"] == [0.62, 0.64, 0.64]
    assert m["canonical_f1"] == pytest.approx((0.62 + 0.64 + 0.64) / 3)
    # video-level diagnostics carried, with their basis recorded
    assert m["paired_ci95_pts"] == [-5.0, 9.0]
    assert m["video_level_basis_seeds"] == 2
    assert "merge_note" in out


def test_merge_verifies_reproduced_seed():
    prev, prog = _world()
    # add a reproduction of seed 0 that matches the committed numbers:
    # canonical mean over folds = 0.62/0.61/0.60? per_seed[0] values are
    # ref 0.60, bilstm 0.62, attn 0.61 with paired deltas 2.0 / 1.0 pts
    prog["cells"] = [[0, 0], [0, 1], [2, 0], [2, 1]]
    for key, c in (("reference_torch_bilstm", 0.60),
                   ("avsum_bilstm", 0.62), ("avsum_attention", 0.61)):
        prog["fold_means"][key][0] = [_fold_mean(c), _fold_mean(c)]
        prog["video_f1"][key][0] = {"v0": c, "v1": c}
    out = merge(prev, prog)
    assert out["seeds_done"] == 3
    assert "determinism proof" in out["merge_note"]

    # now corrupt the reproduction -> merge must abort loudly
    prog["video_f1"]["avsum_bilstm"][0] = {"v0": 0.70, "v1": 0.70}
    prog["fold_means"]["avsum_bilstm"][0] = [
        _fold_mean(0.70), _fold_mean(0.70)
    ]
    with pytest.raises(SystemExit, match="DETERMINISM FAILURE"):
        merge(prev, prog)


def test_merge_variants_limited_extension():
    """A --variants attention extension run has fresh seeds only for the
    reference + attention arms; bilstm's committed row must pass through
    untouched (same decision statistics) while attention extends."""
    prev, prog = _world()
    # strip the bilstm arm from the fresh cells, as a
    # parity_reference --variants attention run writes them
    prog["fold_means"]["avsum_bilstm"][2] = []
    prog["video_f1"]["avsum_bilstm"][2] = {}
    # extension runs declare a larger n_seeds; merge must tolerate it
    prog["settings"] = dict(prog["settings"], n_seeds=4)
    out = merge(prev, prog)
    assert out["seeds_done"] == 3
    b = out["models"]["avsum_bilstm"]
    a = out["models"]["avsum_attention"]
    assert b["n_seeds_model"] == 2 and a["n_seeds_model"] == 3
    assert b["per_seed_paired_delta_pts"] == [2.0, 3.0]  # untouched
    assert b["paired_delta_pts"] == 2.5
    assert a["per_seed_paired_delta_pts"] == [1.0, 2.0, 2.0]
    assert a["paired_delta_pts"] == round((1.0 + 2.0 + 2.0) / 3, 2)
    assert "per-model seed counts differ" in out["protocol"]


def test_merge_rejects_settings_mismatch_and_gaps():
    prev, prog = _world()
    prog2 = dict(prog, settings=dict(prog["settings"], n_videos=3))
    with pytest.raises(SystemExit, match="settings mismatch"):
        merge(prev, prog2)
    # a fresh seed that skips an index cannot extend the prefix
    prev2 = dict(prev, seeds_done=1)
    for key in KEYS:
        prev2["models"][key] = dict(
            prev["models"][key],
            per_seed_canonical_f1=prev["models"][key][
                "per_seed_canonical_f1"][:1],
        )
    for key in ("avsum_bilstm", "avsum_attention"):
        prev2["models"][key]["per_seed_paired_delta_pts"] = (
            prev["models"][key]["per_seed_paired_delta_pts"][:1]
        )
    with pytest.raises(SystemExit, match="do not extend"):
        merge(prev2, prog)


def test_main_also_appends_extra_dataset_sections(tmp_path):
    """--also joins a second dataset's result into one report, keeping the
    merged dataset first and dropping a duplicate of the same dataset."""
    import json

    from scripts.parity_merge import main

    prev, prog = _world()
    work = tmp_path / "work"
    work.mkdir()
    (work / "progress.json").write_text(json.dumps(prog))
    prev_path = tmp_path / "PARITY_F1.json"
    prev_path.write_text(json.dumps(prev))

    summe = json.loads(json.dumps(prev))  # deep copy
    summe["dataset"] = "summe"
    summe["settings"] = dict(prev["settings"], dataset="summe")
    also = tmp_path / "summe.json"
    # both payload layouts must work; exercise the {'datasets': ...} one
    # with a stale tvsum entry that must be dropped in favor of the merge
    also.write_text(json.dumps({"datasets": {"summe": summe,
                                             "tvsum": prev}}))

    out = tmp_path / "out"
    assert main([
        "--work", str(work), "--prev", str(prev_path),
        "--out-dir", str(out), "--also", str(also),
    ]) == 0

    md = (out / "PARITY_F1.md").read_text()
    assert "## tvsum" in md and "## summe" in md
    payload = json.loads((out / "PARITY_F1.json").read_text())
    assert set(payload["datasets"]) == {"tvsum", "summe"}
    # the tvsum section is the MERGED result (3 seeds), not the stale prev
    assert payload["datasets"]["tvsum"]["seeds_done"] == 3
    assert payload["datasets"]["summe"]["seeds_done"] == 2
