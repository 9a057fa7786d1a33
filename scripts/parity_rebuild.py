"""Regenerate PARITY_F1.{json,md} from a parity run's progress.json.

The multi-hour parity run writes raw per-(seed, fold, video) data to
``<work>/<dataset>/progress.json`` after every cell and full reports
after every completed seed — but with whatever report code the process
STARTED with. This tool re-runs the (pure, deterministic) analysis with
the current code over the committed raw data, so report upgrades (e.g.
the round-4 variance-decomposition diagnostics) apply to a run already
in flight without restarting it.

Keyframe-F1/ρ/τ per-fold values are not in progress.json; they are
patched from the last PARITY_F1.json the run itself wrote (valid when
rebuilt at a seed boundary, which is the only time the run writes it).

Run: python scripts/parity_rebuild.py --work /tmp/parity_r4/tvsum \
         --prev PARITY_F1.json --out-dir .
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np  # noqa: F401 — parity_reference expects numpy present

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from scripts.parity_reference import (  # noqa: E402
    ParitySettings,
    _summarize,
    write_reports,
)


def rebuild(work: str, prev_path: str) -> dict:
    with open(os.path.join(work, "progress.json")) as fh:
        prog = json.load(fh)
    with open(prev_path) as fh:
        prev = json.load(fh)
    if "datasets" in prev:
        prev = prev["datasets"][os.path.basename(work)]

    st = ParitySettings(**prev["settings"])
    video_f1 = prog["video_f1"]
    vids = sorted(video_f1["reference_torch_bilstm"][0])
    n_done = sum(
        1
        for s in range(st.n_seeds)
        if len(video_f1["reference_torch_bilstm"][s]) == len(vids)
    )
    if n_done == 0:
        raise SystemExit("no complete seed in progress.json")
    fold_means = {
        k: [[{"canonical_f1": f} for f in seed_folds]
            for seed_folds in per_seed]
        for k, per_seed in prog["fold_canonical"].items()
    }
    result = _summarize(st, n_done, fold_means, video_f1, vids, time.time())
    # patch the metrics progress.json does not carry from the run's own
    # last report (written at the same seed boundary)
    for key, r in result["models"].items():
        for m in ("f1", "spearman", "kendall"):
            r[m] = prev["models"][key][m]
    result["wall_s"] = prev.get("wall_s", result["wall_s"])
    return result


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--work", required=True,
                    help="dataset work dir containing progress.json")
    ap.add_argument("--prev", default=os.path.join(REPO, "PARITY_F1.json"))
    ap.add_argument("--out-dir", default=REPO)
    args = ap.parse_args(argv)
    result = rebuild(args.work, args.prev)
    write_reports([result], args.out_dir)
    print(json.dumps(
        {k: {m: r[m] for m in ("canonical_f1", "paired_delta_pts",
                               "paired_ci95_pts", "p_noninferior_bootstrap")
             if m in r}
         for k, r in result["models"].items()}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
