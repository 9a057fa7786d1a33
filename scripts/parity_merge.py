"""Merge a seed-subset parity run into a committed PARITY_F1 report.

Why this exists: the round-4 decisive parity run (40 videos x 5 seeds,
scripts/parity_reference.py) completed 4 of 5 seeds before the host was
recycled, taking /tmp — and the raw per-video data in progress.json —
with it. The committed PARITY_F1.json carries every per-SEED statistic
(per-seed canonical F1, per-seed paired deltas) but not the per-video
matrices. Re-running all 5 seeds costs ~8 h on this host class; running
ONLY the missing seed costs ~1.6 h.

That shortcut is exact, not approximate, because every (seed, fold)
cell is deterministic in (settings.seed, s, f_idx): the synthetic world
is fully seeded, torch.manual_seed(run_seed) pins the reference init
and its shuffled training order, and the avsum side threads the same
run_seed through Trainer. A subset run therefore produces bit-identical
numbers to the corresponding slice of a full run — and this tool
*verifies* that claim when the subset includes a seed the committed
report already has (a reproduction seed): the fresh per-seed canonical
F1 and paired delta must match the committed values to report rounding,
or the merge aborts.

What merges exactly from per-seed statistics alone:
  - per_seed_canonical_f1 / per_seed_paired_delta_pts: concatenation
  - aggregate metrics (canonical F1, keyframe F1, rho, tau): means over
    all (seed, fold) cells with equal folds per seed -> weighted mean
    of the committed aggregate and the fresh seed's fold means
  - paired_delta_pts: mean over videos of seed-averaged deltas = mean
    of per-seed deltas (same videos every seed) -> mean of the list
  - seed_std_pts and the SEED-LEVEL paired t CI (the acceptance
    statistic, PARITY_PROCEDURE.md §7): recomputed from the full list

What cannot be recomputed without the lost per-video matrices and is
carried from the committed report, annotated with its seed basis:
  - the video-level CI and its diagnostics (paired_ci95_pts,
    paired_se_pts, videos_abs_delta_gt10, videos_needed_for_ci2pts,
    p_noninferior_bootstrap). These are generalization diagnostics,
    not the acceptance statistic; their seed basis is recorded in
    `video_level_basis_seeds`.

Run: python scripts/parity_merge.py --work <dir-with-progress.json> \
         --prev PARITY_F1.json --out-dir .
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from scripts.parity_reference import write_reports  # noqa: E402

KEYS = ("reference_torch_bilstm", "avsum_bilstm", "avsum_attention")


def _complete_seeds(prog: dict, n_folds: int) -> list[int]:
    """Seed indices whose every fold is present in the progress dump."""
    cells = {(s, f) for s, f in prog.get("cells", [])}
    if not cells:  # legacy prefix dump
        pf, ps = prog["done_through"]
        cells = {
            (ss, ff)
            for ss in range(ps + 1)
            for ff in range(n_folds)
            if ss < ps or ff <= pf
        }
    n_seeds = prog["settings"]["n_seeds"]
    return [
        s for s in range(n_seeds)
        if all((s, f) in cells for f in range(n_folds))
    ]


def _complete_seeds_key(prog: dict, key: str, n_folds: int) -> list[int]:
    """Seeds for which THIS model has all folds (variants-limited
    extension runs train only a subset of contenders per cell)."""
    fm = prog["fold_means"][key]
    return [s for s in range(len(fm)) if len(fm[s]) == n_folds]


def _seed_stats(prog: dict, s: int) -> dict:
    """Per-seed statistics for seed s from the raw progress data.

    Values are UNROUNDED (the committed per-seed lists are rounded for
    display; decision statistics over fresh seeds must use the exact
    values and round only at output — advisor r4)."""
    out = {}
    vids = sorted(prog["video_f1"]["reference_torch_bilstm"][s])
    for key in KEYS:
        folds = prog["fold_means"][key][s]
        if not folds:
            continue  # contender not trained at this seed (variants run)
        out[key] = {
            "fold_mean": {
                m: float(np.mean([f[m] for f in folds])) for m in folds[0]
            },
        }
        if key != "reference_torch_bilstm":
            ref = prog["video_f1"]["reference_torch_bilstm"][s]
            own = prog["video_f1"][key][s]
            out[key]["paired_delta_pts"] = 100.0 * float(
                np.mean([own[v] - ref[v] for v in vids])
            )
    return out


def merge(prev: dict, prog: dict, cross_host: str | None = None) -> dict:
    from scipy import stats as sps

    if "datasets" in prev:
        prev = prev["datasets"][prog["settings"]["dataset"]]
    # n_seeds is NOT part of the world or of any cell's computation
    # (run_seed = settings.seed + 1000*s + f_idx) — an extension run
    # necessarily declares a larger n_seeds, so compare everything else
    _minus = lambda s: {k: v for k, v in s.items() if k != "n_seeds"}
    if _minus(prog["settings"]) != _minus(prev["settings"]):
        raise SystemExit(
            "settings mismatch between progress.json and the committed "
            f"report:\n  fresh: {prog['settings']}\n  prev:  "
            f"{prev['settings']}"
        )
    st = prev["settings"]
    n_folds = st["n_folds"]
    n_prev = prev["seeds_done"]
    # Per-model seed sets: a variants-limited extension run trains only
    # a subset of contenders per cell, so each model extends (or keeps)
    # its own seed prefix. The torch reference trains in every cell.
    seeds_by_key = {
        k: _complete_seeds_key(prog, k, n_folds) for k in KEYS
    }
    repro_by_key = {
        k: [s for s in ss if s < n_prev] for k, ss in seeds_by_key.items()
    }
    new_by_key = {
        k: [s for s in ss if s >= n_prev] for k, ss in seeds_by_key.items()
    }
    if not any(new_by_key.values()):
        raise SystemExit(
            f"no seed beyond the committed {n_prev} in {seeds_by_key}"
        )
    for k, new_k in new_by_key.items():
        if sorted(new_k) != list(range(n_prev, n_prev + len(new_k))):
            raise SystemExit(
                f"{k}: new seeds {new_k} do not extend the prefix {n_prev}"
            )
    # the reference must cover every seed any contender extends to
    # (paired deltas need the same-seed reference arm)
    for k in KEYS[1:]:
        missing = set(new_by_key[k]) - set(new_by_key[KEYS[0]])
        if missing:
            raise SystemExit(
                f"{k} has seeds {sorted(missing)} without a matching "
                "reference arm in the progress data"
            )
    repro = sorted(set().union(*repro_by_key.values()))
    new = new_by_key  # per-key from here on

    # Determinism verification: any reproduced seed must match the
    # committed per-seed numbers to report rounding, else the "subset
    # run == slice of a full run" premise is broken and merging would
    # manufacture a statistic no single run ever produced.
    #
    # Exception (--cross-host): when the committed seeds and the fresh
    # ones ran on DIFFERENT hosts, bit-exact reproduction of the torch
    # reference is not achievable — torch CPU matmul reduction order
    # depends on the host's ISA/thread layout — so instead of aborting,
    # record the measured reproduction discrepancy per (seed, model) in
    # the report. The per-seed PAIRED delta remains a valid replication
    # either way: both contenders in a cell train and are scored inside
    # ONE process on ONE host, so host effects cancel within a seed the
    # same way video difficulty does; across seeds the host becomes part
    # of the (already random) seed environment.
    repro_drift = {}
    for s in repro:
        fresh = _seed_stats(prog, s)
        mism = {}
        for key in KEYS:
            if key not in fresh or s not in repro_by_key[key]:
                continue
            got = round(fresh[key]["fold_mean"]["canonical_f1"], 4)
            want = prev["models"][key]["per_seed_canonical_f1"][s]
            if abs(got - want) > 5e-5:
                if cross_host is None:
                    raise SystemExit(
                        f"DETERMINISM FAILURE seed {s} {key}: fresh "
                        f"canonical F1 {got} != committed {want} — "
                        "refusing to merge (pass --cross-host REASON if "
                        "the committed seeds ran on a different host)"
                    )
                mism[key] = {"fresh": got, "committed": want,
                             "abs_diff_pts": round(100 * abs(got - want), 2)}
            if key != "reference_torch_bilstm":
                gotd = round(fresh[key]["paired_delta_pts"], 2)
                wantd = prev["models"][key]["per_seed_paired_delta_pts"][s]
                if abs(gotd - wantd) > 5e-3:
                    if cross_host is None:
                        raise SystemExit(
                            f"DETERMINISM FAILURE seed {s} {key}: fresh "
                            f"paired delta {gotd} != committed {wantd}"
                        )
                    mism.setdefault(key, {})["paired_delta"] = {
                        "fresh": gotd, "committed": wantd,
                        "abs_diff_pts": round(abs(gotd - wantd), 2),
                    }
        if mism:
            repro_drift[s] = mism
            print(f"seed {s}: cross-host drift recorded for "
                  f"{sorted(mism)} (exact match for the rest)")
        else:
            print(f"seed {s}: reproduction matches committed report exactly")

    n_total_by_key = {k: n_prev + len(new[k]) for k in KEYS}
    n_total = max(n_total_by_key.values())
    protocol = prev["protocol"].replace(
        f"x {n_prev} seeds", f"x {n_total} seeds"
    )
    if n_total != n_prev and protocol == prev["protocol"]:
        raise SystemExit(
            "protocol string substitution failed — the committed "
            f"protocol lacks 'x {n_prev} seeds': {prev['protocol']!r}"
        )
    per_key_note = ", ".join(
        f"{k}: {n_total_by_key[k]}" for k in KEYS
        if n_total_by_key[k] != n_total
    )
    result = {
        "settings": dict(st, n_seeds=max(st["n_seeds"], n_total)),
        "dataset": prev["dataset"],
        "seeds_done": n_total,
        "protocol": protocol
        + (f" (per-model seed counts differ: {per_key_note})"
           if per_key_note else ""),
        "wall_s": prev.get("wall_s"),
        "merge_note": (
            f"seeds 0-{n_prev - 1} from the committed run; fresh seeds "
            + "; ".join(
                f"{k}: {new[k] or 'none'}" for k in KEYS
            )
            + " run under identical deterministic settings"
            + (
                (f"; seeds {repro} re-run on the new host as a "
                 "reproduction probe — see cross_host_reproduction "
                 f"({cross_host})")
                if repro and cross_host and repro_drift else
                (f"; seeds {repro} re-run as determinism proof (matched "
                 "exactly)" if repro else "")
            )
            + "; video-level CI and its diagnostics carried from the "
            f"committed {n_prev}-seed run (raw per-video data for those "
            "seeds lost with the host)"
        ),
        "models": {},
    }
    if repro_drift:
        result["cross_host_reproduction"] = {
            "reason": cross_host,
            "drift_by_seed": {str(s): m for s, m in repro_drift.items()},
        }
    all_new = sorted(set().union(*new.values()))
    fresh_stats = {s: _seed_stats(prog, s) for s in all_new}
    for key in KEYS:
        r = dict(prev["models"][key])  # carry diagnostics fields
        new_k, n_tot_k = new[key], n_total_by_key[key]
        r["n_seeds_model"] = n_tot_k
        if not new_k:  # no fresh seeds for this model: committed row as-is
            r["video_level_basis_seeds"] = n_prev
            result["models"][key] = r
            continue
        # aggregate metrics: equal fold counts per seed -> weighted mean
        for m in fresh_stats[new_k[0]][key]["fold_mean"]:
            if m not in r:
                continue
            fresh_sum = sum(
                fresh_stats[s][key]["fold_mean"][m] for s in new_k
            )
            r[m] = (prev["models"][key][m] * n_prev + fresh_sum) / n_tot_k
        per_seed = list(r["per_seed_canonical_f1"]) + [
            round(fresh_stats[s][key]["fold_mean"]["canonical_f1"], 4)
            for s in new_k
        ]
        r["per_seed_canonical_f1"] = per_seed
        r["seed_std_pts"] = round(100.0 * float(np.std(per_seed)), 2)
        r["video_level_basis_seeds"] = n_prev
        result["models"][key] = r

    ref_f1 = result["models"]["reference_torch_bilstm"]["canonical_f1"]
    for key in ("avsum_bilstm", "avsum_attention"):
        r = result["models"][key]
        if not new[key]:
            continue  # committed decision statistics stand unchanged
        # committed seeds contribute their (display-rounded) recorded
        # deltas — the raw per-video data is gone — while fresh seeds
        # contribute UNROUNDED values; rounding happens only at output
        dseed = np.asarray(
            list(r["per_seed_paired_delta_pts"])
            + [fresh_stats[s][key]["paired_delta_pts"] for s in new[key]],
            np.float64,
        )
        r["per_seed_paired_delta_pts"] = [round(float(d), 2) for d in dseed]
        r["delta_canonical_f1_pts"] = round(
            100.0 * (r["canonical_f1"] - ref_f1), 2
        )
        # mean over videos of seed-averaged deltas == mean of per-seed
        # deltas (same videos every seed) — exact under concatenation
        r["paired_delta_pts"] = round(float(dseed.mean()), 2)
        se = float(dseed.std(ddof=1) / np.sqrt(len(dseed)))
        tcrit = float(sps.t.ppf(0.975, len(dseed) - 1))
        r["seed_paired_se_pts"] = round(se, 2)
        r["seed_paired_ci95_pts"] = [
            round(float(dseed.mean()) - tcrit * se, 2),
            round(float(dseed.mean()) + tcrit * se, 2),
        ]
    return result


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--work", required=True,
                    help="dataset work dir containing progress.json")
    ap.add_argument("--prev", default=os.path.join(REPO, "PARITY_F1.json"))
    ap.add_argument("--out-dir", default=REPO)
    ap.add_argument(
        "--also", action="append", default=[],
        help="extra result-payload JSONs (single-result or "
        "{'datasets': ...} PARITY_F1.json layouts) whose dataset "
        "sections are appended to the written report — e.g. a SumMe "
        "run produced with --out-dir elsewhere",
    )
    ap.add_argument(
        "--cross-host", default=None, metavar="REASON",
        help="permit reproduction-seed drift (recorded, not fatal) when "
        "the committed seeds ran on a different host; REASON is stored "
        "in the report, e.g. 'host recycled; torch CPU reduction order "
        "is host-dependent'",
    )
    args = ap.parse_args(argv)
    with open(os.path.join(args.work, "progress.json")) as fh:
        prog = json.load(fh)
    with open(args.prev) as fh:
        prev = json.load(fh)
    result = merge(prev, prog, cross_host=args.cross_host)
    results = [result]
    for path in args.also:
        with open(path) as fh:
            extra = json.load(fh)
        extras = (
            list(extra["datasets"].values())
            if "datasets" in extra else [extra]
        )
        results += [
            e for e in extras if e["settings"]["dataset"]
            != result["settings"]["dataset"]
        ]
    write_reports(results, args.out_dir)
    for key in ("avsum_bilstm", "avsum_attention"):
        r = result["models"][key]
        print(key, "delta", r["paired_delta_pts"],
              "seed CI", r["seed_paired_ci95_pts"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
