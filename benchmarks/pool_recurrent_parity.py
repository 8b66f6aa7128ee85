"""Pool the recurrent physics parity studies to 40 seeds/side and compute
the same tail-symmetry statistics the feedforward 40-seed study carries
(PARITY.md "Physics-grade learning-curve parity"): checkpoint mean±std,
medians + Welch t / Mann-Whitney U on the finals, laggard counts per side,
and per-seed final spans.

Inputs: benchmarks/results/parity_nlink_recurrent{,_b,_c}.json
(seeds 1-10, 11-20, 21-40 of benchmarks/parity_nlink.py --recurrent).
Writes benchmarks/results/parity_nlink_recurrent_pooled.json.
"""

from __future__ import annotations

import json
import os

import numpy as np
from scipy import stats as sps

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
PARTS = ("parity_nlink_recurrent", "parity_nlink_recurrent_b", "parity_nlink_recurrent_c")
CHECKPOINTS = (100, 200, 350, 500)
LAGGARD_THRESHOLD = -250.0
# the established checkpoint statistic (benchmarks/parity_pendulum.py
# summarize): per-seed nan-aware mean over the trailing 20-iteration
# window, then mean/std (population) across seeds
FINAL_WINDOW = 20


def main() -> None:
    curves = {"rsl_rl_tpu": [], "reference": []}
    seeds = []
    for part in PARTS:
        with open(os.path.join(RESULTS, part + ".json")) as f:
            d = json.load(f)
        seeds.extend(d["seeds"])
        for arm in curves:
            curves[arm].extend(d["curves"][arm])
    n = len(seeds)
    assert len(curves["rsl_rl_tpu"]) == len(curves["reference"]) == n

    arrs = {arm: np.asarray(c, np.float64) for arm, c in curves.items()}  # [n, 500]
    out: dict = {"task": "po_nlink5_gru_64envs", "seeds": seeds, "n_per_side": n,
                 "checkpoints": [], "finals": {}}

    for it in CHECKPOINTS:
        row = {"iteration": it}
        for arm, a in arrs.items():
            # per-iteration reward is the mean over episodes COMPLETED that
            # iteration and can be NaN on an episodeless iteration
            v = np.nanmean(a[:, max(0, it - FINAL_WINDOW):it], axis=1)
            row[arm] = round(float(v.mean()), 1)
            row[arm + "_std"] = round(float(v.std()), 1)  # ddof=0, matches summarize
            row[arm + "_median"] = round(float(np.median(v)), 1)
        out["checkpoints"].append(row)
        print(row, flush=True)

    finals = {arm: np.nanmean(a[:, -FINAL_WINDOW:], axis=1) for arm, a in arrs.items()}
    ours, ref = finals["rsl_rl_tpu"], finals["reference"]
    welch = sps.ttest_ind(ours, ref, equal_var=False)
    mwu = sps.mannwhitneyu(ours, ref, alternative="two-sided")
    out["finals"] = {
        "window_iters": FINAL_WINDOW,
        "rsl_rl_tpu": {
            "mean": round(float(ours.mean()), 1),
            "std": round(float(ours.std()), 1),
            "median": round(float(np.median(ours)), 1),
            "min": round(float(ours.min()), 1),
            "max": round(float(ours.max()), 1),
            "laggards_below_-250": int((ours < LAGGARD_THRESHOLD).sum()),
            "per_seed": [round(float(x), 1) for x in ours],
        },
        "reference": {
            "mean": round(float(ref.mean()), 1),
            "std": round(float(ref.std()), 1),
            "median": round(float(np.median(ref)), 1),
            "min": round(float(ref.min()), 1),
            "max": round(float(ref.max()), 1),
            "laggards_below_-250": int((ref < LAGGARD_THRESHOLD).sum()),
            "per_seed": [round(float(x), 1) for x in ref],
        },
        "welch_t_p": round(float(welch.pvalue), 4),
        "mann_whitney_u_p": round(float(mwu.pvalue), 4),
    }
    print(json.dumps(out["finals"], indent=1), flush=True)

    path = os.path.join(RESULTS, "parity_nlink_recurrent_pooled.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {path}")


if __name__ == "__main__":
    main()
