"""Summarize the reference-vs-TPU learning-curve comparison.

Reads logs/curvecmp/{ref,tpu}_s<seed>/metrics.jsonl written by
tools/compare_reference_curve.py and answers the BASELINE.md criterion
question directly: is the between-IMPLEMENTATION gap within the
between-SEED variance?

    python scripts/analyze_curve_compare.py [--root logs/curvecmp]
"""

import argparse
import glob
import json
import os
from collections import defaultdict

import numpy as np


def load(root):
    """side -> seed -> {metric: array aligned by iteration}.  Episodic
    per-term metrics only appear on iterations where envs reset; they are
    forward-filled (each value IS the latest finished-episode snapshot) and
    NaN before the first snapshot."""
    runs = defaultdict(dict)
    for d in sorted(glob.glob(os.path.join(root, "*_s*"))):
        name = os.path.basename(d)
        side, seed = name.rsplit("_s", 1)
        rows = [json.loads(l) for l in open(os.path.join(d, "metrics.jsonl"))]
        n = len(rows)
        keys = set().union(*(r.keys() for r in rows))
        series = {}
        for k in keys:
            arr = np.full(n, np.nan)
            last = np.nan
            for i, r in enumerate(rows):
                if k in r:
                    last = r[k]
                arr[i] = last
            series[k] = arr
        runs[side][int(seed)] = series
    return runs


def window_mean(arr, lo, hi):
    lo, hi = max(lo, 0), min(hi, len(arr))
    if hi <= lo:
        return float("nan")
    w = arr[lo:hi]
    return float(np.nanmean(w)) if np.isfinite(w).any() else float("nan")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="logs/curvecmp")
    p.add_argument("--metrics", default=(
        "mean_reward,rew_tracking_lin_vel,rew_tracking_ang_vel,"
        "rew_orientation,rew_dof_acc,rew_action_rate,rew_default_position,"
        "rew_body_contact_forces,rew_termination,mean_noise_std,kl"))
    args = p.parse_args()

    runs = load(args.root)
    sides = sorted(runs)
    assert len(sides) == 2, f"need both sides, have {sides}"
    n_iter = min(len(s["iter"]) for side in sides for s in runs[side].values())
    windows = [(0, n_iter // 4), (n_iter // 4, n_iter // 2),
               (n_iter // 2, 3 * n_iter // 4), (3 * n_iter // 4, n_iter)]

    print(f"runs: " + ", ".join(
        f"{side} seeds {sorted(runs[side])}" for side in sides))
    print(f"iterations compared: {n_iter}\n")
    verdict_rows = []
    for metric in args.metrics.split(","):
        have = all(metric in s for side in sides for s in runs[side].values())
        if not have:
            continue
        print(f"== {metric} (window means) ==")
        print("window   " + " ".join(f"{side + '_s' + str(seed):>10}"
                                     for side in sides
                                     for seed in sorted(runs[side])) +
              f" {'gap':>9} {'seed_sd':>9}")
        worst_ratio = 0.0
        for (lo, hi) in windows:
            vals = {side: [window_mean(runs[side][seed][metric], lo, hi)
                           for seed in sorted(runs[side])] for side in sides}
            gap = abs(np.mean(vals[sides[0]]) - np.mean(vals[sides[1]]))
            # seed spread pooled over both sides
            spread = np.std(
                np.concatenate([
                    np.asarray(vals[s]) - np.mean(vals[s]) for s in sides
                ]), ddof=1,
            ) * np.sqrt(2.0)
            ratio = gap / spread if spread > 0 else float("inf")
            worst_ratio = max(worst_ratio, ratio)
            cells = " ".join(f"{v:>10.4f}" for s in sides for v in vals[s])
            print(f"{lo:3d}-{hi:3d}  {cells} {gap:>9.4f} {spread:>9.4f}")
        verdict_rows.append((metric, worst_ratio))
        print()

    print("== verdict: between-implementation gap / between-seed spread ==")
    for metric, ratio in verdict_rows:
        flag = "OK" if ratio <= 2.0 else "EXCEEDS"
        print(f"  {metric:28s} worst-window ratio {ratio:6.2f}  [{flag}]")


if __name__ == "__main__":
    main()
