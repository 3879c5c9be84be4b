"""Dump training metrics from a run dir (tfevents or metrics.jsonl) as a
markdown table at selected iterations — the learning-curve evidence for
BENCH_NOTES (reference milestone: policy walks at iteration 2000,
/root/reference/play.py:68).

    python scripts/dump_metrics.py <run_dir> [--every 200]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from collections import defaultdict


def load_tfevents(run_dir: str) -> dict:
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(run_dir, size_guidance={"scalars": 0})
    acc.Reload()
    out = {}
    for tag in acc.Tags()["scalars"]:
        out[tag] = [(e.step, e.value) for e in acc.Scalars(tag)]
    return out


def load_jsonl(run_dir: str) -> dict:
    out = defaultdict(list)
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            out[r["tag"]].append((r["step"], r["value"]))
    return dict(out)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--every", type=int, default=200)
    p.add_argument("--tags", type=str, default=None,
                   help="comma-separated tag filter (default: all)")
    args = p.parse_args()

    if glob.glob(os.path.join(args.run_dir, "events.out.tfevents.*")):
        data = load_tfevents(args.run_dir)
    else:
        data = load_jsonl(args.run_dir)

    tags = sorted(data)
    if args.tags:
        want = args.tags.split(",")
        tags = [t for t in tags if any(w in t for w in want)]
    last_step = max(s for series in data.values() for (s, _) in series)
    steps = list(range(args.every, last_step + 1, args.every))
    if not steps or steps[-1] != last_step:
        steps.append(last_step)

    def at(series, step):
        best = None
        for (s, v) in series:
            if s <= step:
                best = v
        return best

    print("| iter | " + " | ".join(t.split("/")[-1] for t in tags) + " |")
    print("|" + "---|" * (len(tags) + 1))
    for step in steps:
        row = [f"{at(data[t], step):.4g}" if at(data[t], step) is not None
               else "-" for t in tags]
        print(f"| {step} | " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
