"""Summarise integrator-ablation JSONL (scripts/ablate_integrator.py output).

Prints one row per stage: seed count, mean +- half-spread for Dice,
displacement error, uncertainty calibration, and samples/sec — the numbers
the round-2 VERDICT asked to compare with seed spread (item #1).

Usage:
    python scripts/summarize_ablation.py ablation_r3.jsonl [more.jsonl ...]
        [--markdown]
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict

FIELDS = [
    ("dsc_mcmc", "Dice"),
    ("disp_err_mean_vox", "disp err (vox)"),
    ("uncertainty_calibration_corr", "calibration"),
    ("mcmc_samples_per_sec", "samples/sec"),
]


def _fmt(values):
    if not values:
        return "—"
    mean = sum(values) / len(values)
    if len(values) == 1:
        return f"{mean:.4f}"
    half = (max(values) - min(values)) / 2.0
    return f"{mean:.4f} ± {half:.4f}"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("jsonl", nargs="+")
    p.add_argument("--markdown", action="store_true")
    args = p.parse_args(argv)

    by_stage = defaultdict(list)
    for path in args.jsonl:
        for line in open(path):
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if r.get("error") or "stage" not in r:
                continue
            by_stage[(path, r["stage"], r.get("dims", "?"))].append(r)

    sep = " | " if args.markdown else "  "
    header = ["file", "stage", "dims", "n"] + [label for _, label in FIELDS]
    rows = [header]
    for (path, stage, dims), recs in sorted(by_stage.items()):
        row = [path, stage, str(dims), str(len(recs))]
        for key, _ in FIELDS:
            row.append(_fmt([float(r[key]) for r in recs if key in r]))
        rows.append(row)

    widths = [max(len(r[i]) for r in rows) for i in range(len(header))]
    for i, row in enumerate(rows):
        cells = [c.ljust(w) for c, w in zip(row, widths)]
        line = sep.join(cells)
        print(f"| {line} |" if args.markdown else line)
        if args.markdown and i == 0:
            print("|" + "|".join("---" for _ in header) + "|")


if __name__ == "__main__":
    main()
