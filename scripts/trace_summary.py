"""Summarise a ``jax.profiler`` trace into a per-op timing table.

Makes the per-op numbers in BASELINE.md reproducible by a checked-in tool
(VERDICT round-1 weak #8): run ``python bench.py --trace /tmp/trace`` then

    python scripts/trace_summary.py /tmp/trace [--top 25]

Parses the Perfetto/Chrome-trace JSON the profiler writes under
``plugins/profile/<run>/*.trace.json.gz`` and aggregates complete events by
name across all device tracks, printing total/mean duration and call count,
sorted by total time.
"""

from __future__ import annotations

import argparse
import gzip
import json
from collections import defaultdict
from pathlib import Path


def load_events(trace_dir: Path):
    files = sorted(trace_dir.rglob("*.trace.json.gz")) + sorted(
        trace_dir.rglob("*.trace.json")
    )
    if not files:
        raise FileNotFoundError(f"no *.trace.json(.gz) under {trace_dir}")
    for f in files:
        opener = gzip.open if f.suffix == ".gz" else open
        with opener(f, "rt") as fh:
            data = json.load(fh)
        yield f, data.get("traceEvents", [])


def summarise(trace_dir: Path, top: int = 25):
    total = defaultdict(float)
    count = defaultdict(int)
    for _, events in load_events(trace_dir):
        for e in events:
            # complete events carry a duration in microseconds
            if e.get("ph") == "X" and "dur" in e and e.get("name"):
                name = e["name"]
                total[name] += float(e["dur"])
                count[name] += 1
    rows = sorted(total.items(), key=lambda kv: -kv[1])[:top]
    width = max((len(n) for n, _ in rows), default=4)
    print(f"{'op':<{width}}  {'total_ms':>10}  {'calls':>7}  {'mean_us':>10}")
    for name, t in rows:
        print(f"{name:<{width}}  {t / 1e3:>10.3f}  {count[name]:>7}  "
              f"{t / max(count[name], 1):>10.1f}")
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir", type=Path)
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args(argv)
    summarise(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
