"""Seed-replicated ablation of the SVF integrator stages (VERDICT r2 #1).

Runs the canonical 128³ quality protocol (scripts/quality_eval.py) for each
integrator stage over several trainer seeds (GT deformation fixed), in
fresh subprocesses, appending one JSON line per run to the output file:

* ``gather``  — reference-exact grid_sample scaling-and-squaring
  (/root/reference/utils/transformation.py:63-76, the integration the
  posterior quality is judged against);
* ``warp``    — radius-1 blend squarings + one-sided compositions
  (``taylor_threshold=0``);
* ``taylor``  — default: sub-voxel squarings in second-order Taylor form.

Usage:
    python scripts/ablate_integrator.py --out ablation.jsonl \
        [--seeds 0 1 2] [--stages taylor warp gather] [--dims 128]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

STAGES = {
    # Taylor squarings + blend-warp compositions (the pre-split default;
    # recorded rows named 'taylor' used this meaning)
    "taylor": ["--taylor-compositions", "off"],
    # all-blend integrator (no Taylor anywhere)
    "warp": ["--taylor-threshold", "0", "--taylor-compositions", "off"],
    # composition phase as fused Taylor stencils at the SAME step count as
    # the warp split (threshold 1.0 -> e unchanged): +20% samples/sec on
    # TPU (the warp kernels ran at 29% of HBM SoL, the stencils at ~100%)
    # but UNSTABLE end-to-end: the one-sided (u.grad)d is anti-upwind for
    # positive offsets — both 128^3 seeds folded/saturated during VI
    "taylor_comp1": ["--taylor-compositions", "on",
                     "--taylor-threshold", "1.0"],
    # the stable form of the same idea: dimensionally-split per-axis lerps
    # (convex per pass — max principle), Pallas kernels on TPU,
    # warp-identical clamping.  The DEFAULT since the round-3 flip
    # (+34% samples/sec at seed-replicated quality parity)
    "split": ["--taylor-compositions", "split"],
    # the split default with the squaring phase in bfloat16 (SVF3D
    # compute_dtype) — the bandwidth-bound sub-voxel Taylor scan halves its
    # HBM bytes; compositions/outputs/sampler state stay f32
    "split_bf16": ["--taylor-compositions", "split",
                   "--compute-dtype", "bfloat16"],
    # bf16 through the COMPOSITION scans too (the round-3 second flip:
    # dtype-generic split kernels halve the phase's DMA traffic; recorded
    # split_bf16 rows predate this and cover the squaring phase only)
    "split_bf16comp": ["--taylor-compositions", "split",
                       "--compute-dtype", "bfloat16"],
    # gather transitions are ~2.5x slower — a 200-step device chunk exceeds
    # the axon worker's single-program duration boundary (BASELINE.md
    # "Scan-chunk TPU fault") and crashes the worker, so cap the chunk
    "gather": ["--use-gather", "--max-device-chunk", "50"],
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="ablation.jsonl")
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--stages", nargs="+", default=["taylor", "warp", "gather"],
                   choices=list(STAGES))
    p.add_argument("--dims", type=int, default=128)
    p.add_argument("--magnitude", type=float, default=6.0)
    p.add_argument("--vi-iters", type=int, default=384)
    p.add_argument("--burn-in", type=int, default=300)
    p.add_argument("--samples", type=int, default=700)
    args = p.parse_args(argv)

    out_path = Path(args.out)
    done = set()
    if out_path.exists():
        for line in out_path.read_text().splitlines():
            try:
                r = json.loads(line)
                if not r.get("error"):
                    done.add((r["stage"], r["trainer_seed"]))
            except (json.JSONDecodeError, KeyError):
                pass

    for stage in args.stages:
        for seed in args.seeds:
            if (stage, seed) in done:
                print(f"skip {stage} seed {seed} (already in {out_path})",
                      file=sys.stderr)
                continue
            cmd = [
                sys.executable, "scripts/quality_eval.py",
                "--dims", str(args.dims), "--magnitude", str(args.magnitude),
                "--vi-iters", str(args.vi_iters),
                "--burn-in", str(args.burn_in),
                "--samples", str(args.samples),
                "--seed", "0", "--trainer-seed", str(seed),
            ] + STAGES[stage]
            t0 = time.time()
            print(f"== {stage} seed {seed}: {' '.join(cmd)}", file=sys.stderr)
            try:
                proc = subprocess.run(cmd, cwd=str(REPO), capture_output=True,
                                      text=True, timeout=7200)
            except subprocess.TimeoutExpired as e:
                # one over-budget run must not kill the whole driver — record
                # an error row so the resume logic retries only this cell
                rec = {"stage": stage, "trainer_seed": seed, "error": True,
                       "stderr_tail": f"timeout after {e.timeout}s"}
                proc = None
            if proc is not None and proc.returncode != 0:
                rec = {"stage": stage, "trainer_seed": seed, "error": True,
                       "stderr_tail": proc.stderr[-1500:]}
            elif proc is not None:
                try:
                    rec = json.loads(proc.stdout.strip().splitlines()[-1])
                except (json.JSONDecodeError, IndexError):
                    rec = {"stage": stage, "trainer_seed": seed, "error": True,
                           "stderr_tail": "rc=0 but no JSON on stdout: "
                                          + proc.stdout[-500:]}
                rec["stage"] = stage
            rec["wall_s"] = round(time.time() - t0, 1)
            with out_path.open("a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), file=sys.stderr)


if __name__ == "__main__":
    main()
