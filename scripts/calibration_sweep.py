"""Calibration sweep: is corr(posterior std, error) ~0.48 a ceiling of the
model/protocol or an artifact of this framework?  (VERDICT r3 #7)

Varies ONE inference knob at a time from the canonical 128-cubed protocol
(vi 384 / burn-in 300 / samples 700 / thin 1 / uniform-noise 0.1 / 2 chains)
and records the three quality numbers per point, appending JSONL so an
interrupted sweep resumes where it stopped.  The knobs are the ones the
VERDICT names: posterior-accumulator thinning (the reference accumulates
every ``log_period_MCMC``-th sample only — /root/reference/trainer/
trainer.py:436-452 — ours defaults to every sample), burn-in length, total
sample count, and the transformation-noise magnitude
(utils/util.py:44-53's ``alpha``).

The reference-anchored target on the SAME protocol comes from
scripts/head_to_head.py (its ``calibration_corr`` field for the reference
side); this sweep answers the "framework artifact?" half.

Usage::

    python scripts/calibration_sweep.py --out /tmp/calib_sweep.jsonl
    python scripts/calibration_sweep.py --quick   # 64-cubed CPU smoke
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CANON = {"vi-iters": 384, "burn-in": 300, "samples": 700,
         "magnitude": 6, "dims": 128}

# one knob moved per point; name -> extra argv
POINTS = [
    ("canonical", {}),
    ("thin_5", {"thin": 5}),
    ("thin_25", {"thin": 25}),
    ("thin_40", {"thin": 40}),            # the reference's effective thinning
                                          # at the head-to-head protocol
                                          # (log_period_MCMC = 40)
    ("burn_600", {"burn-in": 600}),
    # burn-in turned out to be the live lever (600 -> calib 0.546 vs 0.476
    # at the canonical 300): chase the saturation point
    ("burn_1200", {"burn-in": 1200}),
    ("burn_2400", {"burn-in": 2400}),
    ("burn_1200_samples_1400", {"burn-in": 1200, "samples": 1400}),
    # VERDICT r4 #7: the saturation level rested on seed 0 alone — replicate
    # the burn-in lever across trainer seeds (GT draw fixed, inference noise
    # varies) to put a spread on the ~0.55 plateau
    ("burn_1200_seed1", {"burn-in": 1200, "trainer-seed": 1}),
    ("burn_1200_seed2", {"burn-in": 1200, "trainer-seed": 2}),
    ("burn_2400_seed1", {"burn-in": 2400, "trainer-seed": 1}),
    ("burn_2400_seed2", {"burn-in": 2400, "trainer-seed": 2}),
    ("samples_1400", {"samples": 1400}),
    ("noise_0.05", {"noise-alpha": 0.05}),
    ("noise_0.2", {"noise-alpha": 0.2}),
    ("chains_4", {"chains": 4}),
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/calib_sweep.jsonl")
    p.add_argument("--quick", action="store_true",
                   help="64-cubed reduced-iteration smoke on CPU")
    p.add_argument("--only", default=None,
                   help="comma-separated point names to (re)run")
    args = p.parse_args(argv)

    out = Path(args.out)
    done = set()
    if out.exists():
        for line in out.read_text().splitlines():
            try:
                done.add(json.loads(line)["point"])
            except (json.JSONDecodeError, KeyError):
                pass

    base = dict(CANON)
    if args.quick:
        base.update({"dims": 64, "magnitude": 4, "vi-iters": 64,
                     "burn-in": 50, "samples": 100})

    only = set(args.only.split(",")) if args.only else None
    for name, delta in POINTS:
        if only is not None and name not in only:
            continue
        if only is None and name in done:
            print(f"[sweep] {name}: already in {out}, skipping",
                  file=sys.stderr, flush=True)
            continue
        cfg = dict(base)
        cfg.update(delta)
        cmd = [sys.executable, str(REPO / "scripts/quality_eval.py")]
        for k, v in cfg.items():
            cmd += [f"--{k}", str(v)]
        print(f"[sweep] {name}: {' '.join(cmd[2:])}", file=sys.stderr,
              flush=True)
        t0 = time.monotonic()
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=3600, cwd=str(REPO))
        except subprocess.TimeoutExpired:
            # ADVICE r4: record the timeout and keep sweeping — an uncaught
            # TimeoutExpired aborted the whole sweep AND poisoned resume
            # (the missing JSONL record made every resume re-run the same
            # slow point and crash again).
            wall = round(time.monotonic() - t0, 1)
            rec = {"point": name, "knobs": delta, "wall_s": wall,
                   "error": "timeout"}
            with out.open("a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"[sweep] {name}: TIMEOUT after {wall}s — skipping",
                  file=sys.stderr, flush=True)
            continue
        wall = round(time.monotonic() - t0, 1)
        rec = {"point": name, "knobs": delta, "wall_s": wall}
        if proc.returncode == 0:
            # quality_eval prints the report as its last JSON stdout line
            parsed = None
            for line in reversed(proc.stdout.splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    try:
                        parsed = json.loads(line)
                        break
                    except json.JSONDecodeError:
                        continue
            if parsed is not None:
                rec.update(parsed)
            else:
                rec["error"] = "unparseable stdout"
                rec["stdout_tail"] = proc.stdout[-500:]
        else:
            rec["error"] = f"rc={proc.returncode}"
            rec["stderr_tail"] = proc.stderr[-800:]
        with out.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[sweep] {name}: done in {wall}s -> "
              f"calib={rec.get('uncertainty_calibration_corr')}",
              file=sys.stderr, flush=True)

    # summary table
    rows = [json.loads(x) for x in out.read_text().splitlines()]
    print(json.dumps([{k: r.get(k) for k in
                       ("point", "dsc_mcmc", "disp_err_mean_vox",
                        "uncertainty_calibration_corr", "wall_s", "error")}
                      for r in rows], indent=2))


if __name__ == "__main__":
    main()
