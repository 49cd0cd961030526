"""Probe the max stable device-resident scan-chunk length on the attached
accelerator.

Round-1 finding (commit 2059a..): at 128^3, `lax.scan` chunks beyond ~200
SGLD transitions reproducibly fault the TPU worker under the axon tunnel;
the trainer caps chunks at ``trainer.max_device_chunk`` (default 200) as a
mitigation.  This script turns the bisected magic number into a measured
one (VERDICT round-1 next-step #8): it runs single chunks of increasing
length, EACH IN A FRESH SUBPROCESS so a fault cannot wedge the probing
process, and reports the largest length that completes.

Usage (on the TPU; run alone — concurrent TPU processes wedge the relay):
    python scripts/scan_fault_probe.py --dims 64 --lengths 50 100 200 250 300

The child measures one jitted `make_mcmc_chunk(chunk=L)` call on the
experiment-1 model (2 chains).  rc!=0 / timeout => that length faults.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
from ir_sgmcmc_tpu.data import sphere_pair
from ir_sgmcmc_tpu.engine import init_chains, make_mcmc_chunk
from ir_sgmcmc_tpu.engine.bundle import ModelBundle
from ir_sgmcmc_tpu.models import GMM, DirichletPrior, LogScaleNormalPrior, SVF3D
from ir_sgmcmc_tpu.models.reg_loss import RegLossL2
from ir_sgmcmc_tpu.optim import adam_decay

dims = tuple({dims!r})
L = {length}
bundle = ModelBundle(
    dims=dims, gmm=GMM(4, 1),
    scale_prior=LogScaleNormalPrior(0.0, 2.3),
    proportion_prior=DirichletPrior(4, 0.5),
    reg_loss=RegLossL2(w_reg=1.0, dims=dims),
    transformation=SVF3D(dims, no_steps=12),
    sobolev_s=3, uniform_noise_alpha=0.1, virtual_decimation=True,
)
fixed, moving = sphere_pair(dims, offset=(0.0, 0.0, 2.0))
fixed = {{k: jnp.asarray(v) for k, v in fixed.items()}}
moving = {{k: jnp.asarray(v) for k, v in moving.items()}}
opt_gmm = adam_decay(0.2, 0.001)
opt_reg = adam_decay(0.01, 0.001)
state = init_chains(bundle, jax.random.PRNGKey(0), no_chains=2, mode="noise",
                    q_v=None, gmm=bundle.gmm.init_params(),
                    reg=bundle.reg_loss.init_params(),
                    opt_gmm=opt_gmm, opt_reg=opt_reg)
chunk = make_mcmc_chunk(bundle, opt_gmm, opt_reg, 1e-5, fixed, moving,
                        chunk=L, burn_in=0, thin=1)
t0 = time.perf_counter()
state, m = chunk(state)
x = float(jnp.sum(state.v))  # host sync (axon-safe)
dt = time.perf_counter() - t0
assert x == x, "non-finite state"
print(json.dumps({{"length": L, "ok": True, "wall_s": round(dt, 2)}}))
"""


def probe(length: int, dims, timeout_s: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    code = _CHILD.format(repo=str(REPO), dims=tuple(dims), length=length)
    t0 = time.perf_counter()
    try:
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"length": length, "ok": False, "reason": "timeout"}
    if out.returncode != 0:
        return {"length": length, "ok": False, "rc": out.returncode,
                "stderr_tail": out.stderr[-500:]}
    return json.loads(out.stdout.strip().splitlines()[-1])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dims", type=int, default=128)
    p.add_argument("--lengths", type=int, nargs="+",
                   default=[50, 100, 200, 250, 300])
    p.add_argument("--timeout", type=int, default=900)
    args = p.parse_args(argv)

    results = []
    for L in args.lengths:
        r = probe(L, (args.dims,) * 3, args.timeout)
        results.append(r)
        print(json.dumps(r), flush=True)
        if not r.get("ok"):
            break  # a faulted worker may need the relay to recover
    stable = [r["length"] for r in results if r.get("ok")]
    print(json.dumps({
        "dims": args.dims,
        "max_stable_chunk": max(stable) if stable else 0,
        "results": results,
    }))


if __name__ == "__main__":
    main()
