"""Benchmark: SG-MCMC sampling throughput at 128^3 (experiment-1 scale).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "samples/sec", "vs_baseline": N}

* value        — chains x transitions / sec of the full SGLD transition on
                 the attached accelerator (TPU under axon), 2 chains, 128^3,
                 GMM K=4, Sobolev s=3, uniform noise, virtual decimation,
                 learnable log-normal regulariser — the reference's
                 experiment-1 configuration and its headline runtime metric
                 (trainer/trainer.py:467-476 "MCMC sampling speed").
* vs_baseline  — speedup over the torch-CPU transition measured on this
                 machine (scripts/torch_baseline.py), cached in
                 .bench_baseline.json (the reference publishes no numbers —
                 BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

DIMS = (128, 128, 128)
CHAINS = 2
WARMUP_STEPS = 2
TIMED_STEPS = 20

REPO = Path(__file__).resolve().parent
BASELINE_CACHE = REPO / ".bench_baseline.json"


def measure_torch_baseline() -> float:
    if BASELINE_CACHE.exists():
        return json.loads(BASELINE_CACHE.read_text())["samples_per_sec"]
    # run in a subprocess with jax plugins disabled so torch-CPU timing is clean
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c",
         "from scripts.torch_baseline import run_baseline; print(run_baseline())"],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise RuntimeError("torch baseline failed")
    sps = float(out.stdout.strip().splitlines()[-1])
    BASELINE_CACHE.write_text(json.dumps({"samples_per_sec": sps, "dims": DIMS}))
    return sps


def measure_tpu() -> float:
    import jax
    import jax.numpy as jnp

    from ir_sgmcmc_tpu.data import sphere_pair
    from ir_sgmcmc_tpu.engine import init_chains, make_mcmc_chunk
    from ir_sgmcmc_tpu.engine.bundle import ModelBundle
    from ir_sgmcmc_tpu.models import (
        GMM,
        DirichletPrior,
        LogEnergyExpGammaPrior,
        LogScaleNormalPrior,
        SVF3D,
    )
    from ir_sgmcmc_tpu.models.reg_loss import RegLossLogNormal
    from ir_sgmcmc_tpu.optim import adam_decay

    dims = DIMS
    dof = 3.0 * dims[0] * dims[1] * dims[2]
    bundle = ModelBundle(
        dims=dims,
        gmm=GMM(4, 1),
        scale_prior=LogScaleNormalPrior(0.0, 2.3),
        proportion_prior=DirichletPrior(4, 0.5),
        reg_loss=RegLossLogNormal(w_reg=1.4, dims=dims, learnable=True),
        reg_loc_prior=LogEnergyExpGammaPrior(w_reg=1.4, dof=dof),
        reg_scale_prior=LogScaleNormalPrior(loc=2.8, scale=5.0),
        transformation=SVF3D(dims, no_steps=12),
        sobolev_s=3,
        sobolev_lambda=0.5,
        uniform_noise_alpha=0.1,
        virtual_decimation=True,
    )
    fixed, moving = sphere_pair(dims, offset=(0.0, 0.0, 4.0))
    fixed = {k: jnp.asarray(v) for k, v in fixed.items()}
    moving = {k: jnp.asarray(v) for k, v in moving.items()}

    opt_gmm = adam_decay(0.2, 0.001)
    opt_reg = adam_decay({"loc": 0.01, "log_scale": 0.01}, 0.001)

    state = init_chains(
        bundle, jax.random.PRNGKey(0), no_chains=CHAINS, mode="noise",
        q_v=None, gmm=bundle.gmm.init_params(), reg=bundle.reg_loss.init_params(),
        opt_gmm=opt_gmm, opt_reg=opt_reg,
    )

    warm = make_mcmc_chunk(bundle, opt_gmm, opt_reg, 1e-5, fixed, moving,
                           chunk=WARMUP_STEPS, burn_in=0, thin=1)
    timed = make_mcmc_chunk(bundle, opt_gmm, opt_reg, 1e-5, fixed, moving,
                            chunk=TIMED_STEPS, burn_in=0, thin=1)

    # block_until_ready does not actually block under the axon tunnel;
    # force host syncs with float(·)
    state, _ = warm(state)
    _ = float(jnp.sum(state.v))
    # compile the timed chunk before the clock starts
    state, m = timed(state)
    _ = float(jnp.sum(state.v))

    t0 = time.perf_counter()
    state, m = timed(state)
    _ = float(jnp.sum(state.v))
    dt = time.perf_counter() - t0
    return CHAINS * TIMED_STEPS / dt


def main():
    baseline = measure_torch_baseline()
    value = measure_tpu()
    print(json.dumps({
        "metric": "sgmcmc_samples_per_sec_128cubed_2chains",
        "value": round(value, 3),
        "unit": "samples/sec",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    main()
