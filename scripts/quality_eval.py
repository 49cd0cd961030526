"""End-to-end registration-quality evaluation against a KNOWN deformation.

Builds a synthetic pair whose fixed volume is the moving volume warped by a
known random smooth diffeomorphism (``ir_sgmcmc_tpu.data.svf_pair``), runs
the FULL two-phase pipeline through the Trainer (the same path as
``run.py``), and reports the three quality numbers the reference's outputs
are judged by (VERDICT round-1 next-step #3):

* Dice of the warped segmentation (before/after),
* displacement error vs. the ground-truth field (mean/p95, voxels, inside
  the mask),
* uncertainty calibration — Pearson correlation between the per-voxel
  posterior std-dev and the actual displacement error (BASELINE.json
  configs 4-5 name the per-voxel uncertainty maps as the deliverable).

Usage (CPU smoke):
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/quality_eval.py \
        --dims 32 --magnitude 3 --vi-iters 64 --burn-in 50 --samples 150
TPU (128^3, the canonical scale):
    python scripts/quality_eval.py --dims 128 --magnitude 6 \
        --vi-iters 384 --burn-in 300 --samples 700
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class _PairDataset:
    """Minimal dataset wrapper around one in-memory pair."""

    def __init__(self, fixed, moving, q_v0, structures):
        self._item = (fixed, moving, q_v0)
        self.im_spacing = (1.0, 1.0, 1.0)
        self.structures = structures

    def __len__(self):
        return 1

    def __getitem__(self, idx):
        return self._item


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dims", type=int, default=32)
    p.add_argument("--magnitude", type=float, default=3.0,
                   help="peak GT displacement (voxels)")
    p.add_argument("--vi-iters", type=int, default=64)
    p.add_argument("--burn-in", type=int, default=50)
    p.add_argument("--samples", type=int, default=150)
    p.add_argument("--chains", type=int, default=2)
    p.add_argument("--max-disp", type=int, default=8)
    p.add_argument("--mcmc-init", choices=["VI", "identity", "noise"],
                   default="VI",
                   help="'identity'/'noise' run the experiment-4 MCMC-only "
                        "cold start (no VI phase at all — reference "
                        "trainer/trainer.py:586-611, "
                        "configs/experiment4/*.json)")
    p.add_argument("--model", choices=["svf", "svffd"], default="svf",
                   help="transformation model: dense SVF (experiment-1 "
                        "default) or the B-spline-parameterised SVFFD "
                        "(experiment-5, reference utils/transformation.py:"
                        "156-164)")
    p.add_argument("--cps", type=int, default=2,
                   help="SVFFD control point spacing (voxels; experiment-5 "
                        "ships cps 2 and 4)")
    p.add_argument("--seed", type=int, default=0,
                   help="GT-deformation seed (and trainer seed unless "
                        "--trainer-seed is given)")
    p.add_argument("--trainer-seed", type=int, default=None,
                   help="trainer RNG seed, decoupled from the GT seed so "
                        "seed-replication varies only the inference noise")
    p.add_argument("--taylor-threshold", type=float, default=0.5,
                   help="SVF integrator: max |u| (voxels) for Taylor-form "
                        "squarings; 0 disables Taylor (all squarings warp)")
    p.add_argument("--use-gather", action="store_true",
                   help="SVF integrator: reference-exact gather-based "
                        "squaring (grid_sample self-composition)")
    p.add_argument("--taylor-compositions", choices=["on", "off", "split"],
                   default=None,
                   help="composition-phase step: 'on' = pure Taylor "
                        "stencils, 'split' = dimensionally-split per-axis "
                        "lerps, 'off' = radius-1 warp kernels")
    p.add_argument("--compute-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="SVF integrator squaring-phase compute dtype "
                        "(bfloat16 halves the scan's HBM traffic)")
    p.add_argument("--noise-scheme", choices=["pre", "post"], default=None,
                   help="uniform transformation-noise scheme: 'post' = "
                        "reference-exact (displacement-only cascade + ONE "
                        "gather warp at T+noise, utils/util.py:44-53; "
                        "~3x slower per transition), 'pre' = fast bounded "
                        "path (default from the config)")
    p.add_argument("--no-anchor", action="store_true",
                   help="with --noise-scheme post: per-sample exact gather "
                        "instead of anchored residual warping in the MCMC "
                        "loop")
    p.add_argument("--anchor-radius", type=int, default=None)
    p.add_argument("--block-radius", type=int, default=None,
                   help="'post' scheme block-gather warp: in-block residual "
                        "radius (voxels; default 2, Pallas kernel supports "
                        "<= 4).  This bounds the displacement's IN-BLOCK "
                        "VARIATION — the recovery lever when the "
                        "saturation guard reports block-residual overflow "
                        "(raising max_disp does not move that counter)")
    p.add_argument("--anchor-mode", choices=["taylor", "blend"], default=None)
    p.add_argument("--anchor-period", type=int, default=None)
    p.add_argument("--thin", type=int, default=None,
                   help="posterior-accumulator thinning (trainer.mcmc_thin; "
                        "default 1 = every post-burn-in sample feeds the "
                        "Welford accumulators; the reference keeps every "
                        "log_period_MCMC-th sample only) — the calibration "
                        "sweep lever (VERDICT r3 #7)")
    p.add_argument("--noise-alpha", type=float, default=None,
                   help="uniform transformation-noise magnitude (config "
                        "uniform_noise.magnitude; default 0.1)")
    p.add_argument("--save-period", type=int, default=None,
                   help="trainer.save_period_MCMC: sample-artifact dump "
                        "period (default = log period).  On a slow-tunnel "
                        "host the ~42 MB/period f16 artifact fetch is the "
                        "full-loop limiter; decimating dumps closes it")
    p.add_argument("--max-device-chunk", type=int, default=None,
                   help="cap on uninterrupted device-scan length (axon "
                        "worker stability boundary; the gather integrator "
                        "is ~2.5x slower per transition, so the default "
                        "200 can exceed the worker's duration limit — "
                        "use ~50 with --use-gather)")
    p.add_argument("--phantom", choices=["sphere", "brain"], default="sphere",
                   help="'brain' = 15-structure anisotropic-spacing phantom "
                        "(the reference's Biobank evaluation surface, "
                        "parse_config.py:54-58); per-structure Dice/ASD "
                        "rows are added to the report")
    p.add_argument("--out-dir", default=None)
    args = p.parse_args(argv)

    from ir_sgmcmc_tpu.config import Config
    from ir_sgmcmc_tpu.data.synthetic import brain_phantom_pair, svf_pair
    from ir_sgmcmc_tpu.trainer import Trainer
    from ir_sgmcmc_tpu.utils.vtk_io import read_vtk_field

    dims = (args.dims,) * 3
    spacing = (1.0, 1.0, 1.0)
    structures = {"sphere": 1}
    if args.phantom == "brain":
        fixed, moving, disp_gt, spacing, structures = brain_phantom_pair(
            dims, magnitude=args.magnitude, seed=args.seed)
    else:
        fixed, moving, disp_gt = svf_pair(dims, magnitude=args.magnitude,
                                          seed=args.seed)

    out_dir = args.out_dir or tempfile.mkdtemp(prefix="quality_eval_")
    cfg = json.loads((Path(__file__).resolve().parent.parent
                      / "configs/demo/config_synthetic.json").read_text())
    cfg["data_loader"]["args"]["dims"] = list(dims)
    cfg["transformation_module"]["args"] = {
        "max_disp": args.max_disp,
        "taylor_threshold": args.taylor_threshold,
        "use_gather": args.use_gather,
    }
    if args.model == "svffd":
        cfg["transformation_module"]["type"] = "SVFFD_3D"
        cfg["transformation_module"]["args"]["cps"] = [args.cps] * 3
    if args.taylor_compositions is not None:
        cfg["transformation_module"]["args"]["taylor_compositions"] = {
            "on": True, "off": False, "split": "split",
        }[args.taylor_compositions]
    if args.compute_dtype is not None:
        cfg["transformation_module"]["args"]["compute_dtype"] = args.compute_dtype
    trainer_seed = args.seed if args.trainer_seed is None else args.trainer_seed
    cfg["trainer"].update(
        save_dir=out_dir,
        VI=args.mcmc_init == "VI", MCMC=True, MCMC_init=args.mcmc_init,
        no_iters_VI=args.vi_iters,
        log_period_VI=max(16, args.vi_iters // 4),
        no_samples_VI_test=4,
        no_chains=args.chains,
        no_iters_burn_in=args.burn_in,
        no_samples_MCMC=args.samples,
        log_period_MCMC=max(25, (args.burn_in + args.samples) // 8),
        speed_test_iters=10,
        tensorboard=False,
        seed=trainer_seed,
    )
    if args.max_device_chunk is not None:
        cfg["trainer"]["max_device_chunk"] = args.max_device_chunk
    if args.save_period is not None:
        cfg["trainer"]["save_period_MCMC"] = args.save_period
    if args.noise_scheme is not None:
        cfg["trainer"].setdefault("uniform_noise", {})["scheme"] = args.noise_scheme
    if args.no_anchor:
        cfg["trainer"]["mcmc_anchor"] = False
    if args.anchor_radius is not None:
        cfg["trainer"]["anchor_radius"] = args.anchor_radius
    if args.block_radius is not None:
        cfg["trainer"].setdefault("block_warp", {})["radius"] = args.block_radius
    if args.anchor_mode is not None:
        cfg["trainer"]["anchor_mode"] = args.anchor_mode
    if args.anchor_period is not None:
        cfg["trainer"]["anchor_period"] = args.anchor_period
    if args.thin is not None:
        cfg["trainer"]["mcmc_thin"] = args.thin
    if args.noise_alpha is not None:
        cfg["trainer"].setdefault("uniform_noise", {})["magnitude"] = \
            args.noise_alpha
    config = Config(cfg, run_id="quality")

    la = cfg["data_loader"]["args"]
    # q(v) lives on the control grid for SVFFD, on the voxel grid for SVF
    if args.model == "svffd":
        from ir_sgmcmc_tpu.ops.bspline import control_grid_size

        q_dims = tuple(control_grid_size(dims, [args.cps] * 3))
    else:
        q_dims = dims
    q_v0 = {
        "mu": np.zeros((3,) + q_dims, np.float32),
        "log_var": np.full((3,) + q_dims,
                           2.0 * np.log(la["sigma_v_init"]), np.float32),
        "u": np.full((3,) + q_dims, la["u_v_init"], np.float32),
    }
    ds = _PairDataset(fixed, moving, q_v0, structures)
    ds.im_spacing = spacing
    trainer = Trainer(config, dataset=ds)
    summary = trainer.run()[0]

    mask = fixed["mask"]
    gt_mag = np.sqrt((disp_gt**2).sum(axis=0))[mask]
    mean_path = config.dir / "fields/MCMC_displacement_mean.vtk"
    if mean_path.exists():
        mean = read_vtk_field(mean_path)
        std = read_vtk_field(config.dir / "fields/MCMC_displacement_std_dev.vtk")
        err = mean - disp_gt  # (3, D, H, W) voxel units
        err_mag = np.sqrt((err**2).sum(axis=0))[mask]
        std_mag = np.sqrt((std**2).sum(axis=0))[mask]
        # calibration: does the posterior std-dev rank where the error is?
        calib = float(np.corrcoef(std_mag, err_mag)[0, 1])
        # per-channel pooled correlation
        calib_ch = float(np.corrcoef(
            np.abs(err)[:, mask].ravel(), std[:, mask].ravel())[0, 1])
    else:
        # a guard abort before any post-burn-in sample leaves no posterior
        # statistics (the rollback has nothing pre-violation to keep) —
        # report the abort instead of crashing on the missing artifact
        mean = None
        err_mag = std_mag = np.full_like(gt_mag, np.nan)
        calib = calib_ch = float("nan")

    report = {
        "dims": args.dims,
        "mcmc_init": args.mcmc_init,
        "model": args.model,
        "cps": args.cps if args.model == "svffd" else None,
        "phantom": args.phantom,
        "seed": args.seed,
        "trainer_seed": trainer_seed,
        "taylor_threshold": args.taylor_threshold,
        "use_gather": args.use_gather,
        "taylor_compositions": args.taylor_compositions,
        "compute_dtype": args.compute_dtype,
        "block_radius": args.block_radius,
        "gt_peak_disp_vox": round(float(gt_mag.max()), 3),
        "dsc_before": round(summary.get("dsc_before", float("nan")), 4),
        "dsc_vi": round(summary.get("vi_test_mean_dsc", float("nan")), 4),
        "dsc_mcmc": round(summary.get("mcmc_mean_dsc", float("nan")), 4),
        "disp_err_mean_vox": round(float(err_mag.mean()), 4),
        "disp_err_p95_vox": round(float(np.percentile(err_mag, 95)), 4),
        "disp_err_rel": round(float(err_mag.mean() / max(gt_mag.mean(), 1e-6)), 4),
        "uncertainty_calibration_corr": round(calib, 4),
        "uncertainty_calibration_corr_per_channel": round(calib_ch, 4),
        "mcmc_samples_per_sec": round(summary.get("mcmc_samples_per_sec",
                                                  float("nan")), 3),
        "aborted": summary.get("mcmc_aborted"),
        "run_dir": str(config.dir),
    }
    if args.phantom == "brain" and mean is not None:
        # per-structure Dice/ASD of the posterior-mean registration —
        # the table the reference produces per Biobank run
        # (utils/util.py:123-206)
        import jax.numpy as jnp

        from ir_sgmcmc_tpu.ops.grids import identity_grid, voxel_to_normalised
        from ir_sgmcmc_tpu.ops.resample import warp
        from ir_sgmcmc_tpu.utils.metrics import calc_metrics

        T_mean = identity_grid(dims) + voxel_to_normalised(jnp.asarray(mean))
        seg_w = np.asarray(warp(jnp.asarray(moving["seg"]), T_mean,
                                method="nearest"))
        asd, dsc = calc_metrics(fixed["seg"], seg_w, structures, spacing)
        asd0, dsc0 = calc_metrics(fixed["seg"], moving["seg"], structures,
                                  spacing)
        report["per_structure"] = {
            name: {"dsc_before": round(float(dsc0[0][i]), 4),
                   "dsc": round(float(dsc[0][i]), 4),
                   "asd_before": round(float(asd0[0][i]), 3),
                   "asd": round(float(asd[0][i]), 3)}
            for i, name in enumerate(structures)
        }
        report["mean_asd"] = round(float(np.mean(asd[0][np.isfinite(asd[0])])), 3)

    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
