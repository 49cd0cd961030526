"""Head-to-head: the PyTorch reference vs this framework on the SAME pair.

VERDICT r3 missing #3: quality has only ever been measured against synthetic
ground truth, never against what /root/reference actually produces.  This
harness:

1. generates a synthetic pair with a KNOWN ground-truth deformation
   (brain_phantom_pair — 15 structures with the reference's FIRST label
   IDs) and writes it as .nii.gz in the reference's expected layout
   (``data_dir/{*.nii.gz, masks/, segs/}``, file 0 = fixed);
2. copies /root/reference to a scratch dir, patches its two hardcoded
   ``'cuda:0'`` strings to ``'cpu'`` (base/base_trainer.py:16,
   utils/util.py:115 — its only device plumbing), and runs it via its own
   ``run.py`` with scripts/ref_shims on PYTHONPATH standing in for
   SimpleITK/nibabel/tvtk/vtk (none installed here);
3. runs THIS framework's run.py on the same pair with the same
   experiment-1 hyperparameters (the config schema is shared);
4. compares: posterior displacement mean/std-dev maps (correlation +
   scale), displacement error vs the known GT, per-structure Dice, GMM
   scales/proportions, and uncertainty calibration — written as JSON for
   BASELINE.md's "vs reference implementation" table.

Usage::

    python scripts/head_to_head.py --dims 32 --quick     # plumbing smoke
    python scripts/head_to_head.py --dims 64             # the real run
    python scripts/head_to_head.py --compare-only DIR    # re-run analysis

Run it on CPU (the reference is torch-CPU; this framework's run is
launched with the TPU tunnel disabled as well so both stacks share the
host).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
SHIMS = REPO / "scripts" / "ref_shims"
REFERENCE = Path("/root/reference")
sys.path.insert(0, str(REPO))


def log(msg):
    print(f"[h2h +{time.monotonic() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


T0 = time.monotonic()


# ---------------------------------------------------------------------------
# stage 1: data
# ---------------------------------------------------------------------------

def generate_pair(work: Path, dims: int, seed: int, magnitude: float):
    from ir_sgmcmc_tpu.data.synthetic import brain_phantom_pair
    from ir_sgmcmc_tpu.utils.nifti import write_nifti

    shape = (dims,) * 3
    fixed, moving, disp_gt, spacing, structures = brain_phantom_pair(
        shape, magnitude=magnitude, seed=seed)
    # the reference derives im_spacing = max(shape)/dims = 1 when the files
    # are already at `dims`, so write isotropic unit spacing for an
    # apples-to-apples ASD
    spacing = (1.0, 1.0, 1.0)

    data_dir = work / "data"
    for sub in ("", "masks", "segs"):
        (data_dir / sub).mkdir(parents=True, exist_ok=True)
    for i, vols in enumerate((fixed, moving)):
        stem = f"{i:03d}.nii.gz"
        write_nifti(data_dir / stem, np.asarray(vols["im"], np.float32),
                    spacing)
        write_nifti(data_dir / "masks" / stem,
                    np.asarray(vols["mask"], np.uint8), spacing)
        write_nifti(data_dir / "segs" / stem,
                    np.asarray(vols["seg"], np.int16), spacing)
    np.save(work / "disp_gt.npy", disp_gt)
    (work / "structures.json").write_text(json.dumps(structures))
    log(f"pair written to {data_dir} (dims {dims}, GT peak "
        f"{float(np.sqrt((disp_gt**2).sum(0)).max()):.2f} vox)")
    return data_dir


# ---------------------------------------------------------------------------
# stage 2: the reference
# ---------------------------------------------------------------------------

def prepare_reference(work: Path) -> Path:
    ref = work / "refimpl"
    if ref.exists():
        shutil.rmtree(ref)
    shutil.copytree(REFERENCE, ref)
    bt = ref / "base" / "base_trainer.py"
    bt.write_text(bt.read_text().replace("self.device = 'cuda:0'",
                                         "self.device = 'cpu'"))
    ut = ref / "utils" / "util.py"
    text = ut.read_text().replace("device='cuda:0'", "device='cpu'")
    # pandas 3.x copy-on-write compatibility for MetricTracker
    # (utils/util.py:486-509): `.values[:] = 0` is read-only and chained
    # `self._data.total[key] += ...` no longer writes through — rewrite to
    # .loc, preserving the semantics exactly
    text = (text
            .replace("self._data[col].values[:] = 0",
                     "self._data[col] = 0.0")
            .replace("self._data.total[key] += value * n",
                     "self._data.loc[key, 'total'] += value * n")
            .replace("self._data.counts[key] += n",
                     "self._data.loc[key, 'counts'] += n")
            .replace(
                "self._data.average[key] = self._data.total[key] / "
                "self._data.counts[key]",
                "self._data.loc[key, 'average'] = "
                "self._data.loc[key, 'total'] / self._data.loc[key, 'counts']")
            .replace("return self._data.average[key]",
                     "return self._data.loc[key, 'average']"))
    ut.write_text(text)
    log(f"reference copied+patched at {ref} (cpu device, pandas-3 CoW)")
    return ref


def make_config(data_dir: Path, dims: int, iters: dict, save_dir: Path,
                no_chains: int = 2, model: str = "svf",
                cps: int | None = None) -> dict:
    tmod = {"type": "SVF_3D", "args": {}}
    if model == "svffd":
        # experiment-5's control-grid model (reference
        # utils/transformation.py:156-164, configs/experiment5/*.json);
        # BOTH stacks read cps from this block (reference parse_config
        # passes it to the data loader; ours does the same)
        tmod = {"type": "SVFFD_3D", "args": {"cps": [int(cps or 2)] * 3}}
    return {
        "name": "head_to_head",
        "data_loss": {"type": "GMM", "args": {"no_components": 4, "s": 1}},
        "data_loss_scale_prior": {"type": "LogScaleNormalPrior",
                                  "args": {"loc": 0.0, "scale": 2.3}},
        "data_loss_proportion_prior": {"type": "DirichletPrior",
                                       "args": {"no_classes": 4,
                                                "alpha": 0.5}},
        "reg_loss": {"type": "RegLoss_LogNormal",
                     "args": {"diff_op": "GradientOperator", "w_reg": 1.4,
                              "learnable": True}},
        "reg_loss_loc_prior": {"type": "LogEnergyExpGammaPrior",
                               "args": {"w_reg": 1.4, "learnable": False}},
        "reg_loss_scale_prior": {"type": "LogScaleNormalPrior",
                                 "args": {"loc": 2.8, "scale": 5.0}},
        "entropy_loss": {"type": "EntropyMultivariateNormal", "args": {}},
        "transformation_module": tmod,
        "registration_module": {"type": "RegistrationModule", "args": {}},
        "optimizer_q_v": {"type": "Adam",
                          "args": {"lr_mu": 0.01, "lr_log_var": 0.01,
                                   "lr_u": 0.01, "lr_decay": 0.001}},
        "optimizer_GMM": {"type": "Adam",
                          "args": {"lr_log_std": 0.2, "lr_logits": 0.2,
                                   "lr_decay": 0.001}},
        "optimizer_reg": {"type": "Adam",
                          "args": {"lr_loc": 0.01, "lr_log_scale": 0.01,
                                   "lr_decay": 0.001}},
        "optimizer_SG_MCMC": {"type": "SGD", "args": {"lr": 0.4}},
        "data_loader": {"type": "BiobankDataLoader",
                        "args": {"data_dir": str(data_dir),
                                 "dims": [dims] * 3,
                                 "sigma_v_init": 0.5, "u_v_init": 0.1}},
        "Sobolev_grad": {"enabled": True, "s": 3, "lambda": 0.5},
        "virtual_decimation": True,
        "trainer": {
            "VI": True, "MCMC": True, "MCMC_init": "VI",
            "no_iters_VI": iters["vi"],
            "no_samples_VI_test": iters["vi_test"],
            "no_chains": no_chains,
            "no_iters_burn_in": iters["burn_in"],
            "no_samples_MCMC": iters["samples"],
            "log_period_VI": max(iters["vi"] // 4, 1),
            "log_period_MCMC": iters["thin"],
            "uniform_noise": {"enabled": True, "magnitude": 0.1},
            "tensorboard": True, "verbosity": 2,
            "save_dir": str(save_dir),
        },
    }


def run_reference(work: Path, data_dir: Path, dims: int, iters: dict,
                  model: str = "svf", cps: int | None = None) -> Path:
    ref = prepare_reference(work)
    save_dir = work / "ref_out"
    save_dir.mkdir(exist_ok=True)
    cfg = make_config(data_dir, dims, iters, save_dir, model=model, cps=cps)
    cfg_path = work / "ref_config.json"
    cfg_path.write_text(json.dumps(cfg, indent=2))

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([str(SHIMS), str(ref), str(REPO)])
    env["PALLAS_AXON_POOL_IPS"] = ""          # no TPU plugin in the child
    env["JAX_PLATFORMS"] = "cpu"
    env["OMP_NUM_THREADS"] = str(os.cpu_count() or 1)
    env["MPLBACKEND"] = "Agg"

    log(f"running reference: {iters} at {dims}^3 (log -> {work}/ref.log)")
    t0 = time.monotonic()
    with open(work / "ref.log", "w") as logf:
        proc = subprocess.run(
            [sys.executable, "run.py", "-c", str(cfg_path)],
            cwd=str(ref), env=env, stdout=logf, stderr=subprocess.STDOUT,
            timeout=6 * 3600,
        )
    log(f"reference rc={proc.returncode} in {time.monotonic() - t0:.0f}s")
    if proc.returncode != 0:
        tail = (work / "ref.log").read_text()[-3000:]
        raise RuntimeError(f"reference run failed:\n{tail}")
    return save_dir


# ---------------------------------------------------------------------------
# stage 3: this framework
# ---------------------------------------------------------------------------

def run_ours(work: Path, data_dir: Path, dims: int, iters: dict,
             model: str = "svf", cps: int | None = None) -> Path:
    save_dir = work / "ours_out"
    save_dir.mkdir(exist_ok=True)
    cfg = make_config(data_dir, dims, iters, save_dir, model=model, cps=cps)
    cfg_path = work / "ours_config.json"
    cfg_path.write_text(json.dumps(cfg, indent=2))

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = str(REPO / ".jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "2"
    env["MPLBACKEND"] = "Agg"

    log(f"running this framework: {iters} at {dims}^3 "
        f"(log -> {work}/ours.log)")
    t0 = time.monotonic()
    with open(work / "ours.log", "w") as logf:
        proc = subprocess.run(
            [sys.executable, "run.py", "-c", str(cfg_path),
             "--run-id", "h2h"],
            cwd=str(REPO), env=env, stdout=logf, stderr=subprocess.STDOUT,
            timeout=6 * 3600,
        )
    log(f"ours rc={proc.returncode} in {time.monotonic() - t0:.0f}s")
    if proc.returncode != 0:
        tail = (work / "ours.log").read_text()[-3000:]
        raise RuntimeError(f"our run failed:\n{tail}")
    return save_dir


# ---------------------------------------------------------------------------
# stage 4: compare
# ---------------------------------------------------------------------------

def _find(root: Path, pattern: str):
    hits = sorted(root.rglob(pattern))
    return hits


def _load_tb_scalars(run_dir: Path) -> dict:
    """Final value of every scalar tag in the newest TB event file tree."""
    from tensorboard.backend.event_processing import event_accumulator

    out = {}
    for ev in _find(run_dir, "events.out.tfevents.*"):
        acc = event_accumulator.EventAccumulator(
            str(ev.parent), size_guidance={"scalars": 0})
        acc.Reload()
        for tag in acc.Tags().get("scalars", []):
            events = acc.Scalars(tag)
            if events:
                out[tag] = events[-1].value
    return out


def _mask_corr(a, b, mask):
    a, b = a[mask], b[mask]
    if a.size == 0 or a.std() == 0 or b.std() == 0:
        return float("nan")
    return float(np.corrcoef(a, b)[0, 1])


def compare(work: Path) -> dict:
    from ir_sgmcmc_tpu.utils.vtk_io import read_vtk_field

    disp_gt = np.load(work / "disp_gt.npy")       # (3, D, H, W) voxels
    gt_mag = np.sqrt((disp_gt ** 2).sum(0))

    result = {"work": str(work)}

    def posterior_of(root: Path, label: str, phase: str = "MCMC"):
        # reference: samples/{phase}_sample_{mean,std_dev}.vtk
        # ours:      fields/{phase}_displacement_{mean,std_dev}.vtk
        mean_p = (_find(root, f"{phase}_sample_mean.vtk")
                  or _find(root, f"{phase}_displacement_mean.vtk"))
        std_p = (_find(root, f"{phase}_sample_std_dev.vtk")
                 or _find(root, f"{phase}_displacement_std_dev.vtk"))
        if not mean_p or not std_p:
            log(f"{label}: no posterior mean/std artifacts under {root}")
            return None
        mean = read_vtk_field(mean_p[-1])
        std = read_vtk_field(std_p[-1])
        # BOTH stacks load NIfTI with a (z,y,x) -> (x,y,z) transpose
        # (reference datasets.py:72; ours data/dataset.py:126), so both
        # dumps read back spatially as (3, z_file, y_file, x_file) while
        # disp_gt is (3, x_file, y_file, z_file): transpose both.
        # Channel conventions DIFFER: the reference orders channel 0 =
        # last-internal-axis displacement (torch grid_sample x = W); ours
        # orders channel c = internal-axis-c displacement, so ours also
        # needs a channel reversal.  Verified empirically on the round-4
        # 64-cubed artifacts: every other transform combination scores a
        # displacement error at-or-above the mean GT motion with
        # calibration near zero or negative (orientation scramble), for
        # BOTH stacks independently.
        mean = mean.transpose(0, 3, 2, 1)
        std = std.transpose(0, 3, 2, 1)
        if label == "ours":
            mean = mean[::-1]
            std = std[::-1]
        return mean, std

    sides = {}
    for label, root in (("reference", work / "ref_out"),
                        ("ours", work / "ours_out")):
        post = posterior_of(root, label)
        if post is None:
            continue
        mean, std = post
        err = mean - disp_gt
        err_mag = np.sqrt((err ** 2).sum(0))
        std_mag = np.sqrt((std ** 2).sum(0))
        mask = gt_mag > 0.25  # where the GT actually moves
        sides[label] = {"mean": mean, "std": std}
        result[label] = {
            "disp_err_mean_vox": round(float(err_mag.mean()), 4),
            "disp_err_p95_vox": round(float(np.percentile(err_mag, 95)), 4),
            "post_std_mean_vox": round(float(std_mag.mean()), 4),
            "calibration_corr": round(_mask_corr(err_mag, std_mag,
                                                 np.ones_like(mask)), 4),
            "calibration_corr_moving": round(
                _mask_corr(err_mag, std_mag, mask), 4),
        }

    # VI-phase posterior (VERDICT r4 weak #4: only the MCMC stacks were
    # ever compared): the displacement-space q(v) pushforward — mean and
    # per-voxel std over the VI test samples (sigma AND the rank-1 u both
    # fold into that std; neither stack dumps raw q_v sigma/u fields)
    vi_sides = {}
    for label, root in (("reference", work / "ref_out"),
                        ("ours", work / "ours_out")):
        post = posterior_of(root, label, phase="VI")
        if post is not None:
            vi_sides[label] = post
    if len(vi_sides) == 2:
        (m_r, s_r), (m_o, s_o) = vi_sides["reference"], vi_sides["ours"]
        all_mask = np.ones(m_r.shape[1:], dtype=bool)
        result["vi_cross"] = {
            "mean_corr": round(_mask_corr(
                np.sqrt((m_r**2).sum(0)), np.sqrt((m_o**2).sum(0)),
                all_mask), 4),
            "mean_corr_per_component": [
                round(_mask_corr(m_r[c], m_o[c], all_mask), 4)
                for c in range(3)],
            "std_corr": round(_mask_corr(
                np.sqrt((s_r**2).sum(0)), np.sqrt((s_o**2).sum(0)),
                all_mask), 4),
            "std_scale_ratio_ours_over_ref": round(
                float(np.sqrt((s_o**2).sum(0)).mean()
                      / max(np.sqrt((s_r**2).sum(0)).mean(), 1e-9)), 4),
            "mean_rmse_between_stacks_vox": round(
                float(np.sqrt(((m_r - m_o) ** 2).sum(0).mean())), 4),
            "vi_err_mean_vox": {
                lbl: round(float(np.sqrt(
                    ((m - disp_gt) ** 2).sum(0)).mean()), 4)
                for lbl, (m, _s) in vi_sides.items()},
        }

    if "reference" in sides and "ours" in sides:
        m_r, s_r = sides["reference"]["mean"], sides["reference"]["std"]
        m_o, s_o = sides["ours"]["mean"], sides["ours"]["std"]
        all_mask = np.ones(m_r.shape[1:], dtype=bool)
        result["cross"] = {
            "mean_corr": round(_mask_corr(
                np.sqrt((m_r**2).sum(0)), np.sqrt((m_o**2).sum(0)),
                all_mask), 4),
            "mean_corr_per_component": [
                round(_mask_corr(m_r[c], m_o[c], all_mask), 4)
                for c in range(3)],
            "std_corr": round(_mask_corr(
                np.sqrt((s_r**2).sum(0)), np.sqrt((s_o**2).sum(0)),
                all_mask), 4),
            "std_scale_ratio_ours_over_ref": round(
                float(np.sqrt((s_o**2).sum(0)).mean()
                      / max(np.sqrt((s_r**2).sum(0)).mean(), 1e-9)), 4),
            "mean_rmse_between_stacks_vox": round(
                float(np.sqrt(((m_r - m_o) ** 2).sum(0).mean())), 4),
        }

    # scalar metrics from both stacks' own channels
    structures = json.loads((work / "structures.json").read_text())
    ref_scalars = _load_tb_scalars(work / "ref_out")
    if ref_scalars:
        dsc = {}
        for s in structures:
            vals = [v for t, v in ref_scalars.items()
                    if re.fullmatch(rf"MCMC/chain_\d+/DSC/{re.escape(s)}", t)]
            if vals:
                dsc[s] = round(float(np.mean(vals)), 4)
        gmm_scales = [v for t, v in sorted(ref_scalars.items())
                      if re.fullmatch(r"MCMC/GMM/scale_\d+", t)]
        gmm_props = [v for t, v in sorted(ref_scalars.items())
                     if re.fullmatch(r"MCMC/GMM/proportion_\d+", t)]
        result.setdefault("reference", {}).update({
            "final_dsc_per_structure": dsc,
            "final_dsc_mean": round(float(np.mean(list(dsc.values()))), 4)
            if dsc else None,
            "gmm_scales": [round(float(v), 5) for v in gmm_scales],
            "gmm_proportions": [round(float(v), 5) for v in gmm_props],
        })
        for key in ("MCMC/reg/loc", "MCMC/reg/scale"):
            if key in ref_scalars:
                result["reference"][key.split("/")[-1] + "_reg"] = round(
                    float(ref_scalars[key]), 5)

    # same extraction from OUR tensorboard channel (tag schema:
    # DSC/MCMC/chain_N/<structure>, GMM/{scale,proportion}_i)
    ours_scalars = _load_tb_scalars(work / "ours_out")
    if ours_scalars:
        dsc = {}
        for s in structures:
            vals = [v for t, v in ours_scalars.items()
                    if re.fullmatch(rf"DSC/MCMC/chain_\d+/{re.escape(s)}", t)]
            if vals:
                dsc[s] = round(float(np.mean(vals)), 4)
        result.setdefault("ours", {}).update({
            "final_dsc_per_structure": dsc,
            "final_dsc_mean": round(float(np.mean(list(dsc.values()))), 4)
            if dsc else None,
            "gmm_scales": [round(float(v), 5) for t, v in
                           sorted(ours_scalars.items())
                           if re.fullmatch(r"GMM/scale_\d+", t)],
            "gmm_proportions": [round(float(v), 5) for t, v in
                                sorted(ours_scalars.items())
                                if re.fullmatch(r"GMM/proportion_\d+", t)],
        })

    # our run's summary JSON line (run.py prints it; also in the log)
    ours_log = work / "ours.log"
    if ours_log.exists():
        for line in reversed(ours_log.read_text().splitlines()):
            if '"mcmc_mean_dsc"' in line:
                j = line[line.index("{"):]
                try:
                    result.setdefault("ours", {})["summary"] = json.loads(j)
                except json.JSONDecodeError:
                    pass
                break
    ref_log = work / "ref.log"
    if ref_log.exists():
        txt = ref_log.read_text()
        m = re.findall(r"MCMC sampling speed: ([\d.]+) samples/sec", txt)
        if m:
            result.setdefault("reference", {})["mcmc_samples_per_sec_cpu"] = \
                float(m[-1])
        m = re.findall(r"VI sampling speed: ([\d.]+) samples/sec", txt)
        if m:
            result.setdefault("reference", {})["vi_samples_per_sec_cpu"] = \
                float(m[-1])

    return result


# ---------------------------------------------------------------------------

def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dims", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--seeds", default=None, metavar="A,B,C",
                   help="run (or reuse) one full h2h per GT seed and print "
                        "an aggregate with per-seed rows + spreads "
                        "(VERDICT r4 weak #4: single-draw claims); a seed "
                        "whose work dir already holds both stacks' "
                        "artifacts is re-compared, not re-run")
    p.add_argument("--magnitude", type=float, default=4.0)
    p.add_argument("--work", default=None)
    p.add_argument("--quick", action="store_true",
                   help="reduced iteration counts (plumbing smoke)")
    p.add_argument("--model", choices=["svf", "svffd"], default="svf",
                   help="transformation model in BOTH stacks (svffd = "
                        "experiment-5's control-grid model)")
    p.add_argument("--cps", type=int, default=2,
                   help="SVFFD control point spacing (voxels)")
    p.add_argument("--skip-ref", action="store_true")
    p.add_argument("--skip-ours", action="store_true")
    p.add_argument("--compare-only", default=None, metavar="DIR")
    args = p.parse_args(argv)

    if args.compare_only:
        work = Path(args.compare_only)
        print(json.dumps(compare(work), indent=2))
        return

    if args.quick:
        iters = {"vi": 32, "vi_test": 4, "burn_in": 30, "samples": 60,
                 "thin": 10}
    else:
        iters = {"vi": 256, "vi_test": 10, "burn_in": 400, "samples": 800,
                 "thin": 40}

    tag = "" if args.model == "svf" else f"_{args.model}{args.cps}"

    def one_seed(seed: int) -> dict:
        work = Path(args.work or f"/tmp/h2h_{args.dims}_{seed}{tag}")
        work.mkdir(parents=True, exist_ok=True)
        (work / "iters.json").write_text(json.dumps(iters))
        have = lambda sub, pat: bool(_find(work / sub, pat))
        data_dir = work / "data"
        if not (data_dir / "000.nii.gz").exists():
            data_dir = generate_pair(work, args.dims, seed, args.magnitude)
        if not args.skip_ref and not have("ref_out", "MCMC_sample_mean.vtk"):
            run_reference(work, data_dir, args.dims, iters,
                          model=args.model, cps=args.cps)
        elif have("ref_out", "MCMC_sample_mean.vtk"):
            log(f"seed {seed}: reusing existing reference artifacts")
        if not args.skip_ours and not have(
                "ours_out", "MCMC_displacement_mean.vtk"):
            run_ours(work, data_dir, args.dims, iters,
                     model=args.model, cps=args.cps)
        elif have("ours_out", "MCMC_displacement_mean.vtk"):
            log(f"seed {seed}: reusing existing framework artifacts")
        result = compare(work)
        result["seed"] = seed
        result["model"] = args.model
        (work / "result.json").write_text(json.dumps(result, indent=2))
        return result

    if args.seeds is None:
        print(json.dumps(one_seed(args.seed), indent=2))
        return

    seeds = [int(x) for x in args.seeds.split(",")]
    rows = [one_seed(sd) for sd in seeds]

    def spread(path):
        vals = []
        for r in rows:
            node = r
            for k in path.split("."):
                node = (node or {}).get(k)
            if node is not None:
                vals.append(float(node))
        if not vals:
            return None
        return {"values": [round(v, 4) for v in vals],
                "mean": round(float(np.mean(vals)), 4),
                "spread": round(float(np.max(vals) - np.min(vals)), 4)}

    agg = {
        "dims": args.dims, "model": args.model, "seeds": seeds,
        "iters": iters,
        "cross_mean_rmse_vox": spread("cross.mean_rmse_between_stacks_vox"),
        "cross_mean_corr": spread("cross.mean_corr"),
        "cross_std_corr": spread("cross.std_corr"),
        "vi_cross_mean_corr": spread("vi_cross.mean_corr"),
        "vi_cross_mean_rmse_vox": spread(
            "vi_cross.mean_rmse_between_stacks_vox"),
        "calibration_ref": spread("reference.calibration_corr"),
        "calibration_ours": spread("ours.calibration_corr"),
        "err_ref_vox": spread("reference.disp_err_mean_vox"),
        "err_ours_vox": spread("ours.disp_err_mean_vox"),
        "dsc_ref": spread("reference.final_dsc_mean"),
        "dsc_ours": spread("ours.final_dsc_mean"),
        "per_seed": rows,
    }
    print(json.dumps(agg, indent=2))


if __name__ == "__main__":
    main()
