"""Generate the bundled experiment configs (same schema as the reference's
14 configs, pointing at a generic data dir; plus a synthetic demo)."""
import json, copy, os
from pathlib import Path

ROOT = Path("/root/repo/configs")

def base(name, reg_type, reg_args, vi=True, mcmc=False, mcmc_init="VI",
         transf=None, sob_s=3, sg_lr=0.4, extra=None):
    c = {
        "name": name,
        "data_loss": {"type": "GMM", "args": {"no_components": 4, "s": 1}},
        "data_loss_scale_prior": {"type": "LogScaleNormalPrior",
                                  "args": {"loc": 0.0, "scale": 2.3}},
        "data_loss_proportion_prior": {"type": "DirichletPrior",
                                       "args": {"no_classes": 4, "alpha": 0.5}},
        "reg_loss": {"type": reg_type, "args": dict({"diff_op": "GradientOperator"}, **reg_args)},
        "entropy_loss": {"type": "EntropyMultivariateNormal", "args": {}},
        "transformation_module": transf or {"type": "SVF_3D", "args": {}},
        "registration_module": {"type": "RegistrationModule", "args": {}},
        "optimizer_q_v": {"type": "Adam", "args": {"lr_mu": 0.01, "lr_log_var": 0.01,
                                                   "lr_u": 0.01, "lr_decay": 0.001}},
        "optimizer_GMM": {"type": "Adam", "args": {"lr_log_std": 0.2, "lr_logits": 0.2,
                                                   "lr_decay": 0.001}},
        "optimizer_SG_MCMC": {"type": "SGD", "args": {"lr": sg_lr}},
        "data_loader": {"type": "BiobankDataLoader",
                        "args": {"data_dir": "data/biobank",
                                 "dims": [128, 128, 128],
                                 "sigma_v_init": 0.5, "u_v_init": 0.1}},
        "Sobolev_grad": {"enabled": True, "s": sob_s, "lambda": 0.5},
        "virtual_decimation": True,
        "trainer": {"VI": vi, "MCMC": mcmc, "MCMC_init": mcmc_init,
                    "no_iters_VI": 1024, "no_samples_VI_test": 100,
                    "no_chains": 2, "no_iters_burn_in": 100000,
                    "no_samples_MCMC": 1000000, "log_period_VI": 128,
                    "log_period_MCMC": 20000,
                    "uniform_noise": {"enabled": True, "magnitude": 0.1},
                    "tensorboard": True, "verbosity": 2, "save_dir": "saved/"},
    }
    if reg_type == "RegLoss_LogNormal":
        c["reg_loss_loc_prior"] = {"type": "LogEnergyExpGammaPrior",
                                   "args": {"w_reg": reg_args["w_reg"], "learnable": False}}
        c["reg_loss_scale_prior"] = {"type": "LogScaleNormalPrior",
                                     "args": {"loc": 2.8, "scale": 5.0}}
        c["optimizer_reg"] = {"type": "Adam", "args": {"lr_loc": 0.01, "lr_log_scale": 0.01,
                                                       "lr_decay": 0.001}}
    elif reg_args.get("learnable"):
        c["reg_loss_w_reg_prior"] = {"type": "LogPrecisionExpGammaPrior", "args": {}}
        c["optimizer_reg"] = {"type": "Adam", "args": {"lr_log_w_reg": 0.01, "lr_decay": 0.001}}
    if extra:
        c.update(extra)
    return c

def w(rel, cfg):
    p = ROOT / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(cfg, indent=4) + "\n")

# experiment 1: VI on a single pair, reg-strength variants
w("experiment1/config.json", base("experiment1", "RegLoss_LogNormal", {"w_reg": 1.4, "learnable": True}))
w("experiment1/config_baseline.json", base("experiment1", "RegLoss_L2", {"w_reg": 1.4, "learnable": True}))
w("experiment1/config_fixed_wreg_high.json", base("experiment1", "RegLoss_L2", {"w_reg": 1.4}))
w("experiment1/config_fixed_wreg_low.json", base("experiment1", "RegLoss_L2", {"w_reg": 0.1}))

# experiment 2: two moving volumes (M1/M2), learnable vs fixed w_reg
for m in ("M1", "M2"):
    w(f"experiment2/{m}/config2.json", base(f"experiment2_{m}", "RegLoss_LogNormal", {"w_reg": 2.0, "learnable": True}))
    w(f"experiment2/{m}/config2_fixed_wreg_high.json", base(f"experiment2_{m}", "RegLoss_L2", {"w_reg": 2.0}))
    w(f"experiment2/{m}/config2_fixed_wreg_low.json", base(f"experiment2_{m}", "RegLoss_L2", {"w_reg": 0.1}))

# experiment 3: VI then SG-MCMC warm-started from the VI posterior
w("experiment3/config.json", base("experiment3", "RegLoss_LogNormal", {"w_reg": 1.6, "learnable": True}, vi=True, mcmc=True))
w("experiment3/config_VI.json", base("experiment3", "RegLoss_LogNormal", {"w_reg": 1.6, "learnable": True}, vi=True, mcmc=False))

# experiment 4: SG-MCMC from cold starts (no VI)
w("experiment4/config_identity.json", base("experiment4", "RegLoss_LogNormal", {"w_reg": 1.6, "learnable": True}, vi=False, mcmc=True, mcmc_init="identity"))
w("experiment4/config_noise.json", base("experiment4", "RegLoss_LogNormal", {"w_reg": 1.6, "learnable": True}, vi=False, mcmc=True, mcmc_init="noise"))

# experiment 5: B-spline-parameterised SVF (SVFFD), both phases
w("experiment5/config_SVFFD_2.json", base("experiment5", "RegLoss_L2", {"w_reg": 0.2}, vi=True, mcmc=True,
  transf={"type": "SVFFD_3D", "args": {"cps": [2, 2, 2]}}, sob_s=2, sg_lr=0.01))
w("experiment5/config_SVFFD_4.json", base("experiment5", "RegLoss_L2", {"w_reg": 0.1}, vi=True, mcmc=True,
  transf={"type": "SVFFD_3D", "args": {"cps": [4, 4, 4]}}, sob_s=1, sg_lr=0.01))

# synthetic demo: no data dependency, small grid, quick
demo = base("demo_synthetic", "RegLoss_LogNormal", {"w_reg": 1.4, "learnable": True}, vi=True, mcmc=True)
demo["data_loader"] = {"type": "SyntheticDataLoader",
                       "args": {"dims": [32, 32, 32], "sigma_v_init": 0.5, "u_v_init": 0.1}}
demo["trainer"].update({"no_iters_VI": 64, "no_samples_VI_test": 10, "no_iters_burn_in": 50,
                        "no_samples_MCMC": 100, "log_period_VI": 16, "log_period_MCMC": 50,
                        "tensorboard": False})
w("demo/config_synthetic.json", demo)
print("wrote", len(list(ROOT.rglob("*.json"))), "configs")
