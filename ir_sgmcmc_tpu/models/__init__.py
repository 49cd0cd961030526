from .distributions import (
    DirichletPrior,
    LogEnergyExpGammaPrior,
    LogPrecisionExpGammaPrior,
    LogScaleNormalPrior,
    NormalDistribution,
    make_distribution,
)
from .entropy import entropy_analytic, entropy_sample
from .gmm import GMM
from .reg_loss import (
    RegLossL2,
    RegLossLogNormal,
    RegLossLogNormalL2,
    RegLossStudent,
    make_reg_loss,
)
from .sampler import add_uniform_noise, langevin_noise, sample_q_v, sgld_step
from .transformation import BSplineFFD3D, SVF2D, SVF3D, SVFFD3D, make_transformation

__all__ = [
    "SVF2D",
    "SVF3D",
    "SVFFD3D",
    "BSplineFFD3D",
    "make_transformation",
    "GMM",
    "RegLossL2",
    "RegLossStudent",
    "RegLossLogNormal",
    "RegLossLogNormalL2",
    "make_reg_loss",
    "entropy_analytic",
    "entropy_sample",
    "sample_q_v",
    "sgld_step",
    "langevin_noise",
    "add_uniform_noise",
    "NormalDistribution",
    "DirichletPrior",
    "LogScaleNormalPrior",
    "LogPrecisionExpGammaPrior",
    "LogEnergyExpGammaPrior",
    "make_distribution",
]
