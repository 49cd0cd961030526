"""Regularisation losses over the field-gradient energy.

All losses are functions of the scalar energy ``y = sum ||∇v||²`` (the
"chi-square" variable of /root/reference/model/loss.py:122-170) and return
``(loss, log_y)``.  Learnable parameters live in small dict pytrees; the
``learnable`` flag only controls whether the trainer creates an optimizer
for them (mirroring the reference's ``requires_grad`` switches).

Family (reference model/loss.py:172-321):
* ``RegLossL2``         — Gamma-equivalent prior, learnable ``log_w_reg``.
* ``RegLossStudent``    — Student-t via Gamma-precision marginalisation.
* ``RegLossLogNormal``  — log-normal prior on the energy (energy-based).
* ``RegLossLogNormalL2``— Gamma prior on the energy (energy-based).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..ops.stencil import reg_energy
from .distributions import expgamma_expectation, gamma_log_pdf


class RegLoss:
    """Base: energy computation + dof bookkeeping.

    :param diff_op: ``'GradientOperator'`` (default used by every bundled
        config) or ``None`` for the identity operator.
    :param dims: spatial dims, fixing ``dof = 3 * prod(dims)``.
    """

    learnable = False
    param_names: tuple = ()

    def __init__(self, diff_op="GradientOperator", dims=None, learnable=False):
        if diff_op not in (None, "Identity", "GradientOperator",
                           "Fourier1stDerivativeOperator"):
            raise ValueError(f"unsupported diff_op: {diff_op}")
        self.diff_op = diff_op or "Identity"
        self.dims = tuple(dims) if dims is not None else None
        self.dof = float(3.0 * math.prod(self.dims)) if dims is not None else None
        self.learnable = bool(learnable)

    def energy(self, v: jnp.ndarray) -> jnp.ndarray:
        if self.diff_op == "GradientOperator":
            return reg_energy(v)
        if self.diff_op == "Fourier1stDerivativeOperator":
            # working version of the reference's dead frequency-domain path
            # (utils/diff_op.py:41-59): y = Σ ‖ |ω| v̂ ‖²
            from ..ops.fourier import fourier_derivative_magnitude

            dv = fourier_derivative_magnitude(v)
            if v.ndim == 4:
                return jnp.sum(dv * dv)
            return jnp.sum(dv * dv, axis=tuple(range(1, v.ndim)))
        if v.ndim == 4:
            return jnp.sum(v * v)
        return jnp.sum(v * v, axis=tuple(range(1, v.ndim)))

    def init_params(self) -> dict:
        return {}

    def __call__(self, params: dict, v: jnp.ndarray):
        y = self.energy(v)
        return self._loss(params, y)

    def _loss(self, params, y):
        raise NotImplementedError


class RegLossL2(RegLoss):
    """0.5 w_reg y - 0.5 dof log w_reg — reference model/loss.py:172-198."""

    param_names = ("log_w_reg",)

    def __init__(self, w_reg, diff_op="GradientOperator", dims=None, learnable=False):
        super().__init__(diff_op, dims, learnable)
        self.w_reg = float(w_reg)

    def init_params(self):
        return {"log_w_reg": jnp.asarray(math.log(self.w_reg), jnp.float32)}

    def _loss(self, params, y):
        lw = params["log_w_reg"]
        return 0.5 * jnp.exp(lw) * y - 0.5 * self.dof * lw, jnp.log(y)


class RegLossStudent(RegLoss):
    """Student-t marginal of a Gamma precision prior — model/loss.py:201-241."""

    def __init__(self, diff_op="GradientOperator", dims=None, nu0=2e-6, lambda0=1e-6, a0=1e-6, b0=1e-6):
        super().__init__(diff_op, dims, learnable=False)
        self.a0 = nu0 / 2.0 if nu0 != 2e-6 else a0
        if lambda0 != 1e-6:
            b0 = self.a0 / lambda0
        self.b0_twice = 2.0 * b0

    def _loss(self, params, y):
        return jnp.log(self.b0_twice + y) * (self.a0 + 0.5 * self.dof), jnp.log(y)


class RegLossEnergyBased(RegLoss):
    """Prior on the scalar energy, converted to a prior on the field.

    ``loss = -log p(y) + (dof/2 - 1) log y`` — model/loss.py:244-270.
    """

    def _mlog_energy_prior(self, params, y):
        raise NotImplementedError

    def _loss(self, params, y):
        log_y = jnp.log(y)
        return self._mlog_energy_prior(params, y) + (0.5 * self.dof - 1.0) * log_y, log_y


class RegLossLogNormal(RegLossEnergyBased):
    """Log-normal prior on the energy, learnable (loc, log_scale).

    Initialisation calibrates ``loc`` to the expectation of an
    expGamma(dof/2, w_reg/2) (so exp(loc) ~ Gamma with the familiar w_reg
    strength) and ``log_scale = log 4 + log loc`` — model/loss.py:273-312.
    """

    param_names = ("loc", "log_scale")

    def __init__(self, w_reg=1.0, diff_op="GradientOperator", dims=None, learnable=False):
        super().__init__(diff_op, dims, learnable)
        self.w_reg = float(w_reg)

    def init_params(self):
        loc0 = expgamma_expectation(0.5 * self.dof, 0.5 * self.w_reg)
        return {
            "loc": jnp.asarray(loc0, jnp.float32),
            "log_scale": jnp.asarray(math.log(4.0) + jnp.log(loc0), jnp.float32),
        }

    def _mlog_energy_prior(self, params, y):
        log_y = jnp.log(y)
        scale = jnp.exp(params["log_scale"])
        return log_y + params["log_scale"] + 0.5 * ((log_y - params["loc"]) / scale) ** 2


class RegLossLogNormalL2(RegLossEnergyBased):
    """Gamma(dof/2, w_reg/2) prior on the energy — model/loss.py:315-321."""

    def __init__(self, w_reg, diff_op="GradientOperator", dims=None):
        super().__init__(diff_op, dims, learnable=False)
        self.w_reg = float(w_reg)

    def _mlog_energy_prior(self, params, y):
        return -gamma_log_pdf(jnp.log(y), 0.5 * self.dof, 0.5 * self.w_reg)


_REGISTRY = {
    # reference config type names
    "RegLoss_L2": RegLossL2,
    "RegLoss_Student": RegLossStudent,
    "RegLoss_LogNormal": RegLossLogNormal,
    "RegLoss_LogNormal_L2": RegLossLogNormalL2,
    # native names
    "RegLossL2": RegLossL2,
    "RegLossStudent": RegLossStudent,
    "RegLossLogNormal": RegLossLogNormal,
    "RegLossLogNormalL2": RegLossLogNormalL2,
}


def make_reg_loss(kind: str, **kwargs) -> RegLoss:
    if kind not in _REGISTRY:
        raise ValueError(f"unknown reg loss: {kind}")
    return _REGISTRY[kind](**kwargs)
