"""Distribution and hyperprior library (pure log-pdf functions).

Functional redesign of /root/reference/model/distributions.py: every
distribution is a stateless object holding fixed hyperparameters (plain
floats/arrays — anything learnable lives in the params pytrees owned by the
trainer) and exposing pure ``log_pdf``-style callables that jit/vmap cleanly.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def normal_log_pdf(x, loc, log_scale):
    """log N(x | loc, exp(log_scale)²) — reference model/distributions.py:56-58."""
    e = 0.5 * ((x - loc) * jnp.exp(-log_scale)) ** 2
    return -e - log_scale - _LOG_SQRT_2PI


def gamma_log_pdf(log_x, shape, rate):
    """log Gamma(x | shape, rate) evaluated at x = exp(log_x).

    Reference: model/distributions.py:111-112.
    """
    shape = jnp.asarray(shape, dtype=jnp.float32)
    rate = jnp.asarray(rate, dtype=jnp.float32)
    return (
        shape * jnp.log(rate)
        + (shape - 1.0) * log_x
        - rate * jnp.exp(log_x)
        - gammaln(shape)
    )


def expgamma_log_pdf(x, shape, rate):
    """log pdf of X = log Z, Z ~ Gamma(shape, rate) — distributions.py:167-168."""
    return gamma_log_pdf(x, shape, rate) + x


def expgamma_expectation(shape, rate):
    """E[log Z] for Z ~ Gamma(shape, rate) — distributions.py:171-172."""
    return digamma(jnp.asarray(shape, jnp.float32)) - jnp.log(
        jnp.asarray(rate, jnp.float32)
    )


def exp_inverse_gamma_log_pdf(x, shape, rate):
    """log pdf of X = log Z, Z ~ InverseGamma(shape, rate).

    Reference: distributions.py:115-148 (gamma(-log_x) - 2 log_x, + x change
    of variables).
    """
    return gamma_log_pdf(-x, shape, rate) - 2.0 * x + x


class NormalDistribution:
    """Univariate normal with fixed loc/scale — distributions.py:11-58."""

    def __init__(self, loc=None, scale=None, learnable=False):
        self.loc = float(loc if loc is not None else 0.0)
        self.log_scale = math.log(float(scale if scale is not None else math.log(10.0)))

    def __call__(self, x):
        return normal_log_pdf(x, self.loc, self.log_scale)


class DirichletPrior:
    """Dirichlet prior over mixture log-proportions — distributions.py:180-211."""

    def __init__(self, no_classes, alpha=None):
        a = 0.5 if alpha is None else alpha
        if jnp.ndim(a) == 0:
            self.concentration = jnp.full((no_classes,), float(a), dtype=jnp.float32)
        else:
            conc = jnp.asarray(a, dtype=jnp.float32).reshape(-1)
            assert conc.shape[0] == no_classes
            self.concentration = conc

    def __call__(self, log_proportions):
        c = self.concentration
        return (
            jnp.sum(log_proportions * (c - 1.0), axis=-1)
            + gammaln(jnp.sum(c, axis=-1))
            - jnp.sum(gammaln(c), axis=-1)
        )


class LogScaleNormalPrior:
    """Normal prior on a log-scale parameter — distributions.py:248-258."""

    def __init__(self, loc, scale, learnable=False):
        self.loc = float(loc)
        self.log_scale = math.log(float(scale))

    def __call__(self, log_scale):
        return normal_log_pdf(log_scale, self.loc, self.log_scale)


class LogPrecisionExpGammaPrior:
    """ExpGamma prior on log w_reg (Gamma on w_reg) — distributions.py:214-225."""

    def __init__(self, shape=1e-3, rate=1e-3, **_):
        self.shape = float(shape)
        self.rate = float(rate)

    def __call__(self, log_w_reg):
        return expgamma_log_pdf(log_w_reg, self.shape, self.rate)


class LogEnergyExpGammaPrior:
    """ExpGamma(ν·dof/2, ν·w_reg/2) prior over a log-energy.

    Reference: distributions.py:228-245.  Used as the hyperprior on the
    ``loc`` of a log-normal regularisation loss, so that ``exp(loc)`` is
    Gamma(dof/2, w_reg/2) — the familiar regularisation-strength calibration.
    """

    def __init__(self, w_reg, dof, nu=1.0, learnable=False):
        self.w_reg = float(w_reg)
        self.dof = float(dof)
        self.nu = float(nu)

    def expectation(self):
        return expgamma_expectation(0.5 * self.nu * self.dof, 0.5 * self.nu * self.w_reg)

    def __call__(self, log_energy):
        return expgamma_log_pdf(
            log_energy, 0.5 * self.nu * self.dof, 0.5 * self.nu * self.w_reg
        )


_REGISTRY = {
    "NormalDistribution": NormalDistribution,
    "DirichletPrior": DirichletPrior,
    "LogScaleNormalPrior": LogScaleNormalPrior,
    "LogPrecisionExpGammaPrior": LogPrecisionExpGammaPrior,
    "LogEnergyExpGammaPrior": LogEnergyExpGammaPrior,
}


def make_distribution(kind: str, **kwargs):
    """Factory used by the config layer (type names mirror the reference)."""
    if kind not in _REGISTRY:
        raise ValueError(f"unknown distribution: {kind}")
    return _REGISTRY[kind](**kwargs)
