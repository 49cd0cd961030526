"""Entropy terms of the rank-1-plus-diagonal Gaussian variational family.

q(v) = N(mu, diag(sigma²) + u uᵀ); reference model/loss.py:342-372.
Inputs are ``(3, D, H, W)`` fields (or batched ``(N, 3, D, H, W)``);
reductions run over channel+spatial axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def _reduce(x):
    """Sum over channel+spatial axes, keeping an optional leading batch."""
    if x.ndim == 4:
        return jnp.sum(x)
    return jnp.sum(x, axis=tuple(range(x.ndim - 4, x.ndim)))


def entropy_analytic(log_var: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Analytic entropy (up to constants): 0.5 (log1p ||u/sigma||² + Σ log sigma²).

    The log1p term is the rank-1 correction via the matrix determinant lemma.
    Reference: model/loss.py:350-357.
    """
    sigma = jnp.exp(0.5 * log_var)
    return 0.5 * (jnp.log1p(_reduce((u / sigma) ** 2)) + _reduce(log_var))


def entropy_sample(sample: jnp.ndarray, mu: jnp.ndarray, log_var: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Sample-based quadratic term 0.5 (v-mu)ᵀ Σ⁻¹ (v-mu).

    Uses the Sherman–Morrison identity for the rank-1 update.
    Reference: model/loss.py:358-372.
    """
    sigma = jnp.exp(0.5 * log_var)
    sn = (sample - mu) / sigma
    un = u / sigma
    t1 = _reduce(sn**2)
    t2 = _reduce(sn * un) ** 2 / (1.0 + _reduce(un**2))
    return 0.5 * (t1 - t2)
