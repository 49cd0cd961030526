"""Samplers: reparameterised q(v) draws, SGLD noise, uniform field noise.

Pure-function redesign of /root/reference/utils/sampler.py and the SGLD /
uniform-noise helpers of utils/util.py:44-58, utils/functions.py:76-84.
RNG is explicit (threefry keys) so chains get independent streams under
``vmap``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.grids import voxel_to_normalised


def sample_q_v(key: jax.Array, q_v: dict, antithetic: bool = False):
    """Draw from q(v) = N(mu, diag(sigma²) + u uᵀ) via reparameterisation.

    ``x`` is a *single scalar* standard normal shared across the whole field
    (the rank-1 direction), matching /root/reference/utils/sampler.py:4-21.
    With ``antithetic=True``, returns the pair ``(mu + d, mu - d)``.
    """
    k_eps, k_x = jax.random.split(key)
    sigma = jnp.exp(0.5 * q_v["log_var"])
    eps = jax.random.normal(k_eps, sigma.shape, sigma.dtype)
    x = jax.random.normal(k_x, (), sigma.dtype)
    delta = eps * sigma + x * q_v["u"]
    if antithetic:
        return q_v["mu"] + delta, q_v["mu"] - delta
    return q_v["mu"] + delta


def langevin_noise(key: jax.Array, sigma: jnp.ndarray, tau: float) -> jnp.ndarray:
    """sqrt(2 tau) * sigma * eps — reference utils/util.py:56-58."""
    eps = jax.random.normal(key, sigma.shape, sigma.dtype)
    return math.sqrt(2.0) * jnp.sqrt(tau) * sigma * eps


def sgld_step(key, v, sigma, tau, grad_fn):
    """One preconditioned SGLD transition.

    The reference implements this as a noise-injecting autograd.Function
    whose backward multiplies the gradient by sigma², driven by SGD(lr=tau)
    (utils/functions.py:76-84 + trainer/trainer.py:292,351).  The composite
    update is, explicitly:

        v' = v + sqrt(2 tau) sigma eps
        v_next = v' - tau sigma² grad U(v')

    ``grad_fn`` maps the *noised* state to the gradient of the potential.
    """
    v_noised = v + langevin_noise(key, sigma, tau)
    g = grad_fn(v_noised)
    return v_noised - tau * (sigma**2) * g


def uniform_field_noise(key: jax.Array, shape, alpha: float) -> jnp.ndarray:
    """U(-alpha, alpha) voxel-unit noise converted to normalised coords.

    Reference: utils/util.py:44-53 (``add_noise_uniform_field``).
    """
    noise_vox = jax.random.uniform(key, shape, jnp.float32, -alpha, alpha)
    return voxel_to_normalised(noise_vox)


def add_uniform_noise(key: jax.Array, transformation: jnp.ndarray, alpha: float) -> jnp.ndarray:
    return transformation + uniform_field_noise(key, transformation.shape, alpha)
