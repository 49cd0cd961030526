"""Sobolev gradient smoothing.

The Sobolev kernel is the middle row of ``(I - λL)^{-1}`` for a 1D
finite-difference Laplacian ``L`` of size ``2s+1`` (reference:
/root/reference/utils/functions.py:24-49).  Smoothing a field with it (three
separable passes) while keeping an *identity backward pass* implements the
Sobolev-gradient trick of the reference's ``SobolevGrad`` autograd function
(utils/functions.py:98-109): the loss sees the smoothed field, but parameter
updates receive the raw (unsmoothed) gradient.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .stencil import separable_conv3d


def sobolev_kernel_1d(s: int, lam: float) -> tuple[np.ndarray, np.ndarray]:
    """1D Sobolev smoothing kernel and its square root, each normalised to sum 1.

    :param s: half kernel width (kernel has ``2s+1`` taps).
    :param lam: smoothing strength λ.

    Matches /root/reference/utils/functions.py:24-49: eigendecompose the
    tridiagonal Laplacian, form ``(I - λL)^{-1}`` and ``(I - λL)^{-1/2}``,
    take their middle rows.
    """
    n = 2 * s + 1
    L = np.zeros((n, n))
    idx = np.arange(n)
    L[idx, idx] = -2.0
    L[idx[:-1], idx[:-1] + 1] = 1.0
    L[idx[1:], idx[1:] - 1] = 1.0

    w, v = np.linalg.eigh(L)
    w = 1.0 - lam * w

    inv_sqrt_w = np.where(np.abs(w) > 1e-10, 1.0 / np.sqrt(np.abs(w)), 0.0)
    half = v * inv_sqrt_w  # V diag(w^-1/2)

    kernel = half @ half[s]  # middle row of (I - λL)^{-1}
    kernel_sqrt = half @ v[s]  # middle row of (I - λL)^{-1/2}
    return kernel / kernel.sum(), kernel_sqrt / kernel_sqrt.sum()


@jax.custom_vjp
def sobolev_smooth(field: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separably smooth ``field`` with ``kernel``; backward pass is identity.

    Reference: /root/reference/utils/functions.py:98-109.
    """
    return separable_conv3d(field, kernel)


def _fwd(field, kernel):
    return sobolev_smooth(field, kernel), kernel


def _bwd(kernel, g):
    return g, jnp.zeros_like(kernel)


sobolev_smooth.defvjp(_fwd, _bwd)
