"""Frequency-domain operators: |ω| derivative magnitude, Gaussian smoothing.

The reference ships two frequency-domain code paths that are both dead:
``Fourier1stDerivativeOperator`` (references a missing helper,
/root/reference/utils/diff_op.py:41-59) and ``GaussianGrad`` (built on the
removed ``torch.rfft``, utils/functions.py:87-95).  This module provides
working TPU-native equivalents — FFTs lower to XLA's batched FFT and run on
accelerators; all shapes static.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _omega_norm(shape) -> jnp.ndarray:
    """|ω| over the full 3D FFT grid of ``shape`` (angular frequency)."""
    ws = [jnp.fft.fftfreq(s) * (2.0 * math.pi) for s in shape]
    wz, wy, wx = jnp.meshgrid(*ws, indexing="ij")
    return jnp.sqrt(wx**2 + wy**2 + wz**2).astype(jnp.float32)


def fourier_derivative_magnitude(field: jnp.ndarray) -> jnp.ndarray:
    """Apply the isotropic first-derivative multiplier |ω| in frequency space.

    Working version of the reference's ``Fourier1stDerivativeOperator``
    (utils/diff_op.py:41-59): F⁻¹(|ω| · F(field)).  Acts on the trailing
    three (spatial) axes.
    """
    shape = field.shape[-3:]
    f = jnp.fft.fftn(field, axes=(-3, -2, -1))
    out = jnp.fft.ifftn(f * _omega_norm(shape), axes=(-3, -2, -1))
    return jnp.real(out).astype(field.dtype)


def gaussian_smooth_fft(field: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Gaussian smoothing as a frequency-space multiplier.

    Working version of the reference's ``GaussianGrad`` forward
    (utils/functions.py:87-95): multiply the spectrum by
    exp(-σ²|ω|²/2) — an exact (periodic) Gaussian blur.
    """
    shape = field.shape[-3:]
    w2 = _omega_norm(shape) ** 2
    mult = jnp.exp(-0.5 * (sigma**2) * w2)
    f = jnp.fft.fftn(field, axes=(-3, -2, -1))
    out = jnp.fft.ifftn(f * mult, axes=(-3, -2, -1))
    return jnp.real(out).astype(field.dtype)


@jax.custom_vjp
def gaussian_grad_smooth(field: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Gaussian smoothing with an identity backward pass.

    FFT analog of ``SobolevGrad`` (gradient-smoothing trick,
    utils/functions.py:87-95): the forward blurs, the backward passes
    gradients through untouched.
    """
    return gaussian_smooth_fft(field, sigma)


def _ggs_fwd(field, sigma):
    return gaussian_smooth_fft(field, sigma), None


def _ggs_bwd(_, g):
    return g, None


gaussian_grad_smooth.defvjp(_ggs_fwd, _ggs_bwd)
