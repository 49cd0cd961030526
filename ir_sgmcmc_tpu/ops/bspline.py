"""Cubic B-spline FFD: control grid -> dense velocity field.

The dense field is the tensor-product B-spline interpolation of control-point
parameters, computed as three separable *transposed* 1D convolutions
(reference: /root/reference/utils/transformation.py:79-153).

TPU implementation: a strided transposed 1D convolution along an axis is a
small dense matmul between the control-point axis and a precomputed
``(n_in, n_out)`` spreading matrix.  We build that matrix once per (axis
length, stride) on the host and contract with ``jnp.einsum`` — this lands on
the MXU instead of a scatter, and makes the op trivially differentiable and
shardable.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def cubic_bspline_value(x: float) -> float:
    """Evaluate the 1D cubic B-spline basis at ``x``.

    Reference: /root/reference/utils/transformation.py:79-92.
    """
    t = abs(x)
    if t >= 2.0:
        return 0.0
    if t < 1.0:
        return 2.0 / 3.0 + (0.5 * t - 1.0) * t * t
    return -((t - 2.0) ** 3) / 6.0


def bspline_kernel_1d(stride: int) -> np.ndarray:
    """``4*stride - 1``-tap sampled cubic B-spline kernel.

    Reference: /root/reference/utils/transformation.py:95-102.
    """
    n = 4 * stride - 1
    radius = n // 2
    return np.array(
        [cubic_bspline_value((i - radius) / stride) for i in range(n)], dtype=np.float32
    )


def transposed_conv_matrix(n_in: int, stride: int, crop_lo: int, n_out: int) -> np.ndarray:
    """Dense ``(n_in, n_out)`` matrix of a strided transposed 1D convolution.

    Equivalent to ``conv_transpose1d(x, kernel, stride, padding=(k-1)//2)``
    followed by cropping ``[crop_lo : crop_lo + n_out]`` — the per-axis step
    of the reference FFD (utils/transformation.py:105-123,146-153).
    """
    kernel = bspline_kernel_1d(stride)
    k = len(kernel)
    pad = (k - 1) // 2
    full = (n_in - 1) * stride + k - 2 * pad  # torch conv_transpose output size
    M = np.zeros((n_in, full), dtype=np.float32)
    for i in range(n_in):
        for j in range(k):
            o = i * stride + j - pad
            if 0 <= o < full:
                M[i, o] += kernel[j]
    M = M[:, crop_lo : crop_lo + n_out]
    assert M.shape == (n_in, n_out), (M.shape, n_in, n_out)
    return M


class CubicBSplineFFD3D:
    """Precomputed spreading matrices for one (control grid, image grid) pair.

    :param dims: dense spatial shape ``(D, H, W)``.
    :param cps: control point spacing per axis ``(sD, sH, sW)``.

    The control grid size follows the reference's
    ``get_control_grid_size`` (/root/reference/utils/util.py:61-69):
    ``ceil((S-1)/c) + 3`` points per axis.
    """

    def __init__(self, dims, cps):
        self.dims = tuple(int(d) for d in dims)
        self.cps = tuple(int(c) for c in cps)
        self.control_dims = control_grid_size(self.dims, self.cps)
        # the reference crops [stride : stride + dim] after the transposed conv
        self.mats = [
            jnp.asarray(transposed_conv_matrix(n_in, s, s, n_out))
            for n_in, s, n_out in zip(self.control_dims, self.cps, self.dims)
        ]

    def __call__(self, cp: jnp.ndarray) -> jnp.ndarray:
        """``(3, cD, cH, cW)`` control params -> ``(3, D, H, W)`` dense field."""
        Md, Mh, Mw = self.mats
        out = jnp.einsum("cdhw,dD->cDhw", cp, Md)
        out = jnp.einsum("cdhw,hH->cdHw", out, Mh)
        out = jnp.einsum("cdhw,wW->cdhW", out, Mw)
        return out


def control_grid_size(dims, cps) -> tuple:
    """Control grid size for an image of shape ``dims`` and spacing ``cps``.

    Reference: /root/reference/utils/util.py:61-69.
    """
    import math

    return tuple(int(math.ceil((s - 1) / c) + 1 + 2) for s, c in zip(dims, cps))
