"""Transformation models: SVF integration, B-spline FFD, SVFFD.

Converts the reference's disabled/eyeball SVF tests
(/root/reference/tests/test_utils.py:32-99) into assertive ones.
"""

import numpy as np
import torch

import jax.numpy as jnp

from ir_sgmcmc_tpu.models import BSplineFFD3D, SVF3D, SVFFD3D
from ir_sgmcmc_tpu.ops import control_grid_size, log_det_jacobian


def test_svf_zero_velocity_is_identity():
    svf = SVF3D((8, 8, 8))
    T, disp = svf(jnp.zeros((3, 8, 8, 8)))
    np.testing.assert_allclose(np.asarray(T), np.asarray(svf.id_grid), atol=1e-6)
    np.testing.assert_allclose(np.asarray(disp), 0.0, atol=1e-6)


def test_svf_constant_velocity_is_translation():
    # exp of a constant field is a translation by that amount (voxel units)
    D = H = W = 16
    svf = SVF3D((D, H, W))
    v = np.zeros((3, D, H, W), dtype=np.float32)
    v[0] = 1.5  # 1.5 voxels along x
    T, disp = svf(jnp.asarray(v))
    disp = np.asarray(disp)
    # interior voxels (away from the border-clamped boundary) translate exactly
    inner = disp[0, 4:-4, 4:-4, 4:-4]
    np.testing.assert_allclose(inner, 1.5, atol=1e-3)
    # diffeomorphic everywhere in the interior
    ldj = np.asarray(log_det_jacobian(T))[2:-2, 2:-2, 2:-2]
    assert np.isfinite(ldj).all()


def test_svf_small_field_matches_single_step_composition():
    # for tiny velocities, exp(v) ≈ v
    rng = np.random.default_rng(0)
    v = (rng.standard_normal((3, 12, 12, 12)) * 1e-3).astype(np.float32)
    svf = SVF3D((12, 12, 12))
    _, disp = svf(jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(disp), v, atol=5e-5)


def test_bspline_ffd_matches_torch_conv_transpose():
    """Per-axis parity with the reference conv1D(transpose=True) pipeline
    (/root/reference/utils/transformation.py:105-153)."""
    dims = (12, 12, 12)
    cps = (4, 4, 4)
    ffd = BSplineFFD3D(dims, cps)
    cdims = ffd.control_dims
    rng = np.random.default_rng(1)
    cp = rng.standard_normal((3,) + cdims).astype(np.float32)

    ours = np.asarray(ffd.dense_velocity(jnp.asarray(cp)))

    # torch oracle: transposed conv along each dim then crop
    from ir_sgmcmc_tpu.ops import bspline_kernel_1d

    x = torch.from_numpy(cp)[None]  # (1, 3, cD, cH, cW)
    for i, s in enumerate(cps):
        kernel = torch.from_numpy(bspline_kernel_1d(s))
        dim = i + 2
        x = x.transpose(dim, -1)
        shape_ = x.size()
        groups = int(np.prod(shape_[1:-1]))
        weight = kernel.expand(groups, 1, kernel.shape[-1])
        x = x.reshape(shape_[0], groups, shape_[-1])
        x = torch.nn.functional.conv_transpose1d(
            x, weight, stride=s, padding=(len(kernel) - 1) // 2, groups=groups
        )
        x = x.reshape(shape_[0:-1] + x.shape[-1:])
        x = x.transpose(-1, dim)
    slicer = (slice(None), slice(None)) + tuple(
        slice(s, s + dims[i]) for i, s in enumerate(cps)
    )
    theirs = x[slicer][0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_bspline_partition_of_unity():
    # uniform control points produce a (nearly) uniform dense field in the
    # interior: cubic B-spline basis sums to 1
    dims = (16, 16, 16)
    cps = (4, 4, 4)
    ffd = BSplineFFD3D(dims, cps)
    cp = jnp.ones((3,) + ffd.control_dims)
    dense = np.asarray(ffd.dense_velocity(cp))
    np.testing.assert_allclose(dense[:, 2:-2, 2:-2, 2:-2], 1.0, atol=1e-4)


def test_svffd_shapes():
    dims = (16, 16, 16)
    cps = (4, 4, 4)
    svffd = SVFFD3D(dims, cps)
    cp = jnp.zeros((3,) + svffd.control_dims)
    T, disp = svffd(cp)
    assert T.shape == (3,) + dims
    assert disp.shape == (3,) + dims
    np.testing.assert_allclose(np.asarray(disp), 0.0, atol=1e-6)


def test_control_grid_size_matches_reference_formula():
    # /root/reference/utils/util.py:61-69
    assert control_grid_size((128, 128, 128), (4, 4, 4)) == (35, 35, 35)
    assert control_grid_size((128, 128, 128), (2, 2, 2)) == (67, 67, 67)


def test_svf2d_constant_velocity_is_translation():
    """exp of a constant 2D velocity field is a pure translation."""
    from ir_sgmcmc_tpu.models.transformation import SVF2D
    from ir_sgmcmc_tpu.ops.resample import grid_sample_2d

    H, W = 24, 24
    svf = SVF2D((H, W), no_steps=12)
    v = jnp.stack([jnp.full((H, W), 2.0), jnp.full((H, W), -1.5)])
    transformation, disp = svf(v)
    # interior displacement equals the velocity (boundary clamping aside)
    np.testing.assert_allclose(np.asarray(disp[0][6:-6, 6:-6]), 2.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(disp[1][6:-6, 6:-6]), -1.5, atol=1e-3)

    # warping a delta image moves it by (-2, +1.5) in (x, y)
    im = jnp.zeros((H, W)).at[12, 12].set(1.0)
    warped = grid_sample_2d(im, transformation, mode="linear")
    peak = np.unravel_index(np.argmax(np.asarray(warped)), (H, W))
    # sampling at p + d pulls intensity from the displaced location
    assert abs(peak[1] - (12 - 2)) <= 1 and abs(peak[0] - (12 + 1.5)) <= 1


def test_grid_sample_2d_matches_torch():
    import pytest
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from ir_sgmcmc_tpu.ops.resample import grid_sample_2d

    rng = np.random.default_rng(5)
    im = rng.standard_normal((9, 11)).astype(np.float32)
    grid = (rng.random((2, 7, 8)).astype(np.float32) * 2.4 - 1.2)  # beyond borders
    ours = grid_sample_2d(jnp.asarray(im), jnp.asarray(grid), mode="linear")
    tgrid = torch.from_numpy(np.moveaxis(grid, 0, -1))[None]
    theirs = F.grid_sample(torch.from_numpy(im)[None, None], tgrid,
                           mode="bilinear", padding_mode="border",
                           align_corners=True)[0, 0].numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_fourier_diff_op_reg_loss():
    import jax
    from ir_sgmcmc_tpu.models.reg_loss import RegLossL2

    dims = (8, 8, 8)
    reg = RegLossL2(w_reg=1.0, dims=dims, diff_op="Fourier1stDerivativeOperator")
    p = reg.init_params()
    v = jnp.asarray(np.random.default_rng(0).standard_normal((3,) + dims),
                    jnp.float32)
    loss, log_y = reg(p, v)
    assert np.isfinite(float(loss)) and np.isfinite(float(log_y))
    g = jax.grad(lambda v: jnp.sum(reg(p, v)[0]))(v)
    assert bool(jnp.all(jnp.isfinite(g)))
    # constant fields carry zero derivative energy
    _, log_y0 = reg(p, jnp.ones_like(v))
    assert float(jnp.exp(log_y0)) < 1e-4


def test_bspline_ffd_standalone_transformation():
    """Standalone Cubic_B_spline_FFD_3D is a usable transformation model:
    it returns (transformation, displacement) like the SVF family (the
    reference registry allows the configuration but its trainer cannot
    unpack the bare field — utils/transformation.py:126-153)."""
    from ir_sgmcmc_tpu.models.transformation import make_transformation

    dims = (12, 12, 12)
    mod = make_transformation("Cubic_B_spline_FFD_3D", dims, cps=(4, 4, 4))
    cp = jnp.zeros((3,) + mod.control_dims)
    T, disp = mod(cp)
    assert T.shape == (3,) + dims and disp.shape == (3,) + dims
    # zero control points -> identity transformation, zero displacement
    from ir_sgmcmc_tpu.ops.grids import identity_grid

    np.testing.assert_allclose(np.asarray(T), np.asarray(identity_grid(dims)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(disp), 0.0, atol=1e-6)

    # uniform unit control points -> ~1-voxel displacement in the interior
    T1, disp1 = mod(jnp.ones((3,) + mod.control_dims))
    np.testing.assert_allclose(np.asarray(disp1)[:, 3:-3, 3:-3, 3:-3], 1.0, atol=1e-3)


def test_svf_compute_dtype_bf16_matches_f32():
    # the bf16 squaring phase must agree with f32 to bf16 mantissa order
    # (relative 2^-8 on a sub-voxel field), and gradients must flow
    import jax

    D = H = W = 16
    # smooth low-frequency field (the integrator always sees Sobolev-
    # smoothed velocities; white noise would amplify gradient error
    # through the squaring chain regardless of dtype)
    z, y, x = np.meshgrid(*(np.linspace(0, 2 * np.pi, n) for n in (D, H, W)),
                          indexing="ij")
    v = np.stack([3.0 * np.sin(z) * np.cos(y), 2.5 * np.sin(x + y),
                  2.0 * np.cos(z) * np.sin(x)]).astype(np.float32)
    v = jnp.asarray(v)

    svf32 = SVF3D((D, H, W), max_disp=4)
    svf16 = SVF3D((D, H, W), max_disp=4, compute_dtype="bfloat16")
    _, d32 = svf32(v)
    _, d16 = svf16(v)
    assert d16.dtype == jnp.float32  # outputs stay f32 (split compositions
    # ride bf16 internally since round 3 — the kernels compute f32)
    err = np.abs(np.asarray(d16) - np.asarray(d32))
    assert err.max() < 8e-2, err.max()  # ~2^-8 relative on |d| <= 4, compounding over the scan

    g32 = jax.grad(lambda x: jnp.sum(jnp.sin(svf32(x)[1])))(v)
    g16 = jax.grad(lambda x: jnp.sum(jnp.sin(svf16(x)[1])))(v)
    rel = np.abs(np.asarray(g16 - g32)).max() / np.abs(np.asarray(g32)).max()
    assert rel < 8e-2, rel
