"""Stencil ops: analytic oracles from the reference test-suite plus torch parity.

Covers the reference's tests/test_diff.py oracles (uniform/linear fields,
log|J| of identity and of uniform scaling) and tests/test_utils.py's
separable-convolution constant-27 oracle.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ir_sgmcmc_tpu.ops import (
    box_filter3d,
    det_jacobian,
    gradient,
    identity_grid,
    log_det_jacobian,
    reg_energy,
    separable_conv3d,
    sobolev_kernel_1d,
    sobolev_smooth,
)


def test_gradient_of_uniform_field_is_zero():
    # reference tests/test_diff.py:9-23
    v = jnp.ones((3, 6, 6, 6)) * 2.5
    jac = gradient(v)
    np.testing.assert_allclose(np.asarray(jac), 0.0, atol=1e-6)


def test_gradient_of_linear_field_equals_coefficients():
    # reference tests/test_diff.py:25-49: v_c = a_c * coordinate_c
    D = H = W = 8
    grid_vox = np.stack(
        np.meshgrid(np.arange(D), np.arange(H), np.arange(W), indexing="ij"), 0
    ).astype(np.float32)
    # channel 0 = 2*x (W axis), channel 1 = 3*y, channel 2 = 5*z
    v = np.stack([2.0 * grid_vox[2], 3.0 * grid_vox[1], 5.0 * grid_vox[0]], 0)
    jac = np.asarray(gradient(jnp.asarray(v)))
    np.testing.assert_allclose(jac[0, 0], 2.0, atol=1e-5)  # dvx/dx
    np.testing.assert_allclose(jac[1, 1], 3.0, atol=1e-5)  # dvy/dy
    np.testing.assert_allclose(jac[2, 2], 5.0, atol=1e-5)  # dvz/dz
    np.testing.assert_allclose(jac[0, 1], 0.0, atol=1e-5)


def test_log_det_J_identity_is_zero():
    # reference tests/test_diff.py:51-57
    T = identity_grid((8, 8, 8))
    ldj = np.asarray(log_det_jacobian(T))
    np.testing.assert_allclose(ldj, 0.0, atol=1e-5)


def test_log_det_J_uniform_scaling():
    # reference tests/test_diff.py:92-113: T = 2 * identity => det J = 8
    T = identity_grid((8, 8, 8)) * 2.0
    ldj = np.asarray(log_det_jacobian(T))
    np.testing.assert_allclose(ldj, np.log(8.0), atol=1e-4)


def test_separable_conv_constant_oracle():
    # reference tests/test_utils.py:101-151: convolving a constant-1 field
    # with an all-ones 3-tap separable kernel (replicate pad) gives 27.
    v = jnp.ones((3, 6, 7, 8))
    out = np.asarray(separable_conv3d(v, jnp.ones(3)))
    np.testing.assert_allclose(out, 27.0, atol=1e-5)


def test_box_filter_matches_torch_conv3d_replicate():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 9, 10, 11)).astype(np.float32)
    r = 1
    ours = np.asarray(box_filter3d(jnp.asarray(x[0]), r))
    k = torch.ones(1, 1, 3, 3, 3)
    xt = F.pad(torch.from_numpy(x)[None], (r,) * 6, mode="replicate")
    theirs = F.conv3d(xt, k)[0, 0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-5)


def test_separable_conv_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 8, 8, 8)).astype(np.float32)
    kernel, _ = sobolev_kernel_1d(3, 0.5)
    ours = np.asarray(separable_conv3d(jnp.asarray(x), jnp.asarray(kernel)))

    # torch oracle: the reference's 3x conv3d path (utils/util.py:394-406)
    kt = torch.from_numpy(kernel.astype(np.float32))
    S = torch.stack([kt[None]] * 3, 0)  # (3,1,k)
    S_x = S.unsqueeze(2).unsqueeze(2)
    S_y = S.unsqueeze(2).unsqueeze(4)
    S_z = S.unsqueeze(3).unsqueeze(4)
    p = 3
    xt = F.pad(torch.from_numpy(x)[None], (p,) * 6, mode="replicate")
    out = F.conv3d(xt, S_z, groups=3)
    out = F.conv3d(out, S_y, groups=3)
    out = F.conv3d(out, S_x, groups=3)
    np.testing.assert_allclose(ours, out[0].numpy(), atol=1e-5, rtol=1e-4)


def test_sobolev_kernel_properties():
    kernel, kernel_sqrt = sobolev_kernel_1d(3, 0.5)
    assert kernel.shape == (7,)
    np.testing.assert_allclose(kernel.sum(), 1.0, atol=1e-8)
    np.testing.assert_allclose(kernel, kernel[::-1], atol=1e-10)  # symmetric
    assert kernel[3] == kernel.max()


def test_sobolev_smooth_backward_is_identity():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((3, 6, 6, 6)), dtype=jnp.float32)
    kernel = jnp.asarray(sobolev_kernel_1d(2, 0.5)[0], dtype=jnp.float32)
    g = jax.grad(lambda v: jnp.sum(sobolev_smooth(v, kernel) * 2.0))(x)
    np.testing.assert_allclose(np.asarray(g), 2.0, atol=1e-6)


def test_reg_energy_batched_matches_loop():
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal((2, 3, 6, 6, 6)), dtype=jnp.float32)
    batched = np.asarray(reg_energy(v))
    single = np.array([np.asarray(reg_energy(v[i])) for i in range(2)])
    np.testing.assert_allclose(batched, single, rtol=1e-5)


def test_taylor_squaring_step_matches_jacobian_form():
    """The Jacobian-free custom-VJP step equals 2d + Σ_a J[:,a]·d_a, values
    and gradients (the form models/transformation.py's scan body uses)."""
    import jax

    from ir_sgmcmc_tpu.ops.stencil import gradient, taylor_squaring_step

    rng = np.random.default_rng(11)
    d = jnp.asarray(rng.standard_normal((3, 6, 7, 8)).astype(np.float32)) * 0.4

    def ref(x):
        return 2.0 * x + jnp.sum(gradient(x) * x[None, :], axis=1)

    np.testing.assert_allclose(np.asarray(taylor_squaring_step(d)),
                               np.asarray(ref(d)), atol=1e-6)

    cot = jnp.asarray(rng.standard_normal(d.shape).astype(np.float32))
    g_new = jax.grad(lambda x: jnp.sum(taylor_squaring_step(x) * cot))(d)
    g_ref = jax.grad(lambda x: jnp.sum(ref(x) * cot))(d)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=2e-6, rtol=1e-5)


def test_split_compose_step_properties():
    """Dimensionally-split composition (models/transformation.py phase 2,
    ``taylor_compositions='split'``): exact on linear fields, convex per
    pass (max principle — the stability property the pure Taylor form
    lacks), custom VJP == plain autodiff through the implementation."""
    import jax

    from ir_sgmcmc_tpu.ops.stencil import _split_compose_impl, split_compose_step

    rng = np.random.default_rng(21)
    dims = (7, 8, 9)

    # exact on a linear field d(p) = A p + b at CONSTANT offset u (each
    # axis pass is exact in its own axis and preserves linearity; a
    # spatially-varying u adds the splitting cross term O(|∇u|·|u|·|∇d|),
    # bounded by the smooth-field integration parity test in
    # test_warp_bounded.py) away from the clamped border
    A = rng.standard_normal((3, 3)).astype(np.float32) * 0.05
    b = rng.standard_normal(3).astype(np.float32)
    grids = np.meshgrid(*[np.arange(n, dtype=np.float32) for n in dims],
                        indexing="ij")
    p = np.stack([grids[2], grids[1], grids[0]])  # (x, y, z) channels
    d_lin = jnp.asarray(np.einsum("cd,d...->c...", A, p) + b[:, None, None, None])
    u_const = np.broadcast_to(
        np.asarray([0.4, -0.7, 0.9], np.float32)[:, None, None, None],
        (3,) + dims)
    out = np.asarray(split_compose_step(d_lin, jnp.asarray(u_const)))
    # reference: u + d(p + u) evaluated analytically (u channels are
    # (x, y, z) voxel offsets; p rows are built (x, y, z) to match)
    du = np.einsum("cd,d...->c...", A, p + u_const) + b[:, None, None, None]
    ref = u_const + du
    interior = (slice(None), slice(1, -1), slice(1, -1), slice(1, -1))
    np.testing.assert_allclose(out[interior], ref[interior], atol=1e-4)
    u = jnp.asarray((rng.random((3,) + dims) * 2 - 1).astype(np.float32))

    # max principle: the warped part of the output stays within the input's
    # per-channel range even for rough d (the pure Taylor form amplifies)
    d_rough = jnp.asarray(rng.standard_normal((3,) + dims).astype(np.float32) * 3)
    warped = np.asarray(split_compose_step(d_rough, u)) - np.asarray(u)
    for c in range(3):
        assert warped[c].max() <= float(d_rough[c].max()) + 1e-5
        assert warped[c].min() >= float(d_rough[c].min()) - 1e-5

    # custom (recompute) VJP == autodiff through the implementation
    cot = jnp.asarray(rng.standard_normal((3,) + dims).astype(np.float32))
    gd_new, gu_new = jax.grad(
        lambda x, y: jnp.sum(split_compose_step(x, y) * cot),
        argnums=(0, 1))(d_rough, u)
    gd_ref, gu_ref = jax.grad(
        lambda x, y: jnp.sum(_split_compose_impl(x, y) * cot),
        argnums=(0, 1))(d_rough, u)
    np.testing.assert_allclose(np.asarray(gd_new), np.asarray(gd_ref),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gu_new), np.asarray(gu_ref),
                               atol=2e-6, rtol=1e-5)


def test_taylor_compose_step_matches_jacobian_form():
    """The two-operand composition step equals u + d + Σ_a J_d[:,a]·u_a,
    values and BOTH gradients (models/transformation.py phase 2 in Taylor
    form; the custom VJP must match plain autodiff through the Jacobian
    formulation)."""
    import jax

    from ir_sgmcmc_tpu.ops.stencil import gradient, taylor_compose_step

    rng = np.random.default_rng(12)
    d = jnp.asarray(rng.standard_normal((3, 6, 7, 8)).astype(np.float32)) * 2.0
    u = jnp.asarray(rng.standard_normal((3, 6, 7, 8)).astype(np.float32)) * 0.5

    def ref(x, y):
        return y + x + jnp.sum(gradient(x) * y[None, :], axis=1)

    np.testing.assert_allclose(np.asarray(taylor_compose_step(d, u)),
                               np.asarray(ref(d, u)), atol=1e-6)

    cot = jnp.asarray(rng.standard_normal(d.shape).astype(np.float32))
    gd_new, gu_new = jax.grad(
        lambda x, y: jnp.sum(taylor_compose_step(x, y) * cot),
        argnums=(0, 1))(d, u)
    gd_ref, gu_ref = jax.grad(
        lambda x, y: jnp.sum(ref(x, y) * cot), argnums=(0, 1))(d, u)
    np.testing.assert_allclose(np.asarray(gd_new), np.asarray(gd_ref),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gu_new), np.asarray(gu_ref),
                               atol=2e-6, rtol=1e-5)
