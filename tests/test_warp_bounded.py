"""Bounded shift-and-blend warp: exact parity with the gather formulation.

``warp_bounded`` is the TPU hot-path warp (ops/resample.py); for any
displacement within the radius it must reproduce gather-based grid_sample
(itself pinned to torch semantics in test_resample.py) bit-for-bit up to
float tolerance, for both the unrolled (R<=2) and looped (R>2) variants.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ir_sgmcmc_tpu.models import SVF3D
from ir_sgmcmc_tpu.ops import (
    grid_sample,
    identity_grid,
    voxel_to_normalised,
    warp_bounded,
)


def _random_case(shape, max_disp, rng, channels=None):
    vol_shape = ((channels,) if channels else ()) + shape
    vol = rng.standard_normal(vol_shape).astype(np.float32)
    disp = (rng.random((3,) + shape).astype(np.float32) * 2 - 1) * max_disp
    return jnp.asarray(vol), jnp.asarray(disp)


@pytest.mark.parametrize("radius", [1, 2, 4])
@pytest.mark.parametrize("channels", [None, 3])
def test_warp_bounded_matches_gather(radius, channels):
    rng = np.random.default_rng(radius)
    shape = (12, 13, 14)
    vol, disp = _random_case(shape, radius, rng, channels)

    ours = warp_bounded(vol, disp, radius)
    grid = identity_grid(shape) + voxel_to_normalised(disp)
    ref = grid_sample(vol, grid, mode="linear")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_warp_bounded_border_clamp():
    # displacement pushing past the volume edge saturates like border padding
    rng = np.random.default_rng(9)
    shape = (8, 8, 8)
    vol = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    disp = jnp.full((3,) + shape, 3.0)  # everything shifts out near edges
    ours = warp_bounded(vol, disp, 4)
    grid = identity_grid(shape) + voxel_to_normalised(disp)
    ref = grid_sample(vol, grid, mode="linear")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_warp_bounded_gradients_match_gather():
    rng = np.random.default_rng(3)
    shape = (8, 8, 8)
    vol, disp = _random_case(shape, 1.4, rng)

    def f_b(v, d):
        return jnp.sum(warp_bounded(v, d, 2) * 1.7)

    def f_g(v, d):
        grid = identity_grid(shape) + voxel_to_normalised(d)
        return jnp.sum(grid_sample(v, grid, mode="linear") * 1.7)

    gb = jax.grad(f_b, argnums=(0, 1))(vol, disp)
    gg = jax.grad(f_g, argnums=(0, 1))(vol, disp)
    np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(gg[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb[1]), np.asarray(gg[1]), atol=1e-4)


def test_svf_bounded_matches_gather_integration():
    """Composition integration ≈ the reference squaring formulation.

    The bounded path integrates ``exp(v) = φ^(2^e)`` by one-sided
    compositions while the gather path squares all the way up; both are
    discretizations of the same exponential map, so they agree to
    (shared) trilinear interpolation error on smooth fields — and, vs an
    RK4 ground truth, to the same accuracy (measured: max err 0.454 vs
    0.457 voxels on a 3-voxel-peak field; see also the test below).
    """
    rng = np.random.default_rng(4)
    dims = (16, 16, 16)
    v = _smooth_field(rng, dims, peak=2.0)

    svf_b = SVF3D(dims, no_steps=8, max_disp=4)
    svf_g = SVF3D(dims, no_steps=8, use_gather=True)

    T_b, d_b = svf_b(jnp.asarray(v))
    T_g, d_g = svf_g(jnp.asarray(v))
    diff = np.abs(np.asarray(d_b) - np.asarray(d_g))
    interior = (slice(None),) + (slice(2, -2),) * 3
    assert diff[interior].max() < 0.05, diff[interior].max()
    # boundary rows: Taylor's forward-difference Jacobian vs the warp's
    # border clamp — both approximations of the half-open edge
    assert diff.max() < 0.15, diff.max()
    np.testing.assert_allclose(np.asarray(T_b), np.asarray(T_g), atol=0.015)

    # the opt-in Taylor-composition path carries the same-order error but
    # it is UNCORRELATED with the gather path's trilinear error, so
    # agreement is looser (both sit at the same distance from the RK4
    # ground truth — see test_svf_integration_accuracy_vs_ode_truth;
    # measured here: interior max 0.095 on a 2-voxel field)
    _, d_t = SVF3D(dims, no_steps=8, max_disp=4,
                   taylor_compositions=True)(jnp.asarray(v))
    diff_t = np.abs(np.asarray(d_t) - np.asarray(d_g))
    assert diff_t[interior].max() < 0.15, diff_t[interior].max()
    assert diff_t.max() < 0.4, diff_t.max()

    # the dimensionally-split path replaces each 27-tap blend with three
    # per-axis lerps — its cross-term error vs the gather path is the same
    # order as the blend's own interpolation error
    _, d_s = SVF3D(dims, no_steps=8, max_disp=4,
                   taylor_compositions="split")(jnp.asarray(v))
    diff_s = np.abs(np.asarray(d_s) - np.asarray(d_g))
    assert diff_s[interior].max() < 0.15, diff_s[interior].max()
    assert diff_s.max() < 0.4, diff_s.max()


def _smooth_field(rng, dims, peak):
    from scipy.ndimage import gaussian_filter

    v = rng.standard_normal((3,) + dims).astype(np.float64)
    v = np.stack([gaussian_filter(c, 2.0) for c in v])
    return (v * peak / np.abs(v).max()).astype(np.float32)


def test_svf_integration_accuracy_vs_ode_truth():
    """Both integration schemes hit the true flow to the same accuracy.

    Ground truth: per-voxel RK4 integration of dx/dt = v(x) with cubic
    interpolation of v.  The composition scheme (hot path) must be at
    least as accurate as the reference's squaring scheme — guards against
    a regression where the cheap radius-1 steps would degrade the map.
    """
    from scipy.ndimage import map_coordinates

    rng = np.random.default_rng(7)
    dims = (16, 16, 16)
    v = _smooth_field(rng, dims, peak=2.5).astype(np.float64)

    grid = np.stack(np.meshgrid(
        *[np.arange(d, dtype=np.float64) for d in dims], indexing="ij"))
    pos = grid.reshape(3, -1).copy()
    nsteps, h = 32, 1.0 / 32

    def interp_v(p):
        return np.stack([
            map_coordinates(v[c], p, order=3, mode="nearest") for c in range(3)])

    for _ in range(nsteps):
        k1 = interp_v(pos)
        k2 = interp_v(pos + 0.5 * h * k1)
        k3 = interp_v(pos + 0.5 * h * k2)
        k4 = interp_v(pos + h * k3)
        pos = pos + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4)
    u_true = (pos - grid.reshape(3, -1)).reshape((3,) + dims)

    vf = jnp.asarray(v.astype(np.float32))
    sl = (slice(None),) + (slice(3, -3),) * 3  # interior: border modes differ
    _, d_b = SVF3D(dims, no_steps=8, max_disp=4)(vf)
    _, d_g = SVF3D(dims, no_steps=8, use_gather=True)(vf)
    err_b = np.abs(np.asarray(d_b, np.float64) - u_true)[sl].mean()
    err_g = np.abs(np.asarray(d_g, np.float64) - u_true)[sl].mean()
    assert err_b <= err_g * 1.1 + 1e-4, (err_b, err_g)


def test_svf_integration_plan():
    # exp(v) = φ^(2^e), φ built by radius-1 squarings; default (warp
    # compositions) e = ceil(log2(max_disp)); squarings whose input bound
    # is <= 0.5 vox run in Taylor form
    svf = SVF3D((16, 16, 16), no_steps=12, max_disp=8)
    assert not svf.taylor_compositions
    assert svf.composition_form == "split"  # default since the r3 flip
    assert (svf.no_squarings, svf.no_compositions, svf.no_taylor) == (9, 8, 9)
    svf = SVF3D((16, 16, 16), no_steps=12, max_disp=8,
                taylor_compositions=False)
    assert svf.composition_form == "warp"
    assert (svf.no_squarings, svf.no_compositions, svf.no_taylor) == (9, 8, 9)
    # opt-in Taylor compositions: e = ceil(log2(max_disp/taylor_threshold))
    # so every composition offset sits under the threshold; the image
    # ('pre' scheme) groups to 2^e_img = ceil(log2(max_disp)) resamples
    svf = SVF3D((16, 16, 16), no_steps=12, max_disp=8,
                taylor_compositions=True)
    assert svf.taylor_compositions
    assert (svf.no_squarings, svf.no_compositions, svf.no_taylor,
            svf.no_image_compositions) == (8, 16, 8, 8)
    svf = SVF3D((16, 16, 16), no_steps=4, max_disp=8,
                taylor_compositions=True)
    assert (svf.no_squarings, svf.no_compositions,
            svf.no_image_compositions) == (0, 16, 8)
    # too few steps for a sub-threshold offset -> warp-composition fallback
    svf = SVF3D((16, 16, 16), no_steps=3, max_disp=8,
                taylor_compositions=True)
    assert not svf.taylor_compositions
    assert svf.composition_form == "warp"
    assert (svf.no_squarings, svf.no_compositions) == (0, 8)
    # 'split' keeps the warp-split plan (offsets <= 1, clamped identically)
    # and only swaps the step implementation
    svf = SVF3D((16, 16, 16), no_steps=12, max_disp=8,
                taylor_compositions="split")
    assert svf.composition_form == "split"
    assert (svf.no_squarings, svf.no_compositions, svf.no_taylor,
            svf.no_image_compositions) == (9, 8, 9, 8)
    assert svf.displacement_clamp_bound == float(svf.no_compositions)
    svf = SVF3D((16, 16, 16), no_steps=12, max_disp=1)
    assert (svf.no_squarings, svf.no_compositions, svf.no_taylor) == (12, 1, 12)
    # threshold 0 disables every Taylor form (warps throughout)
    svf = SVF3D((16, 16, 16), no_steps=12, max_disp=8, taylor_threshold=0.0)
    assert not svf.taylor_compositions
    assert svf.no_taylor == 0
    assert (svf.no_squarings, svf.no_compositions) == (9, 8)


def test_taylor_squaring_exact_on_linear_field():
    """u ∘ (id+u) = u + A u exactly for u(p) = A p — pins the Jacobian
    orientation of the Taylor squaring step."""
    from ir_sgmcmc_tpu.ops.stencil import gradient

    dims = (12, 12, 12)
    z, y, x = np.meshgrid(*[np.arange(d, dtype=np.float32) for d in dims],
                          indexing="ij")
    coords = {0: x, 1: y, 2: z}  # channel order: (dx, dy, dz)
    rng = np.random.default_rng(0)
    A = (rng.random((3, 3)).astype(np.float32) - 0.5) * 0.04
    u = np.zeros((3,) + dims, np.float32)
    for i in range(3):
        for j in range(3):
            u[i] += A[i, j] * coords[j]
    exact = u + np.einsum("ij,j...->i...", A, u)
    J = gradient(jnp.asarray(u))
    approx = jnp.asarray(u) + jnp.einsum("ij...,j...->i...", J, jnp.asarray(u))
    interior = (slice(None),) + (slice(2, -2),) * 3
    np.testing.assert_allclose(np.asarray(approx)[interior], exact[interior],
                               atol=1e-6)


def test_svf_image_cascade_matches_gather_warp():
    """im riding the integration == gather-warping im by the final T."""
    rng = np.random.default_rng(11)
    dims = (16, 16, 16)
    v = _smooth_field(rng, dims, peak=2.0)
    from scipy.ndimage import gaussian_filter
    im = gaussian_filter(rng.standard_normal(dims), 1.5).astype(np.float32)
    im /= np.abs(im).max()

    svf = SVF3D(dims, no_steps=8, max_disp=4)
    T, d, warped = svf.integrate(jnp.asarray(v), im=jnp.asarray(im))
    ref = grid_sample(jnp.asarray(im), T, mode="linear")
    # the cascade resamples the image once per composition (2^e times total,
    # vs 12 for the round-1 ride-the-squaring cascade), so agreement is to
    # interpolation error on smooth content, not float tolerance (measured
    # here: mean 0.006, p99 0.041, max 0.071 on a unit-amplitude image)
    diff = np.abs(np.asarray(warped) - np.asarray(ref))
    assert diff.mean() < 0.02, diff.mean()
    assert diff.max() < 0.15, diff.max()
