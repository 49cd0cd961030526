"""grid_sample parity against torch.nn.functional.grid_sample.

The reference relies on torch grid_sample (border padding, align_corners)
for warping and SVF integration; these tests pin our resampler to the exact
same semantics (SURVEY.md §7 names this as the top correctness risk).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ir_sgmcmc_tpu.ops import grid_sample, identity_grid, warp


def _rand_vol(shape, rng):
    return rng.standard_normal(shape).astype(np.float32)


def _rand_grid(shape, rng, scale=1.2):
    # include out-of-range coords to exercise border clamping
    return (scale * (2.0 * rng.random((3,) + shape) - 1.0)).astype(np.float32)


def _torch_grid_sample(vol, grid, mode):
    # vol (C,D,H,W), grid (3,D,H,W) channel 0 = x
    v = torch.from_numpy(vol)[None]
    g = torch.from_numpy(grid).permute(1, 2, 3, 0)[None]
    torch_mode = "bilinear" if mode == "linear" else mode
    out = F.grid_sample(v, g, mode=torch_mode, padding_mode="border", align_corners=True)
    return out[0].numpy()


@pytest.mark.parametrize("mode", ["linear", "nearest"])
@pytest.mark.parametrize("shape", [(4, 5, 6), (8, 8, 8)])
def test_grid_sample_matches_torch(mode, shape):
    rng = np.random.default_rng(0)
    vol = _rand_vol((2,) + shape, rng)
    grid = _rand_grid(shape, rng)

    ours = np.asarray(grid_sample(jnp.asarray(vol), jnp.asarray(grid), mode=mode))
    theirs = _torch_grid_sample(vol, grid, mode)
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_identity_grid_is_noop():
    rng = np.random.default_rng(1)
    vol = _rand_vol((6, 7, 8), rng)
    grid = identity_grid((6, 7, 8))
    out = np.asarray(grid_sample(jnp.asarray(vol), grid, mode="linear"))
    np.testing.assert_allclose(out, vol, atol=1e-5)


def test_warp_translation_moves_sphere_centroid():
    """Assertive version of the reference's eyeball test
    (/root/reference/tests/test_warping.py:14-60): warping by a constant
    translation shifts the sphere centroid by exactly that offset."""
    D = H = W = 24
    zz, yy, xx = np.meshgrid(*(np.arange(s, dtype=np.float32) for s in (D, H, W)), indexing="ij")
    sphere = ((zz - 12) ** 2 + (yy - 12) ** 2 + (xx - 12) ** 2 < 5.0**2).astype(np.float32)

    offset = 3.0  # voxels along x
    grid = np.array(identity_grid((D, H, W)))
    grid[0] += offset * 2.0 / (W - 1)  # sample from x + 3 => image moves -3

    warped = np.asarray(warp(jnp.asarray(sphere), jnp.asarray(grid)))
    cx = (warped * xx).sum() / warped.sum()
    assert abs(cx - (12.0 - offset)) < 0.05


def test_warp_nearest_preserves_labels():
    rng = np.random.default_rng(2)
    seg = rng.integers(0, 5, size=(8, 8, 8)).astype(np.int16)
    grid = _rand_grid((8, 8, 8), rng, scale=1.0)
    out = np.asarray(warp(jnp.asarray(seg), jnp.asarray(grid), method="nearest"))
    assert out.dtype == np.int16
    assert set(np.unique(out)).issubset(set(np.unique(seg)))


# ---- block-gather warp ------------------------------------------------------


def _smooth_disp(dims, magnitude, seed=0):
    """Smooth bounded displacement (low-freq sinusoids), voxel units."""
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.meshgrid(*[np.linspace(0, np.pi, s) for s in dims],
                             indexing="ij")
    d = np.stack([
        np.sin(xx + rng.uniform(0, 6)) * np.cos(yy * 0.5),
        np.cos(yy + rng.uniform(0, 6)) * np.sin(zz * 0.5),
        np.sin(zz + rng.uniform(0, 6)) * np.cos(xx * 0.5),
    ]) * magnitude
    return jnp.asarray(d, jnp.float32)


def test_warp_block_gather_matches_grid_sample():
    """Exact trilinear parity with grid_sample for smooth bounded fields of
    LARGE magnitude (well beyond any practical blend radius)."""
    from ir_sgmcmc_tpu.ops.grids import identity_grid, voxel_to_normalised
    from ir_sgmcmc_tpu.ops.resample import (
        block_residual_overflow,
        grid_sample,
        warp_block_gather,
    )

    dims = (32, 32, 32)
    rng = np.random.default_rng(3)
    vol = jnp.asarray(rng.standard_normal(dims), jnp.float32)
    disp = _smooth_disp(dims, magnitude=6.0)
    expected = grid_sample(vol, identity_grid(dims) + voxel_to_normalised(disp))
    for radius, block in ((2, 4), (3, 8)):
        assert int(block_residual_overflow(disp, 8, radius, block)) == 0
        got = warp_block_gather(vol, disp, 8, radius, block)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   atol=2e-5)

    # multi-channel
    vol4 = jnp.asarray(rng.standard_normal((2,) + dims), jnp.float32)
    exp4 = grid_sample(vol4, identity_grid(dims) + voxel_to_normalised(disp))
    got4 = warp_block_gather(vol4, disp, 8, 2, 4)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(exp4), atol=2e-5)


def test_warp_block_gather_displacement_gradient():
    """The analytic displacement cotangent matches autodiff through the
    gather formulation (vol is constant by contract)."""
    from ir_sgmcmc_tpu.ops.grids import identity_grid, voxel_to_normalised
    from ir_sgmcmc_tpu.ops.resample import grid_sample, warp_block_gather

    dims = (16, 16, 16)
    rng = np.random.default_rng(4)
    vol = jnp.asarray(rng.standard_normal(dims), jnp.float32)
    disp = _smooth_disp(dims, magnitude=2.0, seed=1)
    # keep sampling positions off exact knots where the two formulations'
    # subgradients may legitimately differ
    disp = disp + 0.25
    cot = jnp.asarray(rng.standard_normal(dims), jnp.float32)

    def loss_block(d):
        return jnp.sum(warp_block_gather(vol, d, 8, 2, 4) * cot)

    def loss_gather(d):
        t = identity_grid(dims) + voxel_to_normalised(d)
        return jnp.sum(grid_sample(vol, t) * cot)

    g_block = np.asarray(jax.grad(loss_block)(disp))
    g_gather = np.asarray(jax.grad(loss_gather)(disp))
    np.testing.assert_allclose(g_block, g_gather, atol=5e-4)


def test_warp_block_gather_overflow_clamps_and_counts():
    """In-block variation beyond the radius is clamped (not wrong-valued)
    and reported by block_residual_overflow."""
    from ir_sgmcmc_tpu.ops.resample import (
        block_residual_overflow,
        warp_block_gather,
    )

    dims = (16, 16, 16)
    rng = np.random.default_rng(5)
    vol = jnp.asarray(rng.standard_normal(dims), jnp.float32)
    # high-frequency field: varies ±4 voxels inside each 8-block
    zz = np.meshgrid(*[np.arange(s) for s in dims], indexing="ij")[0]
    disp = jnp.asarray(np.stack([
        4.0 * np.sin(zz * np.pi / 2), np.zeros(dims), np.zeros(dims)]),
        jnp.float32)
    n_over = int(block_residual_overflow(disp, 8, radius=2, block=8))
    assert n_over > 0
    out = warp_block_gather(vol, disp, 8, 2, 8)
    assert np.isfinite(np.asarray(out)).all()
