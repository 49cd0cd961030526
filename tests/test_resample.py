"""grid_sample parity against torch.nn.functional.grid_sample.

The reference relies on torch grid_sample (border padding, align_corners)
for warping and SVF integration; these tests pin our resampler to the exact
same semantics (SURVEY.md §7 names this as the top correctness risk).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

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
