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
    """SVF integration via bounded warps ≈ the reference gather formulation."""
    rng = np.random.default_rng(4)
    dims = (12, 12, 12)
    v = (rng.standard_normal((3,) + dims) * 0.8).astype(np.float32)

    svf_b = SVF3D(dims, no_steps=8, max_disp=4)
    svf_g = SVF3D(dims, no_steps=8, use_gather=True)

    T_b, d_b = svf_b(jnp.asarray(v))
    T_g, d_g = svf_g(jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_g), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(T_b), np.asarray(T_g), atol=1e-5)


def test_svf_radius_schedule():
    svf = SVF3D((16, 16, 16), no_steps=12, max_disp=8)
    assert svf.radii == [1] * 9 + [1, 2, 4]
    svf = SVF3D((16, 16, 16), no_steps=4, max_disp=8)
    assert svf.radii == [1, 1, 2, 4]
