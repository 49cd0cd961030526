"""Pallas warp kernel vs the XLA reference implementation (interpret mode).

The kernel itself targets real TPUs (lane-aligned W); interpret mode checks
the logic — DMA windowing, sublane rolls, lane-shift clamping — on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ir_sgmcmc_tpu.ops.pallas_warp import pallas_applicable, warp_bounded_pallas
from ir_sgmcmc_tpu.ops.resample import _warp_bounded_impl


@pytest.mark.parametrize("shape,radius,chan", [
    ((8, 8, 128), 1, None),
    ((8, 8, 128), 2, 3),
    ((16, 16, 128), 4, 3),
])
def test_pallas_warp_matches_xla(shape, radius, chan):
    rng = np.random.default_rng(0)
    vshape = ((chan,) if chan else ()) + shape
    vol = jnp.asarray(rng.standard_normal(vshape).astype(np.float32))
    disp = jnp.asarray(
        ((rng.random((3,) + shape) * 2 - 1) * radius * 1.2).astype(np.float32))

    out = warp_bounded_pallas(vol, disp, radius, interpret=True)
    ref = _warp_bounded_impl(vol, disp, radius)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_applicable():
    assert pallas_applicable((128, 128, 128), 1)
    assert not pallas_applicable((128, 128, 100), 1)  # unaligned lanes
    assert not pallas_applicable((9, 128, 128), 1)  # untileable z


@pytest.mark.parametrize("shape,radius,chan", [
    ((8, 8, 128), 1, None),
    ((8, 8, 128), 2, 4),
    ((16, 16, 128), 4, 3),
])
def test_pallas_backward_kernels_match_xla(shape, radius, chan):
    import jax.numpy as jnp

    from ir_sgmcmc_tpu.ops.pallas_warp import (
        warp_bounded_dgrad_pallas,
        warp_bounded_tblend_pallas,
    )
    from ir_sgmcmc_tpu.ops.resample import (
        _bwd_dgrads_xla,
        _bwd_tblend_xla,
        _fold_edge,
    )

    rng = np.random.default_rng(1)
    vshape = ((chan,) if chan else ()) + shape
    vol = jnp.asarray(rng.standard_normal(vshape).astype(np.float32))
    disp = jnp.asarray(
        ((rng.random((3,) + shape) * 2 - 1) * radius * 1.2).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(vshape).astype(np.float32))

    gd = warp_bounded_dgrad_pallas(vol, disp, g, radius, interpret=True)
    gd = jnp.where(jnp.abs(disp) <= radius, gd, 0.0)
    np.testing.assert_allclose(np.asarray(gd),
                               np.asarray(_bwd_dgrads_xla(vol, disp, radius, g)),
                               atol=1e-5)

    gp = warp_bounded_tblend_pallas(disp, g, radius, interpret=True)
    gv = _fold_edge(gp, radius, axes=(-3, -2))
    np.testing.assert_allclose(np.asarray(gv),
                               np.asarray(_bwd_tblend_xla(vol, disp, radius, g)),
                               atol=1e-5)


def test_blend_vmap_matches_per_example():
    """vmap folds the batch into the kernel grid (one pallas_call for all
    chains — the exact-path chain-vmap hot path) and must equal per-example
    calls; an unbatched ``vol`` operand broadcasts into the rule."""
    from ir_sgmcmc_tpu.ops.pallas_warp import (
        warp_bounded_dgrad_pallas,
        warp_bounded_tblend_pallas,
    )

    shape = (8, 8, 128)
    radius = 2
    rng = np.random.default_rng(7)
    vol = jnp.asarray(rng.standard_normal((2, 3) + shape).astype(np.float32))
    disp = jnp.asarray(
        ((rng.random((2, 3) + shape) * 2 - 1) * radius * 1.2).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((2, 3) + shape).astype(np.float32))

    out = jax.vmap(lambda v, d: warp_bounded_pallas(
        v, d, radius, interpret=True))(vol, disp)
    gd = jax.vmap(lambda v, d, gg: warp_bounded_dgrad_pallas(
        v, d, gg, radius, interpret=True))(vol, disp, g)
    gp = jax.vmap(lambda d, gg: warp_bounded_tblend_pallas(
        d, gg, radius, interpret=True))(disp, g)
    for b in range(2):
        np.testing.assert_allclose(
            np.asarray(out[b]),
            np.asarray(warp_bounded_pallas(vol[b], disp[b], radius,
                                           interpret=True)), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(gd[b]),
            np.asarray(warp_bounded_dgrad_pallas(vol[b], disp[b], g[b],
                                                 radius, interpret=True)),
            atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(gp[b]),
            np.asarray(warp_bounded_tblend_pallas(disp[b], g[b], radius,
                                                  interpret=True)), atol=2e-5)

    # unbatched vol: the rule broadcasts it across the mapped axis
    out_shared = jax.vmap(lambda d: warp_bounded_pallas(
        vol[0], d, radius, interpret=True))(disp)
    for b in range(2):
        np.testing.assert_allclose(
            np.asarray(out_shared[b]),
            np.asarray(warp_bounded_pallas(vol[0], disp[b], radius,
                                           interpret=True)), atol=2e-5)
