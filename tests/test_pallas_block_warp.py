"""Block-gather warp Pallas kernels vs the XLA formulation (interpret mode).

The kernels target real TPUs (lane-aligned W, dynamic lane gather); interpret
mode checks the logic — static-window DMA, ``take_along_axis`` x-gather,
z/y mask-select chains, residual blend — on CPU against ``ops.resample``'s
gather path.  Compiled-Mosaic parity on real hardware is covered by
scripts/tpu_selftest.py (tests/test_tpu_compiled.py, marker ``tpu``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ir_sgmcmc_tpu.ops.pallas_block_warp import (
    block_warp_dgrad_pallas,
    block_warp_pallas,
    block_warp_pallas_applicable,
)
from ir_sgmcmc_tpu.ops import resample


def _smooth_disp(dims, magnitude, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((3, 2, 2, 2)).astype(np.float32) * magnitude
    d = jax.image.resize(jnp.asarray(c), (3,) + dims, method="cubic")
    return jnp.clip(d, -magnitude, magnitude)


def _xla_fwd(vol, disp, bound, radius, block=8):
    squeeze, v4, nb, windows, r_blocks = resample._wbg_prep(
        vol, disp, bound, radius, block)
    r_c = jnp.clip(r_blocks, -radius, radius)
    out_blocks = resample._block_blend(
        windows, r_c, (resample._tri_o,) * 3, radius, block)
    out = resample._blocks_to_volume(out_blocks, nb, block, v4.shape[-3:])
    return out[0] if squeeze else out


@pytest.mark.parametrize("shape,bound,radius,chan", [
    ((16, 16, 128), 4, 2, None),
    ((16, 16, 128), 9, 2, 2),
    ((8, 8, 128), 6, 1, None),
    # radius 3: the documented recovery lever for block-residual overflow
    # on rough posterior samples (BASELINE.md round 3, phantom seed 2)
    ((16, 16, 128), 9, 3, None),
    # W > 128: the x-gather's per-128-lane-chunk decomposition
    # (_lane_shift_gather — the round-4 256³ Mosaic regression's fix);
    # compiled coverage is scripts/tpu_selftest.py's @256 checks
    ((8, 8, 256), 9, 2, None),
])
def test_block_warp_pallas_matches_xla(shape, bound, radius, chan):
    rng = np.random.default_rng(0)
    vshape = ((chan,) if chan else ()) + shape
    vol = jnp.asarray(rng.standard_normal(vshape).astype(np.float32))
    disp = _smooth_disp(shape, magnitude=bound - 0.5)

    assert block_warp_pallas_applicable(vshape, bound, radius, 8)
    squeeze, v4, m, r_raw = resample._wbg_prep_pallas(vol, disp, bound, radius, 8)
    r_c = jnp.clip(r_raw, -radius, radius)
    out = block_warp_pallas(v4, r_c, m, bound, radius, interpret=True)
    out = out[0] if squeeze else out
    ref = _xla_fwd(vol, disp, bound, radius)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("radius", [2, 3])
def test_block_warp_dgrad_matches_xla(radius):
    shape = (16, 16, 128)
    bound = 6
    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    # keep positions off exact knots where subgradients legitimately differ
    disp = _smooth_disp(shape, magnitude=bound - 1.0, seed=2) + 0.25
    g = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    # XLA path gradient via the public custom-VJP op (pallas off)
    resample.set_pallas_mode(False)
    try:
        g_ref = jax.grad(lambda d: jnp.sum(
            resample.warp_block_gather(vol, d, bound, radius, 8) * g))(disp)
    finally:
        resample.set_pallas_mode(None)

    squeeze, v4, m, r_raw = resample._wbg_prep_pallas(vol, disp, bound, radius, 8)
    r_c = jnp.clip(r_raw, -radius, radius)
    g_r = block_warp_dgrad_pallas(v4, r_c, m, g[None], bound, radius,
                                  interpret=True)
    g_pallas = jnp.where(jnp.abs(r_raw) <= radius, g_r, 0.0)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               atol=5e-4, rtol=1e-4)


def test_block_warp_applicable():
    assert block_warp_pallas_applicable((128, 128, 128), 9, 2, 8)
    assert not block_warp_pallas_applicable((128, 128, 100), 9, 2, 8)
    assert not block_warp_pallas_applicable((128, 128, 128), 9, 2, 4)
    assert not block_warp_pallas_applicable((9, 128, 128), 9, 2, 8)


def test_block_warp_dispatch_interpret_end_to_end():
    """The public op routed through the kernels (interpret) equals the XLA
    path, forward and gradient."""
    shape = (8, 16, 128)
    bound, radius = 5, 2
    rng = np.random.default_rng(3)
    vol = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    disp = _smooth_disp(shape, magnitude=4.0, seed=4) + 0.25

    def loss(d):
        return jnp.sum(resample.warp_block_gather(vol, d, bound, radius, 8) ** 2)

    resample.set_pallas_mode(False)
    try:
        ref_out = resample.warp_block_gather(vol, disp, bound, radius, 8)
        ref_g = jax.grad(loss)(disp)
    finally:
        resample.set_pallas_mode(None)

    resample.set_pallas_mode("interpret")
    try:
        got_out = resample.warp_block_gather(vol, disp, bound, radius, 8)
        got_g = jax.grad(loss)(disp)
    finally:
        resample.set_pallas_mode(None)

    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               atol=5e-4, rtol=1e-4)


def test_block_warp_vmap_matches_per_example():
    """vmap folds the batch into the kernel grid (one pallas_call for all
    chains — the engine's chain-vmap hot path) and must equal per-example
    calls, forward and dgrad."""
    shape = (8, 8, 128)
    bound, radius = 4, 2
    rng = np.random.default_rng(17)
    vols, rs, ms, gs = [], [], [], []
    for b in range(2):
        vol = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        disp = _smooth_disp(shape, magnitude=3.0, seed=20 + b) + 0.2
        _, v4, m, r_raw = resample._wbg_prep_pallas(vol, disp, bound,
                                                    radius, 8)
        vols.append(v4)
        rs.append(jnp.clip(r_raw, -radius, radius))
        ms.append(m)
        gs.append(jnp.asarray(
            rng.standard_normal((1,) + shape).astype(np.float32)))
    v5, r5, m5, g5 = (jnp.stack(x) for x in (vols, rs, ms, gs))

    out = jax.vmap(lambda v, r, m: block_warp_pallas(
        v, r, m, bound, radius, interpret=True))(v5, r5, m5)
    for b in range(2):
        ref = block_warp_pallas(v5[b], r5[b], m5[b], bound, radius,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    gr = jax.vmap(lambda v, r, m, g: block_warp_dgrad_pallas(
        v, r, m, g, bound, radius, interpret=True))(v5, r5, m5, g5)
    for b in range(2):
        ref = block_warp_dgrad_pallas(v5[b], r5[b], m5[b], g5[b],
                                      bound, radius, interpret=True)
        np.testing.assert_allclose(np.asarray(gr[b]), np.asarray(ref),
                                   atol=5e-4, rtol=1e-4)
