"""Pallas split-warp kernels vs the XLA split implementation (interpret).

The dimensionally-split composition step (ops/stencil.py::
split_compose_step) dispatches to these kernels on TPU; interpret mode
validates the exact kernel logic — window DMAs, per-axis lerps, the
gather-form transpose chain with its edge folds, and the clip-mask offset
gradients — against the pure-XLA form on the CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ir_sgmcmc_tpu.ops.pallas_split_warp import (
    split_pallas_applicable,
    split_warp_bwd_pallas,
    split_warp_pallas,
)
from ir_sgmcmc_tpu.ops.stencil import _split_compose_impl


def _rand(rng, shape, scale=1.0):
    return jnp.asarray((rng.standard_normal(shape) * scale).astype(np.float32))


@pytest.mark.parametrize("shape", [(8, 8, 128), (16, 12, 128)])
def test_split_forward_matches_xla(shape):
    rng = np.random.default_rng(3)
    d = _rand(rng, (3,) + shape, 2.0)
    # offsets beyond ±1 exercise the clamp path too
    u = _rand(rng, (3,) + shape, 0.9)

    out = split_warp_pallas(d, u, add_u=True, interpret=True)
    ref = _split_compose_impl(d, u)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # saturated offsets (|u| > 1) clamp identically
    u_big = _rand(rng, (3,) + shape, 1.8)
    out = split_warp_pallas(d, u_big, add_u=True, interpret=True)
    ref = _split_compose_impl(d, u_big)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("scale", [0.9, 1.8])
def test_split_backward_matches_xla(scale):
    shape = (8, 8, 128)
    rng = np.random.default_rng(5)
    d = _rand(rng, (3,) + shape, 2.0)
    u = _rand(rng, (3,) + shape, scale)
    g = _rand(rng, (3,) + shape)

    gd_ref, gu_ref = jax.vjp(_split_compose_impl, d, u)[1](g)
    gd, gu_warp = split_warp_bwd_pallas(d, u, g, interpret=True)
    gu = gu_warp + g  # the compose wrapper adds the direct +u term
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_ref),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gu_ref),
                               atol=3e-5, rtol=1e-4)


def test_split_dispatch_end_to_end():
    """split_compose_step routed through the kernels (interpret override)
    equals the XLA route, values and both gradients."""
    from ir_sgmcmc_tpu.ops import resample
    from ir_sgmcmc_tpu.ops.stencil import split_compose_step

    shape = (8, 8, 128)
    rng = np.random.default_rng(7)
    d = _rand(rng, (3,) + shape, 2.0)
    u = _rand(rng, (3,) + shape, 1.2)
    cot = _rand(rng, (3,) + shape)

    def loss(d, u):
        return jnp.sum(split_compose_step(d, u) * cot)

    resample.set_pallas_mode(False)
    try:
        ref = split_compose_step(d, u)
        gd_ref, gu_ref = jax.grad(loss, argnums=(0, 1))(d, u)
        resample.set_pallas_mode("interpret")
        assert split_pallas_applicable(d.shape)
        out = split_compose_step(d, u)
        gd, gu = jax.grad(loss, argnums=(0, 1))(d, u)
    finally:
        resample.set_pallas_mode(None)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_ref),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gu_ref),
                               atol=3e-5, rtol=1e-4)


def test_split_applicable():
    assert split_pallas_applicable((128, 128, 128))
    assert not split_pallas_applicable((128, 128, 100))  # unaligned lanes
    assert not split_pallas_applicable((9, 128, 128))    # untileable z


def test_split_bf16_matches_f32():
    """bf16 operands (the TPU composition-phase default when SVF3D's
    compute_dtype resolves to bfloat16): the kernels stage windows and
    outputs in bf16 (halving the bandwidth-bound DMA traffic) but run all
    arithmetic f32, so the error budget vs the f32 kernel is one bf16
    rounding of the inputs plus one of the outputs."""
    shape = (8, 8, 128)
    rng = np.random.default_rng(11)
    d, u, g = (_rand(rng, (3,) + shape, s).astype(jnp.bfloat16)
               for s in (2.0, 0.9, 1.0))
    # the reference is the XLA impl ON THE ROUNDED inputs — comparing
    # against unrounded f32 inputs would flip the |u| >= 1 clip mask for
    # offsets whose bf16 rounding crosses 1.0
    d32, u32, g32 = (x.astype(jnp.float32) for x in (d, u, g))

    out = split_warp_pallas(d, u, add_u=True, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _split_compose_impl(d32, u32)
    # |d| <= ~8 here, so one bf16 ulp is ~8 * 2^-8 = 0.03
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=6e-2)

    gd, gu_warp = split_warp_bwd_pallas(d, u, g, interpret=True)
    assert gd.dtype == jnp.bfloat16 and gu_warp.dtype == jnp.bfloat16
    gd_ref, gu_ref = jax.vjp(_split_compose_impl, d32, u32)[1](g32)
    gu = gu_warp.astype(jnp.float32) + g32
    np.testing.assert_allclose(np.asarray(gd, np.float32),
                               np.asarray(gd_ref), atol=8e-2)
    # at |u| EXACTLY 1.0 (common after bf16 rounding, measure-zero in f32)
    # the clip subgradient conventions differ: XLA's min/max VJP passes
    # half the cotangent, the kernel's strict |u| < 1 mask passes none —
    # both valid subgradients, so compare only off the tie set
    interior = np.abs(np.asarray(u32)) != 1.0
    np.testing.assert_allclose(np.asarray(gu)[interior],
                               np.asarray(gu_ref)[interior], atol=1e-1)


def test_split_vmap_matches_per_example():
    """vmap folds the batch into the kernel grid (one pallas_call for all
    chains — the engine's chain-vmap hot path) and must equal per-example
    calls; an unbatched ``u`` operand broadcasts into the rule."""
    shape = (8, 8, 128)
    rng = np.random.default_rng(13)
    d = jnp.stack([_rand(rng, (3,) + shape, 2.0) for _ in range(2)])
    u = jnp.stack([_rand(rng, (3,) + shape, 0.9) for _ in range(2)])
    g = jnp.stack([_rand(rng, (3,) + shape) for _ in range(2)])

    out = jax.vmap(lambda dd, uu: split_warp_pallas(
        dd, uu, add_u=True, interpret=True))(d, u)
    for b in range(2):
        ref = split_warp_pallas(d[b], u[b], add_u=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(ref),
                                   atol=2e-5)

    gd, gu = jax.vmap(lambda dd, uu, gg: split_warp_bwd_pallas(
        dd, uu, gg, interpret=True))(d, u, g)
    for b in range(2):
        gd_ref, gu_ref = split_warp_bwd_pallas(d[b], u[b], g[b],
                                               interpret=True)
        np.testing.assert_allclose(np.asarray(gd[b]), np.asarray(gd_ref),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(gu[b]), np.asarray(gu_ref),
                                   atol=2e-5)

    # unbatched u: the rule broadcasts it across the mapped axis
    out_shared = jax.vmap(lambda dd: split_warp_pallas(
        dd, u[0], add_u=True, interpret=True))(d)
    for b in range(2):
        ref = split_warp_pallas(d[b], u[0], add_u=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out_shared[b]),
                                   np.asarray(ref), atol=2e-5)
