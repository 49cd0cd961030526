"""Pallas TPU kernel for the bounded shift-and-blend trilinear warp.

The XLA formulation of :func:`ir_sgmcmc_tpu.ops.resample.warp_bounded`
(slice-multiply-accumulate over ``(2R+2)³`` statically shifted copies)
round-trips every shifted term through HBM — lane-dimension shifts are
materialised copies — costing ~30-80 ms per 128³ warp on a v5e (measured).
This kernel keeps the whole working set in VMEM:

* the volume is replicate-padded in z and y only (lane dimension stays
  128-aligned); x shifts are in-register ``pltpu.roll``s with border-clamp
  masking on the wrapped lanes,
* the grid walks (channel, z-tile); the padded volume block depends only on
  the channel, so Mosaic re-uses it across all z-tiles of a channel,
* per (oz, oy) a ``(TD, H, W)`` slab is read from the VMEM block; the four
  x-offsets blend in registers with triangular weights computed on the fly
  from the displacement block.

HBM traffic per warp ≈ one read of vol+disp and one write of out, the
speed-of-light for this op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tri(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _shift_x_clamped(slab: jnp.ndarray, ox: int, W: int, col: jnp.ndarray):
    """``slab`` shifted by ``ox`` along the lane axis with border clamping."""
    if ox == 0:
        return slab
    rolled = pltpu.roll(slab, (-ox) % W, axis=slab.ndim - 1)
    if ox > 0:
        edge = jax.lax.slice_in_dim(slab, W - 1, W, axis=slab.ndim - 1)
        return jnp.where(col < W - ox, rolled, edge)
    edge = jax.lax.slice_in_dim(slab, 0, 1, axis=slab.ndim - 1)
    return jnp.where(col >= -ox, rolled, edge)


def _warp_kernel(vol_hbm, disp_ref, out_ref, window, sem,
                 *, R: int, TD: int, H: int, W: int):
    P = R
    c = pl.program_id(0)
    i = pl.program_id(1)
    offsets = list(range(-R, R + 1))

    # DMA the haloed z-window of this channel into VMEM (~1 MB).  vol_hbm is
    # channel-flattened to (C·Dp, Hp, W) so the window is one dynamic slice.
    Dp = pl.num_programs(1) * TD + 2 * P
    dma = pltpu.make_async_copy(
        vol_hbm.at[pl.ds(c * Dp + i * TD, TD + 2 * P)], window, sem)
    dma.start()
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    dma.wait()

    # one output z-slice at a time: all blend temporaries are (H, W) plane
    # registers (full-tile temps blew the 16 MB VMEM stack at 128³)
    def zbody(z, _):
        d = jnp.clip(disp_ref[:, z], -R, R)  # (3, H, W)
        dx, dy, dz = d[0], d[1], d[2]
        wx = [_tri(dx - ox) for ox in offsets]
        acc = jnp.zeros((H, W), jnp.float32)

        wy = [_tri(dy - oy) for oy in offsets]
        Hp = window.shape[1]

        def accumulate(acc, oz, wz):
            # one aligned full-row read per oz; y-shifts are sublane rolls
            # followed by an aligned prefix slice (no wraparound: the window
            # is edge-padded in y, and y + P + oy < Hp for all valid y)
            plane = window[pl.ds(z + P + oz, 1), :, :].reshape(Hp, W)
            for iy, oy in enumerate(offsets):
                wzy = wz * wy[iy]
                rolled = pltpu.roll(plane, (-(P + oy)) % Hp, axis=0)
                slab = rolled[0:H, :]
                for ix, ox in enumerate(offsets):
                    acc = acc + (wzy * wx[ix]) * _shift_x_clamped(slab, ox, W, col)
            return acc

        if R <= 2:
            for oz in offsets:
                acc = accumulate(acc, oz, _tri(dz - oz))
        else:
            def body(k, acc):
                oz = k - R  # traced; pl.ds handles the dynamic slab start
                return accumulate(acc, oz, _tri(dz - oz.astype(jnp.float32)))

            acc = jax.lax.fori_loop(0, len(offsets), body, acc)

        out_ref[0, z] = acc
        return 0

    jax.lax.fori_loop(0, TD, zbody, 0)


def pallas_applicable(vol_shape, radius: int) -> bool:
    """Kernel constraints: lane-aligned W, tileable z, bounded halo window."""
    D, H, W = vol_shape[-3:]
    if W % 128 != 0 or W > 1024:
        return False
    if D % 8 != 0:
        return False
    # the haloed z-window (TD+2P, H+2P, W) must stay a small VMEM resident
    P = radius + 1
    window_bytes = (8 + 2 * P) * (H + 2 * P) * W * 4
    return window_bytes < 4 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def warp_bounded_pallas(vol: jnp.ndarray, disp_vox: jnp.ndarray, radius: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Pallas forward of the bounded trilinear warp (same contract as
    ``ops.resample.warp_bounded``): ``vol (C?, D, H, W)``, ``disp (3, D, H, W)``.
    """
    R = int(radius)
    P = R
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[None]
    C, D, H, W = vol.shape
    TD = 8 if D % 8 == 0 else D

    # sublane (y) extent of the DMA window must be 8-aligned or the DMA
    # faults the TPU worker — pad the high side up to a multiple of 8
    Hp = H + 2 * P + (-(H + 2 * P)) % 8
    Dp = D + 2 * P
    padded = jnp.pad(vol, [(0, 0), (P, P), (P, Hp - H - P), (0, 0)], mode="edge")
    padded = padded.reshape(C * Dp, Hp, W)

    grid = (C, D // TD)
    out = pl.pallas_call(
        functools.partial(_warp_kernel, R=R, TD=TD, H=H, W=W),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded vol stays in HBM
            pl.BlockSpec((3, TD, H, W), lambda c, i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TD, H, W), lambda c, i: (c, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, D, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TD + 2 * P, Hp, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(padded, disp_vox)
    return out[0] if squeeze else out
