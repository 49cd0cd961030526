"""Pallas TPU kernels for the bounded shift-and-blend trilinear warp.

The XLA formulation of :func:`ir_sgmcmc_tpu.ops.resample.warp_bounded`
(slice-multiply-accumulate over ``(2R+2)³`` statically shifted copies)
round-trips every shifted term through HBM — lane-dimension shifts are
materialised copies — costing ~30-80 ms per 128³ warp on a v5e (measured).
These kernels keep the whole working set in VMEM:

* the volume is replicate-padded in z and y only (lane dimension stays
  128-aligned); x shifts are in-register ``pltpu.roll``s with border-clamp
  masking on the wrapped lanes,
* the grid walks z-tiles; all channels are processed per program with the
  blend weights (``tri`` products of the displacement, identical across
  channels) computed ONCE and reused — but every per-element op stays 2D
  ``(H, W)`` via python channel loops: a channel-vectorised variant with
  ``(C, H, W)`` leading-dim ops measured 2× slower (Mosaic relayouts),
* per (oz, oy) the slabs are read from per-channel haloed z-windows
  stacked in one VMEM scratch; triangular weights are computed on the fly
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


def _dtri(t):
    return -jnp.sign(t) * (jnp.abs(t) < 1.0).astype(t.dtype)


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


def _load_windows(src_hbm, window, sem, *, C, rows_src, rows_win, src0, win_rows):
    """Per-channel DMAs of haloed z-windows into one 3D scratch.

    Channel ``c``'s rows ``[src0(c), src0(c)+win_rows)`` of ``src_hbm``
    land at scratch rows ``[c·win_rows, (c+1)·win_rows)``.  All copies are
    started before any is waited on so the up-to-7 window transfers (tblend
    loads C+3 channels) overlap instead of serialising (ADVICE r2); they
    share one DMA semaphore — each ``wait`` consumes exactly its own copy's
    completion count.
    """
    dmas = [
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(src0(c), win_rows)],
            window.at[pl.ds(c * win_rows, win_rows)], sem)
        for c in range(C)
    ]
    for dma in dmas:
        dma.start()
    for dma in dmas:
        dma.wait()


def _warp_kernel(vol_hbm, disp_ref, out_ref, window, sem,
                 *, R: int, C: int, TD: int, H: int, W: int):
    # grid = (B, D // TD): batching rides the leading grid axis (the same
    # rewrite as the split/block-gather kernels — the sequential_vmap loop
    # cost a dynamic-slice/update round-trip of every operand per chain)
    P = R
    b = pl.program_id(0)
    i = pl.program_id(1)
    offsets = list(range(-R, R + 1))
    WR = TD + 2 * P  # window rows per channel
    Dp = pl.num_programs(1) * TD + 2 * P

    _load_windows(vol_hbm, window, sem, C=C, rows_src=Dp, rows_win=WR,
                  src0=lambda c: (b * C + c) * Dp + i * TD, win_rows=WR)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    Hp = window.shape[1]

    # one output z-slice at a time: all blend temporaries are (H, W) plane
    # registers (full-tile temps blew the 16 MB VMEM stack at 128³)
    def zbody(z, _):
        d = jnp.clip(disp_ref[0, :, z], -R, R)  # (3, H, W)
        dx, dy, dz = d[0], d[1], d[2]
        wx = [_tri(dx - ox) for ox in offsets]
        wy = [_tri(dy - oy) for oy in offsets]

        def accumulate(accs, oz, wz):
            # one aligned full-row read per (channel, oz); y-shifts are
            # sublane rolls followed by an aligned prefix slice (no
            # wraparound: the window is edge-padded in y, and
            # y + P + oy < Hp for all valid y)
            planes = [
                window[pl.ds(c * WR + z + P + oz, 1)].reshape(Hp, W)
                for c in range(C)
            ]
            for iy, oy in enumerate(offsets):
                wzy = wz * wy[iy]
                slabs = [pltpu.roll(p, (-(P + oy)) % Hp, axis=0)[0:H, :]
                         for p in planes]
                for ix, ox in enumerate(offsets):
                    wc = wzy * wx[ix]  # shared by all channels
                    accs = tuple(
                        a + wc * _shift_x_clamped(s, ox, W, col)
                        for a, s in zip(accs, slabs))
            return accs

        accs = tuple(jnp.zeros((H, W), jnp.float32) for _ in range(C))
        if R <= 2:
            for oz in offsets:
                accs = accumulate(accs, oz, _tri(dz - oz))
        else:
            def body(k, accs):
                oz = k - R  # traced; pl.ds handles the dynamic slab start
                return accumulate(accs, oz, _tri(dz - oz.astype(jnp.float32)))

            accs = jax.lax.fori_loop(0, len(offsets), body, accs)

        for c in range(C):
            out_ref[0, c, z] = accs[c]
        return 0

    jax.lax.fori_loop(0, TD, zbody, 0)


def _dgrad_kernel(vol_hbm, disp_ref, g_ref, out_ref, window, sem,
                  *, R: int, C: int, TD: int, H: int, W: int):
    """Displacement-gradient pass of the warp backward.

    g_d-axis(p) = Σ_o  W'_axis(d-o) · (other-axis weights) · Σ_c g_c(p)·vol_c(p+o)

    Same slab access pattern as the forward kernel plus the derivative
    weights; the channel sum ``S = Σ_c g_c · vol_c(p+o)`` is built per
    offset and feeds all three axis accumulators, so the weight products
    are computed once instead of per channel.
    """
    P = R
    b = pl.program_id(0)
    i = pl.program_id(1)
    offsets = list(range(-R, R + 1))
    WR = TD + 2 * P
    Dp = pl.num_programs(1) * TD + 2 * P

    _load_windows(vol_hbm, window, sem, C=C, rows_src=Dp, rows_win=WR,
                  src0=lambda c: (b * C + c) * Dp + i * TD, win_rows=WR)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    Hp = window.shape[1]

    def zbody(z, _):
        d = jnp.clip(disp_ref[0, :, z], -R, R)  # (3, H, W)
        dx, dy, dz = d[0], d[1], d[2]
        gs = [g_ref[0, c, z] for c in range(C)]
        wx = [_tri(dx - ox) for ox in offsets]
        dwx = [_dtri(dx - ox) for ox in offsets]
        wy = [_tri(dy - oy) for oy in offsets]
        dwy = [_dtri(dy - oy) for oy in offsets]

        def accumulate(carry, oz, wz, dwz):
            acc_x, acc_y, acc_z = carry
            planes = [
                window[pl.ds(c * WR + z + P + oz, 1)].reshape(Hp, W)
                for c in range(C)
            ]
            for iy, oy in enumerate(offsets):
                slabs = [pltpu.roll(p, (-(P + oy)) % Hp, axis=0)[0:H, :]
                         for p in planes]
                for ix, ox in enumerate(offsets):
                    S = None
                    for c in range(C):
                        t = gs[c] * _shift_x_clamped(slabs[c], ox, W, col)
                        S = t if S is None else S + t
                    acc_x = acc_x + (dwx[ix] * wy[iy] * wz) * S
                    acc_y = acc_y + (wx[ix] * dwy[iy] * wz) * S
                    acc_z = acc_z + (wx[ix] * wy[iy] * dwz) * S
            return acc_x, acc_y, acc_z

        carry = (jnp.zeros((H, W), jnp.float32),) * 3
        if R <= 2:
            for oz in offsets:
                carry = accumulate(carry, oz, _tri(dz - oz), _dtri(dz - oz))
        else:
            def body(k, carry):
                oz = k - R
                ozf = oz.astype(jnp.float32)
                return accumulate(carry, oz, _tri(dz - ozf), _dtri(dz - ozf))

            carry = jax.lax.fori_loop(0, len(offsets), body, carry)

        for axis in range(3):
            out_ref[0, axis, z] = carry[axis]
        return 0

    jax.lax.fori_loop(0, TD, zbody, 0)


@functools.partial(jax.jit, static_argnames=("radius", "interpret", "z_halo"))
def warp_bounded_dgrad_pallas(vol, disp_vox, g, radius: int,
                              interpret: bool = False, z_halo: bool = False):
    """Pallas displacement-gradient pass: returns dU/d(disp) given cotangent
    ``g`` (saturation masking of the clip is applied by the caller).
    ``z_halo=True``: ``vol`` already carries ``R`` halo rows per side in z
    (spatially-sharded call sites, parallel/halo.py).  ``vmap`` folds the
    mapped axis into the kernel grid (one call for all chains)."""
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[None]
        g = g[None]

    @jax.custom_batching.custom_vmap
    def call(vol, disp_vox, g):
        return _dgrad_batched(vol[None], disp_vox[None], g[None],
                              radius, interpret, z_halo)[0]

    @call.def_vmap
    def _rule(axis_size, in_batched, vol, disp_vox, g):
        ops = []
        for x, bt in zip((vol, disp_vox, g), in_batched):
            ops.append(x if bt else
                       jnp.broadcast_to(x[None], (axis_size,) + x.shape))
        return _dgrad_batched(*ops, radius, interpret, z_halo), True

    return call(vol, disp_vox, g)


def _dgrad_batched(vol5, disp5, g5, radius, interpret, z_halo=False):
    """Batched dgrad kernel call: ``vol5 (B, C, Dz, H, W)``,
    ``disp5 (B, 3, D, H, W)``, ``g5 (B, C, D, H, W)``.  The batch rides
    the leading grid axis — per-program VMEM is one element's windows."""
    R = int(radius)
    P = R
    B, C = vol5.shape[0], vol5.shape[1]
    D, H, W = disp5.shape[-3:]
    TD = 8 if D % 8 == 0 else D

    Hp = H + 2 * P + (-(H + 2 * P)) % 8
    Dp = D + 2 * P
    zpad = (0, 0) if z_halo else (P, P)
    padded = jnp.pad(vol5, [(0, 0), (0, 0), zpad, (P, Hp - H - P), (0, 0)],
                     mode="edge")
    padded = padded.reshape(B * C * Dp, Hp, W)

    return pl.pallas_call(
        functools.partial(_dgrad_kernel, R=R, C=C, TD=TD, H=H, W=W),
        grid=(B, D // TD),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 3, TD, H, W), lambda b, i: (b, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, TD, H, W), lambda b, i: (b, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, TD, H, W), lambda b, i: (b, 0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, D, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C * (TD + 2 * P), Hp, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(padded, disp5, g5)


def _rollx_zero(a: jnp.ndarray, ox: int, W: int, col: jnp.ndarray):
    """``a`` shifted so element x' holds a(x'-ox), zero outside [0, W)."""
    if ox == 0:
        return a
    rolled = pltpu.roll(a, ox % W, axis=a.ndim - 1)
    if ox > 0:
        return jnp.where(col >= ox, rolled, 0.0)
    return jnp.where(col < W + ox, rolled, 0.0)


def _tblend_kernel(x_hbm, out_ref, window, sem,
                   *, R: int, C: int, TZ: int, Hy: int, Hy_out: int, W: int):
    """Transpose-blend pass of the warp backward (gradient w.r.t. the volume).

    Computes the z/y-*unfolded* padded gradient
        g_padded(r) = Σ_o (w_o ⊙ g)(r − P − o)
    with the x-axis edge-fold applied in-kernel: the interior term is a
    zero-filled lane roll, and the mass that falls outside [0, W) is exactly
    the border-clamp fold — sliced from the |ox| edge lanes and deposited on
    the border lane.  The caller slices the valid region and folds z and y
    (thin concats in XLA).

    Input is channel-stacked [g(C), dx, dy, dz], zero-padded by 2P in z
    and y, flattened to ((C+3)·Dz, Hy, W); the displacement windows and the
    blend weights are shared across the C cotangent channels.
    """
    P = R
    b = pl.program_id(0)
    i = pl.program_id(1)
    offsets = list(range(-R, R + 1))
    WR = TZ + 2 * P
    Dz = pl.num_programs(1) * TZ + 2 * P

    _load_windows(x_hbm, window, sem, C=C + 3, rows_src=Dz, rows_win=WR,
                  src0=lambda c: (b * (C + 3) + c) * Dz + i * TZ, win_rows=WR)
    col = jax.lax.broadcasted_iota(jnp.int32, (Hy, W), 1)

    def rbody(r, _):
        def accumulate(accs, oz, s):
            # source rows for this z-offset (shared by all y/x/channel terms)
            dxr = jnp.clip(window[pl.ds(C * WR + s, 1)].reshape(Hy, W), -R, R)
            dyr = jnp.clip(window[pl.ds((C + 1) * WR + s, 1)].reshape(Hy, W), -R, R)
            dzr = jnp.clip(window[pl.ds((C + 2) * WR + s, 1)].reshape(Hy, W), -R, R)
            gcs = [window[pl.ds(c * WR + s, 1)].reshape(Hy, W) for c in range(C)]
            wz = _tri(dzr - oz)
            wxs = [_tri(dxr - ox) for ox in offsets]
            for oy in offsets:
                wzy = wz * _tri(dyr - oy)
                new = []
                for c in range(C):
                    b = wzy * gcs[c]
                    inner = jnp.zeros((Hy, W), jnp.float32)
                    for ix, ox in enumerate(offsets):
                        a = wxs[ix] * b
                        inner = inner + _rollx_zero(a, ox, W, col)
                        # x edge-fold: the out-of-range mass lives in
                        # exactly |ox| edge lanes — slice them instead of a
                        # masked full-width reduction
                        if ox < 0:
                            lo = jax.lax.slice_in_dim(a, 0, -ox, axis=1)
                            if -ox > 1:
                                lo = jnp.sum(lo, axis=1, keepdims=True)
                            inner = inner + jnp.where(col == 0, lo, 0.0)
                        elif ox > 0:
                            hi = jax.lax.slice_in_dim(a, W - ox, W, axis=1)
                            if ox > 1:
                                hi = jnp.sum(hi, axis=1, keepdims=True)
                            inner = inner + jnp.where(col == W - 1, hi, 0.0)
                    # y shift: element y' takes inner(y' + P - oy)
                    rolled = pltpu.roll(inner, (-(P - oy)) % Hy, axis=0)
                    new.append(accs[c] + rolled[0:Hy_out, :])
                accs = tuple(new)
            return accs

        accs = tuple(jnp.zeros((Hy_out, W), jnp.float32) for _ in range(C))
        if R <= 2:
            for oz in offsets:
                accs = accumulate(accs, oz, r + P - oz)
        else:
            def body(k, accs):
                oz = k - R
                return accumulate(accs, oz.astype(jnp.float32), r + P - oz)

            accs = jax.lax.fori_loop(0, len(offsets), body, accs)

        for c in range(C):
            out_ref[0, c, r] = accs[c]
        return 0

    jax.lax.fori_loop(0, TZ, rbody, 0)


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def warp_bounded_tblend_pallas(disp_vox, g, radius: int, interpret: bool = False):
    """Pallas transpose-blend: gradient w.r.t. the volume, ready-folded in x.

    Returns the g_padded tensor of extent ``(C, D+2P, H+2P, W)`` (x already
    edge-folded); the caller folds z and y with
    ``resample._fold_edge(·, P, axes=(-3, -2))``.
    """
    squeeze = g.ndim == 3
    if squeeze:
        g = g[None]

    @jax.custom_batching.custom_vmap
    def call(disp_vox, g):
        return _tblend_batched(disp_vox[None], g[None], radius, interpret)[0]

    @call.def_vmap
    def _rule(axis_size, in_batched, disp_vox, g):
        d_b, g_b = in_batched
        if not d_b:
            disp_vox = jnp.broadcast_to(
                disp_vox[None], (axis_size,) + disp_vox.shape)
        if not g_b:
            g = jnp.broadcast_to(g[None], (axis_size,) + g.shape)
        return _tblend_batched(disp_vox, g, radius, interpret), True

    out = call(disp_vox, g)
    return out[0] if squeeze else out


def _tblend_batched(disp5, g5, radius, interpret):
    """Batched tblend kernel call: ``disp5 (B, 3, D, H, W)``,
    ``g5 (B, C, D, H, W)``; batch rides the leading grid axis."""
    R = int(radius)
    P = R
    B, C = g5.shape[0], g5.shape[1]
    D, H, W = g5.shape[-3:]
    TZ = 8

    Dp_out = D + 2 * P
    Dz_out = Dp_out + (-Dp_out) % TZ
    Hp_out = H + 2 * P
    Hy_out = Hp_out + (-Hp_out) % 8
    Hy = Hy_out + 2 * P + (-(Hy_out + 2 * P)) % 8
    Dz = Dz_out + 2 * P

    x = jnp.concatenate([g5, disp5], axis=1)  # (B, C+3, D, H, W)
    x = jnp.pad(x, [(0, 0), (0, 0), (2 * P, Dz - D - 2 * P),
                    (2 * P, Hy - H - 2 * P), (0, 0)])
    x = x.reshape(B * (C + 3) * Dz, Hy, W)

    out = pl.pallas_call(
        functools.partial(_tblend_kernel, R=R, C=C, TZ=TZ, Hy=Hy,
                          Hy_out=Hy_out, W=W),
        grid=(B, Dz_out // TZ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, C, TZ, Hy_out, W),
                               lambda b, i: (b, 0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Dz_out, Hy_out, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(((C + 3) * (TZ + 2 * P), Hy, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        # C in-flight accumulators × (2R+1) x-terms: R=2 at 128³ needs ~73 MB
        # of scoped stack (v5e VMEM is 128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x)
    return out[:, :, :Dp_out, :Hp_out, :]


def pallas_applicable(vol_shape, radius: int) -> bool:
    """Kernel constraints: lane-aligned W, tileable z, bounded halo windows
    (C ≤ 4 on every call site)."""
    D, H, W = vol_shape[-3:]
    if W % 128 != 0 or W > 1024:
        return False
    if D % 8 != 0:
        return False
    P = radius + 1
    window_bytes = 4 * (8 + 2 * P) * (H + 2 * P) * W * 4
    return window_bytes < 16 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("radius", "interpret", "z_halo"))
def warp_bounded_pallas(vol: jnp.ndarray, disp_vox: jnp.ndarray, radius: int,
                        interpret: bool = False, z_halo: bool = False) -> jnp.ndarray:
    """Pallas forward of the bounded trilinear warp (same contract as
    ``ops.resample.warp_bounded``): ``vol (C?, D, H, W)``, ``disp (3, D, H, W)``.

    ``vmap`` (the chain axis) folds the mapped axis into the kernel grid —
    one ``pallas_call`` serves all chains with no XLA-level per-chain
    slicing (the sequential_vmap loop cost a dynamic-slice/update
    round-trip of every operand per chain).  ``z_halo=True``: ``vol`` comes
    with ``R`` halo rows per side in z already (sharded call sites).
    """
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[None]

    @jax.custom_batching.custom_vmap
    def call(vol, disp_vox):
        return _warp_batched(vol[None], disp_vox[None],
                             radius, interpret, z_halo)[0]

    @call.def_vmap
    def _rule(axis_size, in_batched, vol, disp_vox):
        v_b, d_b = in_batched
        if not v_b:
            vol = jnp.broadcast_to(vol[None], (axis_size,) + vol.shape)
        if not d_b:
            disp_vox = jnp.broadcast_to(
                disp_vox[None], (axis_size,) + disp_vox.shape)
        return _warp_batched(vol, disp_vox, radius, interpret, z_halo), True

    out = call(vol, disp_vox)
    return out[0] if squeeze else out


def _warp_batched(vol5, disp5, radius, interpret, z_halo=False):
    """Batched forward kernel call: ``vol5 (B, C, Dz, H, W)``,
    ``disp5 (B, 3, D, H, W)``; batch rides the leading grid axis."""
    R = int(radius)
    P = R
    B, C = vol5.shape[0], vol5.shape[1]
    D, H, W = disp5.shape[-3:]
    TD = 8 if D % 8 == 0 else D

    # sublane (y) extent of the DMA window must be 8-aligned or the DMA
    # faults the TPU worker — pad the high side up to a multiple of 8
    Hp = H + 2 * P + (-(H + 2 * P)) % 8
    Dp = D + 2 * P
    zpad = (0, 0) if z_halo else (P, P)
    padded = jnp.pad(vol5, [(0, 0), (0, 0), zpad, (P, Hp - H - P), (0, 0)],
                     mode="edge")
    padded = padded.reshape(B * C * Dp, Hp, W)

    return pl.pallas_call(
        functools.partial(_warp_kernel, R=R, C=C, TD=TD, H=H, W=W),
        grid=(B, D // TD),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded vol stays in HBM
            pl.BlockSpec((1, 3, TD, H, W), lambda b, i: (b, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, TD, H, W), lambda b, i: (b, 0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, D, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C * (TD + 2 * P), Hp, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(padded, disp5)
