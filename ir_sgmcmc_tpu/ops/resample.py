"""3D resampling (the TPU equivalent of ``torch.nn.functional.grid_sample``).

This is the single most load-bearing op in the framework: it implements both
image warping (reference: /root/reference/utils/registration.py:17-30) and
each squaring step of SVF integration (utils/transformation.py:63-76).

Semantics match torch ``grid_sample(mode=..., padding_mode='border',
align_corners=True)``:

* grid values are normalised coordinates in ``[-1, 1]``; with
  ``align_corners=True`` the mapping to voxel indices is
  ``i = (g + 1) / 2 * (S - 1)``,
* ``border`` padding clamps coordinates to the valid index range,
* ``nearest`` rounds half-to-even (like ``std::nearbyint``).

Implementation notes (TPU): the trilinear kernel is expressed as eight
flat-index gathers + VPU blends.  XLA lowers the gathers onto the TPU's
dynamic-gather path; everything else fuses.  All shapes are static, so the
op jits cleanly inside ``lax.scan`` loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _to_voxel_coords(grid: jnp.ndarray, shape) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Normalised ``(3, D, H, W)`` grid -> clamped voxel coords (ix, iy, iz)."""
    D, H, W = shape
    ix = (grid[0] + 1.0) * 0.5 * (W - 1)
    iy = (grid[1] + 1.0) * 0.5 * (H - 1)
    iz = (grid[2] + 1.0) * 0.5 * (D - 1)
    # border padding: clamp the *coordinate* before interpolation
    ix = jnp.clip(ix, 0.0, W - 1)
    iy = jnp.clip(iy, 0.0, H - 1)
    iz = jnp.clip(iz, 0.0, D - 1)
    return ix, iy, iz


def _gather(vol_flat: jnp.ndarray, xi, yi, zi, H, W):
    """Gather ``vol_flat[(C,) DHW]`` at integer voxel coords ``(D, H, W)``."""
    idx = (zi * H + yi) * W + xi
    return jnp.take(vol_flat, idx.reshape(-1), axis=-1).reshape(
        vol_flat.shape[:-1] + idx.shape
    )


@functools.partial(jax.jit, static_argnames=("mode",))
def grid_sample(vol: jnp.ndarray, grid: jnp.ndarray, mode: str = "linear") -> jnp.ndarray:
    """Sample ``vol`` at the locations of ``grid``.

    :param vol: ``(D, H, W)`` or ``(C, D, H, W)`` volume.
    :param grid: ``(3, D', H', W')`` normalised coordinates (channel 0 = x/W).
    :param mode: ``'linear'`` (trilinear) or ``'nearest'``.
    :return: warped volume with the spatial shape of ``grid``.
    """
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[None]
    C = vol.shape[0]
    D, H, W = vol.shape[-3:]
    out_shape = grid.shape[1:]

    ix, iy, iz = _to_voxel_coords(grid, (D, H, W))
    vol_flat = vol.reshape(C, -1)

    if mode == "nearest":
        xi = jnp.rint(ix).astype(jnp.int32)
        yi = jnp.rint(iy).astype(jnp.int32)
        zi = jnp.rint(iz).astype(jnp.int32)
        out = _gather(vol_flat, xi, yi, zi, H, W)
    elif mode == "linear":
        x0 = jnp.floor(ix)
        y0 = jnp.floor(iy)
        z0 = jnp.floor(iz)
        fx = ix - x0
        fy = iy - y0
        fz = iz - z0

        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        z0i = z0.astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, W - 1)
        y1i = jnp.minimum(y0i + 1, H - 1)
        z1i = jnp.minimum(z0i + 1, D - 1)

        # gather the 8 corners, blend on the VPU
        c000 = _gather(vol_flat, x0i, y0i, z0i, H, W)
        c100 = _gather(vol_flat, x1i, y0i, z0i, H, W)
        c010 = _gather(vol_flat, x0i, y1i, z0i, H, W)
        c110 = _gather(vol_flat, x1i, y1i, z0i, H, W)
        c001 = _gather(vol_flat, x0i, y0i, z1i, H, W)
        c101 = _gather(vol_flat, x1i, y0i, z1i, H, W)
        c011 = _gather(vol_flat, x0i, y1i, z1i, H, W)
        c111 = _gather(vol_flat, x1i, y1i, z1i, H, W)

        c00 = c000 + (c100 - c000) * fx
        c10 = c010 + (c110 - c010) * fx
        c01 = c001 + (c101 - c001) * fx
        c11 = c011 + (c111 - c011) * fx
        c0 = c00 + (c10 - c00) * fy
        c1 = c01 + (c11 - c01) * fy
        out = c0 + (c1 - c0) * fz
    else:
        raise ValueError(f"unknown mode: {mode}")

    out = out.reshape((C,) + out_shape)
    return out[0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("mode",))
def grid_sample_2d(im: jnp.ndarray, grid: jnp.ndarray, mode: str = "linear") -> jnp.ndarray:
    """2D analog of :func:`grid_sample` (torch semantics, border padding).

    :param im: ``(H, W)`` or ``(C, H, W)``.
    :param grid: ``(2, H', W')`` normalised coordinates (channel 0 = x/W).
    """
    squeeze = im.ndim == 2
    if squeeze:
        im = im[None]
    C, H, W = im.shape
    out_shape = grid.shape[1:]
    ix = jnp.clip((grid[0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    iy = jnp.clip((grid[1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    im_flat = im.reshape(C, -1)

    def gather(xi, yi):
        idx = (yi * W + xi).reshape(-1)
        return jnp.take(im_flat, idx, axis=-1).reshape((C,) + out_shape)

    if mode == "nearest":
        out = gather(jnp.rint(ix).astype(jnp.int32), jnp.rint(iy).astype(jnp.int32))
    elif mode == "linear":
        x0 = jnp.floor(ix)
        y0 = jnp.floor(iy)
        fx, fy = ix - x0, iy - y0
        x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, W - 1)
        y1i = jnp.minimum(y0i + 1, H - 1)
        c00, c10 = gather(x0i, y0i), gather(x1i, y0i)
        c01, c11 = gather(x0i, y1i), gather(x1i, y1i)
        c0 = c00 + (c10 - c00) * fx
        c1 = c01 + (c11 - c01) * fx
        out = c0 + (c1 - c0) * fy
    else:
        raise ValueError(f"unknown mode: {mode}")
    return out[0] if squeeze else out


def _unrolled_blend(padded, wx, wy, wz, offsets, P, out_shape):
    """Fully unrolled (2R+2)^3 shift-and-blend; used for small radii."""
    D, H, W = out_shape
    acc = None
    for iz, oz in enumerate(offsets):
        plane_z = jax.lax.slice_in_dim(padded, P + oz, P + oz + D, axis=-3)
        for iy, oy in enumerate(offsets):
            plane_zy = jax.lax.slice_in_dim(plane_z, P + oy, P + oy + H, axis=-2)
            wzy = wz[iz] * wy[iy]
            for ix, ox in enumerate(offsets):
                slab = jax.lax.slice_in_dim(plane_zy, P + ox, P + ox + W, axis=-1)
                term = (wzy * wx[ix]) * slab
                acc = term if acc is None else acc + term
    return acc


def _looped_blend(padded, dx, dy, dz, R, P, out_shape):
    """fori_loop over the z offset with the (2R+2)^2 in-plane blend unrolled;
    bounds compile time and working set for large radii."""
    D, H, W = out_shape
    offsets = list(range(-R, R + 1))
    n_off = len(offsets)

    def tri(d, o):
        return jnp.maximum(0.0, 1.0 - jnp.abs(d - o))

    wx = [tri(dx, o) for o in offsets]
    wy = [tri(dy, o) for o in offsets]

    def body(i, acc):
        oz = i - R  # traced offset in [-R, R+1]
        wz = tri(dz, oz.astype(dz.dtype))
        start = [0] * (padded.ndim - 3) + [P + oz, 0, 0]
        sizes = padded.shape[:-3] + (D, padded.shape[-2], padded.shape[-1])
        plane_z = jax.lax.dynamic_slice(padded, start, sizes)
        inner = None
        for iy, oy in enumerate(offsets):
            plane_zy = jax.lax.slice_in_dim(plane_z, P + oy, P + oy + H, axis=-2)
            for ix, ox in enumerate(offsets):
                slab = jax.lax.slice_in_dim(plane_zy, P + ox, P + ox + W, axis=-1)
                term = (wy[iy] * wx[ix]) * slab
                inner = term if inner is None else inner + term
        return acc + wz * inner

    acc0 = jnp.zeros(padded.shape[:-3] + out_shape, padded.dtype)
    return jax.lax.fori_loop(0, n_off, body, acc0)


def _warp_bounded_impl(vol: jnp.ndarray, disp_vox: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Trilinear warp for displacements bounded by ``radius`` voxels per axis.

    TPU-native replacement for the gather formulation of :func:`grid_sample`
    on the hot path: XLA lowers per-element gathers to a serialized path on
    TPU (~175 ms per 128³ warp), whereas a displacement bounded by ``R``
    voxels lets the warp be written as a dense blend of ``(2R+2)³``
    statically-shifted copies with separable triangular weights

        out(p) = Σ_o  tri(dx-ox) tri(dy-oy) tri(dz-oz) · vol(p + o),

    which is pure fused VPU work.  For ``|d| <= R`` this is *exactly*
    trilinear interpolation with border clamping (the replicate padding
    saturates out-of-range positions); larger displacements are clamped to
    ``±R``, so choose ``radius`` ≥ the max expected displacement.

    :param vol: ``(D, H, W)`` or ``(C, D, H, W)``.
    :param disp_vox: ``(3, D, H, W)`` displacement in voxel units
        (channel 0 displaces x/W).
    :param radius: static per-axis displacement bound R (voxels).
    """
    R = int(radius)
    P = R
    out_shape = vol.shape[-3:]
    d = jnp.clip(disp_vox, -R, R)
    dx, dy, dz = d[0], d[1], d[2]
    padded = jnp.pad(vol, [(0, 0)] * (vol.ndim - 3) + [(P, P)] * 3, mode="edge")

    if R <= 2:  # 64 / 216 terms: unroll everything, let XLA fuse one kernel
        offsets = list(range(-R, R + 1))

        def tri(dd, o):
            return jnp.maximum(0.0, 1.0 - jnp.abs(dd - o))

        wx = [tri(dx, o) for o in offsets]
        wy = [tri(dy, o) for o in offsets]
        wz = [tri(dz, o) for o in offsets]
        return _unrolled_blend(padded, wx, wy, wz, offsets, P, out_shape)
    return _looped_blend(padded, dx, dy, dz, R, P, out_shape)


# ---- analytic VJP ----------------------------------------------------------
#
# Plain autodiff through the blend saves every per-offset weight product as a
# residual: (2R+2)³ full volumes *per warp*, times 12 squaring steps, times
# the chain batch — 170+ GB of HLO temps at 128³ (measured: OOM on a 16 GB
# v5e chip).  The analytic backward recomputes the (cheap, fused) weights
# from (vol, disp) instead, so the only saved residuals are the inputs
# themselves:
#
#   out(p)        = Σ_o Wx(dx-ox) Wy(dy-oy) Wz(dz-oz) · pad(vol)(p+P+o)
#   ∂out/∂vol     : transpose blend — scatter w_o·g to pad index p+P+o, then
#                   fold the edge padding back onto the border voxels;
#   ∂out/∂d_axis  : same blend with the triangular weight of that axis
#                   replaced by its derivative  W'(t) = -sign(t)·1{|t|<1},
#                   summed over the volume's channel axis;
#   clip          : gradients vanish where |disp| > R.


def _tri(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _dtri(t):
    return -jnp.sign(t) * (jnp.abs(t) < 1.0).astype(t.dtype)


def _fold_edge(gp: jnp.ndarray, P: int, axes=(-3, -2, -1)) -> jnp.ndarray:
    """Transpose of ``jnp.pad(mode='edge')``: sum pad slabs onto the borders.

    Written as slice + zero-pad + add (NOT a concatenate of border/mid
    pieces): XLA fuses either form on one device, but under GSPMD a
    spatially-sharded concatenate falls back to a full-axis all-gather,
    while pads partition with O(halo) collectives (observed in the
    compiled-HLO audit, tests/test_parallel.py)."""
    for axis in axes:
        n = gp.shape[axis] - 2 * P
        ax = axis % gp.ndim
        lo = jax.lax.slice_in_dim(gp, 0, P, axis=axis).sum(axis=axis, keepdims=True)
        core = jax.lax.slice_in_dim(gp, P, P + n, axis=axis)
        hi = jax.lax.slice_in_dim(gp, P + n, 2 * P + n, axis=axis).sum(axis=axis, keepdims=True)
        cfg_lo = [(0, 0, 0)] * gp.ndim
        cfg_lo[ax] = (0, n - 1, 0)
        cfg_hi = [(0, 0, 0)] * gp.ndim
        cfg_hi[ax] = (n - 1, 0, 0)
        zero = jnp.zeros((), gp.dtype)
        gp = (core + jax.lax.pad(lo, zero, cfg_lo)
              + jax.lax.pad(hi, zero, cfg_hi))
    return gp


def _warp_bounded_bwd_impl(vol, disp_vox, radius, g):
    """Analytic backward: two blend passes, both output-stationary.

    Pass 1 (displacement grads) has the forward's structure — slabs of the
    replicate-padded volume, accumulated with derivative weights.  Pass 2
    (volume grad) is the *transpose* blend: scatter w_o·g to padded index
    p+P+o, which re-indexes as a gather — slices at P−o of the zero-padded
    product field — so both passes are pure slice-multiply-accumulate chains
    that XLA fuses, with no read-modify-write of a large accumulator (an
    earlier in-place `.at[].add` scatter serialised ~100 GB of HBM traffic
    per transition at 128³).
    """
    R = int(radius)
    g_disp = _bwd_dgrads_xla(vol, disp_vox, R, g)
    g_vol = _bwd_tblend_xla(vol, disp_vox, R, g)
    return g_vol, g_disp


def _bwd_dgrads_xla(vol, disp_vox, R, g, z_halo: bool = False):
    """Pass 1: gradients w.r.t. the displacement channels.

    ``z_halo=True`` means ``vol`` already carries ``R`` rows of halo on each
    side of the D axis (spatially-sharded call sites exchange real neighbour
    rows instead of replicate-padding — parallel/halo.py)."""
    P = R
    D, H, W = disp_vox.shape[-3:]
    lead = vol.ndim - 3  # 0 (scalar volume) or 1 (channel axis)
    d = jnp.clip(disp_vox, -R, R)
    dx, dy, dz = d[0], d[1], d[2]
    zpad = (0, 0) if z_halo else (P, P)
    padded = jnp.pad(vol, [(0, 0)] * lead + [zpad, (P, P), (P, P)], mode="edge")
    offsets = list(range(-R, R + 1))
    n_off = len(offsets)

    wx = [_tri(dx - o) for o in offsets]
    wy = [_tri(dy - o) for o in offsets]
    dwx = [_dtri(dx - o) for o in offsets]
    dwy = [_dtri(dy - o) for o in offsets]

    def d_grads(carry, oz, wz_o, dwz_o):
        g_dx, g_dy, g_dz = carry
        plane_z = jax.lax.dynamic_slice_in_dim(padded, P + oz, D, axis=lead)
        for iy, oy in enumerate(offsets):
            plane_zy = jax.lax.slice_in_dim(plane_z, P + oy, P + oy + H, axis=lead + 1)
            for ix, ox in enumerate(offsets):
                slab = jax.lax.slice_in_dim(plane_zy, P + ox, P + ox + W, axis=lead + 2)
                gs = (g * slab).sum(axis=0) if lead else g * slab
                g_dx = g_dx + (dwx[ix] * wy[iy] * wz_o) * gs
                g_dy = g_dy + (wx[ix] * dwy[iy] * wz_o) * gs
                g_dz = g_dz + (wx[ix] * wy[iy] * dwz_o) * gs
        return g_dx, g_dy, g_dz

    zero = jnp.zeros((D, H, W), vol.dtype)
    carry = (zero, zero, zero)
    if R <= 2:
        for oz in offsets:
            carry = d_grads(carry, oz, _tri(dz - oz), _dtri(dz - oz))
    else:
        def body(i, carry):
            oz = i - R
            t = dz - oz.astype(dz.dtype)
            return d_grads(carry, oz, _tri(t), _dtri(t))

        carry = jax.lax.fori_loop(0, n_off, body, carry)
    g_dx, g_dy, g_dz = carry
    g_disp = jnp.stack([g_dx, g_dy, g_dz], axis=0)
    # clip: no gradient where the displacement was saturated
    return jnp.where(jnp.abs(disp_vox) <= R, g_disp, 0.0)


def _bwd_tblend_xla(vol, disp_vox, R, g):
    """Pass 2: gradient w.r.t. the volume (transpose blend)."""
    return _fold_edge(_tblend_acc_xla(disp_vox, R, g), R)


def _tblend_acc_xla(disp_vox, R, g):
    """Unfolded transpose blend: the padded gradient accumulator
    ``(..., D+2P, H+2P, W+2P)`` before the replicate-pad transpose fold.

    g_padded(r) = Σ_o (w_o ⊙ g)(r − P − o); with X = zeropad_{2P}(·), the
    term re-indexes as X(w_o ⊙ g)(r + P − o) — a slice at start P−o ≥ 0.
    Exposed unfolded so spatially-sharded callers (parallel/halo.py) can
    fold x/y locally and resolve the z pad rows via neighbour exchange.
    """
    P = R
    D, H, W = disp_vox.shape[-3:]
    lead = g.ndim - 3
    d = jnp.clip(disp_vox, -R, R)
    dx, dy, dz = d[0], d[1], d[2]
    offsets = list(range(-R, R + 1))
    n_off = len(offsets)
    pad2 = [(0, 0)] * lead + [(2 * P, 2 * P)] * 3
    gpad = jnp.pad(g, pad2)
    dxp = jnp.pad(dx, [(2 * P, 2 * P)] * 3)
    dyp = jnp.pad(dy, [(2 * P, 2 * P)] * 3)
    dzp = jnp.pad(dz, [(2 * P, 2 * P)] * 3)
    Dp, Hp, Wp = D + 2 * P, H + 2 * P, W + 2 * P

    def t_blend(acc, oz):
        gz = jax.lax.dynamic_slice_in_dim(gpad, P - oz, Dp, axis=lead)
        dxz = jax.lax.dynamic_slice_in_dim(dxp, P - oz, Dp, axis=0)
        dyz = jax.lax.dynamic_slice_in_dim(dyp, P - oz, Dp, axis=0)
        dzz = jax.lax.dynamic_slice_in_dim(dzp, P - oz, Dp, axis=0)
        wz = _tri(dzz - oz)
        for oy in offsets:
            gzy = jax.lax.slice_in_dim(gz, P - oy, P - oy + Hp, axis=lead + 1)
            dxzy = jax.lax.slice_in_dim(dxz, P - oy, P - oy + Hp, axis=1)
            dyzy = jax.lax.slice_in_dim(dyz, P - oy, P - oy + Hp, axis=1)
            wzy = jax.lax.slice_in_dim(wz, P - oy, P - oy + Hp, axis=1)
            for ox in offsets:
                gzyx = jax.lax.slice_in_dim(gzy, P - ox, P - ox + Wp, axis=lead + 2)
                dxzyx = jax.lax.slice_in_dim(dxzy, P - ox, P - ox + Wp, axis=2)
                dyzyx = jax.lax.slice_in_dim(dyzy, P - ox, P - ox + Wp, axis=2)
                wzyx = jax.lax.slice_in_dim(wzy, P - ox, P - ox + Wp, axis=2)
                w = _tri(dxzyx - ox) * _tri(dyzyx - oy) * wzyx
                acc = acc + w * gzyx
        return acc

    acc0 = jnp.zeros(g.shape[:lead] + (Dp, Hp, Wp), g.dtype)
    if R <= 2:
        acc = acc0
        for oz in offsets:
            acc = t_blend(acc, oz)
    else:
        def tbody(i, acc):
            return t_blend(acc, i - R)

        acc = jax.lax.fori_loop(0, n_off, tbody, acc0)
    return acc


# Pallas dispatch override: None = backend default (TPU + compatible
# shapes), False = force the XLA blend (the trainer sets this while
# building a spatially-sharded step — GSPMD cannot partition a
# pallas_call, while the XLA blend partitions with O(halo) collectives,
# see tests/test_parallel.py's compiled-HLO audit), "interpret" = force
# the kernels in interpreter mode (CPU-mesh validation of the exact
# TPU-dispatch graph).  Trace-time state: set it before the jit traces.
_PALLAS_OVERRIDE = None


def set_pallas_mode(mode) -> None:
    """``None`` (auto), ``False`` (XLA blend), or ``"interpret"``."""
    global _PALLAS_OVERRIDE
    _PALLAS_OVERRIDE = mode


def _use_pallas(vol_shape, radius: int):
    """Pallas dispatch decision: False, True (TPU), or "interpret"."""
    from .pallas_warp import pallas_applicable

    if _PALLAS_OVERRIDE is False:
        return False
    if not pallas_applicable(vol_shape, radius):
        return False
    if _PALLAS_OVERRIDE == "interpret":
        return "interpret"
    return jax.default_backend() == "tpu"


def _warp_fwd_dispatch(vol, disp_vox, radius):
    mode = _use_pallas(vol.shape, radius)
    if mode:
        from .pallas_warp import warp_bounded_pallas

        return warp_bounded_pallas(vol, disp_vox, radius,
                                   interpret=mode == "interpret")
    return _warp_bounded_impl(vol, disp_vox, radius)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def warp_bounded(vol: jnp.ndarray, disp_vox: jnp.ndarray, radius: int) -> jnp.ndarray:
    return _warp_fwd_dispatch(vol, disp_vox, radius)


warp_bounded.__doc__ = _warp_bounded_impl.__doc__


def _wb_fwd(vol, disp_vox, radius):
    return _warp_fwd_dispatch(vol, disp_vox, radius), (vol, disp_vox)


def _wb_bwd(radius, residuals, g):
    vol, disp_vox = residuals
    mode = _use_pallas(vol.shape, radius)
    if mode:
        from .pallas_warp import warp_bounded_dgrad_pallas, warp_bounded_tblend_pallas

        R = int(radius)
        interpret = mode == "interpret"
        g_disp = warp_bounded_dgrad_pallas(vol, disp_vox, g, R,
                                           interpret=interpret)
        g_disp = jnp.where(jnp.abs(disp_vox) <= R, g_disp, 0.0)
        g_vol = _fold_edge(
            warp_bounded_tblend_pallas(disp_vox, g, R, interpret=interpret),
            R, axes=(-3, -2))
        return g_vol, g_disp
    return _warp_bounded_bwd_impl(vol, disp_vox, radius, g)


warp_bounded.defvjp(_wb_fwd, _wb_bwd)


# ---- block-gather warp ------------------------------------------------------
#
# Exact trilinear warp for SMOOTH displacements of ANY bounded magnitude —
# the TPU answer to the per-sample global warp of the post-noise scheme
# (reference utils/util.py:44-53).  XLA lowers a 128³ per-voxel gather to a
# serialized ~2M-index path (measured 55-180 ms — ~1600× off the HBM
# roofline), but a Sobolev-smoothed displacement varies slowly: over an
# 8³ block it stays within a couple of voxels of its block mean.  So:
#
#     d(x) = m_b + r(x),   m_b = round(mean_b d)  (integer, per block),
#                          |r| ≤ spread_b + 0.5   (small)
#
# ONE coarse gather fetches each block's haloed window at offset m_b
# (thousands of contiguous slabs instead of millions of scalar indices),
# and the residual is blended inside the window with the same triangular
# weights as :func:`warp_bounded` — EXACT trilinear interpolation whenever
# |r| ≤ radius (clamped beyond; see :func:`block_residual_overflow`).


def _block_means(disp_vox: jnp.ndarray, block: int, max_disp: float):
    """Per-block rounded mean displacement ``(3, nbz, nby, nbx)`` (int32).

    Layout note: the obvious 7-D ``reshape → reduce((2,4,6))`` splits the
    TPU minor (sublane, lane) dims and costs a full relayout pass of the
    field before the reduce (measured 2.3 ms per 128³ transition — ~5% of
    a whole SGLD step).  Splitting only MAJOR axes is a free bitcast, so
    z and y reduce as two cheap strided sums, and the lane axis reduces as
    a one-hot block-sum matmul on the MXU (one (…, W) × (W, nbx) pass —
    no lane relayout).  ~0.1 ms for the same result.
    """
    D, H, W = disp_vox.shape[-3:]
    B = block
    nb = (D // B, H // B, W // B)
    lead = disp_vox.shape[:-3]
    x = disp_vox.astype(jnp.float32)
    x = x.reshape(lead + (nb[0], B, H, W)).sum(axis=-3)       # (…, nbz, H, W)
    x = x.reshape(lead + (nb[0], nb[1], B, W)).sum(axis=-2)   # (…, nbz, nby, W)
    cols = (jax.lax.broadcasted_iota(jnp.int32, (W, nb[2]), 0) // B
            == jax.lax.broadcasted_iota(jnp.int32, (W, nb[2]), 1))
    m = jnp.round(jnp.matmul(x, cols.astype(jnp.float32)) / float(B ** 3))
    return jnp.clip(m, -max_disp, max_disp).astype(jnp.int32)


def _gather_windows(vol: jnp.ndarray, m: jnp.ndarray, block: int, radius: int,
                    pad: int):
    """Haloed per-block windows of ``vol`` at the block offsets ``m``.

    :param vol: ``(C, D, H, W)``.
    :param m: ``(3, nbz, nby, nbx)`` int32 per-block integer displacement
        (channel 0 = x/W, like ``disp_vox``).
    :return: ``(nb, C, Ws, Ws, Ws)`` with ``Ws = block + 2*radius``.
    """
    C, D, H, W = vol.shape
    B, R = block, radius
    Ws = B + 2 * R
    nbz, nby, nbx = m.shape[1:]
    padded = jnp.pad(vol, [(0, 0)] + [(pad, pad)] * 3, mode="edge")
    oz, oy, ox = jnp.meshgrid(
        jnp.arange(nbz, dtype=jnp.int32) * B,
        jnp.arange(nby, dtype=jnp.int32) * B,
        jnp.arange(nbx, dtype=jnp.int32) * B, indexing="ij")
    # start (z, y, x) in padded coords; m channel order is (x, y, z)
    starts = jnp.stack([
        oz + m[2].astype(jnp.int32) + (pad - R),
        oy + m[1].astype(jnp.int32) + (pad - R),
        ox + m[0].astype(jnp.int32) + (pad - R),
    ], axis=-1).reshape(-1, 3)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
        start_index_map=(1, 2, 3))
    return jax.lax.gather(
        padded, starts, dnums, slice_sizes=(C, Ws, Ws, Ws),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _block_blend(windows, r, weights_fn, radius: int, block: int):
    """Σ_o wz·wy·wx · window-slice over the ``(2R+1)³`` residual offsets.

    ``weights_fn[axis](rc, o)`` gives the per-axis weight (``_tri_o``
    forward, ``_dtri_o`` for the gradient blends); ``r`` is
    ``(nb, 3, B, B, B)``.  Layout note: a blocks-last variant (block index
    innermost, fully lane-aligned) was measured SLOWER on TPU — the
    transposes cost more than XLA loses on the 12-wide inner dims.
    """
    R, B = radius, block
    offsets = list(range(-R, R + 1))
    rx, ry, rz = r[:, 0, None], r[:, 1, None], r[:, 2, None]  # (nb,1,B,B,B)
    wx = [weights_fn[0](rx, o) for o in offsets]
    wy = [weights_fn[1](ry, o) for o in offsets]
    wz = [weights_fn[2](rz, o) for o in offsets]
    acc = None
    for iz, oz in enumerate(offsets):
        win_z = jax.lax.slice_in_dim(windows, R + oz, R + oz + B, axis=-3)
        for iy, oy in enumerate(offsets):
            win_zy = jax.lax.slice_in_dim(win_z, R + oy, R + oy + B, axis=-2)
            wzy = wz[iz] * wy[iy]
            for ix, ox in enumerate(offsets):
                slab = jax.lax.slice_in_dim(win_zy, R + ox, R + ox + B, axis=-1)
                term = (wzy * wx[ix]) * slab
                acc = term if acc is None else acc + term
    return acc


def _blocks_to_volume(blocks, nb, B, out_shape):
    """(nb_total, C, B, B, B) -> (C, D, H, W)."""
    C = blocks.shape[1]
    v = blocks.reshape(nb[0], nb[1], nb[2], C, B, B, B)
    return v.transpose(3, 0, 4, 1, 5, 2, 6).reshape((C,) + out_shape)


def _volume_to_blocks(vol, nb, B):
    """(C, D, H, W) -> (nb_total, C, B, B, B)."""
    C = vol.shape[0]
    v = vol.reshape(C, nb[0], B, nb[1], B, nb[2], B)
    return v.transpose(1, 3, 5, 0, 2, 4, 6).reshape(-1, C, B, B, B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def warp_block_gather(vol: jnp.ndarray, disp_vox: jnp.ndarray,
                      max_disp: int, radius: int = 2,
                      block: int = 8) -> jnp.ndarray:
    """Warp ``vol`` by a smooth bounded displacement via block windows.

    EXACT trilinear interpolation (same semantics as
    ``grid_sample(vol, id + voxel_to_normalised(disp))``) whenever each
    voxel's displacement stays within ``radius`` of its block's rounded
    mean — i.e. for displacement fields whose in-block variation is small,
    which Sobolev-smoothed diffeomorphic fields satisfy; voxels beyond are
    clamped to the window edge (count them with
    :func:`block_residual_overflow` — surface like saturation).

    ``vol`` is treated as a CONSTANT (its cotangent is zero): the op exists
    for the likelihood's image warp, where only the transformation carries
    gradient.  Cotangents flow to ``disp_vox`` through the blend weights
    (analytic, recomputed in the backward — no per-offset residuals).

    :param vol: ``(D, H, W)`` or ``(C, D, H, W)``; spatial dims divisible
        by ``block``.
    :param disp_vox: ``(3, D, H, W)`` voxel-unit displacement
        (channel 0 = x/W), ``|disp| ≤ max_disp``.
    :param max_disp: static bound on ``|disp|`` (pads the volume once).
    """
    out, _ = _wbg_fwd(vol, disp_vox, max_disp, radius, block)
    return out


def _wbg_prep(vol, disp_vox, max_disp, radius, block):
    squeeze = vol.ndim == 3
    v4 = vol[None] if squeeze else vol
    B, R = block, radius
    nb = tuple(s // B for s in v4.shape[-3:])
    m = _block_means(jax.lax.stop_gradient(disp_vox), B, max_disp)
    pad = int(max_disp) + R + 1
    windows = _gather_windows(jax.lax.stop_gradient(v4), m, B, R, pad)
    m_full = jnp.repeat(jnp.repeat(jnp.repeat(
        m, B, axis=1), B, axis=2), B, axis=3)
    r = disp_vox - m_full.astype(disp_vox.dtype)
    r_blocks = _volume_to_blocks(r, nb, B)  # (nb_total, 3, B, B, B)
    return squeeze, v4, nb, windows, r_blocks


def _use_block_pallas(vol_shape, max_disp, radius, block):
    """Pallas dispatch for the block-gather warp (same override knob as the
    bounded warp — ``set_pallas_mode``)."""
    from .pallas_block_warp import block_warp_pallas_applicable

    if _PALLAS_OVERRIDE is False:
        return False
    if not block_warp_pallas_applicable(vol_shape, int(max_disp),
                                        int(radius), int(block)):
        return False
    if _PALLAS_OVERRIDE == "interpret":
        return "interpret"
    return jax.default_backend() == "tpu"


def _wbg_prep_pallas(vol, disp_vox, max_disp, radius, block):
    """Shared Pallas-path prep: block means + clipped volume-layout residual."""
    squeeze = vol.ndim == 3
    v4 = vol[None] if squeeze else vol
    m = _block_means(jax.lax.stop_gradient(disp_vox), block, max_disp)
    m_full = jnp.repeat(jnp.repeat(jnp.repeat(
        m, block, axis=1), block, axis=2), block, axis=3)
    r_raw = disp_vox - m_full.astype(disp_vox.dtype)
    return squeeze, v4, m, r_raw


def _wbg_fwd(vol, disp_vox, max_disp, radius, block):
    mode = _use_block_pallas(vol.shape, max_disp, radius, block)
    if mode:
        from .pallas_block_warp import block_warp_pallas

        squeeze, v4, m, r_raw = _wbg_prep_pallas(
            vol, disp_vox, max_disp, radius, block)
        r_c = jnp.clip(r_raw, -radius, radius)
        out = block_warp_pallas(jax.lax.stop_gradient(v4), r_c, m,
                                int(max_disp), int(radius),
                                interpret=mode == "interpret")
        return (out[0] if squeeze else out), (vol, disp_vox)
    squeeze, v4, nb, windows, r_blocks = _wbg_prep(
        vol, disp_vox, max_disp, radius, block)
    r_c = jnp.clip(r_blocks, -radius, radius)
    out_blocks = _block_blend(windows, r_c, (_tri_o, _tri_o, _tri_o),
                              radius, block)
    out = _blocks_to_volume(out_blocks, nb, block, v4.shape[-3:])
    out = out[0] if squeeze else out
    return out, (vol, disp_vox)


def _wbg_bwd(max_disp, radius, block, residuals, g):
    vol, disp_vox = residuals
    mode = _use_block_pallas(vol.shape, max_disp, radius, block)
    if mode:
        from .pallas_block_warp import block_warp_dgrad_pallas

        squeeze, v4, m, r_raw = _wbg_prep_pallas(
            vol, disp_vox, max_disp, radius, block)
        r_c = jnp.clip(r_raw, -radius, radius)
        g4 = g[None] if g.ndim == 3 else g
        g_r = block_warp_dgrad_pallas(jax.lax.stop_gradient(v4), r_c, m, g4,
                                      int(max_disp), int(radius),
                                      interpret=mode == "interpret")
        g_disp = jnp.where(jnp.abs(r_raw) <= radius, g_r, 0.0)
        return jnp.zeros_like(vol), g_disp
    squeeze, v4, nb, windows, r_blocks = _wbg_prep(
        vol, disp_vox, max_disp, radius, block)
    r_c = jnp.clip(r_blocks, -radius, radius)
    g4 = g[None] if g.ndim == 3 else g
    g_blocks = _volume_to_blocks(g4, nb, block)  # (nb, C, B, B, B)
    grads = []
    for axis in range(3):
        fns = [_tri_o] * 3
        fns[axis] = _dtri_o
        gb = _block_blend(windows, r_c, tuple(fns), radius, block)
        grads.append(jnp.sum(gb * g_blocks, axis=1))  # sum channels
    g_r = jnp.stack(grads, axis=1)  # (nb, 3, B, B, B)
    g_r = jnp.where(jnp.abs(r_blocks) <= radius, g_r, 0.0)
    g_disp = _blocks_to_volume(g_r, nb, block, v4.shape[-3:])
    return jnp.zeros_like(vol), g_disp


def _tri_o(t, o):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t - o))


def _dtri_o(t, o):
    return _dtri(t - o)


warp_block_gather.defvjp(_wbg_fwd, _wbg_bwd)


def block_residual_overflow(disp_vox: jnp.ndarray, max_disp: int,
                            radius: int = 2, block: int = 8) -> jnp.ndarray:
    """Voxels whose block residual exceeds ``radius`` (warp inexact there)."""
    B = block
    nb = tuple(s // B for s in disp_vox.shape[-3:])
    m = _block_means(disp_vox, B, max_disp)
    m_full = jnp.repeat(jnp.repeat(jnp.repeat(
        m, B, axis=1), B, axis=2), B, axis=3)
    r = disp_vox - m_full.astype(disp_vox.dtype)
    return jnp.sum(jnp.any(jnp.abs(r) > radius, axis=0))


def warp(moving: jnp.ndarray, transformation: jnp.ndarray, *, method: str = "linear") -> jnp.ndarray:
    """Warp an image/segmentation by a dense transformation.

    The dtype dispatch of the reference ``RegistrationModule``
    (/root/reference/utils/registration.py:17-41) becomes an explicit
    ``method`` argument: use ``'linear'`` for intensity images and
    ``'nearest'`` for masks/segmentations.  Integer/bool inputs are sampled
    as float and cast back, matching the reference.
    """
    in_dtype = moving.dtype
    vol = moving.astype(jnp.float32)
    out = grid_sample(vol, transformation, mode=method)
    if method == "nearest" and in_dtype != jnp.float32:
        out = out.astype(in_dtype)
    return out
