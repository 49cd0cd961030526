"""Spatially-sharded stencil ops via halo exchange (shard_map + ppermute).

For volumes too large for one device's HBM, fields shard along the leading
spatial axis (D) over a ``'space'`` mesh axis.  Stencil ops (separable
convolutions, forward differences — SURVEY.md §5.7's "context-parallel
analog") need only a fixed-radius halo from each neighbour, exchanged over
ICI with ``lax.ppermute``; the outermost shards replicate-pad, matching the
single-device replicate-padding semantics exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.stencil import conv1d_axis


def _exchange_halo_d(x: jnp.ndarray, r: int, axis_name: str) -> jnp.ndarray:
    """Append ``r`` slices of halo on both sides of the local D axis (-3).

    Boundary shards replicate their own edge slice (replicate padding).
    """
    n = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)

    lo_own = x[..., :r, :, :]  # my first r slices -> sent to left neighbour
    hi_own = x[..., -r:, :, :]  # my last r slices -> sent to right neighbour

    # receive from the right: their first r slices; from the left: their last r
    from_right = lax.ppermute(lo_own, axis_name, [(i, (i - 1) % n) for i in range(n)])
    from_left = lax.ppermute(hi_own, axis_name, [(i, (i + 1) % n) for i in range(n)])

    # boundary shards: replicate own edge instead of the wrapped halo
    edge_lo = jnp.repeat(x[..., :1, :, :], r, axis=-3)
    edge_hi = jnp.repeat(x[..., -1:, :, :], r, axis=-3)
    left_halo = jnp.where(idx == 0, edge_lo, from_left)
    right_halo = jnp.where(idx == n - 1, edge_hi, from_right)

    return jnp.concatenate([left_halo, x, right_halo], axis=-3)


def _conv_d_valid(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Valid 1D correlation along D (-3) of a halo-padded block."""
    taps = int(kernel.shape[0])
    n_out = x.shape[-3] - taps + 1
    out = None
    for j in range(taps):
        term = kernel[j] * lax.slice_in_dim(x, j, j + n_out, axis=x.ndim - 3)
        out = term if out is None else out + term
    return out


def separable_conv3d_sharded(field, kernel, mesh: Mesh, axis_name: str = "space"):
    """Separable 3D convolution of a D-sharded field (replicate padding).

    ``field``: ``(..., D, H, W)`` sharded along D over ``axis_name``; H/W
    passes are local (fields are contiguous in those axes per shard), the D
    pass exchanges an ``r``-slice halo.
    """
    kernel = jnp.asarray(kernel, dtype=field.dtype)
    r = int(kernel.shape[0]) // 2
    ndim = field.ndim
    spec = P(*((None,) * (ndim - 3)), axis_name, None, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
    )
    def _run(x):
        # local H and W passes
        x = conv1d_axis(x, kernel, axis=-1)
        x = conv1d_axis(x, kernel, axis=-2)
        # halo-exchanged D pass
        x = _exchange_halo_d(x, r, axis_name)
        return _conv_d_valid(x, kernel)

    return _run(field)


def _warp_bounded_zhalo(vol_zh, disp, radius: int):
    """Bounded blend warp of a block whose D axis already carries an
    ``R``-slice halo (y/x replicate-pad locally).  Output spatial shape =
    ``disp.shape[-3:]``."""
    from ..ops.resample import _looped_blend, _unrolled_blend

    R = P = int(radius)
    out_shape = disp.shape[-3:]
    d = jnp.clip(disp, -R, R)
    dx, dy, dz = d[0], d[1], d[2]
    lead = vol_zh.ndim - 3
    padded = jnp.pad(vol_zh, [(0, 0)] * lead + [(0, 0), (P, P), (P, P)],
                     mode="edge")
    offsets = list(range(-R, R + 1))
    if R <= 2:
        def tri(dd, o):
            return jnp.maximum(0.0, 1.0 - jnp.abs(dd - o))

        wx = [tri(dx, o) for o in offsets]
        wy = [tri(dy, o) for o in offsets]
        wz = [tri(dz, o) for o in offsets]
        return _unrolled_blend(padded, wx, wy, wz, offsets, P, out_shape)
    return _looped_blend(padded, dx, dy, dz, R, P, out_shape)


def _local_warp_fwd(v_h, disp, radius: int, pallas_mode: str):
    """Forward blend of a z-haloed block; Pallas per shard when requested."""
    if pallas_mode == "off":
        return _warp_bounded_zhalo(v_h, disp, radius)
    from ..ops.pallas_warp import warp_bounded_pallas

    return warp_bounded_pallas(v_h, disp, radius,
                               interpret=pallas_mode == "interpret", z_halo=True)


def _local_dgrad(v_h, disp, g, radius: int, pallas_mode: str):
    """Displacement gradient of a z-haloed block (clip mask included)."""
    from ..ops.resample import _bwd_dgrads_xla

    R = int(radius)
    if pallas_mode == "off":
        return _bwd_dgrads_xla(v_h, disp, R, g, z_halo=True)
    from ..ops.pallas_warp import warp_bounded_dgrad_pallas

    g_disp = warp_bounded_dgrad_pallas(v_h, disp, g, R,
                                       interpret=pallas_mode == "interpret",
                                       z_halo=True)
    return jnp.where(jnp.abs(disp) <= R, g_disp, 0.0)


def _local_tblend_zpad(disp, g, radius: int, pallas_mode: str):
    """Transpose blend of a local block, x/y already folded, z rows NOT:
    returns ``(..., D_loc + 2R, H, W)`` — the ``R`` pad rows on each side
    carry the gradient mass that belongs to the z neighbours."""
    from ..ops.resample import _fold_edge, _tblend_acc_xla

    R = int(radius)
    if pallas_mode == "off":
        acc = _tblend_acc_xla(disp, R, g)  # (..., Dp, Hp, Wp)
        acc = _fold_edge(acc, R, axes=(-1,))
    else:
        from ..ops.pallas_warp import warp_bounded_tblend_pallas

        acc = warp_bounded_tblend_pallas(disp, g, R,
                                         interpret=pallas_mode == "interpret")
    return _fold_edge(acc, R, axes=(-2,))


def _exchange_tblend_z(acc, radius: int, axis_name: str):
    """Resolve the z pad rows of a local transpose-blend accumulator:
    interior rows ppermute to the owning neighbour shard; at the global
    boundaries they fold onto the border row (replicate-pad transpose),
    reproducing single-device ``_fold_edge`` semantics exactly."""
    R = int(radius)
    n = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)
    D_loc = acc.shape[-3] - 2 * R

    lo = acc[..., :R, :, :]          # belongs to the left neighbour
    core = acc[..., R:R + D_loc, :, :]
    hi = acc[..., R + D_loc:, :, :]  # belongs to the right neighbour

    from_right = lax.ppermute(lo, axis_name, [(i, (i - 1) % n) for i in range(n)])
    from_left = lax.ppermute(hi, axis_name, [(i, (i + 1) % n) for i in range(n)])

    head = core[..., :R, :, :] + jnp.where(idx == 0, 0.0, from_left)
    tail = core[..., D_loc - R:, :, :] + jnp.where(idx == n - 1, 0.0, from_right)
    # global-boundary shards fold their own out-of-range rows onto the border
    fold_lo = jnp.sum(lo, axis=-3, keepdims=True)
    fold_hi = jnp.sum(hi, axis=-3, keepdims=True)
    head = jnp.concatenate(
        [head[..., :1, :, :] + jnp.where(idx == 0, fold_lo, 0.0),
         head[..., 1:, :, :]], axis=-3)
    tail = jnp.concatenate(
        [tail[..., :-1, :, :],
         tail[..., -1:, :, :] + jnp.where(idx == n - 1, fold_hi, 0.0)], axis=-3)
    mid = core[..., R:D_loc - R, :, :]
    return jnp.concatenate([head, mid, tail], axis=-3)


@functools.lru_cache(maxsize=None)
def _make_halo_warp(radius: int, axis_name: str, pallas_mode: str):
    """Per-shard bounded warp with halo-exchange forward AND analytic
    backward (closing parallel/halo.py's round-2 'future work' gap): both
    passes move only ``O(R · H · W)`` bytes over ICI per neighbour —
    2 ppermutes of R-slice volume halos forward, 2 more for the recomputed
    halo plus 2 for the transpose-blend z rows backward — never a full
    volume."""

    @jax.custom_vjp
    def hw(v, d):
        v_h = _exchange_halo_d(v, radius, axis_name)
        return _local_warp_fwd(v_h, d, radius, pallas_mode)

    def fwd(v, d):
        return hw(v, d), (v, d)

    def bwd(res, g):
        v, d = res
        # recompute the halo (O(halo) ICI traffic, cheaper than saving v_h)
        v_h = _exchange_halo_d(v, radius, axis_name)
        g_disp = _local_dgrad(v_h, d, g, radius, pallas_mode)
        acc = _local_tblend_zpad(d, g, radius, pallas_mode)
        g_vol = _exchange_tblend_z(acc, radius, axis_name)
        return g_vol, g_disp

    hw.defvjp(fwd, bwd)
    return hw


def warp_bounded_sharded(vol, disp_vox, radius: int, mesh: Mesh,
                         axis_name: str = "space", pallas_mode: str = "off"):
    """Bounded trilinear warp of a D-sharded volume (halo exchange over ICI).

    The displacement bound ``R`` means each shard needs exactly ``R`` slices
    of halo from each neighbour (SURVEY.md §7's "halo-limited warp"); the
    outermost shards replicate-pad, reproducing single-device border-clamp
    semantics bit-for-bit.  ``vol``: ``(C?, D, H, W)`` sharded along D;
    ``disp_vox``: ``(3, D, H, W)`` sharded the same way.

    Differentiation is ANALYTIC (the same two-pass backward as the
    single-device ``ops.resample.warp_bounded``) with the transpose-blend z
    rows resolved by neighbour exchange — collective traffic stays O(halo)
    in both directions.  ``pallas_mode``: ``'off'`` = XLA blend per shard,
    ``'tpu'`` = Pallas kernels per shard (each device runs the kernel on its
    local z-haloed block — no GSPMD partitioning of ``pallas_call``),
    ``'interpret'`` = Pallas in interpreter mode (CPU validation).

    Requires each shard to hold at least ``2·radius`` rows of D.
    """
    D = vol.shape[-3]
    n_space = mesh.shape[axis_name]
    if D // n_space < 2 * int(radius):
        raise ValueError(
            f"warp_bounded_sharded: {D} rows over {n_space} shards leaves "
            f"{D // n_space} rows/shard < 2*radius={2 * int(radius)}")
    vspec = P(*((None,) * (vol.ndim - 3)), axis_name, None, None)
    dspec = P(None, axis_name, None, None)
    fn = _make_halo_warp(int(radius), axis_name, pallas_mode)

    # check_vma=False: pallas_call's ShapeDtypeStruct carries no
    # varying-across-mesh annotation, so the vma typecheck rejects the
    # kernel inside shard_map; variance here is trivially 'everything
    # varies over the space axis'
    @functools.partial(shard_map, mesh=mesh, in_specs=(vspec, dspec),
                       out_specs=vspec, check_vma=False)
    def _run(v, d):
        return fn(v, d)

    return _run(vol, disp_vox)


def gradient_d_sharded(field, mesh: Mesh, axis_name: str = "space"):
    """Forward-difference along D for a D-sharded ``(..., D, H, W)`` field.

    Matches the single-device semantics of ``ops.stencil.gradient``'s D
    component (trailing edge replicated -> last difference duplicated).
    """
    ndim = field.ndim
    spec = P(*((None,) * (ndim - 3)), axis_name, None, None)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec)
    def _run(x):
        n = lax.psum(1, axis_name)
        idx = lax.axis_index(axis_name)
        # next shard's first slice
        from_right = lax.ppermute(
            x[..., :1, :, :], axis_name, [(i, (i - 1) % n) for i in range(n)]
        )
        nxt = jnp.where(idx == n - 1, x[..., -1:, :, :], from_right)
        xp = jnp.concatenate([x, nxt], axis=-3)
        d = xp[..., 1:, :, :] - xp[..., :-1, :, :]
        # on the last shard the final diff is 0 (x - x); the single-device op
        # replicates the previous diff there instead
        def fix_last(d):
            return jnp.concatenate([d[..., :-1, :, :], d[..., -2:-1, :, :]], axis=-3)

        return jnp.where(idx == n - 1, fix_last(d), d)

    return _run(field)
