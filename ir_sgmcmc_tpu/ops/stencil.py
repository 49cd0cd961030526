"""Stencil operators: finite differences, separable convolutions, box filters.

All stencils are implemented as static shift-and-add expressions over
replicate-padded volumes.  On TPU this is the right design: every tap is a
VPU add/multiply-accumulate that XLA fuses into a single elementwise kernel —
no gathers, no convolution lowering, no dynamic shapes.

Reference semantics:
* gradient operator — /root/reference/utils/diff_op.py:62-96
* separable 3D convolution — /root/reference/utils/util.py:350-406
* LCC box filter — /root/reference/model/loss.py:54-59,102-111
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .grids import det_jacobian


def _replicate_pad_axis(x: jnp.ndarray, axis: int, lo: int, hi: int) -> jnp.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (lo, hi)
    return jnp.pad(x, pad, mode="edge")


def conv1d_axis(x: jnp.ndarray, kernel, axis: int) -> jnp.ndarray:
    """Correlate ``x`` with a 1D ``kernel`` along ``axis`` (replicate padding).

    The kernel length must be odd; output has the same shape as the input.
    Implemented as an unrolled shift-and-add so XLA fuses it into one VPU
    kernel.
    """
    k = jnp.asarray(kernel, dtype=x.dtype)
    taps = int(k.shape[0])
    assert taps % 2 == 1, "kernel length must be odd"
    r = taps // 2
    xp = _replicate_pad_axis(x, axis, r, r)
    n = x.shape[axis]
    out = None
    for j in range(taps):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(j, j + n)
        term = k[j] * xp[tuple(sl)]
        out = term if out is None else out + term
    return out


def separable_conv3d(field: jnp.ndarray, kernel) -> jnp.ndarray:
    """Separable 3D convolution with the same odd 1D kernel along D, H, W.

    Equivalent (including replicate padding, which clamps independently per
    axis) to the reference's three grouped convolutions
    (/root/reference/utils/util.py:394-406).
    """
    out = field
    for axis in (-3, -2, -1):
        out = conv1d_axis(out, kernel, axis)
    return out


def box_filter3d(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Sum over a cubic ``(2r+1)^3`` window with replicate padding.

    A box kernel is exactly separable, so the reference's dense
    ``nn.Conv3d`` of ones (/root/reference/model/loss.py:57) becomes three
    shift-and-add passes.
    """
    ones = jnp.ones((2 * radius + 1,), dtype=x.dtype)
    return separable_conv3d(x, ones)


def gradient(field: jnp.ndarray, *, normalised_spacing: bool = False) -> jnp.ndarray:
    """Forward-difference Jacobian of a ``(3, D, H, W)`` vector field.

    :param normalised_spacing: when the input is a transformation in
        normalised ``[-1, 1]`` coordinates, divide each derivative by the
        normalised voxel spacing ``2/(S-1)`` of its axis so that the identity
        transformation has ``det J = 1``.
    :return: ``(3, 3, D, H, W)`` Jacobian; ``[c, d]`` is ∂field_c/∂x_d with
        d = 0,1,2 ↔ x (W axis), y (H axis), z (D axis).

    Matches /root/reference/utils/diff_op.py:78-96: forward differences with
    the trailing edge replicated (so the last difference along each axis is
    duplicated, not zeroed).
    """
    D, H, W = field.shape[-3:]

    def fwd_diff(axis: int) -> jnp.ndarray:
        n = field.shape[axis]
        sl_hi = [slice(None)] * field.ndim
        sl_lo = [slice(None)] * field.ndim
        sl_hi[axis] = slice(1, n)
        sl_lo[axis] = slice(0, n - 1)
        d = field[tuple(sl_hi)] - field[tuple(sl_lo)]
        return _replicate_pad_axis(d, axis, 0, 1)

    d_dx = fwd_diff(-1)
    d_dy = fwd_diff(-2)
    d_dz = fwd_diff(-3)

    if normalised_spacing:
        d_dx = d_dx * ((W - 1) / 2.0)
        d_dy = d_dy * ((H - 1) / 2.0)
        d_dz = d_dz * ((D - 1) / 2.0)

    # insert the derivative axis right after the channel axis: unbatched
    # (3, 3, D, H, W), batched (N, 3, 3, D, H, W)
    return jnp.stack([d_dx, d_dy, d_dz], axis=field.ndim - 3)


def _fwd_diff_axis(field: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Forward difference with the trailing edge replicated (see gradient)."""
    n = field.shape[axis]
    sl_hi = [slice(None)] * field.ndim
    sl_lo = [slice(None)] * field.ndim
    sl_hi[axis] = slice(1, n)
    sl_lo[axis] = slice(0, n - 1)
    d = field[tuple(sl_hi)] - field[tuple(sl_lo)]
    return _replicate_pad_axis(d, axis, 0, 1)


def _taylor_squaring_impl(d: jnp.ndarray) -> jnp.ndarray:
    # accumulate (d·∇)d one derivative axis at a time — NEVER materialising
    # the (3, 3, D, H, W) Jacobian (72 MB at 128³)
    out = 2.0 * d
    for c, axis in ((0, -1), (1, -2), (2, -3)):
        out = out + _fwd_diff_axis(d, axis) * d[c][None]
    return out


@jax.custom_vjp
def taylor_squaring_step(d: jnp.ndarray) -> jnp.ndarray:
    """One second-order scaling-and-squaring step ``d' = 2d + (d·∇)d``.

    Equal to ``2d + Σ_a J[:, a]·d_a`` with ``J = gradient(d)`` (the Taylor
    form of ``u ∘ (id+u)``, models/transformation.py), but with an analytic
    VJP: plain autodiff stores the 9-channel Jacobian as a residual per
    step — 72 MB at 128³, ~650 MB of HBM round-trips across the 9-step
    chain — while this form saves only ``d`` (the scan carry, already live)
    and rebuilds the three directional differences in the backward.

    VJP (``D_a`` = forward-difference-with-replicated-edge along axis a):
        ḡ_k = 2 g_k + D_aᵀ(g_k · d_a) summed over a,
              + Σ_i g_i · (D_k d)_i          (the transport term's factor),
    with ``D_aᵀ`` obtained by ``jax.linear_transpose`` at trace time (it
    lowers to the same shift/slice ops as a hand-written adjoint).
    """
    return _taylor_squaring_impl(d)


def _taylor_fwd(d):
    return _taylor_squaring_impl(d), d


def _taylor_bwd(d, g):
    gd = 2.0 * g
    for c, axis in ((0, -1), (1, -2), (2, -3)):
        diff = _fwd_diff_axis(d, axis)        # (3, D, H, W)
        # transport term: ḡ_c += Σ_i g_i (D_axis d)_i
        gd = gd.at[c].add(jnp.sum(g * diff, axis=0))
        # difference term: ḡ += D_axisᵀ(g · d_c), channelwise
        transpose = jax.linear_transpose(
            lambda u: _fwd_diff_axis(u, axis), g)
        gd = gd + transpose(g * d[c][None])[0]
    return (gd,)


taylor_squaring_step.defvjp(_taylor_fwd, _taylor_bwd)


def _taylor_compose_impl(d: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    # u + d ∘ (id+u) ≈ u + d + (u·∇)d, accumulated one derivative axis at
    # a time — never materialising the (3, 3, D, H, W) Jacobian
    out = u + d
    for c, axis in ((0, -1), (1, -2), (2, -3)):
        out = out + _fwd_diff_axis(d, axis) * u[c][None]
    return out


@jax.custom_vjp
def taylor_compose_step(d: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """One second-order one-sided composition ``d' = u + d + (u·∇)d``.

    The Taylor form of the composition-phase recurrence
    ``T_{j+1} = T_j ∘ φ`` (models/transformation.py phase 2):
    ``d_{j+1}(p) = u_φ(p) + d_j(p + u_φ(p)) ≈ u_φ + d_j + J_{d_j} u_φ``.
    Trilinear interpolation of ``d_j`` at offset ``u_φ`` and this expansion
    both carry an ``O(|∇²d_j| · |u_φ|²)`` error — at sub-voxel offsets the
    analytic form is the *more* accurate of the two (RK4-oracle measurement
    in the SVF3D docstring) and runs as pure XLA-fused stencils instead of
    a 27-tap blend kernel.

    Analytic VJP (the two-operand analogue of :func:`taylor_squaring_step`;
    plain autodiff would store the 9-channel Jacobian per step):
        ḡ_u[c] = g_c + Σ_i g_i · (D_c d)_i
        ḡ_d    = g + Σ_c D_cᵀ(g · u_c)
    with ``D_c`` the forward difference along component ``c``'s axis.
    """
    return _taylor_compose_impl(d, u)


def _taylor_compose_fwd(d, u):
    return _taylor_compose_impl(d, u), (d, u)


def _taylor_compose_bwd(res, g):
    d, u = res
    gu = g
    gd = g
    for c, axis in ((0, -1), (1, -2), (2, -3)):
        diff = _fwd_diff_axis(d, axis)        # (3, D, H, W)
        gu = gu.at[c].add(jnp.sum(g * diff, axis=0))
        transpose = jax.linear_transpose(
            lambda x: _fwd_diff_axis(x, axis), g)
        gd = gd + transpose(g * u[c][None])[0]
    return gd, gu


taylor_compose_step.defvjp(_taylor_compose_fwd, _taylor_compose_bwd)


def _shift_axis(field: jnp.ndarray, off: int, axis: int) -> jnp.ndarray:
    """``field(p + off·e_axis)`` with the border replicated (off = ±1)."""
    n = field.shape[axis]
    sl = [slice(None)] * field.ndim
    if off > 0:
        sl[axis] = slice(1, n)
        return _replicate_pad_axis(field[tuple(sl)], axis, 0, 1)
    sl[axis] = slice(0, n - 1)
    return _replicate_pad_axis(field[tuple(sl)], axis, 1, 0)


def _axis_lerp(d: jnp.ndarray, u_c: jnp.ndarray, axis: int) -> jnp.ndarray:
    # d(p + u_c·e_axis) for |u_c| <= 1 as the exact 1D linear interpolation
    # out = (1-|u_c|)·d + u_c⁺·d(p+1) + |u_c⁻|·d(p-1): a CONVEX combination
    # per voxel — the pass obeys a max principle, so it cannot overshoot
    up = jnp.maximum(u_c, 0.0)[None]
    un = jnp.minimum(u_c, 0.0)[None]
    return (d + up * (_shift_axis(d, +1, axis) - d)
              - un * (_shift_axis(d, -1, axis) - d))


def _split_warp_impl(d: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    out = d
    for c, axis in ((0, -1), (1, -2), (2, -3)):
        out = _axis_lerp(out, u[c], axis)
    return out


def _split_compose_impl(d: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    # the offsets are clamped exactly like the radius-1 blend warp's, so
    # the clamping (and the saturation-guard semantics) match the warp path
    return u + _split_warp_impl(d, jnp.clip(u, -1.0, 1.0))


def _split_use_pallas(shape, dtype=jnp.float32):
    """Pallas dispatch decision for the split step — honours the same
    trace-time override as the blend kernels (``resample.set_pallas_mode``:
    the trainer forces the XLA form while building GSPMD-partitioned
    spatially-sharded steps; tests force ``"interpret"``)."""
    from . import resample
    from .pallas_split_warp import split_pallas_applicable

    if resample._PALLAS_OVERRIDE is False:
        return False
    if not split_pallas_applicable(shape, dtype):
        return False
    if resample._PALLAS_OVERRIDE == "interpret":
        return "interpret"
    return jax.default_backend() == "tpu"


def _split_fwd_dispatch(d, u):
    mode = _split_use_pallas(d.shape, d.dtype)
    if mode:
        from .pallas_split_warp import split_warp_pallas

        return split_warp_pallas(d, u, add_u=True,
                                 interpret=mode == "interpret")
    return _split_compose_impl(d, u)


@jax.custom_vjp
def split_compose_step(d: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """One composition ``d' = u + d ∘ (id+u)`` by dimensional splitting.

    ``d(p+u)`` is approximated by three SEQUENTIAL per-axis 2-tap linear
    interpolations (x, then y, then z).  Each pass is exact in its own
    axis and a convex combination per voxel, so the step is unconditionally
    stable for ``|u| ≤ 1`` — unlike the pure Taylor form
    (:func:`taylor_compose_step`), whose one-sided ``(u·∇)d`` term is
    anti-upwind for positive offsets and measurably blows up end-to-end
    (BASELINE.md round 3: 128³ VI folds at thousands of voxels).  The
    splitting error vs the full trilinear blend is the usual
    ``O(|∂²d|·|u|²)`` cross-term — the same order as the blend's own
    interpolation error — and the ``|u| ≤ 1`` clamp matches the warp's,
    so the saturation-guard semantics are identical.

    On TPU the step dispatches to VMEM-resident Pallas kernels
    (ops/pallas_split_warp.py) with the blend kernel's one-read-one-write
    HBM traffic at ~1/3 of its VPU arithmetic; elsewhere it runs as
    XLA-fused shift/multiply stencils whose VJP recomputes the two
    intermediate passes from ``(d, u)`` instead of storing them.
    """
    return _split_fwd_dispatch(d, u)


def _split_compose_fwd(d, u):
    return _split_fwd_dispatch(d, u), (d, u)


def _split_compose_bwd(res, g):
    d, u = res
    mode = _split_use_pallas(d.shape, d.dtype)
    if mode:
        from .pallas_split_warp import split_warp_bwd_pallas

        gd, gu = split_warp_bwd_pallas(d, u, g,
                                       interpret=mode == "interpret")
        return gd, gu + g  # + g: the direct ``+u`` term of the compose
    _, vjp = jax.vjp(_split_compose_impl, d, u)
    return vjp(g)


split_compose_step.defvjp(_split_compose_fwd, _split_compose_bwd)


def reg_energy(field: jnp.ndarray) -> jnp.ndarray:
    """Squared Frobenius norm of the field Jacobian, ``y = sum ||∇v||²``.

    The "chi-square" energy used by every regularisation loss
    (/root/reference/model/loss.py:152-161).  Accepts ``(3, D, H, W)`` or a
    batched ``(N, 3, D, H, W)``; reduces over everything except the batch.
    """
    jac = gradient(field)
    if field.ndim == 4:
        return jnp.sum(jac * jac)
    return jnp.sum(jac * jac, axis=tuple(range(1, jac.ndim)))


def log_det_jacobian(transformation: jnp.ndarray) -> jnp.ndarray:
    """log |J| of a normalised-coordinate transformation ``(3, D, H, W)``.

    NaN where the transformation folds (det J <= 0), matching
    /root/reference/utils/util.py:209-212.  Batched ``(N, 3, D, H, W)``
    inputs are mapped over the leading axis.
    """
    if transformation.ndim == 5:
        return jax.vmap(log_det_jacobian)(transformation)
    jac = gradient(transformation, normalised_spacing=True)
    return jnp.log(det_jacobian(jac))
