"""Pallas TPU kernels for the dimensionally-split composition step.

``split_compose_step`` (ops/stencil.py) approximates the phase-2
composition ``d' = u + d ∘ (id+u)`` by three sequential per-axis 2-tap
lerps (x, then y, then z) at clamped offsets ``|u| ≤ 1``.  As plain XLA
that schedule moves ~2× the minimal bytes (each pass plus the remat
backward round-trips the volume) and measured only parity with the
27-tap blend kernel it replaces (BASELINE.md round 3).  These kernels
run the whole step VMEM-resident with the blend kernel's traffic —
one read of ``d`` + ``u`` and one write of the output per direction —
at ~1/3 the 27-tap kernel's VPU arithmetic:

* the volume rides the same per-channel haloed z-window DMA as
  ops/pallas_warp.py, but from UNPADDED operands: the window start is
  clamped in-bounds and a per-program row offset re-aligns it
  (:func:`_window_geometry`), y edges are in-kernel clamped selects —
  the old edge-pad pass cost a full extra read+write of every operand
  (measured 7.8% of a 128³ transition);
  the offsets ``u`` ride the same window (weights at the SOURCE slice
  are needed by the x/y passes of neighbouring output slices);
* phase 1 computes the x- then y-passed slabs ``B = L_y(L_x(d))`` for
  every window row into a VMEM scratch (per-row (Hp, W) plane ops — the
  idiom the 27-tap kernels established; channel-leading 3D ops relayout
  under Mosaic);
* phase 2 z-lerps three scratch rows per output slice.

The backward kernel computes BOTH gradients in one pass: the transpose
chain ``ḡ_d = L_xᵀ L_yᵀ L_zᵀ g`` (gather form — per output row it reads
the cotangent's haloed window, so no cross-tile scatter; border-clamp
transposes fold onto the edge rows exactly like the blend kernels'
x-fold) and the offset gradient ``ū = Σ_c ⟨chain cotangent, ∂L/∂u⟩``
using the recomputed ``A``/``B`` scratches.

Replaces: /root/reference/utils/transformation.py:63-76's gather-based
composition (the TPU-hostile formulation — see SURVEY §7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_warp import _rollx_zero, _shift_x_clamped

P = 1  # the split step is radius-1 by construction (offsets clamped to ±1)


def _shift_y_clamped(plane: jnp.ndarray, oy: int, H: int, row):
    """``plane`` shifted by ``oy`` along the sublane axis, border-clamped
    (the y analog of ``_shift_x_clamped`` — operands are UNPADDED since
    round 3, so edge replication is an in-kernel select, not a pad pass)."""
    rolled = pltpu.roll(plane, (-oy) % H, axis=0)
    if oy > 0:
        edge = jax.lax.slice_in_dim(plane, H - 1, H, axis=0)
        return jnp.where(row < H - oy, rolled, edge)
    edge = jax.lax.slice_in_dim(plane, 0, 1, axis=0)
    return jnp.where(row >= -oy, rolled, edge)


def _rolly_zero(plane: jnp.ndarray, oy: int, H: int, row):
    """``plane`` shifted by ``oy`` along sublanes with ZERO fill (transpose
    helper — mass may not wrap across the volume edge)."""
    rolled = pltpu.roll(plane, (-oy) % H, axis=0)
    if oy > 0:
        return jnp.where(row < H - oy, rolled, 0.0)
    return jnp.where(row >= -oy, rolled, 0.0)


def _lerp_x(d: jnp.ndarray, uxp, uxn, W: int, col) -> jnp.ndarray:
    # d(p + ux·e_x), border-clamped; uxp = max(ux,0), uxn = min(ux,0)
    return (d + uxp * (_shift_x_clamped(d, 1, W, col) - d)
              - uxn * (_shift_x_clamped(d, -1, W, col) - d))


def _lerp_y(a: jnp.ndarray, uyp, uyn, H: int, row) -> jnp.ndarray:
    # a(p + uy·e_y), border-clamped rows (replicate — the XLA impl's clamp)
    a_dn = _shift_y_clamped(a, 1, H, row)   # row r -> a(r+1)
    a_up = _shift_y_clamped(a, -1, H, row)  # row r -> a(r-1)
    return a + uyp * (a_dn - a) - uyn * (a_up - a)


def _window_geometry(i, TD: int, D: int):
    """Clamped z-window placement for UNPADDED operands.

    The desired window covers global rows ``[i·TD - P, i·TD + TD + P)``;
    the DMA reads ``E = min(TD + 2P, D)`` in-bounds rows starting at
    ``start = clamp(i·TD - P, 0, D - E)``.  ``delta = (i·TD - P) - start``
    maps desired window row ``s`` to loaded row ``clamp(s + delta,
    0, E-1)`` — the clamp IS the z edge replication the old edge-pad pass
    provided (a full extra read+write of every operand, measured 7.8% of
    a 128³ transition).
    """
    E = min(TD + 2 * P, D)
    z0 = i * TD - P
    start = jnp.clip(z0, 0, D - E)
    delta = z0 - start
    return E, z0, start, delta


def _split_fwd_kernel(xd_hbm, xu_hbm, out_ref, window, bwin, sem,
                      *, C: int, TD: int, H: int, W: int, D: int,
                      add_u: bool):
    # grid = (B, D // TD): program_id(0) selects the batch element (chain),
    # program_id(1) the z-block.  Batching rides the grid instead of an
    # XLA-level loop — vmapping the old single-batch kernel cost a
    # dynamic-slice + dynamic-update-slice round-trip of every operand per
    # chain per call (~40% of the composition phase at 128³/2 chains,
    # the ``while.317-333`` rows of BASELINE.md's round-3 trace).
    b = pl.program_id(0)
    i = pl.program_id(1)
    WR = TD + 2 * P
    E, _, start, delta = _window_geometry(i, TD, D)

    _load_windows_refs([(xd_hbm, b * C, C, D), (xu_hbm, b * 3, 3, D)],
                       window, sem, start=start, E=E)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    rowv = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)

    def wplane(k, s):
        # window planes arrive in the HBM dtype (f32 or bf16 — bf16 halves
        # the DMA traffic of this bandwidth-bound kernel); ALL arithmetic
        # runs f32 and only the output store rounds back.  ``s`` is a
        # DESIRED window row; the clip replicates the z edges.
        si = jnp.clip(s + delta, 0, E - 1)
        return window[pl.ds(k * E + si, 1)].reshape(H, W).astype(jnp.float32)

    def brow(s, _):
        ux = jnp.clip(wplane(C, s), -1.0, 1.0)
        uy = jnp.clip(wplane(C + 1, s), -1.0, 1.0)
        uxp, uxn = jnp.maximum(ux, 0.0), jnp.minimum(ux, 0.0)
        uyp, uyn = jnp.maximum(uy, 0.0), jnp.minimum(uy, 0.0)
        for c in range(C):
            d = wplane(c, s)
            by = _lerp_y(_lerp_x(d, uxp, uxn, W, col), uyp, uyn, H, rowv)
            bwin[pl.ds(c * WR + s, 1)] = by.reshape(1, H, W)
        return 0

    jax.lax.fori_loop(0, WR, brow, 0)

    def zrow(z, _):
        s = z + P
        uz = jnp.clip(wplane(C + 2, s), -1.0, 1.0)
        uzp, uzn = jnp.maximum(uz, 0.0), jnp.minimum(uz, 0.0)
        for c in range(C):
            b0 = bwin[pl.ds(c * WR + s, 1)].reshape(H, W)
            bp = bwin[pl.ds(c * WR + s + 1, 1)].reshape(H, W)
            bm = bwin[pl.ds(c * WR + s - 1, 1)].reshape(H, W)
            o = b0 + uzp * (bp - b0) - uzn * (bm - b0)
            if add_u:
                o = o + wplane(C + c, s)
            out_ref[0, c, z] = o.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, TD, zrow, 0)


def _split_bwd_kernel(xd_hbm, xu_hbm, xg_hbm, gd_ref, gu_ref, window, awin,
                      bwin, sem, *, C: int, TD: int, H: int, W: int, D: int):
    """One pass computing ``ḡ_d = L_xᵀ L_yᵀ L_zᵀ g`` and ``ū``.

    Window channels: ``[d(C), u(3, RAW), g(C)]`` — unpadded; z edges
    replicate through the clamped window indexing, and ``gplane``
    zero-masks out-of-volume cotangent rows.  The transpose is written
    in gather form, so
    each output row only reads its ±1 window neighbours; the
    replicate-pad transposes become explicit edge folds (masks on the
    global first/last row, column 0/W-1) — mirroring the tblend kernel's
    x-fold.  ``ū`` masks the clip: offsets with ``|u| ≥ 1`` are saturated
    and get zero gradient (matching ``jnp.clip``'s interior convention).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    WR = TD + 2 * P
    E, z0, start, delta = _window_geometry(i, TD, D)

    _load_windows_refs([(xd_hbm, b * C, C, D), (xu_hbm, b * 3, 3, D),
                        (xg_hbm, b * C, C, D)],
                       window, sem, start=start, E=E)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)

    def dplane(c, s):
        si = jnp.clip(s + delta, 0, E - 1)
        return window[pl.ds(c * E + si, 1)].reshape(H, W).astype(jnp.float32)

    def uplane(k, s):
        si = jnp.clip(s + delta, 0, E - 1)
        return window[pl.ds((C + k) * E + si, 1)].reshape(
            H, W).astype(jnp.float32)

    def gplane(c, s):
        # the z-transpose needs out-of-volume cotangent rows to carry NO
        # mass (the old zero-pad): mask rows whose global index z0+s is
        # outside [0, D)
        si = jnp.clip(s + delta, 0, E - 1)
        plane = window[pl.ds((C + 3 + c) * E + si, 1)].reshape(
            H, W).astype(jnp.float32)
        gl = z0 + s
        inb = jnp.logical_and(gl >= 0, gl < D).astype(jnp.float32)
        return plane * inb

    # phase 1: A = L_x(d) and B = L_y(A) for every window row (recompute —
    # storing them in the forward would round-trip 2 volumes through HBM)
    def abrow(s, _):
        ux = jnp.clip(uplane(0, s), -1.0, 1.0)
        uy = jnp.clip(uplane(1, s), -1.0, 1.0)
        uxp, uxn = jnp.maximum(ux, 0.0), jnp.minimum(ux, 0.0)
        uyp, uyn = jnp.maximum(uy, 0.0), jnp.minimum(uy, 0.0)
        for c in range(C):
            d = dplane(c, s)
            a = _lerp_x(d, uxp, uxn, W, col)
            awin[pl.ds(c * WR + s, 1)] = a.reshape(1, H, W)
            bwin[pl.ds(c * WR + s, 1)] = _lerp_y(
                a, uyp, uyn, H, row).reshape(1, H, W)
        return 0

    jax.lax.fori_loop(0, WR, abrow, 0)

    def zrow(z, _):
        s = z + P
        gz = i * TD + z  # global output row
        first = gz == 0
        last = gz == D - 1

        u_raw = [uplane(k, s) for k in range(3)]
        ux = jnp.clip(u_raw[0], -1.0, 1.0)
        uy = jnp.clip(u_raw[1], -1.0, 1.0)
        uz = jnp.clip(u_raw[2], -1.0, 1.0)
        uxp, uxn = jnp.maximum(ux, 0.0), jnp.minimum(ux, 0.0)
        uyp, uyn = jnp.maximum(uy, 0.0), jnp.minimum(uy, 0.0)
        uzp, uzn = jnp.maximum(uz, 0.0), jnp.minimum(uz, 0.0)
        w0x, w0y = 1.0 - jnp.abs(ux), 1.0 - jnp.abs(uy)
        # z-transpose neighbour weights come from the SOURCE rows s∓1
        uz_m = jnp.clip(uplane(2, s - 1), -1.0, 1.0)
        uz_p = jnp.clip(uplane(2, s + 1), -1.0, 1.0)

        gux = jnp.zeros((H, W), jnp.float32)
        guy = jnp.zeros((H, W), jnp.float32)
        guz = jnp.zeros((H, W), jnp.float32)
        for c in range(C):
            g0 = gplane(c, s)
            # T1 = L_zᵀ g  (gplane zero-masks out-of-volume rows, so they
            # carry no mass; the replicate-pad transpose is the two edge
            # folds)
            t1 = ((1.0 - jnp.abs(uz)) * g0
                  + jnp.maximum(uz_m, 0.0) * gplane(c, s - 1)
                  - jnp.minimum(uz_p, 0.0) * gplane(c, s + 1))
            t1 = t1 + jnp.where(first, -uzn * g0, 0.0)
            t1 = t1 + jnp.where(last, uzp * g0, 0.0)
            # T2 = L_yᵀ T1 (in-plane; zero-fill shifts + folds on the
            # first/last row)
            t2 = (w0y * t1
                  + _rolly_zero(uyp * t1, -1, H, row)
                  - _rolly_zero(uyn * t1, 1, H, row))
            t2 = t2 + jnp.where(row == 0, -uyn * t1, 0.0)
            t2 = t2 + jnp.where(row == H - 1, uyp * t1, 0.0)
            # ḡ_d = L_xᵀ T2 (in-plane; folds on columns 0 / W-1)
            gd = (w0x * t2
                  + _rollx_zero(uxp * t2, 1, W, col)
                  - _rollx_zero(uxn * t2, -1, W, col))
            gd = gd + jnp.where(col == 0, -uxn * t2, 0.0)
            gd = gd + jnp.where(col == W - 1, uxp * t2, 0.0)
            gd_ref[0, c, z] = gd.astype(gd_ref.dtype)

            # offset gradients: ⟨stage cotangent, ∂L/∂u⟩ per axis
            d = dplane(c, s)
            a = awin[pl.ds(c * WR + s, 1)].reshape(H, W)
            ddx = jnp.where(ux >= 0.0,
                            _shift_x_clamped(d, 1, W, col) - d,
                            d - _shift_x_clamped(d, -1, W, col))
            gux = gux + t2 * ddx
            ddy = jnp.where(uy >= 0.0,
                            _shift_y_clamped(a, 1, H, row) - a,
                            a - _shift_y_clamped(a, -1, H, row))
            guy = guy + t1 * ddy
            b0 = bwin[pl.ds(c * WR + s, 1)].reshape(H, W)
            bp = bwin[pl.ds(c * WR + s + 1, 1)].reshape(H, W)
            bm = bwin[pl.ds(c * WR + s - 1, 1)].reshape(H, W)
            ddz = jnp.where(uz >= 0.0, bp - b0, b0 - bm)
            guz = guz + g0 * ddz

        gu_ref[0, 0, z] = (
            gux * (jnp.abs(u_raw[0]) < 1.0).astype(jnp.float32)
        ).astype(gu_ref.dtype)
        gu_ref[0, 1, z] = (
            guy * (jnp.abs(u_raw[1]) < 1.0).astype(jnp.float32)
        ).astype(gu_ref.dtype)
        gu_ref[0, 2, z] = (
            guz * (jnp.abs(u_raw[2]) < 1.0).astype(jnp.float32)
        ).astype(gu_ref.dtype)
        return 0

    jax.lax.fori_loop(0, TD, zrow, 0)


def split_pallas_applicable(shape, dtype=jnp.float32) -> bool:
    """Same lane/tile rules as the blend kernels (pallas_warp.py); H must
    be sublane-tileable for ``dtype`` since round 3 (operands are unpadded
    — in-kernel rolls/selects handle the edges, so no alignment padding
    exists to absorb a ragged H)."""
    D, H, W = shape[-3:]
    sub = 16 if jnp.dtype(dtype) == jnp.bfloat16 else 8
    if W % 128 != 0 or W > 1024:
        return False
    if D % 8 != 0 or H % sub != 0:
        return False
    # bwd scratches: 9-channel window + A + B (3 each), 10 rows per channel
    window_bytes = 15 * (8 + 2 * P) * (H + 8) * W * 4
    return window_bytes < 64 * 1024 * 1024


def _load_windows_refs(srcs, window, sem, *, start, E):
    """Per-channel z-window DMAs from MULTIPLE flat ``(B·C·D, H, W)``
    sources into one scratch; destination channel-blocks follow the
    sources in order.  Each source entry ``(ref, chan_base, n_chan, D)``
    reads channels ``chan_base .. chan_base + n_chan`` (the batch
    element's slice of the flattened channel axis).  All copies start
    before any wait (they share one semaphore).  ``start``/``E`` place
    the clamped in-bounds window (:func:`_window_geometry`) — operands
    carry NO padding."""
    dmas = []
    dst = 0
    for ref, chan_base, n_chan, D in srcs:
        for c in range(n_chan):
            dmas.append(pltpu.make_async_copy(
                ref.at[pl.ds((chan_base + c) * D + start, E)],
                window.at[pl.ds(dst * E, E)], sem))
            dst += 1
    for dma in dmas:
        dma.start()
    for dma in dmas:
        dma.wait()


def _split_fwd_batched(d5, u5, add_u: bool, interpret: bool):
    """Batched forward kernel call: ``d5 (B, C, D, H, W)``,
    ``u5 (B, 3, D, H, W)``.  The batch rides the leading grid axis —
    per-program VMEM (one element's windows) is unchanged, and no
    XLA-level slicing per batch element exists at all."""
    B, C = d5.shape[0], d5.shape[1]
    D, H, W = d5.shape[-3:]
    TD = 8
    E = min(TD + 2 * P, D)
    dt = d5.dtype  # window + outputs ride the input dtype (f32 or bf16)
    xd = d5.reshape(B * C * D, H, W)               # free bitcast — no pad
    xu = u5.astype(dt).reshape(B * 3 * D, H, W)
    return pl.pallas_call(
        functools.partial(_split_fwd_kernel, C=C, TD=TD, H=H, W=W, D=D,
                          add_u=add_u),
        grid=(B, D // TD),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, C, TD, H, W),
                               lambda b, i: (b, 0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, D, H, W), dt),
        scratch_shapes=[
            pltpu.VMEM(((C + 3) * E, H, W), dt),
            pltpu.VMEM((C * (TD + 2 * P), H, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xd, xu)


@functools.partial(jax.jit, static_argnames=("add_u", "interpret"))
def split_warp_pallas(d: jnp.ndarray, u: jnp.ndarray,
                      add_u: bool = True, interpret: bool = False):
    """Forward split warp: ``L_z(L_y(L_x(d; ux); uy); uz)`` (+``u`` when
    ``add_u`` — the composition form).  ``d (C, D, H, W)``, ``u (3, D, H, W)``.

    ``vmap`` folds the mapped axis into the kernel grid (one call for all
    chains) instead of looping — the sequential_vmap loop cost a full
    dynamic-slice/update round-trip of every operand per chain per call."""
    @jax.custom_batching.custom_vmap
    def call(d, u):
        return _split_fwd_batched(d[None], u[None], add_u, interpret)[0]

    @call.def_vmap
    def _rule(axis_size, in_batched, d, u):
        d_b, u_b = in_batched
        if not d_b:
            d = jnp.broadcast_to(d[None], (axis_size,) + d.shape)
        if not u_b:
            u = jnp.broadcast_to(u[None], (axis_size,) + u.shape)
        return _split_fwd_batched(d, u, add_u, interpret), True

    return call(d, u)


def _split_bwd_batched(d5, u5, g5, interpret: bool):
    """Batched backward kernel call (see :func:`_split_fwd_batched`)."""
    B, C = d5.shape[0], d5.shape[1]
    D, H, W = d5.shape[-3:]
    TD = 8
    E = min(TD + 2 * P, D)
    dt = d5.dtype
    xd = d5.reshape(B * C * D, H, W)               # free bitcast — no pad
    xu = u5.astype(dt).reshape(B * 3 * D, H, W)
    xg = g5.astype(dt).reshape(B * C * D, H, W)
    return pl.pallas_call(
        functools.partial(_split_bwd_kernel, C=C, TD=TD, H=H, W=W, D=D),
        grid=(B, D // TD),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, C, TD, H, W), lambda b, i: (b, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TD, H, W), lambda b, i: (b, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C, D, H, W), dt),
            jax.ShapeDtypeStruct((B, 3, D, H, W), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM(((2 * C + 3) * E, H, W), dt),
            pltpu.VMEM((C * (TD + 2 * P), H, W), jnp.float32),
            pltpu.VMEM((C * (TD + 2 * P), H, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xd, xu, xg)


@functools.partial(jax.jit, static_argnames=("interpret",))
def split_warp_bwd_pallas(d: jnp.ndarray, u: jnp.ndarray, g: jnp.ndarray,
                          interpret: bool = False):
    """Backward split warp: returns ``(ḡ_d, ū_warp)`` — the gradients of
    the warp part only (the compose wrapper adds ``g`` to ``ū`` for the
    direct ``+u`` term).  ``vmap`` folds into the kernel grid like the
    forward."""
    @jax.custom_batching.custom_vmap
    def call(d, u, g):
        gd, gu = _split_bwd_batched(d[None], u[None], g[None], interpret)
        return gd[0], gu[0]

    @call.def_vmap
    def _rule(axis_size, in_batched, d, u, g):
        ops = []
        for x, b in zip((d, u, g), in_batched):
            ops.append(x if b else
                       jnp.broadcast_to(x[None], (axis_size,) + x.shape))
        return _split_bwd_batched(*ops, interpret), (True, True)

    return call(d, u, g)
