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
  ops/pallas_warp.py (z halo 1, y edge-padded, lane dim untouched);
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


def _valid_rows(plane: jnp.ndarray, H: int) -> jnp.ndarray:
    """Rows ``[P, P+H)`` of a padded ``(Hp, W)`` plane (roll+prefix-slice —
    the aligned idiom the blend kernels use)."""
    Hp = plane.shape[0]
    return pltpu.roll(plane, (-P) % Hp, axis=0)[0:H, :]


def _lerp_x(d: jnp.ndarray, uxp, uxn, W: int, col) -> jnp.ndarray:
    # d(p + ux·e_x), border-clamped; uxp = max(ux,0), uxn = min(ux,0)
    return (d + uxp * (_shift_x_clamped(d, 1, W, col) - d)
              - uxn * (_shift_x_clamped(d, -1, W, col) - d))


def _lerp_y(a: jnp.ndarray, uyp, uyn) -> jnp.ndarray:
    # a(p + uy·e_y) on an edge-padded plane: the ±1-row neighbours of every
    # VALID row exist in the padding (wraparound only touches rows the
    # z-pass never reads), and the edge padding makes the border rows
    # replicate — exactly the XLA impl's clamp semantics
    Hp = a.shape[0]
    a_dn = pltpu.roll(a, (-1) % Hp, axis=0)  # row r -> a(r+1)
    a_up = pltpu.roll(a, 1, axis=0)          # row r -> a(r-1)
    return a + uyp * (a_dn - a) - uyn * (a_up - a)


def _split_fwd_kernel(xd_hbm, xu_hbm, out_ref, window, bwin, sem,
                      *, C: int, TD: int, H: int, W: int, add_u: bool):
    i = pl.program_id(0)
    WR = TD + 2 * P
    Hp = window.shape[1]

    _load_windows_refs([(xd_hbm, C), (xu_hbm, 3)], window, sem,
                       i=i, TD=TD, WR=WR)
    col = jax.lax.broadcasted_iota(jnp.int32, (Hp, W), 1)

    def wplane(k, s):
        # window planes arrive in the HBM dtype (f32 or bf16 — bf16 halves
        # the DMA traffic of this bandwidth-bound kernel); ALL arithmetic
        # runs f32 and only the output store rounds back
        return window[pl.ds(k * WR + s, 1)].reshape(Hp, W).astype(jnp.float32)

    def brow(s, _):
        ux = jnp.clip(wplane(C, s), -1.0, 1.0)
        uy = jnp.clip(wplane(C + 1, s), -1.0, 1.0)
        uxp, uxn = jnp.maximum(ux, 0.0), jnp.minimum(ux, 0.0)
        uyp, uyn = jnp.maximum(uy, 0.0), jnp.minimum(uy, 0.0)
        for c in range(C):
            d = wplane(c, s)
            by = _lerp_y(_lerp_x(d, uxp, uxn, W, col), uyp, uyn)
            bwin[pl.ds(c * WR + s, 1)] = by.reshape(1, Hp, W)
        return 0

    jax.lax.fori_loop(0, WR, brow, 0)

    def zrow(z, _):
        s = z + P
        uz = _valid_rows(jnp.clip(wplane(C + 2, s), -1.0, 1.0), H)
        uzp, uzn = jnp.maximum(uz, 0.0), jnp.minimum(uz, 0.0)
        for c in range(C):
            b0 = _valid_rows(bwin[pl.ds(c * WR + s, 1)].reshape(Hp, W), H)
            bp = _valid_rows(bwin[pl.ds(c * WR + s + 1, 1)].reshape(Hp, W), H)
            bm = _valid_rows(bwin[pl.ds(c * WR + s - 1, 1)].reshape(Hp, W), H)
            o = b0 + uzp * (bp - b0) - uzn * (bm - b0)
            if add_u:
                o = o + _valid_rows(wplane(C + c, s), H)
            out_ref[c, z] = o.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, TD, zrow, 0)


def _split_bwd_kernel(xd_hbm, xu_hbm, xg_hbm, gd_ref, gu_ref, window, awin,
                      bwin, sem, *, C: int, TD: int, H: int, W: int, D: int):
    """One pass computing ``ḡ_d = L_xᵀ L_yᵀ L_zᵀ g`` and ``ū``.

    Window channels: ``[d(C, edge-padded), u(3, edge-padded, RAW),
    g(C, zero-padded)]``.  The transpose is written in gather form, so
    each output row only reads its ±1 window neighbours; the
    replicate-pad transposes become explicit edge folds (masks on the
    global first/last row, column 0/W-1) — mirroring the tblend kernel's
    x-fold.  ``ū`` masks the clip: offsets with ``|u| ≥ 1`` are saturated
    and get zero gradient (matching ``jnp.clip``'s interior convention).
    """
    i = pl.program_id(0)
    WR = TD + 2 * P
    Hp = window.shape[1]

    _load_windows_refs([(xd_hbm, C), (xu_hbm, 3), (xg_hbm, C)], window, sem,
                       i=i, TD=TD, WR=WR)
    col = jax.lax.broadcasted_iota(jnp.int32, (Hp, W), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (Hp, W), 0)

    def dplane(c, s):
        return window[pl.ds(c * WR + s, 1)].reshape(Hp, W).astype(jnp.float32)

    def uplane(k, s):
        return window[pl.ds((C + k) * WR + s, 1)].reshape(
            Hp, W).astype(jnp.float32)

    def gplane(c, s):
        return window[pl.ds((C + 3 + c) * WR + s, 1)].reshape(
            Hp, W).astype(jnp.float32)

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
            awin[pl.ds(c * WR + s, 1)] = a.reshape(1, Hp, W)
            bwin[pl.ds(c * WR + s, 1)] = _lerp_y(a, uyp, uyn).reshape(1, Hp, W)
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

        gux = jnp.zeros((Hp, W), jnp.float32)
        guy = jnp.zeros((Hp, W), jnp.float32)
        guz = jnp.zeros((Hp, W), jnp.float32)
        for c in range(C):
            g0 = gplane(c, s)
            # T1 = L_zᵀ g  (g is zero-padded, so out-of-volume rows carry
            # no mass; the replicate-pad transpose is the two edge folds)
            t1 = ((1.0 - jnp.abs(uz)) * g0
                  + jnp.maximum(uz_m, 0.0) * gplane(c, s - 1)
                  - jnp.minimum(uz_p, 0.0) * gplane(c, s + 1))
            t1 = t1 + jnp.where(first, -uzn * g0, 0.0)
            t1 = t1 + jnp.where(last, uzp * g0, 0.0)
            # T2 = L_yᵀ T1 (in-plane; folds on the first/last VALID row)
            t2 = (w0y * t1
                  + pltpu.roll(uyp * t1, 1, axis=0)
                  - pltpu.roll(uyn * t1, (-1) % Hp, axis=0))
            t2 = t2 + jnp.where(row == P, -uyn * t1, 0.0)
            t2 = t2 + jnp.where(row == P + H - 1, uyp * t1, 0.0)
            # ḡ_d = L_xᵀ T2 (in-plane; folds on columns 0 / W-1)
            gd = (w0x * t2
                  + _rollx_zero(uxp * t2, 1, W, col)
                  - _rollx_zero(uxn * t2, -1, W, col))
            gd = gd + jnp.where(col == 0, -uxn * t2, 0.0)
            gd = gd + jnp.where(col == W - 1, uxp * t2, 0.0)
            gd_ref[c, z] = _valid_rows(gd, H).astype(gd_ref.dtype)

            # offset gradients: ⟨stage cotangent, ∂L/∂u⟩ per axis
            d = dplane(c, s)
            a = awin[pl.ds(c * WR + s, 1)].reshape(Hp, W)
            ddx = jnp.where(ux >= 0.0,
                            _shift_x_clamped(d, 1, W, col) - d,
                            d - _shift_x_clamped(d, -1, W, col))
            gux = gux + t2 * ddx
            ddy = jnp.where(uy >= 0.0,
                            pltpu.roll(a, (-1) % Hp, axis=0) - a,
                            a - pltpu.roll(a, 1, axis=0))
            guy = guy + t1 * ddy
            b0 = bwin[pl.ds(c * WR + s, 1)].reshape(Hp, W)
            bp = bwin[pl.ds(c * WR + s + 1, 1)].reshape(Hp, W)
            bm = bwin[pl.ds(c * WR + s - 1, 1)].reshape(Hp, W)
            ddz = jnp.where(uz >= 0.0, bp - b0, b0 - bm)
            guz = guz + g0 * ddz

        gu_ref[0, z] = _valid_rows(
            gux * (jnp.abs(u_raw[0]) < 1.0).astype(jnp.float32),
            H).astype(gu_ref.dtype)
        gu_ref[1, z] = _valid_rows(
            guy * (jnp.abs(u_raw[1]) < 1.0).astype(jnp.float32),
            H).astype(gu_ref.dtype)
        gu_ref[2, z] = _valid_rows(
            guz * (jnp.abs(u_raw[2]) < 1.0).astype(jnp.float32),
            H).astype(gu_ref.dtype)
        return 0

    jax.lax.fori_loop(0, TD, zrow, 0)


def split_pallas_applicable(shape) -> bool:
    """Same lane/tile rules as the blend kernels (pallas_warp.py)."""
    D, H, W = shape[-3:]
    if W % 128 != 0 or W > 1024:
        return False
    if D % 8 != 0:
        return False
    # bwd scratches: 9-channel window + A + B (3 each), 10 rows per channel
    window_bytes = 15 * (8 + 2 * P) * (H + 2 * P + 8) * W * 4
    return window_bytes < 64 * 1024 * 1024


def _pad_flat(a, mode, Hp, H):
    """One array padded to the kernels' flat ``(C·Dp, Hp, W)`` layout.

    Each operand is staged SEPARATELY (no concatenation): the composition
    scan re-invokes the kernel with the same ``u`` (and the backward with
    the same ``d`` as its forward), so under the TPU unroll XLA CSEs the
    identical pads across steps/passes — a concatenated [d|u|g] staging
    array re-materialises all channels every call (measured ~5% of the
    128³ transition).
    """
    x = jnp.pad(a, [(0, 0), (P, P), (P, Hp - H - P), (0, 0)], mode=mode)
    return x.reshape(x.shape[0] * x.shape[1], Hp, x.shape[3])


def _load_windows_refs(srcs, window, sem, *, i, TD, WR):
    """Per-channel z-window DMAs from MULTIPLE flat sources into one
    scratch; destination channel-blocks follow the sources in order.  All
    copies start before any wait (they share one semaphore)."""
    dmas = []
    dst = 0
    for ref, n_chan in srcs:
        Dp = ref.shape[0] // n_chan
        for c in range(n_chan):
            dmas.append(pltpu.make_async_copy(
                ref.at[pl.ds(c * Dp + i * TD, WR)],
                window.at[pl.ds(dst * WR, WR)], sem))
            dst += 1
    for dma in dmas:
        dma.start()
    for dma in dmas:
        dma.wait()


@functools.partial(jax.jit, static_argnames=("add_u", "interpret"))
def split_warp_pallas(d: jnp.ndarray, u: jnp.ndarray,
                      add_u: bool = True, interpret: bool = False):
    """Forward split warp: ``L_z(L_y(L_x(d; ux); uy); uz)`` (+``u`` when
    ``add_u`` — the composition form).  ``d (C, D, H, W)``, ``u (3, D, H, W)``."""
    @jax.custom_batching.sequential_vmap
    def call(d, u):
        C = d.shape[0]
        D, H, W = d.shape[-3:]
        TD = 8
        dt = d.dtype  # window + outputs ride the input dtype (f32 or bf16)
        sub = 16 if dt == jnp.bfloat16 else 8  # sublane tile
        Hp = H + 2 * P + (-(H + 2 * P)) % sub
        xd = _pad_flat(d, "edge", Hp, H)
        xu = _pad_flat(u.astype(dt), "edge", Hp, H)
        return pl.pallas_call(
            functools.partial(_split_fwd_kernel, C=C, TD=TD, H=H, W=W,
                              add_u=add_u),
            grid=(D // TD,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((C, TD, H, W), lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, D, H, W), dt),
            scratch_shapes=[
                pltpu.VMEM(((C + 3) * (TD + 2 * P), Hp, W), dt),
                pltpu.VMEM((C * (TD + 2 * P), Hp, W), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(xd, xu)

    return call(d, u)


@functools.partial(jax.jit, static_argnames=("interpret",))
def split_warp_bwd_pallas(d: jnp.ndarray, u: jnp.ndarray, g: jnp.ndarray,
                          interpret: bool = False):
    """Backward split warp: returns ``(ḡ_d, ū_warp)`` — the gradients of
    the warp part only (the compose wrapper adds ``g`` to ``ū`` for the
    direct ``+u`` term)."""
    @jax.custom_batching.sequential_vmap
    def call(d, u, g):
        C = d.shape[0]
        D, H, W = d.shape[-3:]
        TD = 8
        dt = d.dtype
        sub = 16 if dt == jnp.bfloat16 else 8
        Hp = H + 2 * P + (-(H + 2 * P)) % sub
        xd = _pad_flat(d, "edge", Hp, H)
        xu = _pad_flat(u.astype(dt), "edge", Hp, H)
        xg = _pad_flat(g.astype(dt), "constant", Hp, H)
        return pl.pallas_call(
            functools.partial(_split_bwd_kernel, C=C, TD=TD, H=H, W=W, D=D),
            grid=(D // TD,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((C, TD, H, W), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, TD, H, W), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((C, D, H, W), dt),
                jax.ShapeDtypeStruct((3, D, H, W), dt),
            ],
            scratch_shapes=[
                pltpu.VMEM(((2 * C + 3) * (TD + 2 * P), Hp, W), dt),
                pltpu.VMEM((C * (TD + 2 * P), Hp, W), jnp.float32),
                pltpu.VMEM((C * (TD + 2 * P), Hp, W), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(xd, xu, xg)

    return call(d, u, g)
