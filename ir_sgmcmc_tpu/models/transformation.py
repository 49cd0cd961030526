"""Transformation models: SVF (scaling and squaring), B-spline FFD, SVFFD.

Functional redesign of /root/reference/utils/transformation.py.  Each model
is a callable object holding only static precomputed constants (identity
grid, spreading matrices); the forward map is pure and jit/vmap/shard-safe.
The squaring loop is a ``lax.scan`` so it traces once regardless of step
count.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.bspline import CubicBSplineFFD3D, control_grid_size
from ..ops.grids import identity_grid, normalised_to_voxel, voxel_to_normalised
from ..ops.resample import grid_sample, grid_sample_2d, warp_bounded
from ..ops.stencil import (split_compose_step, taylor_compose_step,
                           taylor_squaring_step)


class SVF3D:
    """Stationary velocity field, integrated by scaling and squaring.

    ``v`` is a ``(3, D, H, W)`` velocity in voxel units.  Returns
    ``(transformation, displacement)`` where the transformation is in
    normalised ``[-1, 1]`` coordinates (ready for :func:`grid_sample`) and
    the displacement is in voxel units — matching the reference
    (/root/reference/utils/transformation.py:51-76).

    TPU design: integration runs in *voxel displacement* space with the
    bounded shift-and-blend warp (see ``ops.resample.warp_bounded``) whose
    cost scales as ``(2R+1)³`` in the blend radius ``R``.  Instead of
    squaring all the way up (``T ∘ T`` doubles the sampling offset each
    step, forcing ``R = max_disp/2`` at the end — the single R=4 step was
    67% of all device time in the 128³ SGLD trace), the integration is
    split so every warp offset stays ≤ 1 voxel:

    1. ``φ = exp(v / 2^e)`` by ``S − e`` radius-1 squarings, where
       ``e = ceil(log2(max_disp))`` — the running displacement during this
       phase is bounded by ``max_disp / 2^e ≤ 1``;
    2. ``exp(v) = φ^(2^e)`` by ``2^e − 1`` *one-sided* compositions
       ``T_{j+1} = T_j ∘ φ``: the sampled *values* ``u_j`` grow toward
       ``max_disp``, but the sampling *offset* is always ``u_φ`` (≤ 1
       voxel), so radius 1 suffices throughout.

    Squarings whose input displacement is bounded by ``taylor_threshold``
    voxels use the second-order expansion ``u ∘ (id+u) ≈ u + J_u u``
    (analytic stencil Jacobian) instead of a warp: at sub-voxel offsets the
    analytic gradient is MORE accurate than trilinear interpolation
    (measured vs per-voxel RK4 flow integration: mean err 0.04876 vs
    0.04893 voxels with all squarings in Taylor form) and ~3× cheaper.

    ``taylor_compositions`` selects the phase-2 step implementation:

    * ``"split"`` (default): dimensional splitting — three sequential
      per-axis 2-tap linear interpolations (ops/stencil.py::
      split_compose_step; Pallas kernels on TPU,
      ops/pallas_split_warp.py).  Each pass is a convex combination (max
      principle → unconditionally stable for the same clamped
      ``|u_φ| ≤ 1`` offsets as the warp) and the cross-term splitting
      error is the same ``O(|∂²d|·|u_φ|²)`` order as the blend's own
      interpolation error.  Measured at 128³: 27.5 vs 20.4 samples/sec
      (+34%) with seed-replicated quality parity (BASELINE.md round 3).
    * ``False`` / ``"warp"``: radius-1 blend warps (Pallas kernels on
      TPU) — exact trilinear, 27-tap, measured 28.7% of the HBM roofline
      (VPU-compute-bound) while carrying 28.6% of device time.
    * ``True`` / ``"taylor"``: the pure second-order expansion
      ``d' = u_φ + d + (u_φ·∇)d`` with ``e`` raised until
      ``|u_φ| ≤ taylor_threshold`` (falls back to warps if ``no_steps``
      can't reach it).  KEPT FOR THE RECORD: at the e-raised offsets it
      measured neutral-to-slower (19.85 vs 20.42 samples/sec at 128³),
      and at warp-split offsets (threshold 1.0) its one-sided ``(u·∇)d``
      is anti-upwind for positive offsets — end-to-end it folds the
      transformation at 128³ (BASELINE.md round 3).  Do not use it for
      real runs.

    ``max_disp`` is the assumed bound on the total displacement magnitude
    (voxels/axis); beyond it the offsets saturate — detected and surfaced
    by the ``sat`` counter in ``engine.vi.forward_sample``.
    """

    def __init__(self, dims, no_steps: int = 12, max_disp: int = 8, use_gather: bool = False,
                 taylor_threshold: float = 0.5, unroll: int | bool | None = None,
                 taylor_compositions: bool | str | None = None,
                 compute_dtype: str | None = None):
        self.dims = tuple(int(d) for d in dims)
        self.no_steps = int(no_steps)
        self.max_disp = int(max_disp)
        self.use_gather = bool(use_gather)
        # optional reduced-precision compute for the squaring phase: the
        # sub-voxel Taylor scan is HBM-bandwidth-bound (fwd + analytic-VJP
        # backward both stream the (3, D, H, W) carry), so bf16 halves its
        # traffic.  The displacement magnitudes in this phase are <= 1 voxel
        # and the scan is followed by f32 compositions, so the error budget
        # is the bf16 mantissa (2^-8 relative) on a sub-voxel field.
        # ``None`` (default) resolves per backend at trace time like
        # ``unroll``: bfloat16 on TPU — measured 29.3 → 38.5 samples/sec at
        # 128³ with seed-replicated quality parity (Dice 0.9743±0.0004,
        # disp err 0.799, calibration 0.477 — BASELINE.md round 3) — and
        # float32 elsewhere (CPU gains nothing and the tests' oracle
        # tolerances assume f32).  "float32" / "bfloat16" force it.
        if compute_dtype not in (None, "float32", "bfloat16"):
            raise ValueError(
                f"compute_dtype must be None (auto: bfloat16 on TPU), "
                f"'float32' or 'bfloat16'; got {compute_dtype!r}")
        self._compute_dtype_cfg = compute_dtype
        # scan unroll factor for the integration loops: reverse-mode AD
        # through lax.scan stacks each step's residuals with
        # dynamic-update-slices and reads them back with dynamic-slices —
        # 13% of device time in the round-2 trace.  Unrolling turns the
        # residuals into plain SSA buffers (no slicing traffic) at the cost
        # of a longer compile; True = fully unroll.  ``None`` (default)
        # resolves per backend at trace time: fully unrolled on TPU
        # (measured 18.7 → 20.1 samples/sec at 128³; compiles are one-off
        # and cached), scan on CPU (full unrolling costs 130 s+ compiles at
        # 128³; partial unroll=4 measured SLOWER than the scan — the
        # chunked residual slicing fuses worse than either extreme).
        self.unroll = unroll
        self.taylor_threshold = float(taylor_threshold)
        # phase-2 step implementation (see the class docstring); bool /
        # None accepted for config back-compat.  Default: 'split' — +34%
        # samples/sec over the blend kernels at 128³ with seed-replicated
        # quality parity (Dice 0.9744±0.0004 vs 0.9752±0.0004, disp err
        # 0.800 vs 0.798, calibration 0.478 vs 0.479 — BASELINE.md r3)
        if taylor_compositions is None:
            form = "split"
        elif taylor_compositions is False:
            form = "warp"
        elif taylor_compositions is True:
            form = "taylor"
        else:
            form = str(taylor_compositions)
        if form not in ("warp", "taylor", "split"):
            raise ValueError(
                f"taylor_compositions must be one of False/'warp', "
                f"True/'taylor', 'split'; got {taylor_compositions!r}")
        # split point: e squarings are replaced by 2^e one-sided
        # compositions.  'warp' and 'split' run at offset <= 1 voxel
        # (clamped identically); the pure-Taylor form raises e until the
        # composition offset |u_phi| <= max_disp / 2^e sits under
        # taylor_threshold.
        bound = (min(self.taylor_threshold, 1.0)
                 if form == "taylor" and self.taylor_threshold > 0 else 1.0)
        e = 0
        if self.max_disp > bound:
            ratio = int(math.ceil(self.max_disp / bound - 1e-9))
            e = (ratio - 1).bit_length()
        if form == "taylor" and (e > self.no_steps
                                 or self.taylor_threshold <= 0):
            # not enough steps to reach a sub-threshold offset (or Taylor
            # disabled outright) — fall back to the warp-composition split
            form = "warp"
            e = min(self.no_steps,
                    max(0, (self.max_disp - 1).bit_length()))
        e = min(self.no_steps, e)
        self.composition_form = form
        self.taylor_compositions = form == "taylor"
        self.no_squarings = self.no_steps - e
        self.no_compositions = 2 ** e
        # image-cascade grouping ('pre' scheme only): the image is not
        # smooth, so it composes by radius-1 WARPS regardless — and must
        # not pay the raised Taylor e in resample count (each resample
        # low-passes the image; BASELINE.md round 3).  It warps by the
        # increment ψ = φ^m (displacement d_m from the chain, |d_m| ≤ 1)
        # every m = 2^(e-e_img) Taylor steps: 2^e_img resamples total,
        # identical to the warp-composition split.
        e_img = min(self.no_steps, max(0, (self.max_disp - 1).bit_length()))
        self.no_image_compositions = 2 ** min(e, e_img)
        # where each configured path actually CLAMPS (consumed by the
        # engine's saturation guard, engine/vi.py): 'warp' and 'split'
        # compositions clamp the displacement at |u_φ| > 1, i.e.
        # |d| > 2^e; the pure-Taylor chain never clamps the displacement —
        # its error just grows past the threshold (graceful, second-order)
        # — so only the IMAGE warp clamps there: the grouped ψ-cascade
        # ('pre' scheme, radius 1 per 2^(e-e_img) steps) at |d| > 2^e_img,
        # or the block-gather overflow ('post' scheme), which counts itself.
        self.displacement_clamp_bound = (float("inf") if form == "taylor"
                                         else float(self.no_compositions))
        self.image_clamp_bound = float(self.no_image_compositions)
        # squaring k sees |u| <= max_disp / 2^(S-k); Taylor while under the
        # threshold (validated at 0.5 vox against the RK4 ground truth)
        self.no_taylor = sum(
            1 for k in range(self.no_squarings)
            if self.max_disp / 2 ** (self.no_steps - k) <= self.taylor_threshold
        )

    def __call__(self, v: jnp.ndarray):
        transformation, disp, _ = self.integrate(v, im=None)
        return transformation, disp

    @property
    def _unroll(self):
        """Trace-time resolution of the backend-dependent default."""
        if self.unroll is None:
            return jax.default_backend() == "tpu"
        return self.unroll

    @property
    def compute_dtype(self):
        """Squaring-phase dtype (``None`` = f32), backend-resolved."""
        if self._compute_dtype_cfg is None:
            return (jnp.dtype(jnp.bfloat16)
                    if jax.default_backend() == "tpu" else None)
        if self._compute_dtype_cfg == "float32":
            return None
        return jnp.dtype(self._compute_dtype_cfg)

    @property
    def id_grid(self):
        # built lazily so a jitted caller gets symbolic iotas, not a
        # closed-over literal (192 MB of HLO at 256³ — see identity_grid)
        return identity_grid(self.dims)

    def integrate(self, v: jnp.ndarray, im: jnp.ndarray | None = None):
        """Integrate ``v``; optionally warp ``im`` by the transformation.

        Returns ``(transformation, displacement, im_warped)``.

        Phase 1 (squarings) builds ``u_φ`` with ``T ∘ T`` at radius 1; the
        image is untouched (3-channel warps).  Phase 2 applies ``2^e − 1``
        one-sided compositions ``T_{j+1} = T_j ∘ φ`` — the displacement and
        the image are warped by the *same* ≤1-voxel offset ``u_φ``, so one
        fused 4-channel blend shares the weight computation; induction from
        ``u_1 = u_φ, g_1 = im ∘ φ`` gives ``g_N = im ∘ φ^N = im ∘ exp(v)``
        exactly (no trailing ``T_0`` factor — the earlier ride-the-squaring
        cascade was off by one application of ``id + v/2^S``).

        Both loops are ``lax.scan`` with a backend-resolved unroll (see
        ``__init__``): fully unrolled on TPU where the scan's residual
        stacking costs 12% of device time, scan-rolled on CPU where a fully
        unrolled warp graph fuses into one enormous XLA module (130s+
        compiles).  No ``jax.checkpoint``: warp_bounded's analytic VJP
        keeps only its inputs as residuals, which are exactly the scan
        carries — remat would add a recompute pass for nothing.
        """
        if self.use_gather:
            transformation, disp = self._call_gather(v)
            warped = None
            if im is not None:
                warped = grid_sample(im, transformation, mode="linear")
            return transformation, disp, warped

        disp = v / float(2 ** self.no_steps)  # voxel units
        if self.compute_dtype is not None:
            # run the sub-voxel squaring scans in reduced precision; the
            # cast's transpose re-casts the incoming cotangent on the way
            # back into the scan, so the backward rides bf16 too
            disp = disp.astype(self.compute_dtype)
        if self.no_taylor:
            def taylor_squaring(d, _):
                # u ∘ (id+u) ≈ u + J_u u, exact for linear fields (tests
                # pin the orientation).  Stays on XLA deliberately: a fused
                # Pallas version (windowed z-halo DMA, in-register shifts,
                # analytic transpose) measured 4.05/2.36 ms fwd/bwd per
                # 128³ step vs XLA's 1.45/1.7 — Mosaic per-slice overhead
                # dominates this low-arithmetic stencil, and in-scan XLA
                # fuses it to ~0.9 ms fwd+bwd.  The step uses the
                # Jacobian-free custom-VJP form (ops/stencil.py) so
                # autodiff never stores the 9-channel J as a residual.
                return taylor_squaring_step(d), None

            disp, _ = jax.lax.scan(taylor_squaring, disp, None,
                                   length=self.no_taylor, unroll=self._unroll)
        if self.no_squarings - self.no_taylor:
            if self.compute_dtype is not None:
                disp = disp.astype(jnp.float32)  # blend kernels are f32

            def squaring(d, _):
                return d + warp_bounded(d, d, 1), None

            disp, _ = jax.lax.scan(squaring, disp, None,
                                   length=self.no_squarings - self.no_taylor,
                                   unroll=self._unroll)
        if self.compute_dtype is not None and self.composition_form == "warp":
            # the radius-1 blend kernels are f32; the split/taylor stencils
            # are dtype-generic, so those composition scans ride the reduced
            # precision too (the phase is bandwidth-bound — bf16 halves the
            # kernels' DMA traffic; outputs are cast back below)
            disp = disp.astype(jnp.float32)
        u_phi = disp  # |u_phi| <= max_disp / 2^e <= 1 voxel by assumption
        N = self.no_compositions

        if self.composition_form == "split":
            # dimensional splitting: three per-axis 2-tap lerps, convex per
            # voxel (stable), XLA-fused at HBM speed — replaces the 27-tap
            # blend kernel that measured 28.7% of the roofline
            def dstep_one(d):
                return split_compose_step(d, u_phi)
        elif self.composition_form == "taylor":
            # d_{j+1} = u_φ + d_j ∘ (id+u_φ) in second-order Taylor form —
            # |u_φ| <= taylor_threshold by the choice of e (UNSTABLE
            # end-to-end at warp-split offsets; see the class docstring)
            def dstep_one(d):
                return taylor_compose_step(d, u_phi)
        else:
            def dstep_one(d):
                return u_phi + warp_bounded(d, u_phi, 1)

        g = None
        if im is None:
            if N > 1:
                def compose(d, _):
                    return dstep_one(d), None

                disp, _ = jax.lax.scan(compose, u_phi, None, length=N - 1,
                                       unroll=self._unroll)
        elif self.composition_form in ("taylor", "split"):
            # displacement composes in Taylor form; the image (not smooth —
            # no valid Taylor expansion) rides as radius-1 warps by the
            # grouped increment ψ = φ^m, keeping its resample count at the
            # warp-composition split's 2^e_img (see __init__)
            K = self.no_image_compositions
            m = N // K

            def dstep(d, _):
                return dstep_one(d), None

            u_psi = u_phi
            if m > 1:
                u_psi, _ = jax.lax.scan(dstep, u_phi, None, length=m - 1,
                                        unroll=self._unroll)
            disp = u_psi
            # the IMAGE rides exact f32 blend warps regardless of the
            # displacement compositions' compute dtype (the likelihood is
            # sensitive to the image's resample fidelity — BASELINE.md r3,
            # anchored-residual finding)
            u_psi32 = u_psi.astype(jnp.float32)
            g = warp_bounded(im[None] if im.ndim == 3 else im, u_psi32, 1)
            if K > 1:
                def compose_tg(state, _):
                    d, gg = state
                    d, _ = jax.lax.scan(dstep, d, None, length=m,
                                        unroll=self._unroll)
                    return (d, warp_bounded(gg, u_psi32, 1)), None

                (disp, g), _ = jax.lax.scan(compose_tg, (u_psi, g), None,
                                            length=K - 1,
                                            unroll=self._unroll)
            g = g[0] if im.ndim == 3 else g
        else:
            g0 = im[None] if im.ndim == 3 else im
            g = warp_bounded(g0, u_phi, 1)  # g_1 = im ∘ φ
            if N > 1:
                # carry [d | g] as ONE array so the scan body is a single
                # fused warp plus one add — no per-step concat/split
                u_phi_g = jnp.concatenate(
                    [u_phi, jnp.zeros_like(g)], axis=0)

                def compose_im(state, _):
                    return warp_bounded(state, u_phi, 1) + u_phi_g, None

                state0 = jnp.concatenate([u_phi, g], axis=0)
                state, _ = jax.lax.scan(compose_im, state0, None,
                                        length=N - 1, unroll=self._unroll)
                disp, g = state[:3], state[3:]
            g = g[0] if im.ndim == 3 else g
        disp = disp.astype(jnp.float32)  # outputs are always f32
        transformation = self.id_grid + voxel_to_normalised(disp)
        return transformation, disp, g

    def _call_gather(self, v: jnp.ndarray):
        """Reference formulation (gather-based grid_sample); kept for parity
        testing and non-TPU backends."""
        disp0 = voxel_to_normalised(v) / float(2 ** self.no_steps)
        id_grid = self.id_grid

        def squaring_step(disp, _):
            transformation = id_grid + disp
            disp = disp + grid_sample(disp, transformation, mode="linear")
            return disp, None

        disp, _ = jax.lax.scan(squaring_step, disp0, None, length=self.no_steps)
        transformation = id_grid + disp
        return transformation, normalised_to_voxel(disp)


class SVF2D:
    """2D stationary velocity field (scaling and squaring).

    Reference: /root/reference/utils/transformation.py:23-48 (``SVF_2D``,
    used by its debug plots and tests).  2D fields are small, so the
    gather-based formulation is used directly.
    """

    def __init__(self, dims, no_steps: int = 12):
        self.dims = tuple(int(d) for d in dims)  # (H, W)
        self.no_steps = int(no_steps)
        H, W = self.dims
        x = jnp.linspace(-1.0, 1.0, W, dtype=jnp.float32)
        y = jnp.linspace(-1.0, 1.0, H, dtype=jnp.float32)
        yy, xx = jnp.meshgrid(y, x, indexing="ij")
        self.id_grid = jnp.stack([xx, yy], axis=0)

    def _vox_to_norm(self, field):
        H, W = self.dims
        scale = jnp.array([2.0 / (W - 1), 2.0 / (H - 1)], jnp.float32)
        return field * scale.reshape(2, 1, 1)

    def __call__(self, v: jnp.ndarray):
        """``v``: ``(2, H, W)`` voxel-unit velocity ->
        (transformation [-1,1], displacement voxels)."""
        disp = self._vox_to_norm(v) / float(2 ** self.no_steps)

        def squaring_step(disp, _):
            disp = disp + grid_sample_2d(disp, self.id_grid + disp, mode="linear")
            return disp, None

        disp, _ = jax.lax.scan(squaring_step, disp, None, length=self.no_steps)
        transformation = self.id_grid + disp
        H, W = self.dims
        scale = jnp.array([(W - 1) / 2.0, (H - 1) / 2.0], jnp.float32)
        return transformation, disp * scale.reshape(2, 1, 1)


class BSplineFFD3D:
    """Cubic B-spline FFD: dense field from control points (no integration).

    Reference: /root/reference/utils/transformation.py:126-153.  There the
    forward returns only the dense field, which makes the registry-allowed
    standalone configuration unusable by the reference's own trainer (it
    unpacks ``(transformation, displacement)``).  Here the standalone model
    is a first-class *displacement* parameterisation: ``__call__`` treats
    the spread field as a voxel-unit displacement and returns
    ``(transformation, displacement)`` like every other transformation
    model; :meth:`dense_velocity` exposes the raw field for SVFFD
    composition (where it is a velocity to be integrated).
    """

    def __init__(self, dims, cps):
        self.dims = tuple(int(d) for d in dims)
        self.cps = tuple(int(c) for c in cps)
        self.control_dims = control_grid_size(self.dims, self.cps)
        self._ffd = CubicBSplineFFD3D(self.dims, self.cps)

    @property
    def id_grid(self):
        # lazy like SVF3D.id_grid: jitted callers see symbolic iotas, not
        # a closed-over dense literal
        return identity_grid(self.dims)

    def dense_velocity(self, cp: jnp.ndarray) -> jnp.ndarray:
        return self._ffd(cp)

    def __call__(self, cp: jnp.ndarray):
        disp = self._ffd(cp)
        transformation = self.id_grid + voxel_to_normalised(disp)
        return transformation, disp


class SVFFD3D:
    """B-spline-parameterised SVF: spread control points, then integrate.

    Reference: /root/reference/utils/transformation.py:156-164.
    """

    def __init__(self, dims, cps, no_steps: int = 12, max_disp: int = 8, use_gather: bool = False,
                 taylor_threshold: float = 0.5, unroll: int | bool | None = None,
                 taylor_compositions: bool | str | None = None,
                 compute_dtype: str | None = None):
        self.dims = tuple(int(d) for d in dims)
        self.cps = tuple(int(c) for c in cps)
        self.ffd = BSplineFFD3D(dims, cps)
        self.svf = SVF3D(dims, no_steps, max_disp=max_disp, use_gather=use_gather,
                         taylor_threshold=taylor_threshold, unroll=unroll,
                         taylor_compositions=taylor_compositions,
                         compute_dtype=compute_dtype)
        self.max_disp = self.svf.max_disp
        self.displacement_clamp_bound = self.svf.displacement_clamp_bound
        self.image_clamp_bound = self.svf.image_clamp_bound
        self.use_gather = self.svf.use_gather
        self.control_dims = self.ffd.control_dims

    def __call__(self, cp: jnp.ndarray):
        return self.svf(self.ffd.dense_velocity(cp))

    def integrate(self, cp: jnp.ndarray, im: jnp.ndarray | None = None):
        return self.svf.integrate(self.ffd.dense_velocity(cp), im)


def make_transformation(kind: str, dims, cps=None, no_steps: int = 12, max_disp: int = 8, use_gather: bool = False,
                        taylor_threshold: float = 0.5, unroll: int | bool = False,
                        taylor_compositions: bool | str | None = None,
                        compute_dtype: str | None = None):
    """Factory used by the config layer (types mirror the reference names)."""
    if kind in ("SVF_3D", "SVF3D"):
        return SVF3D(dims, no_steps, max_disp=max_disp, use_gather=use_gather,
                     taylor_threshold=taylor_threshold, unroll=unroll,
                     taylor_compositions=taylor_compositions,
                     compute_dtype=compute_dtype)
    if kind in ("SVF_2D", "SVF2D"):
        return SVF2D(dims, no_steps)
    if kind in ("SVFFD_3D", "SVFFD3D"):
        assert cps is not None, "SVFFD requires control point spacing (cps)"
        return SVFFD3D(dims, cps, no_steps, max_disp=max_disp, use_gather=use_gather,
                       taylor_threshold=taylor_threshold, unroll=unroll,
                       taylor_compositions=taylor_compositions,
                       compute_dtype=compute_dtype)
    if kind in ("Cubic_B_spline_FFD_3D", "BSplineFFD3D"):
        assert cps is not None
        return BSplineFFD3D(dims, cps)
    raise ValueError(f"unknown transformation model: {kind}")
