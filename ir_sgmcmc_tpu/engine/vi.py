"""Variational-inference engine: one fully-jitted ELBO step + scan loops.

Re-architecture of the reference VI hot loop (/root/reference/trainer/
trainer.py:79-170).  The whole iteration — antithetic sampling, Sobolev
smoothing, SVF integration, warping, LCC residuals, virtual decimation, the
*interleaved detached GMM Adam steps*, the ELBO, and all three optimizer
updates — is one pure function ``(state) -> (state, metrics)`` scanned on
device with ``lax.scan``.  The reference runs 2 forward passes and 3
backward passes per iteration through the Python/eager torch stack; here XLA
sees the whole iteration and fuses it.

Gradient-flow invariants kept from the reference:
* GMM updates see *detached* residuals (trainer.py:68-77);
* the data term for q(v) uses the *post-update* GMM parameters (the
  ``_step_GMM`` call precedes the data term, trainer.py:99-101);
* the VD factor is a constant (no_grad, trainer.py:507-514);
* Sobolev smoothing backpropagates identity (utils/functions.py:98-109).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.entropy import entropy_analytic, entropy_sample
from ..models.gmm import GMM
from ..models.reg_loss import RegLossL2, RegLossLogNormal
from ..models.sampler import sample_q_v
from ..ops.grids import det_jacobian, voxel_to_normalised
from ..ops.resample import (
    block_residual_overflow,
    grid_sample,
    warp_block_gather,
    warp_bounded,
)
from ..ops.stencil import gradient
from .bundle import ModelBundle


class VIState(NamedTuple):
    q_v: dict
    gmm: dict
    reg: dict
    opt_q_v: Any
    opt_gmm: Any
    opt_reg: Any
    key: jax.Array
    step: jnp.ndarray


def count_folds(transformation: jnp.ndarray) -> jnp.ndarray:
    """Number of voxels where the transformation is non-diffeomorphic.

    Equivalent to the reference's NaN-count of log|J|
    (utils/util.py:209-212) without materialising the log.  Boundary
    semantics match the reference exactly: ``log(det)`` is NaN only for
    *strictly negative* determinants (``log(0) = -inf``, which is not
    NaN-counted), so the guard fires on ``det < 0``, not ``det <= 0``.
    """
    jac = gradient(transformation, normalised_spacing=True)
    return jnp.sum(det_jacobian(jac) < 0.0)


def forward_sample(bundle: ModelBundle, fixed: dict, moving: dict, v_unsmoothed, key,
                   anchor: dict | None = None, anchor_radius: int = 2):
    """Shared forward chain: smooth -> integrate+warp -> residuals.

    Mirrors trainer.py:81-96 (VI) / :292-307 (MCMC).  On the TPU hot path
    the moving image is warped *through the squaring cascade*
    (``SVF3D.integrate`` — exact, and every warp is a small-radius
    shift-and-blend); the reference's uniform transformation noise
    (utils/util.py:44-53) becomes a final radius-1 jitter warp, i.e. the
    U(-α, α) voxel noise perturbs the pre-transform sampling position
    instead of the post-transform one — the same-scale regulariser (the two
    differ by the local Jacobian, ≈ identity for diffeomorphic fields).

    ``anchor`` (``noise_scheme='post'`` MCMC only): per-chunk anchored
    residual warping.  Instead of one global gather per sample (XLA TPU
    gathers run far from roofline — BASELINE.md round 3), the chunk entry
    precomputes ``W0 = moving ∘ T0`` (one gather) and each step warps the
    *anchored* image with the small residual ``δ' = J0⁻¹ (d - d0 + noise)``
    via the bounded-blend kernel: ``W0(x + δ'(x)) = moving(T0(x + δ')) ≈
    moving(T(x) + noise)`` to second order in the residual.  Quality sits
    between the exact single-gather path (one resample) and the cascade
    path (one resample of a once-resampled image); residuals are clamped at
    ``anchor_radius`` voxels and clamped voxels are surfaced through the
    ``sat`` guard channel.
    """
    v = bundle.smooth(v_unsmoothed)
    integrate = getattr(bundle.transformation, "integrate", None)
    post_noise = (
        bundle.uniform_noise_alpha is not None
        and getattr(bundle, "noise_scheme", "pre") == "post"
    )
    anchored = (
        anchor is not None
        and integrate is not None
        and not getattr(bundle.transformation, "use_gather", False)
        and getattr(bundle, "noise_scheme", "pre") == "post"
    )
    anchor_sat = jnp.zeros((), jnp.int32)
    if anchored:
        transformation, displacement, _ = integrate(v, im=None)
        delta = displacement - anchor["d0"]
        if bundle.uniform_noise_alpha is not None:
            alpha = bundle.uniform_noise_alpha
            delta = delta + jax.random.uniform(
                key, delta.shape, delta.dtype, -alpha, alpha)
        # into the anchor's source frame: T0(x + δ') ≈ T0(x) + J0 δ'
        delta = jnp.einsum("cd...,d...->c...", anchor["Jinv"], delta)
        if "GW0" in anchor:
            # Taylor form: W0 ∘ (id + δ') ≈ W0 + ∇W0 · δ' — the analytic
            # stencil gradient is a better-conditioned slope estimator
            # than the trilinear cell slope at the near-knot positions the
            # anchored residual lives at (same reasoning as the cascade's
            # sub-voxel Taylor squarings, models/transformation.py:119-128);
            # accuracy needs |δ'| ≲ 1, enforced by the re-anchor period +
            # the clamp below
            delta = jnp.clip(delta, -anchor_radius, anchor_radius)
            w0 = anchor["W0"]
            squeeze_w = w0.ndim == 3
            if squeeze_w:
                w0 = w0[None]
            warped = w0 + jnp.einsum("cd...,d...->c...", anchor["GW0"], delta)
            if squeeze_w:
                warped = warped[0]
        else:
            warped = warp_bounded(anchor["W0"], delta, anchor_radius)
        anchor_sat = jnp.sum(jnp.any(
            jnp.abs(jax.lax.stop_gradient(delta)) >= anchor_radius, axis=0))
    elif (integrate is not None
            and not getattr(bundle.transformation, "use_gather", False)
            and not post_noise):
        transformation, displacement, warped = integrate(v, im=moving["im"])
        if bundle.uniform_noise_alpha is not None:
            alpha = bundle.uniform_noise_alpha
            noise = jax.random.uniform(
                key, (3,) + warped.shape[-3:], warped.dtype, -alpha, alpha)
            # blend radius covers the configured magnitude (alpha > 1 must
            # not silently truncate the noise to ±1 voxel)
            warped = warp_bounded(warped, noise, max(1, -int(-float(alpha) // 1)))
    elif integrate is not None and post_noise and not getattr(
            bundle.transformation, "use_gather", False):
        # exact reference noise semantics on the bounded path: integrate the
        # displacement cascade without the image (cheap — all small radii),
        # then ONE single-resample warp at T + noise (utils/util.py:44-53).
        # The warp runs as a block-gather (one coarse window gather + an
        # in-block residual blend, ops/resample.py) — exact trilinear and
        # ~20× faster on TPU than the per-voxel gather, which XLA lowers to
        # a serialized ~2M-index path; overflowing block residuals are
        # clamped and counted into ``sat``
        transformation, displacement, _ = integrate(v, im=None)
        alpha = bundle.uniform_noise_alpha
        noise = jax.random.uniform(
            key, transformation.shape, transformation.dtype, -alpha, alpha)
        max_disp = getattr(bundle.transformation, "max_disp", None)
        block = int(getattr(bundle, "block_size", 8))
        # the block decomposition needs the field to be smooth at the
        # block scale: require >= 8 blocks per axis (at small volumes the
        # per-voxel gather is cheap anyway, and an 8³ block spanning half
        # a 16³ volume would overflow the residual radius everywhere)
        if (getattr(bundle, "block_warp", True) and max_disp is not None
                and all(s % block == 0 and s >= 8 * block
                        for s in bundle.dims)):
            d_total = displacement + noise
            radius = int(getattr(bundle, "block_radius", 2))
            bound = int(-(-float(max_disp + alpha) // 1))
            warped = warp_block_gather(moving["im"], d_total, bound,
                                       radius, block)
            anchor_sat = block_residual_overflow(
                jax.lax.stop_gradient(d_total), bound, radius, block)
        else:
            t = transformation + voxel_to_normalised(noise)
            warped = grid_sample(moving["im"], t, mode="linear")
    else:
        transformation, displacement = bundle.transformation(v)
        t = transformation
        if bundle.uniform_noise_alpha is not None:
            alpha = bundle.uniform_noise_alpha
            noise = jax.random.uniform(
                key, t.shape, t.dtype, -alpha, alpha)
            t = t + voxel_to_normalised(noise)
        warped = grid_sample(moving["im"], t, mode="linear")
    ndv = count_folds(jax.lax.stop_gradient(transformation))
    residuals = bundle.gmm.residual_map(fixed["im"], warped)
    # displacement-saturation detector (bounded-warp hot path only): voxels
    # whose displacement reaches the ``max_disp`` blend bound were silently
    # clamped inside ``warp_bounded`` — the posterior is wrong there.  The
    # count is surfaced like ``ndv`` so the trainer can warn/abort with
    # guidance to raise ``max_disp`` or fall back to ``use_gather``.
    max_disp = getattr(bundle.transformation, "max_disp", None)
    if max_disp is not None and not getattr(bundle.transformation, "use_gather", False):
        d = jax.lax.stop_gradient(displacement)
        # The count must track where the configured path ACTUALLY clamps
        # — comparing against max_disp itself would both over-count for
        # non-power-of-two max_disp (ADVICE r2) and UNDER-count when
        # no_steps caps e below ceil(log2(max_disp)).  Phase-2 blend warps
        # clamp the displacement at |u_phi| > 1, i.e. |d| > no_compositions
        # = 2^e; with ``taylor_compositions`` the displacement path never
        # clamps (displacement_clamp_bound = inf — its Taylor error grows
        # gracefully instead), so only the image warp's clamping counts:
        # the 'pre' cascade at |d| > image_clamp_bound here, the 'post'
        # block-gather overflow via ``anchor_sat`` above.
        tr = bundle.transformation
        default_bound = float(2 ** max(0, (int(max_disp) - 1).bit_length()))
        if post_noise or anchored:
            clamp_bound = float(getattr(
                tr, "displacement_clamp_bound",
                getattr(tr, "no_compositions", default_bound)))
        else:
            clamp_bound = float(getattr(
                tr, "image_clamp_bound",
                getattr(tr, "no_compositions", default_bound)))
        if math.isinf(clamp_bound):
            sat = jnp.zeros((), jnp.int32)
        else:
            sat = jnp.sum(jnp.any(jnp.abs(d) >= clamp_bound, axis=0))
    else:
        sat = jnp.zeros((), jnp.int32)
    sat = sat + anchor_sat
    return {
        "v": v,
        "transformation": transformation,
        "displacement": displacement,
        "warped": warped,
        "residuals": residuals,
        "ndv": ndv,
        "sat": sat,
        # breakdown for the trainer's guard message: the RESIDUAL-window
        # component (anchored-residual clamp or block-gather in-block
        # overflow) names a different recovery lever than the displacement
        # clamp bound — raising ``max_disp`` does not move it
        "sat_resid": anchor_sat,
    }


def gmm_adam_step(bundle: ModelBundle, opt, gmm, opt_gmm, residuals, mask, alpha):
    """One detached GMM Adam step (trainer.py:68-77)."""
    res_d = jax.lax.stop_gradient(residuals)

    def gmm_loss(p):
        return bundle.gmm.masked_nll(p, res_d, mask) * alpha - bundle.gmm_prior_terms(p)

    grads = jax.grad(gmm_loss)(gmm)
    updates, opt_gmm = opt.update(grads, opt_gmm, gmm)
    return optax.apply_updates(gmm, updates), opt_gmm


def vd_alpha(bundle: ModelBundle, gmm, residuals, mask):
    if not bundle.virtual_decimation:
        return jnp.asarray(1.0, jnp.float32)
    return bundle.gmm.vd_alpha(gmm, residuals, mask)


def make_vi_step(bundle: ModelBundle, opt_q_v, opt_gmm, opt_reg, fixed: dict, moving: dict,
                 remat: bool = False):
    """Build the jitted VI step ``(VIState) -> (VIState, metrics)``.

    ``remat``: run the two antithetic forward chains *sequentially* —
    ``lax.scan`` over the stacked chains with ``jax.checkpoint`` on the
    body — instead of as one batch-2 vmapped pass.  Scan's reverse-mode
    processes iterations one at a time, so the backward pass recomputes
    each chain's interior (Sobolev, integration cascade, warp, LCC)
    alone instead of holding both alive: at 256³ the batched step needs
    17.5 GB of activations (over one 16 GB v5e chip) while the scan-remat
    step fits and runs at 0.834 iters/sec, for ~1.3× forward FLOPs.  Same
    math, same PRNG draws, same GMM update order — only the activation
    schedule changes.
    """
    reg_loss = bundle.reg_loss
    learnable_reg = reg_loss.learnable and len(reg_loss.param_names) > 0

    def loss_fn(diff_params, gmm, opt_gmm_state, keys):
        q_v, reg_p = diff_params
        s1, s2 = sample_q_v(keys[0], q_v, antithetic=True)
        mask = fixed["mask"]

        # The two antithetic forward chains are GMM-independent — the
        # reference's interleaved detached GMM Adam steps (trainer.py:68-77,
        # :99) only consume each sample's *residuals* — so the expensive part
        # (Sobolev smoothing, SVF integration, warp, LCC residuals, the
        # regulariser stencil, the entropy quadratic term) runs as ONE
        # batch-2 vmapped pass; the strictly sequential per-sample GMM
        # updates and VD/data terms are applied afterwards, unchanged in
        # order and gradient flow.
        def fwd(v_sample, key):
            out = forward_sample(bundle, fixed, moving, v_sample, key)
            reg, log_y = reg_loss(reg_p, out["v"])
            ent = entropy_sample(v_sample, q_v["mu"], q_v["log_var"], q_v["u"])
            return out, jnp.sum(reg), log_y, ent

        if remat:
            # lax.scan over the two chains, checkpoint on the body: scan's
            # reverse-mode processes iterations strictly sequentially, so
            # only ONE chain's rematerialised interior is live at a time.
            # (Two independent jax.checkpoint calls are NOT enough — XLA
            # co-schedules their transposes and the peak is the same as the
            # batched pass; measured 22.2 GB vs batched 17.5 GB at 256³.)
            fwd_ckpt = jax.checkpoint(lambda _, sk: (None, fwd(*sk)))
            _, (outs, regs, log_ys, ents) = jax.lax.scan(
                fwd_ckpt, None,
                (jnp.stack([s1, s2]), jnp.stack([keys[1], keys[2]])),
            )
        else:
            outs, regs, log_ys, ents = jax.vmap(fwd)(
                jnp.stack([s1, s2]), jnp.stack([keys[1], keys[2]])
            )

        datas, alphas = [], []
        for i in range(2):
            res = outs["residuals"][i]
            a = vd_alpha(bundle, gmm, res, mask)
            gmm, opt_gmm_state = gmm_adam_step(
                bundle, opt_gmm, gmm, opt_gmm_state, res, mask, a
            )
            datas.append(bundle.gmm.masked_nll(gmm, res, mask) * a)
            alphas.append(a)

        data_term = 0.5 * (datas[0] + datas[1]) - bundle.gmm_prior_terms(gmm)
        reg_term = 0.5 * (regs[0] + regs[1])
        if learnable_reg and isinstance(reg_loss, RegLossLogNormal):
            reg_term -= 0.5 * (jnp.sum(bundle.reg_loc_prior(log_ys[0]))
                               + jnp.sum(bundle.reg_loc_prior(log_ys[1])))
            reg_term -= jnp.sum(bundle.reg_scale_prior(reg_p["log_scale"]))
        elif learnable_reg and isinstance(reg_loss, RegLossL2):
            reg_term -= jnp.sum(bundle.reg_w_reg_prior(reg_p["log_w_reg"]))

        entropy_term = 0.5 * (ents[0] + ents[1]) + entropy_analytic(
            q_v["log_var"], q_v["u"]
        )
        loss = data_term + reg_term - entropy_term

        metrics = {
            "data_term": data_term,
            "reg_term": reg_term,
            "entropy_term": entropy_term,
            "total_loss": loss,
            "vd_alpha": alphas[0],
            "reg_energy": jnp.exp(log_ys[0]).reshape(()),
            "ndv": outs["ndv"][0],
            "sat": outs["sat"][0],
            "sat_resid": outs["sat_resid"][0],
        }
        return loss, (gmm, opt_gmm_state, metrics)

    def step(state: VIState, _=None):
        key, k1, k2, k3 = jax.random.split(state.key, 4)
        grads, (gmm, opt_gmm_state, metrics) = jax.grad(loss_fn, has_aux=True)(
            (state.q_v, state.reg), state.gmm, state.opt_gmm, (k1, k2, k3)
        )
        g_q_v, g_reg = grads

        upd_q_v, opt_q_v_state = opt_q_v.update(g_q_v, state.opt_q_v, state.q_v)
        q_v = optax.apply_updates(state.q_v, upd_q_v)

        reg_p, opt_reg_state = state.reg, state.opt_reg
        if learnable_reg:
            upd_reg, opt_reg_state = opt_reg.update(g_reg, state.opt_reg, state.reg)
            reg_p = optax.apply_updates(state.reg, upd_reg)

        # largest voxel-wise L2-norm update per variational parameter
        # (utils/util.py:281-295)
        for name in ("mu", "log_var", "u"):
            old_n = jnp.linalg.norm(state.q_v[name], axis=0)
            new_n = jnp.linalg.norm(q_v[name], axis=0)
            metrics[f"max_update_{name}"] = jnp.max(jnp.abs(new_n - old_n))

        metrics["gmm_scales"] = GMM.scales(gmm)
        metrics["gmm_proportions"] = GMM.proportions(gmm)

        new_state = VIState(
            q_v=q_v,
            gmm=gmm,
            reg=reg_p,
            opt_q_v=opt_q_v_state,
            opt_gmm=opt_gmm_state,
            opt_reg=opt_reg_state,
            key=key,
            step=state.step + 1,
        )
        return new_state, metrics

    return step


def make_vi_chunk(step_fn, chunk: int, *, step_builder=None, images=None,
                  raw: bool = False):
    """Scan ``chunk`` VI steps on device, returning stacked per-step metrics.

    Large-volume mode: pass ``step_builder`` (``(fixed, moving) → step_fn``)
    plus ``images=(fixed, moving)`` instead of a prebuilt ``step_fn`` — the
    image pair then enters the jitted module as PARAMETERS rather than
    closed-over literals (a 256³ pair embeds ~134 MB of dense constants in
    the StableHLO, overflowing the remote-compile transport; see
    ``engine.mcmc.make_mcmc_chunk``).

    ``raw``: return the untraced ``(state, fixed, moving) -> (state,
    metrics)`` runner (requires ``step_builder``) for composition under an
    outer transform — see ``engine.pairs``.
    """
    if raw:
        if step_builder is None:
            raise ValueError("raw=True requires step_builder")

        def run_raw(state: VIState, fixed, moving):
            return jax.lax.scan(step_builder(fixed, moving), state, None,
                                length=chunk)

        return run_raw

    if step_builder is None:
        def run(state: VIState):
            return jax.lax.scan(step_fn, state, None, length=chunk)

        return jax.jit(run, donate_argnums=0)

    def run_params(state: VIState, fixed, moving):
        return jax.lax.scan(step_builder(fixed, moving), state, None,
                            length=chunk)

    jit_run = jax.jit(run_params, donate_argnums=0)
    fixed, moving = images
    return lambda state: jit_run(state, fixed, moving)


def gmm_warmup(bundle: ModelBundle, opt_gmm, state: VIState, fixed, moving, no_steps: int = 25):
    """Data-driven GMM init + warm-up (trainer.py:529-547).

    Draws one q(v) sample, computes residuals, spreads the component scales
    over the residual std-dev, then takes ``no_steps`` detached Adam steps.
    The images are jit parameters (not baked literals) so the warmup module
    stays small at large volumes.
    """

    @jax.jit
    def _init(state: VIState, fixed, moving):
        key, k_s, k_n = jax.random.split(state.key, 3)
        v = sample_q_v(k_s, state.q_v)
        out = forward_sample(bundle, fixed, moving, v, k_n)
        res, mask = out["residuals"], fixed["mask"]
        n = jnp.sum(mask)
        mean = jnp.sum(jnp.where(mask, res, 0.0)) / n
        var = jnp.sum(jnp.where(mask, (res - mean) ** 2, 0.0)) / (n - 1)
        sigma = jnp.sqrt(var)
        gmm = bundle.gmm.init_scales_from_residual_std(state.gmm, sigma)
        alpha = vd_alpha(bundle, gmm, res, mask)

        def body(carry, _):
            gmm, opt_state = carry
            gmm, opt_state = gmm_adam_step(bundle, opt_gmm, gmm, opt_state, res, mask, alpha)
            return (gmm, opt_state), None

        (gmm, opt_state), _ = jax.lax.scan(
            body, (gmm, state.opt_gmm), None, length=no_steps
        )
        return state._replace(gmm=gmm, opt_gmm=opt_state, key=key)

    return _init(state, fixed, moving)
