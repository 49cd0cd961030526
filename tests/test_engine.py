"""Engine-level tests: ELBO optimisation and SGLD sampling on synthetic pairs.

These are the trainer-level tests the reference lacks (SURVEY.md §4):
* VI: the ELBO improves and alignment (in-graph Dice) increases on a
  translated-sphere pair.
* MCMC: chains stay finite, diffeomorphic, and reduce the data term; the
  Welford posterior statistics match a direct sample computation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ir_sgmcmc_tpu.data import sphere_pair
from ir_sgmcmc_tpu.engine import (
    ModelBundle,
    VIState,
    gmm_warmup,
    init_chains,
    make_mcmc_chunk,
    make_vi_chunk,
    make_vi_step,
    posterior_statistics,
)
from ir_sgmcmc_tpu.engine.mcmc import (
    WelfordState,
    welford_finalize,
    welford_init,
    welford_merge,
    welford_update,
)
from ir_sgmcmc_tpu.models import GMM, DirichletPrior, LogScaleNormalPrior, SVF3D
from ir_sgmcmc_tpu.models.reg_loss import RegLossL2
from ir_sgmcmc_tpu.optim import adam_decay


DIMS = (12, 12, 12)


def _make_bundle(dims=DIMS, vd=False, noise=None):
    return ModelBundle(
        dims=dims,
        gmm=GMM(no_components=2, s=1),
        scale_prior=LogScaleNormalPrior(loc=0.0, scale=2.3),
        proportion_prior=DirichletPrior(2, alpha=0.5),
        reg_loss=RegLossL2(w_reg=1.0, dims=dims, learnable=False),
        transformation=SVF3D(dims),
        sobolev_s=2,
        sobolev_lambda=0.5,
        uniform_noise_alpha=noise,
        virtual_decimation=vd,
    )


def _data(dims=DIMS, offset=(0.0, 0.0, 2.0)):
    fixed, moving = sphere_pair(dims, offset=offset)
    to_j = lambda d: {k: jnp.asarray(v) for k, v in d.items()}
    return to_j(fixed), to_j(moving)


def _init_state(bundle, key=0):
    opt_q_v = adam_decay({"mu": 0.02, "log_var": 0.02, "u": 0.02}, 0.001)
    opt_gmm = adam_decay(0.2, 0.001)
    opt_reg = adam_decay(0.01, 0.001)
    q_v = bundle.init_q_v(sigma_v_init=0.2, u_v_init=0.05)
    gmm = bundle.gmm.init_params()
    reg = bundle.reg_loss.init_params()
    state = VIState(
        q_v=q_v,
        gmm=gmm,
        reg=reg,
        opt_q_v=opt_q_v.init(q_v),
        opt_gmm=opt_gmm.init(gmm),
        opt_reg=opt_reg.init(reg),
        key=jax.random.PRNGKey(key),
        step=jnp.zeros((), jnp.int32),
    )
    return state, (opt_q_v, opt_gmm, opt_reg)


def _dice(seg_a, seg_b, label=1):
    a = np.asarray(seg_a) == label
    b = np.asarray(seg_b) == label
    return 2.0 * (a & b).sum() / (a.sum() + b.sum())


def test_vi_improves_elbo_and_alignment():
    bundle = _make_bundle()
    fixed, moving = _data()
    state, (opt_q_v, opt_gmm, opt_reg) = _init_state(bundle)

    state = gmm_warmup(bundle, opt_gmm, state, fixed, moving)
    step = make_vi_step(bundle, opt_q_v, opt_gmm, opt_reg, fixed, moving)
    chunk = make_vi_chunk(step, 40)

    state, m1 = chunk(state)
    state, m2 = chunk(state)

    loss_first = float(np.mean(np.asarray(m1["total_loss"])[:10]))
    loss_last = float(np.mean(np.asarray(m2["total_loss"])[-10:]))
    assert loss_last < loss_first, (loss_first, loss_last)
    assert np.isfinite(np.asarray(m2["total_loss"])).all()

    # alignment improves: warp the moving seg with the posterior-mean field
    from ir_sgmcmc_tpu.ops import warp

    v = bundle.smooth(state.q_v["mu"])
    T, _ = bundle.transformation(v)
    warped_seg = warp(moving["seg"], T, method="nearest")
    dice_before = _dice(fixed["seg"], moving["seg"])
    dice_after = _dice(fixed["seg"], warped_seg)
    assert dice_after > dice_before + 0.05, (dice_before, dice_after)


def test_vi_remat_step_matches_batched():
    """vi_remat (sequential antithetic chains under jax.checkpoint) is an
    activation-schedule change only: same PRNG draws, same GMM update order,
    same math — trajectories must match the batched step to fp tolerance."""
    bundle = _make_bundle(vd=True, noise=0.05)
    fixed, moving = _data()
    state, (opt_q_v, opt_gmm, opt_reg) = _init_state(bundle)
    state = gmm_warmup(bundle, opt_gmm, state, fixed, moving)

    step_b = make_vi_step(bundle, opt_q_v, opt_gmm, opt_reg, fixed, moving)
    step_r = make_vi_step(bundle, opt_q_v, opt_gmm, opt_reg, fixed, moving,
                          remat=True)
    s_b, m_b = make_vi_chunk(step_b, 6)(jax.tree.map(jnp.copy, state))
    s_r, m_r = make_vi_chunk(step_r, 6)(jax.tree.map(jnp.copy, state))

    np.testing.assert_allclose(np.asarray(m_b["total_loss"]),
                               np.asarray(m_r["total_loss"]), rtol=2e-4)
    for name in ("mu", "log_var", "u"):
        np.testing.assert_allclose(np.asarray(s_b.q_v[name]),
                                   np.asarray(s_r.q_v[name]),
                                   rtol=1e-3, atol=1e-4)


def test_vi_with_vd_and_uniform_noise_runs():
    bundle = _make_bundle(vd=True, noise=0.05)
    fixed, moving = _data()
    state, (opt_q_v, opt_gmm, opt_reg) = _init_state(bundle)
    state = gmm_warmup(bundle, opt_gmm, state, fixed, moving)
    step = make_vi_step(bundle, opt_q_v, opt_gmm, opt_reg, fixed, moving)
    chunk = make_vi_chunk(step, 5)
    state, metrics = chunk(state)
    alphas = np.asarray(metrics["vd_alpha"])
    assert np.isfinite(alphas).all() and (alphas > 0).all() and (alphas <= 1).all()
    assert np.isfinite(np.asarray(metrics["total_loss"])).all()


def test_vi_learnable_lognormal_reg():
    from ir_sgmcmc_tpu.models import LogEnergyExpGammaPrior
    from ir_sgmcmc_tpu.models.reg_loss import RegLossLogNormal

    dims = DIMS
    bundle = _make_bundle()
    dof = 3.0 * np.prod(dims)
    bundle.reg_loss = RegLossLogNormal(w_reg=1.4, dims=dims, learnable=True)
    bundle.reg_loc_prior = LogEnergyExpGammaPrior(w_reg=1.4, dof=dof)
    bundle.reg_scale_prior = LogScaleNormalPrior(loc=2.8, scale=5.0)

    fixed, moving = _data()
    opt_q_v = adam_decay({"mu": 0.02, "log_var": 0.02, "u": 0.02}, 0.001)
    opt_gmm = adam_decay(0.2, 0.001)
    opt_reg = adam_decay({"loc": 0.01, "log_scale": 0.01}, 0.001)
    q_v = bundle.init_q_v(0.2, 0.05)
    gmm = bundle.gmm.init_params()
    reg = bundle.reg_loss.init_params()
    state = VIState(
        q_v, gmm, reg,
        opt_q_v.init(q_v), opt_gmm.init(gmm), opt_reg.init(reg),
        jax.random.PRNGKey(1), jnp.zeros((), jnp.int32),
    )
    state = gmm_warmup(bundle, opt_gmm, state, fixed, moving)
    step = make_vi_step(bundle, opt_q_v, opt_gmm, opt_reg, fixed, moving)
    chunk = make_vi_chunk(step, 10)
    new_state, metrics = chunk(state)
    assert np.isfinite(np.asarray(metrics["total_loss"])).all()
    # reg params actually moved
    assert float(jnp.abs(new_state.reg["loc"] - reg["loc"])) > 0


# ---- Welford ---------------------------------------------------------------


def test_welford_matches_direct_stats():
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((20, 3, 4, 4, 4)).astype(np.float32)
    w = welford_init((3, 4, 4, 4))
    for x in xs:
        w = welford_update(w, jnp.asarray(x), jnp.asarray(1.0))
    mean, std = welford_finalize(w)
    np.testing.assert_allclose(np.asarray(mean), xs.mean(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(std), xs.std(0, ddof=1), atol=1e-5)


def test_welford_gating_skips_samples():
    xs = np.arange(10, dtype=np.float32)
    w = welford_init(())
    for i, x in enumerate(xs):
        w = welford_update(w, jnp.asarray(x), jnp.asarray(float(i % 2 == 0)))
    mean, _ = welford_finalize(w)
    np.testing.assert_allclose(float(mean), xs[::2].mean(), atol=1e-6)


def test_welford_merge_matches_pooled():
    rng = np.random.default_rng(1)
    xs = rng.standard_normal((2, 15, 5)).astype(np.float32)
    ws = []
    for c in range(2):
        w = welford_init((5,))
        for x in xs[c]:
            w = welford_update(w, jnp.asarray(x), jnp.asarray(1.0))
        ws.append(w)
    stacked = jax.tree.map(lambda *l: jnp.stack(l), *ws)
    merged = welford_merge(stacked)
    mean, std = welford_finalize(merged)
    pooled = xs.reshape(-1, 5)
    np.testing.assert_allclose(np.asarray(mean), pooled.mean(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(std), pooled.std(0, ddof=1), atol=1e-4)


# ---- MCMC -------------------------------------------------------------------


@pytest.mark.parametrize("init_mode", ["VI", "identity", "noise"])
def test_mcmc_runs_and_collects(init_mode):
    bundle = _make_bundle()
    fixed, moving = _data()
    opt_gmm = adam_decay(0.2, 0.001)
    opt_reg = adam_decay(0.01, 0.001)
    q_v = bundle.init_q_v(0.1, 0.01)

    state = init_chains(
        bundle, jax.random.PRNGKey(2), no_chains=2, mode=init_mode,
        q_v=q_v, gmm=bundle.gmm.init_params(), reg=bundle.reg_loss.init_params(),
        opt_gmm=opt_gmm, opt_reg=opt_reg,
    )
    chunk = make_mcmc_chunk(
        bundle, opt_gmm, opt_reg, tau=1e-4, fixed=fixed, moving=moving,
        chunk=12, burn_in=4, thin=2,
    )
    state, metrics = chunk(state)
    assert np.isfinite(np.asarray(metrics["data_term"])).all()
    assert metrics["data_term"].shape == (12, 2)  # (steps, chains)
    # collected (12-4)/2 = 4 samples per chain
    np.testing.assert_allclose(np.asarray(state.welford.count), 4.0)
    mean, std = posterior_statistics(state)
    assert mean.shape == (3,) + DIMS
    assert np.isfinite(np.asarray(mean)).all() and np.isfinite(np.asarray(std)).all()


def test_mcmc_reduces_data_term_from_identity():
    bundle = _make_bundle()
    fixed, moving = _data()
    opt_gmm = adam_decay(0.2, 0.001)
    opt_reg = adam_decay(0.01, 0.001)

    state = init_chains(
        bundle, jax.random.PRNGKey(3), no_chains=2, mode="identity",
        q_v=None, gmm=bundle.gmm.init_params(), reg=bundle.reg_loss.init_params(),
        opt_gmm=opt_gmm, opt_reg=opt_reg,
    )
    chunk = make_mcmc_chunk(
        bundle, opt_gmm, opt_reg, tau=5e-4, fixed=fixed, moving=moving,
        chunk=60, burn_in=50, thin=2,
    )
    state, metrics = chunk(state)
    d = np.asarray(metrics["data_term"])
    assert np.isfinite(d).all()
    assert d[-5:].mean() < d[:5].mean()
    assert np.asarray(metrics["ndv"]).max() == 0  # stays diffeomorphic


def test_forward_sample_saturation_counter():
    """The hot path counts voxels whose displacement reaches ``max_disp``
    (silently clamped by the bounded warp); small fields report zero."""
    from dataclasses import replace

    from ir_sgmcmc_tpu.engine.vi import forward_sample

    bundle_small = _make_bundle()  # max_disp=8
    bundle_tight = replace(bundle_small, transformation=SVF3D(DIMS, max_disp=2))
    fixed, moving = _data()
    key = jax.random.PRNGKey(0)

    v_small = jnp.full((3,) + DIMS, 0.2, jnp.float32)
    assert int(forward_sample(bundle_small, fixed, moving, v_small, key)["sat"]) == 0

    # 6-voxel translation >> max_disp=2: most voxels saturate
    v_big = jnp.full((3,) + DIMS, 6.0, jnp.float32)
    sat = int(forward_sample(bundle_tight, fixed, moving, v_big, key)["sat"])
    assert sat > 0.5 * np.prod(DIMS)

    # the gather path is unbounded -> never reports saturation
    bundle_gather = replace(
        bundle_small, transformation=SVF3D(DIMS, max_disp=2, use_gather=True))
    assert int(forward_sample(bundle_gather, fixed, moving, v_big, key)["sat"]) == 0

    # Taylor-form compositions never clamp the DISPLACEMENT (the stencil
    # error grows gracefully instead of truncating) — under the 'post'
    # scheme the only clamping surface is the block warp (which counts its
    # own overflow; at these tiny dims it falls back to the unbounded
    # grid_sample), so the guard must not fire on |d| alone
    tr_taylor = SVF3D(DIMS, no_steps=8, max_disp=2, taylor_compositions=True)
    assert tr_taylor.displacement_clamp_bound == float("inf")
    bundle_taylor = replace(bundle_tight, transformation=tr_taylor,
                            uniform_noise_alpha=0.05, noise_scheme="post")
    assert int(forward_sample(bundle_taylor, fixed, moving, v_big, key)["sat"]) == 0
    # …but in the 'pre' scheme the grouped ψ-cascade DOES clamp the image
    # at |d| > no_image_compositions — the count must survive there
    bundle_taylor_pre = replace(bundle_taylor, noise_scheme="pre")
    assert tr_taylor.image_clamp_bound == float(tr_taylor.no_image_compositions)
    sat_pre = int(forward_sample(bundle_taylor_pre, fixed, moving, v_big, key)["sat"])
    assert sat_pre > 0.5 * np.prod(DIMS)


def test_shared_vs_per_chain_param_schemes_agree():
    """Validation of the round-1 design deviation: per-chain GMM/reg params
    updated in parallel (this engine's default) vs the reference's ONE
    shared set receiving sequential per-chain Adam steps
    (/root/reference/trainer/trainer.py:316-327).  Same init, same SGLD
    noise streams; the pooled posterior displacement statistics must agree
    closely — the schemes differ only in the GMM parameter dynamics."""
    bundle = _make_bundle(vd=True)
    fixed, moving = _data()
    opt_gmm = adam_decay(0.2, 0.001)
    opt_reg = adam_decay(0.01, 0.001)

    results = {}
    for mode in ("per_chain", "shared"):
        state = init_chains(
            bundle, jax.random.PRNGKey(5), no_chains=2, mode="identity",
            q_v=None, gmm=bundle.gmm.init_params(),
            reg=bundle.reg_loss.init_params(),
            opt_gmm=opt_gmm, opt_reg=opt_reg, param_mode=mode)
        chunk = make_mcmc_chunk(
            bundle, opt_gmm, opt_reg, tau=5e-4, fixed=fixed, moving=moving,
            chunk=40, burn_in=10, thin=1, param_mode=mode)
        state, metrics = chunk(state)
        mean, std = posterior_statistics(state)
        results[mode] = (np.asarray(mean), np.asarray(std),
                         np.asarray(metrics["data_term"]))

    m_pc, s_pc, d_pc = results["per_chain"]
    m_sh, s_sh, d_sh = results["shared"]
    assert np.isfinite(d_sh).all() and np.isfinite(d_pc).all()
    # the data terms track each other through the whole run
    np.testing.assert_allclose(d_pc[-5:].mean(), d_sh[-5:].mean(), rtol=0.05)
    # pooled posterior mean/std maps agree to a small fraction of the
    # displacement scale (~the SGLD noise floor)
    scale = max(float(np.abs(m_pc).max()), 1e-3)
    assert float(np.abs(m_pc - m_sh).max()) < 0.1 * scale + 0.02
    assert float(np.abs(s_pc - s_sh).max()) < 0.1 * float(s_pc.max()) + 0.02


def test_pre_vs_post_transform_noise_discrepancy():
    """Validation of the round-1 design deviation (VERDICT missing #2): the
    hot path jitters the already-warped image (noise in the PRE-transform
    sampling position) where the reference perturbs the transformation
    (POST-transform, /root/reference/utils/util.py:44-53).

    Measured (round 2, 24^3 textured sphere, |disp| <= ~2.5 voxels,
    alpha=0.5): the schemes coincide EXACTLY at T = identity, but on a
    realistic field the pointwise noise-induced discrepancy is the same
    order as the noise's own effect (ratio ~0.8) — voxel-scale texture
    decorrelates the two sampling-position dithers entirely.  Both schemes
    dither with the same amplitude (the statistical role of the noise), but
    pointwise reference parity needs the opt-in ``noise_scheme='post'``
    (exercised in test_post_noise_scheme_matches_reference_semantics)."""
    from ir_sgmcmc_tpu.ops.grids import identity_grid, voxel_to_normalised
    from ir_sgmcmc_tpu.ops.resample import grid_sample, warp_bounded

    dims = (24, 24, 24)
    fixed, moving = _data(dims, offset=(0, 0, 2))
    im = jnp.asarray(moving["im"])
    alpha = 0.5
    noise = jax.random.uniform(
        jax.random.PRNGKey(1), (3,) + dims, jnp.float32, -alpha, alpha)

    # T = identity: the two schemes are the same operation
    T_id = identity_grid(dims)
    post_id = grid_sample(im, T_id + voxel_to_normalised(noise))
    pre_id = warp_bounded(im, noise, 1)
    np.testing.assert_allclose(np.asarray(post_id), np.asarray(pre_id), atol=1e-5)

    # realistic field: record the discrepancy against each scheme's own
    # no-noise baseline; it is bounded by (is the same order as) the
    # noise's own effect, not orders larger
    bundle = _make_bundle(dims)
    v = bundle.smooth(2.5 * jax.random.normal(jax.random.PRNGKey(0), (3,) + dims))
    svf = SVF3D(dims)
    T, disp, g = svf.integrate(v, im=im)

    post0 = grid_sample(im, T)
    post = grid_sample(im, T + voxel_to_normalised(noise))
    pre = warp_bounded(g, noise, 1)

    effect = np.abs(np.asarray(post) - np.asarray(post0))
    dnoise = np.abs(np.asarray(post - post0) - np.asarray(pre - g))
    ratio = dnoise.mean() / max(effect.mean(), 1e-8)
    assert ratio < 1.5, f"noise-scheme discrepancy ratio {ratio:.3f}"
    # the noise amplitude delivered by both schemes matches
    pre_effect = np.abs(np.asarray(pre) - np.asarray(g))
    amp_ratio = pre_effect.mean() / max(effect.mean(), 1e-8)
    assert 0.5 < amp_ratio < 2.0, f"noise amplitude ratio {amp_ratio:.3f}"


def test_post_noise_scheme_matches_reference_semantics():
    """``noise_scheme='post'`` reproduces the reference's transformation
    noise EXACTLY on the bounded hot path: forward_sample's warped image
    equals grid_sample(moving, T + U(-a,a)) with the same key."""
    from dataclasses import replace

    from ir_sgmcmc_tpu.engine.vi import forward_sample
    from ir_sgmcmc_tpu.ops.grids import voxel_to_normalised
    from ir_sgmcmc_tpu.ops.resample import grid_sample

    bundle = replace(_make_bundle(noise=0.2), noise_scheme="post")
    fixed, moving = _data()
    key = jax.random.PRNGKey(3)
    v = jnp.asarray(
        np.random.default_rng(0).standard_normal((3,) + DIMS), jnp.float32)

    out = forward_sample(bundle, fixed, moving, v, key)

    T, disp = bundle.transformation(bundle.smooth(v))
    noise = jax.random.uniform(key, T.shape, T.dtype, -0.2, 0.2)
    expected = grid_sample(
        moving["im"], T + voxel_to_normalised(noise), mode="linear")
    np.testing.assert_allclose(np.asarray(out["warped"]),
                               np.asarray(expected), atol=1e-5)


# ---- anchored residual warping ---------------------------------------------


def test_anchored_forward_matches_exact_post_warp():
    """Anchored residual warping (engine/mcmc.py make_chain_anchor):
    at the anchor point the warp is EXACT (δ=0 blend is the identity on
    W0 = moving ∘ T0); a small velocity perturbation reproduces the exact
    single-gather warp to interpolation order."""
    from dataclasses import replace

    from ir_sgmcmc_tpu.engine.mcmc import make_chain_anchor
    from ir_sgmcmc_tpu.engine.vi import forward_sample
    from ir_sgmcmc_tpu.ops.resample import grid_sample

    bundle = replace(_make_bundle(noise=None), noise_scheme="post")
    fixed, moving = _data()
    key = jax.random.PRNGKey(4)
    v0 = jnp.asarray(
        0.5 * np.random.default_rng(1).standard_normal((3,) + DIMS),
        jnp.float32)

    T0, _, _ = bundle.transformation.integrate(bundle.smooth(v0), im=None)
    exact0 = grid_sample(moving["im"], T0, mode="linear")
    v1 = v0 + 0.3
    T1, _, _ = bundle.transformation.integrate(bundle.smooth(v1), im=None)
    exact1 = grid_sample(moving["im"], T1, mode="linear")

    # blend mode resamples W0 trilinearly; taylor mode expands W0 + ∇W0·δ
    # (looser forward tolerance, better-behaved gradient — BASELINE.md r3)
    for mode, ratio in (("blend", 0.4), ("taylor", 0.55)):
        anchor = make_chain_anchor(bundle, moving, anchor_mode=mode)(v0)

        # at the anchor: bit-for-bit the single gather warp
        out0 = forward_sample(bundle, fixed, moving, v0, key, anchor=anchor)
        np.testing.assert_allclose(np.asarray(out0["warped"]),
                                   np.asarray(exact0), atol=1e-5)

        # off the anchor (≈0.3-voxel residual): tracks the exact gather
        # warp several times closer than a frozen anchor; the floor is the
        # second resample / first-order expansion, not the residual frame
        out1 = forward_sample(bundle, fixed, moving, v1, key, anchor=anchor)
        err_anchored = np.abs(np.asarray(out1["warped"]) - np.asarray(exact1))
        err_frozen = np.abs(np.asarray(out0["warped"]) - np.asarray(exact1))
        assert err_anchored.mean() < ratio * err_frozen.mean(), mode
        assert err_anchored.max() < 0.2, mode  # unit-intensity image


def test_anchored_residual_saturation_surfaces_in_sat():
    """Residuals beyond ``anchor_radius`` are clamped by the bounded blend
    and must be counted in the ``sat`` guard channel."""
    from dataclasses import replace

    from ir_sgmcmc_tpu.engine.mcmc import make_chain_anchor
    from ir_sgmcmc_tpu.engine.vi import forward_sample

    bundle = replace(_make_bundle(noise=None), noise_scheme="post")
    fixed, moving = _data()
    key = jax.random.PRNGKey(5)
    v0 = jnp.zeros((3,) + DIMS, jnp.float32)
    anchor = make_chain_anchor(bundle, moving)(v0)

    # 3-voxel translation off a zero anchor >> radius 1: most voxels clamp
    v_far = jnp.full((3,) + DIMS, 3.0, jnp.float32)
    out = forward_sample(bundle, fixed, moving, v_far, key,
                         anchor=anchor, anchor_radius=1)
    assert int(out["sat"]) > 0.5 * np.prod(DIMS)
    # with a radius that covers the residual, no clamping is reported
    out_ok = forward_sample(bundle, fixed, moving, v_far, key,
                            anchor=anchor, anchor_radius=4)
    assert int(out_ok["sat"]) == 0


def test_anchored_mcmc_chunk_tracks_unanchored():
    """An anchored post-noise MCMC chunk stays finite and tracks the exact
    (per-step gather) chunk's data term — the anchored likelihood is a
    controlled approximation, re-anchored each chunk."""
    from dataclasses import replace

    bundle = replace(_make_bundle(vd=True, noise=0.1), noise_scheme="post")
    fixed, moving = _data()
    opt_gmm = adam_decay(0.2, 0.001)
    opt_reg = adam_decay(0.01, 0.001)

    results = {}
    for anchored in (False, True):
        state = init_chains(
            bundle, jax.random.PRNGKey(6), no_chains=2, mode="identity",
            q_v=None, gmm=bundle.gmm.init_params(),
            reg=bundle.reg_loss.init_params(),
            opt_gmm=opt_gmm, opt_reg=opt_reg)
        chunk = make_mcmc_chunk(
            bundle, opt_gmm, opt_reg, tau=5e-4, fixed=fixed, moving=moving,
            chunk=30, burn_in=10, thin=1, anchored=anchored, anchor_radius=2)
        state, metrics = chunk(state)
        mean, std = posterior_statistics(state)
        results[anchored] = (np.asarray(metrics["data_term"]),
                             np.asarray(mean), np.asarray(std))

    d_exact, m_exact, s_exact = results[False]
    d_anch, m_anch, s_anch = results[True]
    assert np.isfinite(d_anch).all()
    # identical SGLD noise streams, near-identical likelihoods: the data
    # terms track closely through the run
    rel = np.abs(d_anch - d_exact) / np.abs(d_exact)
    assert rel.mean() < 0.05, f"mean relative data-term gap {rel.mean():.3f}"
    np.testing.assert_allclose(m_anch, m_exact, atol=0.15)
