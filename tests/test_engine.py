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
