"""Probabilistic layer: GMM, reg losses, entropy, distributions, VD, sampler.

The reference has no tests for any of this (SURVEY.md §4); oracles here are
independent scipy/closed-form implementations of the same math.
"""

import math

import numpy as np
import scipy.special
import scipy.stats

import jax
import jax.numpy as jnp

from ir_sgmcmc_tpu.models import (
    GMM,
    DirichletPrior,
    LogEnergyExpGammaPrior,
    LogScaleNormalPrior,
    RegLossL2,
    RegLossLogNormal,
    RegLossStudent,
    entropy_analytic,
    entropy_sample,
    sample_q_v,
)
from ir_sgmcmc_tpu.models.distributions import (
    expgamma_expectation,
    expgamma_log_pdf,
    gamma_log_pdf,
    normal_log_pdf,
)


# ---- distributions ---------------------------------------------------------


def test_normal_log_pdf_matches_scipy():
    x = np.linspace(-3, 3, 7)
    ours = np.asarray(normal_log_pdf(jnp.asarray(x), 0.5, math.log(2.0)))
    theirs = scipy.stats.norm.logpdf(x, loc=0.5, scale=2.0)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_gamma_log_pdf_matches_scipy():
    x = np.array([0.1, 1.0, 5.0, 20.0])
    shape, rate = 2.5, 1.3
    ours = np.asarray(gamma_log_pdf(jnp.log(x), shape, rate))
    theirs = scipy.stats.gamma.logpdf(x, a=shape, scale=1.0 / rate)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_expgamma_log_pdf_is_gamma_with_change_of_variables():
    # if X = log Z, p_X(x) = p_Z(e^x) * e^x
    x = np.array([-1.0, 0.0, 1.0])
    shape, rate = 3.0, 0.7
    ours = np.asarray(expgamma_log_pdf(jnp.asarray(x), shape, rate))
    theirs = scipy.stats.gamma.logpdf(np.exp(x), a=shape, scale=1.0 / rate) + x
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_expgamma_expectation_matches_digamma():
    val = float(expgamma_expectation(4.0, 2.0))
    assert abs(val - (scipy.special.digamma(4.0) - np.log(2.0))) < 1e-6


def test_dirichlet_prior_matches_scipy():
    p = np.array([0.2, 0.3, 0.5])
    prior = DirichletPrior(3, alpha=0.5)
    ours = float(prior(jnp.log(p)))
    theirs = scipy.stats.dirichlet.logpdf(p, [0.5, 0.5, 0.5])
    # the reference omits nothing here: full normalised log pdf
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_log_scale_normal_prior():
    prior = LogScaleNormalPrior(loc=0.0, scale=2.3)
    ours = float(prior(jnp.asarray(1.0)))
    theirs = scipy.stats.norm.logpdf(1.0, 0.0, 2.3)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_log_energy_expgamma_prior_expectation():
    dof = 3.0 * 16**3
    prior = LogEnergyExpGammaPrior(w_reg=1.4, dof=dof)
    expected = scipy.special.digamma(dof / 2) - np.log(1.4 / 2)
    np.testing.assert_allclose(float(prior.expectation()), expected, rtol=1e-6)


# ---- GMM -------------------------------------------------------------------


def _gmm_oracle_logpdf(z, logits, log_std):
    # scipy mixture oracle
    logp = scipy.special.log_softmax(logits + 1e-2)
    comp = np.stack(
        [scipy.stats.norm.logpdf(z, 0.0, np.exp(ls)) + lp for lp, ls in zip(logp, log_std)]
    )
    return scipy.special.logsumexp(comp, axis=0)


def test_gmm_log_pdf_matches_scipy_mixture():
    gmm = GMM(no_components=3, s=1)
    params = {
        "logits": jnp.asarray([0.1, -0.2, 0.4]),
        "log_std": jnp.asarray([-1.0, 0.0, 1.0]),
    }
    z = np.linspace(-4, 4, 11).astype(np.float32)
    ours = np.asarray(gmm.log_pdf(params, jnp.asarray(z)))
    theirs = _gmm_oracle_logpdf(z, np.array([0.1, -0.2, 0.4]), np.array([-1.0, 0.0, 1.0]))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_gmm_residual_map_zero_for_identical_images():
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.random((8, 8, 8)), dtype=jnp.float32)
    gmm = GMM(4, s=1)
    res = np.asarray(gmm.residual_map(im, im))
    np.testing.assert_allclose(res, 0.0, atol=1e-5)


def test_gmm_init_scales_spread():
    gmm = GMM(4, s=1)
    params = gmm.init_scales_from_residual_std(gmm.init_params(), jnp.asarray(2.0))
    scales = np.asarray(GMM.scales(params))
    np.testing.assert_allclose(scales[0], 0.02, rtol=1e-5)  # sigma/100
    np.testing.assert_allclose(scales[-1], 10.0, rtol=1e-5)  # 5*sigma
    assert np.all(np.diff(np.log(scales)) > 0)


def test_gmm_masked_nll_equals_subset_nll():
    gmm = GMM(2, s=1)
    params = gmm.init_params()
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((6, 6, 6)), dtype=jnp.float32)
    mask = jnp.asarray(rng.random((6, 6, 6)) > 0.3)
    nll = float(gmm.masked_nll(params, z, mask))
    lp = np.asarray(gmm.log_pdf(params, z))
    np.testing.assert_allclose(nll, -lp[np.asarray(mask)].sum(), rtol=1e-5)


def test_vd_factor_in_unit_interval_and_iid_near_one():
    # iid residuals decorrelate -> VD factor ≈ 1 (clamped at 1)
    rng = np.random.default_rng(2)
    res = jnp.asarray(rng.standard_normal((1, 24, 24, 24)), dtype=jnp.float32)
    mask = jnp.ones_like(res, dtype=bool)
    alpha = float(GMM.vd_factor(res, mask))
    assert 0.9 <= alpha <= 1.0


def test_vd_factor_smooth_residuals_below_one():
    # heavily smoothed residuals are spatially correlated -> alpha << 1
    from ir_sgmcmc_tpu.ops import separable_conv3d

    rng = np.random.default_rng(3)
    res = jnp.asarray(rng.standard_normal((24, 24, 24)), dtype=jnp.float32)
    res = separable_conv3d(res, jnp.ones(7) / 7.0)[None]
    mask = jnp.ones_like(res, dtype=bool)
    alpha = float(GMM.vd_factor(res, mask))
    assert 0.0 < alpha < 0.5


def test_rescale_residuals_matches_manual_gradient():
    """The VD rescaling is sum_k z_k ∂(-log p)/∂z_k; for a single-component
    GMM this reduces to z² (since -log p = z²/2 + const)."""
    gmm = GMM(1, s=1)
    params = gmm.init_params()
    rng = np.random.default_rng(4)
    res = jnp.asarray(rng.standard_normal((4, 4, 4)), dtype=jnp.float32)
    mask = jnp.ones_like(res, dtype=bool)
    out = np.asarray(gmm.rescale_residuals(params, res, mask))
    np.testing.assert_allclose(out, np.asarray(res) ** 2, rtol=1e-5, atol=1e-6)


# ---- reg losses -------------------------------------------------------------


def test_reg_loss_l2_closed_form():
    dims = (6, 6, 6)
    loss = RegLossL2(w_reg=2.0, dims=dims)
    params = loss.init_params()
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.standard_normal((3,) + dims), dtype=jnp.float32)
    val, log_y = loss(params, v)
    from ir_sgmcmc_tpu.ops import reg_energy

    y = float(reg_energy(v))
    dof = 3.0 * 6**3
    expected = 0.5 * 2.0 * y - 0.5 * dof * math.log(2.0)
    np.testing.assert_allclose(float(val), expected, rtol=1e-4)
    np.testing.assert_allclose(float(log_y), math.log(y), rtol=1e-5)


def test_reg_loss_student_closed_form():
    dims = (4, 4, 4)
    loss = RegLossStudent(dims=dims, nu0=2.0, lambda0=1.0)
    v = jnp.ones((3,) + dims) * 0.1
    val, log_y = loss({}, v)
    from ir_sgmcmc_tpu.ops import reg_energy

    y = float(reg_energy(v))
    a0 = 1.0
    b0_twice = 2.0 * (a0 / 1.0)
    dof = 3.0 * 4**3
    np.testing.assert_allclose(float(val), math.log(b0_twice + y) * (a0 + dof / 2), rtol=1e-5)


def test_reg_loss_lognormal_init_and_loss():
    dims = (6, 6, 6)
    loss = RegLossLogNormal(w_reg=1.4, dims=dims, learnable=True)
    params = loss.init_params()
    dof = 3.0 * 6**3
    loc_expected = scipy.special.digamma(dof / 2) - np.log(0.7)
    np.testing.assert_allclose(float(params["loc"]), loc_expected, rtol=1e-5)
    np.testing.assert_allclose(
        float(params["log_scale"]), math.log(4.0) + math.log(loc_expected), rtol=1e-5
    )

    rng = np.random.default_rng(6)
    v = jnp.asarray(rng.standard_normal((3,) + dims), dtype=jnp.float32)
    val, log_y = loss(params, v)
    y = math.exp(float(log_y))
    ly = float(log_y)
    scale = math.exp(float(params["log_scale"]))
    mlog = ly + float(params["log_scale"]) + 0.5 * ((ly - float(params["loc"])) / scale) ** 2
    expected = mlog + (0.5 * dof - 1.0) * ly
    np.testing.assert_allclose(float(val), expected, rtol=1e-4)


def test_reg_loss_batched():
    dims = (4, 4, 4)
    loss = RegLossL2(w_reg=1.0, dims=dims)
    params = loss.init_params()
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.standard_normal((2, 3) + dims), dtype=jnp.float32)
    val, log_y = loss(params, v)
    assert val.shape == (2,)
    v0, _ = loss(params, v[0])
    np.testing.assert_allclose(float(val[0]), float(v0), rtol=1e-5)


# ---- entropy ----------------------------------------------------------------


def test_entropy_analytic_matches_dense_gaussian():
    """Compare against the exact entropy of N(0, diag(σ²)+uuᵀ) on a small
    problem (entropy = 0.5 log det(2πe Σ); the reference drops the constant)."""
    rng = np.random.default_rng(8)
    n = 3 * 2 * 2 * 2
    log_var = rng.standard_normal((3, 2, 2, 2)).astype(np.float32) * 0.3
    u = rng.standard_normal((3, 2, 2, 2)).astype(np.float32) * 0.5

    ours = float(entropy_analytic(jnp.asarray(log_var), jnp.asarray(u)))

    sigma2 = np.exp(log_var).reshape(-1)
    uu = u.reshape(-1)
    cov = np.diag(sigma2) + np.outer(uu, uu)
    half_logdet = 0.5 * np.linalg.slogdet(cov)[1]
    np.testing.assert_allclose(ours, half_logdet, rtol=1e-4)


def test_entropy_sample_is_half_mahalanobis():
    rng = np.random.default_rng(9)
    shape = (3, 2, 2, 2)
    mu = rng.standard_normal(shape).astype(np.float32)
    log_var = (rng.standard_normal(shape) * 0.2).astype(np.float32)
    u = (rng.standard_normal(shape) * 0.4).astype(np.float32)
    sample = rng.standard_normal(shape).astype(np.float32)

    ours = float(
        entropy_sample(jnp.asarray(sample), jnp.asarray(mu), jnp.asarray(log_var), jnp.asarray(u))
    )

    d = (sample - mu).reshape(-1)
    cov = np.diag(np.exp(log_var).reshape(-1)) + np.outer(u.reshape(-1), u.reshape(-1))
    expected = 0.5 * d @ np.linalg.solve(cov, d)
    np.testing.assert_allclose(ours, expected, rtol=1e-4)


# ---- sampler ----------------------------------------------------------------


def test_sample_q_v_antithetic_pair():
    key = jax.random.PRNGKey(0)
    q_v = {
        "mu": jnp.ones((3, 4, 4, 4)),
        "log_var": jnp.zeros((3, 4, 4, 4)),
        "u": jnp.full((3, 4, 4, 4), 0.1),
    }
    s1, s2 = sample_q_v(key, q_v, antithetic=True)
    np.testing.assert_allclose(np.asarray(s1 + s2) / 2.0, 1.0, atol=1e-6)


def test_sample_q_v_statistics():
    # moments of q(v): var = sigma² + u² (u scaled by a shared scalar x)
    q_v = {
        "mu": jnp.zeros((3, 4, 4, 4)),
        "log_var": jnp.full((3, 4, 4, 4), math.log(0.25)),
        "u": jnp.full((3, 4, 4, 4), 0.5),
    }
    keys = jax.random.split(jax.random.PRNGKey(1), 4000)
    samples = jax.vmap(lambda k: sample_q_v(k, q_v))(keys)
    var = np.asarray(samples).var()
    np.testing.assert_allclose(var, 0.25 + 0.25, rtol=0.1)


def test_sgld_samples_gaussian_stationary_distribution():
    """Preconditioned SGLD targets the right stationary distribution.

    For U(v) = v²/(2 s²) the update
        v' = v + sqrt(2 tau) sigma eps;  v_next = v' - tau sigma² U'(v')
    is the OU discretisation v_next = (1-a)(v + sqrt(2 tau) sigma eps) with
    a = tau sigma²/s², whose exact stationary variance is
    2 s² (1-a)² / (2-a)  (-> s² as tau -> 0).  The reference composes this
    update from an autograd Function + SGD (utils/functions.py:76-84); here
    it is models.sampler.sgld_step.
    """
    import jax

    from ir_sgmcmc_tpu.models.sampler import sgld_step

    s2 = 2.0  # target variance
    grad_fn = lambda v: v / s2

    def chain_var(tau, sig, n=120_000, burn=5_000):
        def body(carry, key):
            v = sgld_step(key, carry, jnp.asarray(sig), tau, grad_fn)
            return v, v

        keys = jax.random.split(jax.random.PRNGKey(0), n)
        _, samples = jax.lax.scan(body, jnp.zeros(()), keys)
        return float(np.asarray(samples[burn:]).var())

    for tau, sig in [(0.05, 1.0), (0.05, 0.5)]:
        a = tau * sig**2 / s2
        expected = 2.0 * s2 * (1.0 - a) ** 2 / (2.0 - a)
        np.testing.assert_allclose(chain_var(tau, sig), expected, rtol=0.08)
