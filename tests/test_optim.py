"""Rate-decay Adam: parity with the reference's modified Adam semantics."""

import numpy as np

import jax.numpy as jnp

from ir_sgmcmc_tpu.optim import adam_decay, reinit_moments


def _reference_adam(grads, lr, lr_decay, b1=0.9, b2=0.999, eps=1e-8):
    """Numpy oracle of /root/reference/optimizers/adam_rate_decay.py:44-97."""
    p = np.zeros_like(grads[0])
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    step = 0
    reinit = 0
    traj = []
    for g in grads:
        clr = lr / (1 + step * lr_decay)
        step += 1
        bc1 = 1 - b1 ** (step - reinit)
        bc2 = 1 - b2 ** (step - reinit)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        denom = np.sqrt(v) / np.sqrt(bc2) + eps
        p = p - (clr / bc1) * m / denom
        traj.append(p.copy())
    return traj


def test_adam_decay_matches_reference_trajectory():
    rng = np.random.default_rng(0)
    grads = [rng.standard_normal(5).astype(np.float32) for _ in range(10)]
    lr, lr_decay = 0.01, 0.001

    opt = adam_decay(lr, lr_decay)
    params = jnp.zeros(5)
    state = opt.init(params)
    ours = []
    for g in grads:
        updates, state = opt.update(jnp.asarray(g), state, params)
        params = params + updates
        ours.append(np.asarray(params))

    theirs = _reference_adam(grads, lr, lr_decay)
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_adam_decay_per_leaf_lr():
    params = {"a": jnp.zeros(3), "b": jnp.zeros(3)}
    lrs = {"a": 0.1, "b": 0.0}
    opt = adam_decay(lrs)
    state = opt.init(params)
    g = {"a": jnp.ones(3), "b": jnp.ones(3)}
    updates, state = opt.update(g, state, params)
    assert abs(float(updates["a"][0])) > 0
    np.testing.assert_allclose(np.asarray(updates["b"]), 0.0)


def test_reinit_restarts_bias_correction():
    opt = adam_decay(0.1, 0.0)
    params = jnp.zeros(2)
    state = opt.init(params)
    g = jnp.ones(2)
    for _ in range(5):
        _, state = opt.update(g, state, params)
    state = reinit_moments(state)
    assert int(state.reinit_step) == 5
    np.testing.assert_allclose(np.asarray(state.mu), 0.0)
    # next update behaves like a fresh Adam step (full bias correction)
    updates, _ = opt.update(g, state, params)
    np.testing.assert_allclose(np.asarray(updates), -0.1, rtol=1e-4)
