"""Adam with per-step learning-rate decay, re-initialisable moments, and
per-leaf learning rates.

Update rule (matching /root/reference/optimizers/adam_rate_decay.py:32-99):

    clr  = lr / (1 + step * lr_decay)          # step counted before increment
    t    = (step + 1) - reinit_step            # bias correction restarts on reinit
    m    = b1 m + (1 - b1) g
    v    = b2 v + (1 - b2) g²
    p   -= clr / (1 - b1^t) * m / (sqrt(v) / sqrt(1 - b2^t) + eps)

The reference's per-parameter-group learning rates (parse_config.py:215-249)
become a ``lr`` pytree with the same structure as the params (or a scalar).
Exposed as an ``optax.GradientTransformation`` so it composes with the rest
of the optax ecosystem.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdamDecayState(NamedTuple):
    step: jnp.ndarray  # int32, number of completed steps
    reinit_step: jnp.ndarray  # int32, step at which moments were last reset
    mu: optax.Updates
    nu: optax.Updates


def adam_decay(lr, lr_decay: float = 0.0, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """Create the transform.  ``lr`` is a scalar or a pytree matching params."""

    def _lr_tree(params):
        if isinstance(lr, (int, float)):
            return jax.tree.map(lambda _: float(lr), params)
        return lr

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return AdamDecayState(
            step=jnp.zeros((), jnp.int32),
            reinit_step=jnp.zeros((), jnp.int32),
            mu=z,
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        lrs = _lr_tree(grads)
        step = state.step  # pre-increment, for the decayed lr
        new_step = step + 1
        t = (new_step - state.reinit_step).astype(jnp.float32)

        mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * g * g, state.nu, grads)

        bc1 = 1.0 - b1**t
        bc2 = 1.0 - b2**t
        decay = 1.0 + step.astype(jnp.float32) * lr_decay

        def upd(m, v, lr_leaf):
            clr = lr_leaf / decay
            return -(clr / bc1) * m / (jnp.sqrt(v) / jnp.sqrt(bc2) + eps)

        updates = jax.tree.map(upd, mu, nu, lrs)
        return updates, AdamDecayState(new_step, state.reinit_step, mu, nu)

    return optax.GradientTransformation(init, update)


def reinit_moments(state: AdamDecayState) -> AdamDecayState:
    """Zero the moments and restart bias correction at the current step.

    Reference: adam_rate_decay.py:60-68 (``step(reinit=True)``).
    """
    return AdamDecayState(
        step=state.step,
        reinit_step=state.step,
        mu=jax.tree.map(jnp.zeros_like, state.mu),
        nu=jax.tree.map(jnp.zeros_like, state.nu),
    )
