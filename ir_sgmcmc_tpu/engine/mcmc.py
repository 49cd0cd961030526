"""SG-MCMC engine: preconditioned SGLD over vmapped parallel chains.

Re-architecture of the reference MCMC phase (/root/reference/trainer/
trainer.py:291-476, 586-611).  One transition for a single chain is a pure
function; chains become a vmapped leading axis (the reference's batch
dimension, SURVEY.md §2 #21), which shards across TPU devices over a
``Mesh('chain')`` axis — see ``ir_sgmcmc_tpu.parallel``.

The SGLD update implemented here is exactly the composite of the reference's
noise-injecting autograd function + SGD(lr=tau) + sigma² gradient
preconditioning (utils/functions.py:76-84):

    v'     = v + sqrt(2 tau) * sigma * eps
    v_next = v' - tau * sigma² * grad U(v')

Design deviations from the reference (intentional, parallelism-first):
* GMM and regularisation parameters are *per-chain* and updated in parallel,
  instead of one shared parameter set receiving ``no_chains`` sequential
  Adam steps per transition (trainer.py:316-327).  Each chain is thereby a
  self-contained posterior sampler with no cross-chain sync in the hot loop.
* posterior statistics use running Welford accumulators instead of
  materialising every thinned sample (trainer.py:366) — O(1) memory at any
  chain length.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.gmm import GMM
from ..models.reg_loss import RegLossL2, RegLossLogNormal
from ..models.sampler import langevin_noise, sample_q_v
from .bundle import ModelBundle
from .vi import forward_sample, gmm_adam_step, vd_alpha


class WelfordState(NamedTuple):
    count: jnp.ndarray
    mean: jnp.ndarray
    m2: jnp.ndarray


def welford_init(shape) -> WelfordState:
    return WelfordState(
        count=jnp.zeros((), jnp.float32),
        mean=jnp.zeros(shape, jnp.float32),
        m2=jnp.zeros(shape, jnp.float32),
    )


def welford_update(w: WelfordState, x: jnp.ndarray, weight: jnp.ndarray) -> WelfordState:
    """Weighted (0/1-gated) Welford update; ``weight`` gates thinning."""
    count = w.count + weight
    safe = jnp.maximum(count, 1.0)
    delta = x - w.mean
    mean = w.mean + weight * delta / safe
    m2 = w.m2 + weight * delta * (x - mean)
    return WelfordState(count, mean, m2)


def welford_finalize(w: WelfordState):
    """(mean, std) with the sample (ddof=1) normalisation of torch.std."""
    var = w.m2 / jnp.maximum(w.count - 1.0, 1.0)
    return w.mean, jnp.sqrt(var)


def welford_merge(ws: WelfordState) -> WelfordState:
    """Merge per-chain accumulators (leading axis) via Chan's parallel rule,
    reproducing the reference's pooled statistics over all chains' samples
    (utils/util.py:114-120)."""

    def merge(a: WelfordState, b: WelfordState) -> WelfordState:
        n = a.count + b.count
        safe = jnp.maximum(n, 1.0)
        delta = b.mean - a.mean
        mean = a.mean + delta * b.count / safe
        m2 = a.m2 + b.m2 + delta**2 * a.count * b.count / safe
        return WelfordState(n, mean, m2)

    n_chains = ws.count.shape[0]
    acc = jax.tree.map(lambda x: x[0], ws)
    for i in range(1, n_chains):
        acc = merge(acc, jax.tree.map(lambda x: x[i], ws))
    return acc


class MCMCState(NamedTuple):
    """All leaves carry a leading ``(no_chains,)`` axis."""

    v: jnp.ndarray  # (C, 3, *field_dims)
    sigma: jnp.ndarray  # (C, 3, *field_dims) SGLD preconditioner
    gmm: dict
    reg: dict
    opt_gmm: Any
    opt_reg: Any
    welford: WelfordState  # over displacement (C, 3, *dims)
    key: jax.Array  # (C, 2) per-chain keys
    step: jnp.ndarray  # scalar


def init_chains(
    bundle: ModelBundle,
    key: jax.Array,
    no_chains: int,
    mode: str,
    q_v: dict | None,
    gmm: dict,
    reg: dict,
    opt_gmm,
    opt_reg,
    param_mode: str = "per_chain",
) -> MCMCState:
    """SGLD state init — reference trainer.py:586-611.

    ``mode``: ``'VI'`` (per-chain q(v) samples, sigma from the VI log-var),
    ``'identity'`` (zeros, sigma 1) or ``'noise'`` (standard normal, sigma 1).
    ``param_mode``: ``'per_chain'`` replicates GMM/reg params per chain;
    ``'shared'`` keeps one set (reference semantics, trainer.py:316-327).
    """
    shape = (no_chains, 3) + bundle.field_dims
    key, *chain_keys = jax.random.split(key, no_chains + 1)

    if mode == "VI":
        assert q_v is not None, "MCMC_init='VI' requires fitted q(v) params"
        v = jnp.stack([sample_q_v(k, q_v) for k in chain_keys])
        sigma = jnp.broadcast_to(jnp.exp(0.5 * q_v["log_var"]), shape)
    elif mode == "identity":
        v = jnp.zeros(shape, jnp.float32)
        sigma = jnp.ones(shape, jnp.float32)
    elif mode == "noise":
        v = jax.random.normal(key, shape, jnp.float32)
        sigma = jnp.ones(shape, jnp.float32)
    else:
        raise ValueError(f"unknown MCMC init mode: {mode}")

    if param_mode == "shared":
        gmm_c, reg_c = gmm, reg
        opt_gmm_c = opt_gmm.init(gmm)
        opt_reg_c = opt_reg.init(reg)
    else:
        # per-chain copies of the (VI-fitted) GMM/reg params + fresh optimizers
        rep = lambda t: jnp.broadcast_to(t, (no_chains,) + t.shape)
        gmm_c = jax.tree.map(rep, gmm)
        reg_c = jax.tree.map(rep, reg)
        opt_gmm_c = jax.vmap(opt_gmm.init)(gmm_c) if gmm_c else opt_gmm.init(gmm_c)
        opt_reg_c = jax.vmap(opt_reg.init)(reg_c) if reg_c else jax.tree.map(rep, opt_reg.init(reg_c))

    chain_rng = jax.random.split(jax.random.fold_in(key, 7), no_chains)

    return MCMCState(
        v=v,
        sigma=sigma,
        gmm=gmm_c,
        reg=reg_c,
        opt_gmm=opt_gmm_c,
        opt_reg=opt_reg_c,
        welford=jax.vmap(lambda _: welford_init((3,) + tuple(bundle.dims)))(
            jnp.arange(no_chains)
        ),
        key=chain_rng,
        step=jnp.zeros((), jnp.int32),
    )


def make_chain_anchor(bundle: ModelBundle, moving: dict,
                      anchor_mode: str = "taylor"):
    """Build the per-chain anchor for anchored residual warping.

    Runs ONCE per device chunk (engine-level amortisation of the global
    gather): integrate the chunk-entry velocity to ``T0``, gather
    ``W0 = moving ∘ T0`` (forward only — the anchor carries no gradient),
    and precompute ``J0⁻¹ = (I + ∇d0)⁻¹`` so per-step residuals can be
    mapped into the anchor's source frame (see
    :func:`~ir_sgmcmc_tpu.engine.vi.forward_sample`).
    """
    from ..ops.grids import inv_jacobian
    from ..ops.resample import grid_sample
    from ..ops.stencil import gradient

    def anchor_one(v_unsmoothed):
        v = bundle.smooth(v_unsmoothed)
        transformation, displacement, _ = bundle.transformation.integrate(
            v, im=None)
        w0 = grid_sample(moving["im"], transformation, mode="linear")
        eye = jnp.eye(3, dtype=displacement.dtype).reshape(3, 3, 1, 1, 1)
        # clamp the frame map: near-folded anchor voxels (det -> 0, which
        # DO occur transiently — the fold guard tolerates a handful) would
        # otherwise put ~1/det ~ 1e6 factors into the residual map AND its
        # transpose in the backward pass, poisoning the chain around them;
        # a diffeomorphic J^-1 entry is O(1), so [-3, 3] is generous
        jinv = jnp.clip(inv_jacobian(eye + gradient(displacement)), -3.0, 3.0)
        anchor = {"W0": jax.lax.stop_gradient(w0),
                  "d0": jax.lax.stop_gradient(displacement),
                  "Jinv": jax.lax.stop_gradient(jinv)}
        if anchor_mode == "taylor":
            w0c = w0 if w0.ndim == 4 else w0[None]
            anchor["GW0"] = jax.lax.stop_gradient(gradient(w0c))
        return anchor

    return anchor_one


def make_sgld_transition(
    bundle: ModelBundle, opt_gmm, opt_reg, tau: float, fixed: dict, moving: dict,
    anchored: bool = False, anchor_radius: int = 2,
):
    """Single-chain SGLD transition ``(chain_state, collect?) -> ...``.

    ``fixed``/``moving`` are one image pair (shared across chains — the
    reference ``expand``s them over the chain axis, trainer.py:361-362; under
    vmap they broadcast for free).

    With ``anchored=True`` the transition takes a third ``anchor`` argument
    (from :func:`make_chain_anchor`) and the image warp runs as a bounded
    residual blend off the anchor instead of a per-step global gather.
    """
    reg_loss = bundle.reg_loss
    learnable_reg = reg_loss.learnable and len(reg_loss.param_names) > 0

    def potential(v_noised, reg_p, gmm, opt_gmm_state, key, anchor):
        """U(v') for one chain; also advances the detached GMM params."""
        out = forward_sample(bundle, fixed, moving, v_noised, key,
                             anchor=anchor, anchor_radius=anchor_radius)
        mask = fixed["mask"]
        alpha = vd_alpha(bundle, gmm, out["residuals"], mask)
        gmm, opt_gmm_state = gmm_adam_step(
            bundle, opt_gmm, gmm, opt_gmm_state, out["residuals"], mask, alpha
        )
        data_term = bundle.gmm.masked_nll(gmm, out["residuals"], mask) * alpha
        data_term = data_term - bundle.gmm_prior_terms(gmm)

        reg, log_y = reg_loss(reg_p, out["v"])
        reg_term = jnp.sum(reg)
        if learnable_reg and isinstance(reg_loss, RegLossLogNormal):
            reg_term -= jnp.sum(bundle.reg_loc_prior(log_y))
            reg_term -= jnp.sum(bundle.reg_scale_prior(reg_p["log_scale"]))
        elif learnable_reg and isinstance(reg_loss, RegLossL2):
            reg_term -= jnp.sum(bundle.reg_w_reg_prior(reg_p["log_w_reg"]))

        loss = data_term + reg_term
        aux = {
            "gmm": gmm,
            "opt_gmm": opt_gmm_state,
            "data_term": data_term,
            "reg_term": reg_term,
            "vd_alpha": alpha,
            "reg_energy": jnp.exp(log_y).reshape(()),
            "ndv": out["ndv"],
            "sat": out["sat"],
            "sat_resid": out["sat_resid"],
            "displacement": out["displacement"],
            "transformation": out["transformation"],
            "warped": out["warped"],
        }
        return loss, aux

    def transition(chain, collect_weight, anchor=None):
        """``chain``: dict with one chain's slices of MCMCState fields."""
        key, k_noise, k_unif = jax.random.split(chain["key"], 3)
        v_noised = chain["v"] + langevin_noise(k_noise, chain["sigma"], tau)

        grad_fn = jax.grad(potential, argnums=(0, 1), has_aux=True)
        (g_v, g_reg), aux = grad_fn(
            v_noised, chain["reg"], chain["gmm"], chain["opt_gmm"], k_unif,
            anchor,
        )

        v_next = v_noised - tau * chain["sigma"] ** 2 * g_v

        reg_p, opt_reg_state = chain["reg"], chain["opt_reg"]
        if learnable_reg:
            upd, opt_reg_state = opt_reg.update(g_reg, chain["opt_reg"], chain["reg"])
            reg_p = optax.apply_updates(chain["reg"], upd)

        welford = welford_update(chain["welford"], aux["displacement"], collect_weight)

        new_chain = {
            "v": v_next,
            "sigma": chain["sigma"],
            "gmm": aux["gmm"],
            "reg": reg_p,
            "opt_gmm": aux["opt_gmm"],
            "opt_reg": opt_reg_state,
            "welford": welford,
            "key": key,
        }
        metrics = {
            "data_term": aux["data_term"],
            "reg_term": aux["reg_term"],
            "vd_alpha": aux["vd_alpha"],
            "reg_energy": aux["reg_energy"],
            "ndv": aux["ndv"],
            "sat": aux["sat"],
            "sat_resid": aux["sat_resid"],
            "gmm_scales": GMM.scales(aux["gmm"]),
            "gmm_proportions": GMM.proportions(aux["gmm"]),
        }
        return new_chain, metrics

    return transition


def make_sgld_transition_shared(
    bundle: ModelBundle, opt_gmm, opt_reg, tau: float, fixed: dict, moving: dict
):
    """Reference-semantics transition over ALL chains: one SHARED GMM/reg
    parameter set, with the GMM receiving ``no_chains`` *sequential* Adam
    steps per transition (each chain's data term evaluated with the GMM
    state after its own update — /root/reference/trainer/trainer.py:316-327)
    and the regulariser one Adam step on the gradient summed over chains
    (:344-354).  Hyperprior terms enter once per transition (:329-339).

    This is the validation baseline for the parallel ``per_chain`` scheme
    (the engine default): its cross-chain sequential dependence forces a
    parameter sync per transition, so chains no longer shard freely.
    """
    reg_loss = bundle.reg_loss
    learnable_reg = reg_loss.learnable and len(reg_loss.param_names) > 0

    def potential(v_noised, reg_p, gmm0, opt_gmm0, keys):
        mask = fixed["mask"]

        def body(carry, xs):
            gmm, opt_state, data_total = carry
            v_c, key_c = xs
            out = forward_sample(bundle, fixed, moving, v_c, key_c)
            alpha = vd_alpha(bundle, gmm, out["residuals"], mask)
            gmm, opt_state = gmm_adam_step(
                bundle, opt_gmm, gmm, opt_state, out["residuals"], mask, alpha
            )
            data_c = bundle.gmm.masked_nll(gmm, out["residuals"], mask) * alpha
            reg_c, log_y_c = reg_loss(reg_p, out["v"])
            aux_c = {
                "data_term": data_c,
                "reg_term": jnp.sum(reg_c),
                "vd_alpha": alpha,
                "reg_energy": jnp.exp(log_y_c).reshape(()),
                "log_y": log_y_c.reshape(()),
                "ndv": out["ndv"],
                "sat": out["sat"],
                "sat_resid": out["sat_resid"],
                "displacement": out["displacement"],
            }
            return (gmm, opt_state, data_total + data_c), aux_c

        (gmm, opt_gmm_state, data_term), aux = jax.lax.scan(
            body, (gmm0, opt_gmm0, jnp.zeros((), jnp.float32)),
            (v_noised, keys),
        )
        data_term = data_term - bundle.gmm_prior_terms(gmm)
        reg_term = jnp.sum(aux["reg_term"])
        if learnable_reg and isinstance(reg_loss, RegLossLogNormal):
            reg_term -= jnp.sum(bundle.reg_loc_prior(aux["log_y"]))
            reg_term -= jnp.sum(bundle.reg_scale_prior(reg_p["log_scale"]))
        elif learnable_reg and isinstance(reg_loss, RegLossL2):
            reg_term -= jnp.sum(bundle.reg_w_reg_prior(reg_p["log_w_reg"]))
        loss = data_term + reg_term
        return loss, {**aux, "gmm": gmm, "opt_gmm": opt_gmm_state}

    def transition(chain, collect_weight):
        """``chain``: full chain-major state dict with SHARED gmm/reg."""
        keys = jax.vmap(lambda k: jax.random.split(k, 3))(chain["key"])
        new_keys, k_noise, k_unif = keys[:, 0], keys[:, 1], keys[:, 2]
        v_noised = chain["v"] + jax.vmap(langevin_noise, in_axes=(0, 0, None))(
            k_noise, chain["sigma"], tau
        )

        grad_fn = jax.grad(potential, argnums=(0, 1), has_aux=True)
        (g_v, g_reg), aux = grad_fn(
            v_noised, chain["reg"], chain["gmm"], chain["opt_gmm"], k_unif
        )

        v_next = v_noised - tau * chain["sigma"] ** 2 * g_v

        reg_p, opt_reg_state = chain["reg"], chain["opt_reg"]
        if learnable_reg:
            upd, opt_reg_state = opt_reg.update(g_reg, chain["opt_reg"], chain["reg"])
            reg_p = optax.apply_updates(chain["reg"], upd)

        welford = jax.vmap(welford_update, in_axes=(0, 0, None))(
            chain["welford"], aux["displacement"], collect_weight
        )

        new_chain = {
            "v": v_next,
            "sigma": chain["sigma"],
            "gmm": aux["gmm"],
            "reg": reg_p,
            "opt_gmm": aux["opt_gmm"],
            "opt_reg": opt_reg_state,
            "welford": welford,
            "key": new_keys,
        }
        metrics = {
            "data_term": aux["data_term"],
            "reg_term": aux["reg_term"],
            "vd_alpha": aux["vd_alpha"],
            "reg_energy": aux["reg_energy"],
            "ndv": aux["ndv"],
            "sat": aux["sat"],
            "sat_resid": aux["sat_resid"],
            "gmm_scales": jnp.broadcast_to(
                GMM.scales(aux["gmm"]), (v_next.shape[0],) + GMM.scales(aux["gmm"]).shape
            ),
            "gmm_proportions": jnp.broadcast_to(
                GMM.proportions(aux["gmm"]),
                (v_next.shape[0],) + GMM.proportions(aux["gmm"]).shape,
            ),
        }
        return new_chain, metrics

    return transition


def make_mcmc_chunk(
    bundle: ModelBundle,
    opt_gmm,
    opt_reg,
    tau: float,
    fixed: dict,
    moving: dict,
    chunk: int,
    burn_in: int,
    thin: int,
    param_mode: str = "per_chain",
    chain_mesh=None,
    anchored: bool = False,
    anchor_radius: int = 2,
    anchor_mode: str = "taylor",
    anchor_period: int = 25,
    raw: bool = False,
):
    """Scan ``chunk`` SGLD transitions over all chains on device.

    Thinned displacement samples feed the per-chain Welford accumulators
    once past ``burn_in`` (every ``thin`` steps), replacing the reference's
    sample tensor (trainer.py:365-366, 429).

    ``param_mode``: ``'per_chain'`` (engine default — independent GMM/reg
    per chain, embarrassingly parallel) or ``'shared'`` (exact reference
    semantics — one parameter set, sequential per-chain GMM updates).

    ``chain_mesh``: a ``Mesh(('chain',))`` to run the vmapped transition
    under an explicit ``shard_map`` — each device executes the transition
    on its LOCAL chains only.  Without it, chain-sharded inputs still
    compute correctly under the GSPMD partitioner, but a ``pallas_call``
    has no sharding rule there: the partitioner falls back to all-gathering
    the full chain-stacked operands around every kernel (measured on the
    virtual mesh: 8x-volume all-gathers per warp — replication, not
    parallelism).  Under shard_map the chains are manual and the kernels
    run on local blocks, with zero cross-chain collectives (the transition
    is embarrassingly parallel).
    """
    # anchored residual warping needs the bounded post-noise path and
    # per-chain (embarrassingly parallel) transitions; anything else falls
    # back to the per-step exact warp silently — the caller's config is
    # still honoured, just without the amortisation
    anchored = (
        anchored
        and param_mode != "shared"
        and getattr(bundle, "noise_scheme", "pre") == "post"
        and getattr(bundle.transformation, "integrate", None) is not None
        and not getattr(bundle.transformation, "use_gather", False)
    )

    # NOTE: the transition builders run INSIDE the traced function below so
    # that ``fixed``/``moving`` enter the jitted module as PARAMETERS, not
    # closed-over literals — closure arrays are embedded in the StableHLO
    # as dense constants, which at 256³ makes a ~134 MB module that
    # overflows the remote-compile transport (and bloats every cache entry)
    def _build(fixed, moving):
        anchor_fn = None
        if param_mode == "shared":
            vtransition = make_sgld_transition_shared(
                bundle, opt_gmm, opt_reg, tau, fixed, moving
            )
            return vtransition, anchor_fn
        transition = make_sgld_transition(
            bundle, opt_gmm, opt_reg, tau, fixed, moving,
            anchored=anchored, anchor_radius=anchor_radius)
        if anchored:
            vtransition = jax.vmap(transition, in_axes=(0, None, 0))
            anchor_fn = jax.vmap(make_chain_anchor(bundle, moving, anchor_mode))
        else:
            vtransition = jax.vmap(transition, in_axes=(0, None))
        if chain_mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec

            # every state leaf and every metric is chain-major, so one
            # P('chain') spec serves as the pytree prefix for all of them;
            # check_vma off: pallas_call output ShapeDtypeStructs carry no
            # variance annotation
            in_specs = (PartitionSpec("chain"), PartitionSpec())
            if anchored:
                in_specs = in_specs + (PartitionSpec("chain"),)
                anchor_fn = shard_map(
                    anchor_fn,
                    mesh=chain_mesh,
                    in_specs=(PartitionSpec("chain"),),
                    out_specs=PartitionSpec("chain"),
                    check_vma=False,
                )
            vtransition = shard_map(
                vtransition,
                mesh=chain_mesh,
                in_specs=in_specs,
                out_specs=PartitionSpec("chain"),
                check_vma=False,
            )
        return vtransition, anchor_fn

    def make_body(vtransition, anchor):
        def body(state: MCMCState, _):
            step = state.step + 1
            collect = jnp.logical_and(step > burn_in, (step - burn_in) % thin == 0)
            chain = {
                "v": state.v,
                "sigma": state.sigma,
                "gmm": state.gmm,
                "reg": state.reg,
                "opt_gmm": state.opt_gmm,
                "opt_reg": state.opt_reg,
                "welford": state.welford,
                "key": state.key,
            }
            w = collect.astype(jnp.float32)
            if anchor is not None:
                new_chain, metrics = vtransition(chain, w, anchor)
            else:
                new_chain, metrics = vtransition(chain, w)
            new_state = MCMCState(step=step, **new_chain)
            return new_state, metrics

        return body

    def run(state: MCMCState, fixed, moving):
        vtransition, anchor_fn = _build(fixed, moving)
        if anchor_fn is None:
            return jax.lax.scan(make_body(vtransition, None), state, None,
                                length=chunk)
        # re-anchor every ``anchor_period`` steps (bounds the residual the
        # per-step warp must cover): nested scan — the outer body pays one
        # gather, the inner scan rides it as an invariant; a non-dividing
        # chunk gets one shorter trailing block
        period = min(max(anchor_period, 1), chunk)

        def block_of(n):
            def block(state, _):
                anchor = anchor_fn(state.v)
                return jax.lax.scan(make_body(vtransition, anchor), state,
                                    None, length=n)
            return block

        parts = []
        full = chunk // period
        if full:
            state, ms = jax.lax.scan(block_of(period), state, None,
                                     length=full)
            parts.append(jax.tree.map(
                lambda x: x.reshape((full * period,) + x.shape[2:]), ms))
        rem = chunk - full * period
        if rem:
            state, ms = block_of(rem)(state, None)
            parts.append(ms)
        if len(parts) == 1:
            return state, parts[0]
        ms = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)
        return state, ms

    # ``raw``: hand back the untraced runner ``(state, fixed, moving) ->
    # (state, metrics)`` for composition under an outer transform — the
    # pair-parallel layer (engine/pairs.py) vmaps/maps it over a stacked
    # pair axis before jitting
    if raw:
        return run

    # Below ~32 MB the images are baked into the module as literals (the
    # long-standing behaviour: replicated constants, zero collectives even
    # for gather-based paths under GSPMD).  Large volumes become jit
    # PARAMETERS instead: a closed-over 256³ pair embeds ~134 MB of dense
    # literals in the StableHLO, overflowing the remote-compile transport.
    image_bytes = sum(x.size * x.dtype.itemsize
                      for d in (fixed, moving) for x in jax.tree.leaves(d))
    if image_bytes <= 32 * 1024 * 1024:
        return jax.jit(lambda state: run(state, fixed, moving),
                       donate_argnums=0)

    jit_run = jax.jit(run, donate_argnums=0)

    def chunk_fn(state: MCMCState):
        return jit_run(state, fixed, moving)

    # expose lower/compile for the HLO audit tests (same traced signature)
    chunk_fn.lower = lambda state: jit_run.lower(state, fixed, moving)
    return chunk_fn


def posterior_statistics(state: MCMCState):
    """Pooled posterior mean/std of the displacement over all chains."""
    merged = welford_merge(state.welford)
    return welford_finalize(merged)
