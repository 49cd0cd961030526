"""Pair-parallel registration: independent image pairs over the device mesh.

The reference registers image pairs strictly sequentially (its loader holds
one pair, /root/reference/trainer/trainer.py:478-563 runs it end-to-end);
a population workload (the Biobank experiments) therefore uses one
accelerator per process.  On a TPU slice the pairs are embarrassingly
parallel — the production-throughput mode here stacks P pairs along a new
leading axis, shards that axis over a 1D ``Mesh(('pair',))``, and runs the
UNMODIFIED single-pair chunk runners on each device's local pairs:

* the chunk body executes under an explicit ``shard_map`` (a ``pallas_call``
  has no GSPMD sharding rule — the partitioner would all-gather the full
  pair-stacked volumes around every warp kernel; same finding as the chain
  mesh, engine/mcmc.py::make_mcmc_chunk);
* within a device, local pairs run SEQUENTIALLY via ``lax.map`` — each
  iteration sees exactly the unbatched single-pair shapes (the tested code
  path, Pallas-applicable), and peak memory stays one pair's working set
  regardless of how many pairs a device holds;
* there are zero cross-pair collectives: every pair carries its own model
  parameters, optimizer moments, chains, and Welford accumulators.

Wall-clock for P pairs on D devices is ~ceil(P/D) single-pair runs.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mcmc import make_mcmc_chunk
from .vi import make_vi_chunk

__all__ = [
    "stack_trees",
    "unstack_tree",
    "pair_device_count",
    "make_pair_mesh",
    "shard_pairs",
    "make_pair_vi_chunk",
    "make_pair_mcmc_chunk",
]


def stack_trees(trees):
    """Stack a list of congruent pytrees along a new leading pair axis."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *trees)


def unstack_tree(tree, i: int):
    """Slice pair ``i`` out of a pair-stacked pytree."""
    return jax.tree.map(lambda x: x[i], tree)


def pair_device_count(n_pairs: int, n_devices: int | None = None) -> int:
    """Largest device count that evenly tiles ``n_pairs`` (shard_map needs
    the global pair axis divisible by the mesh axis)."""
    if n_devices is None:
        n_devices = len(jax.devices())
    d = min(int(n_pairs), int(n_devices))
    while n_pairs % d:
        d -= 1
    return d


def make_pair_mesh(n_pairs: int, n_devices: int | None = None) -> Mesh:
    d = pair_device_count(n_pairs, n_devices)
    return Mesh(np.asarray(jax.devices()[:d]), ("pair",))


def shard_pairs(tree, mesh: Mesh):
    """Place a pair-stacked pytree: every leaf shards along its leading
    pair axis (a single ``P('pair')`` prefix serves the whole tree — the
    stack gave every leaf, scalars included, that axis)."""
    sh = NamedSharding(mesh, P("pair"))
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), tree)


def _pair_parallel(run, mesh: Mesh):
    """Lift a single-pair runner ``(state, fixed, moving) -> (state,
    metrics)`` to pair-stacked operands on ``mesh``; jitted, state donated."""

    def local(state, fixed, moving):
        # lax.map = scan over the local pairs: the body traces ONCE with
        # unbatched single-pair shapes and runs them one at a time —
        # kernels stay on their tested layout and only one pair's
        # activations are live per device
        return jax.lax.map(lambda args: run(*args), (state, fixed, moving))

    spec = P("pair")
    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,  # pallas_call outputs carry no variance annotation
    )
    return jax.jit(sharded, donate_argnums=0)


def _as_chunk_fn(jit_run, fixed_st, moving_st):
    """Bind the stacked images as jit PARAMETERS (never closed-over
    literals — P pairs of baked constants would multiply the StableHLO
    size; see engine.mcmc.make_mcmc_chunk) and expose ``lower`` for the
    compiled-HLO collective audits."""

    def chunk_fn(state):
        return jit_run(state, fixed_st, moving_st)

    chunk_fn.lower = lambda state: jit_run.lower(state, fixed_st, moving_st)
    return chunk_fn


def make_pair_vi_chunk(bundle, opt_q_v, opt_gmm, opt_reg,
                       fixed_st: dict, moving_st: dict, chunk: int,
                       mesh: Mesh, remat: bool = False):
    """VI chunk over pair-stacked images/state: ``(VIState+pair axis) ->
    (state, metrics)``, metrics leaves ``(P, chunk, ...)``."""
    from .vi import make_vi_step

    def step_builder(fixed, moving):
        return make_vi_step(bundle, opt_q_v, opt_gmm, opt_reg, fixed, moving,
                            remat=remat)

    run = make_vi_chunk(None, chunk, step_builder=step_builder, raw=True)
    return _as_chunk_fn(_pair_parallel(run, mesh), fixed_st, moving_st)


def make_pair_mcmc_chunk(bundle, opt_gmm, opt_reg, tau: float,
                         fixed_st: dict, moving_st: dict, chunk: int,
                         burn_in: int, thin: int, mesh: Mesh,
                         param_mode: str = "per_chain"):
    """MCMC chunk over pair-stacked images/state: ``(MCMCState+pair axis)
    -> (state, metrics)``, metrics leaves ``(P, chunk, chains, ...)``."""
    run = make_mcmc_chunk(
        bundle, opt_gmm, opt_reg, tau, fixed=None, moving=None,
        chunk=chunk, burn_in=burn_in, thin=thin, param_mode=param_mode,
        raw=True)
    return _as_chunk_fn(_pair_parallel(run, mesh), fixed_st, moving_st)
