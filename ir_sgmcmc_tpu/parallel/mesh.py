"""Device mesh construction and state sharding.

The reference has no distributed backend (SURVEY.md §2 #22); its only
parallel axis is MCMC chains batched on one GPU.  Here that axis becomes a
first-class ``jax.sharding.Mesh`` dimension: chain-major state leaves are
sharded over ``'chain'`` and image data is replicated, so the vmapped SGLD
transition partitions across devices with zero cross-chain collectives in
the hot loop (embarrassingly parallel over ICI).

A second ``'space'`` axis supports spatial sharding of stencil ops for
volumes that exceed one device's HBM (see ``halo.py``).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axes=("chain",)) -> Mesh:
    """1D or 2D mesh over the first ``n_devices`` devices.

    ``axes=('chain',)`` puts all devices on the chain axis;
    ``axes=('chain', 'space')`` with ``n_devices=(c, s)`` builds a 2D mesh.
    """
    devices = jax.devices()
    if isinstance(n_devices, tuple):
        shape = n_devices
    else:
        n = len(devices) if n_devices is None else int(n_devices)
        shape = (n,) + (1,) * (len(axes) - 1)
    total = int(np.prod(shape))
    dev = np.asarray(devices[:total]).reshape(shape)
    return Mesh(dev, axes)


def shard_chain_state(state, mesh: Mesh, no_chains: int):
    """Place a chain-major state pytree: leading-``no_chains`` leaves are
    sharded over ``'chain'``, everything else replicated."""
    chain_sh = NamedSharding(mesh, P("chain"))
    rep_sh = NamedSharding(mesh, P())

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim > 0 and x.shape[0] == no_chains:
            return jax.device_put(x, chain_sh)
        return jax.device_put(x, rep_sh)

    return jax.tree.map(place, state)


def replicate(tree, mesh: Mesh):
    rep_sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(jax.numpy.asarray(x), rep_sh), tree)


def shard_state_spatial(state, mesh: Mesh, no_chains: int, field_depth: int):
    """Chain x space placement of a chain-major state pytree.

    Field leaves ``(C, ..., D, H, W)`` with ``D == field_depth`` shard over
    ``('chain', ..., 'space', None, None)``; other chain-major leaves shard
    over ``'chain'`` only; the rest replicate.  With these input shardings
    the jitted SGLD transition partitions under XLA's SPMD partitioner —
    the stencil convolutions, pads, and static slices of the bounded-blend
    warp lower to local compute plus compiler-inserted halo exchanges over
    ICI (the "annotate shardings, let XLA insert collectives" recipe; the
    hand-written ppermute halo ops in ``halo.py`` remain as the explicit /
    benchmarkable formulation).
    """
    n_space = mesh.shape["space"]
    chain_only = NamedSharding(mesh, P("chain"))
    rep = NamedSharding(mesh, P())

    def place(x):
        x = jax.numpy.asarray(x)
        if (
            x.ndim >= 4
            and x.shape[0] == no_chains
            and x.shape[-3] == field_depth
            and field_depth % n_space == 0
        ):
            spec = P("chain", *([None] * (x.ndim - 4)), "space", None, None)
            return jax.device_put(x, NamedSharding(mesh, spec))
        if x.ndim > 0 and x.shape[0] == no_chains:
            return jax.device_put(x, chain_only)
        return jax.device_put(x, rep)

    return jax.tree.map(place, state)


def shard_tree_spatial(tree, mesh: Mesh, field_depth: int,
                       axis_name: str = "space"):
    """Spatial-only placement of an arbitrary state pytree (no chain axis —
    the VI phase, reference trainer.py:119-223, is batch-1): every leaf
    ``(..., D, H, W)`` with ``D == field_depth`` shards along D over
    ``axis_name`` (this covers q(v) params AND their Adam moments, which
    mirror the param shapes); everything else replicates."""
    n_space = mesh.shape[axis_name]
    rep = NamedSharding(mesh, P())

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 3 and x.shape[-3] == field_depth and field_depth % n_space == 0:
            spec = P(*([None] * (x.ndim - 3)), axis_name, None, None)
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, rep)

    return jax.tree.map(place, tree)


def shard_images_spatial(tree, mesh: Mesh, field_depth: int):
    """Place an image-pair dict: ``(..., D, H, W)`` volumes shard along D
    over ``'space'`` (replicated over ``'chain'``); the rest replicate."""
    n_space = mesh.shape["space"]
    rep = NamedSharding(mesh, P())

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 3 and x.shape[-3] == field_depth and field_depth % n_space == 0:
            spec = P(*([None] * (x.ndim - 3)), "space", None, None)
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, rep)

    return jax.tree.map(place, tree)
