from .bundle import ModelBundle
from .mcmc import (
    MCMCState,
    init_chains,
    make_mcmc_chunk,
    make_sgld_transition,
    posterior_statistics,
)
from .pairs import (
    make_pair_mcmc_chunk,
    make_pair_mesh,
    make_pair_vi_chunk,
    shard_pairs,
    stack_trees,
    unstack_tree,
)
from .vi import VIState, count_folds, gmm_warmup, make_vi_chunk, make_vi_step

__all__ = [
    "stack_trees",
    "unstack_tree",
    "make_pair_mesh",
    "shard_pairs",
    "make_pair_vi_chunk",
    "make_pair_mcmc_chunk",
    "ModelBundle",
    "VIState",
    "make_vi_step",
    "make_vi_chunk",
    "gmm_warmup",
    "count_folds",
    "MCMCState",
    "init_chains",
    "make_sgld_transition",
    "make_mcmc_chunk",
    "posterior_statistics",
]
