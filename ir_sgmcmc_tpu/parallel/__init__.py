from .halo import gradient_d_sharded, separable_conv3d_sharded, warp_bounded_sharded
from .mesh import make_mesh, replicate, shard_chain_state

__all__ = [
    "make_mesh",
    "shard_chain_state",
    "replicate",
    "separable_conv3d_sharded",
    "gradient_d_sharded",
    "warp_bounded_sharded",
]
