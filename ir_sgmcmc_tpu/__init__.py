"""ir-sgmcmc-tpu: TPU-native stochastic-gradient MCMC image registration.

A ground-up JAX/XLA re-design of the capabilities of dgrzech/ir-sgmcmc
(uncertainty quantification in non-rigid 3D image registration via VI +
SG-MCMC), built for TPU: functional core over pytrees, `lax.scan` loops,
explicit PRNG keys, chain parallelism over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy to keep `import ir_sgmcmc_tpu` light for kernel-only users
    if name == "Config":
        from .config import Config

        return Config
    if name == "Trainer":
        from .trainer import Trainer

        return Trainer
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
