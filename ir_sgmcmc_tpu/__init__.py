"""ir-sgmcmc-tpu: TPU-native stochastic-gradient MCMC image registration.

A ground-up JAX/XLA re-design of the capabilities of dgrzech/ir-sgmcmc
(uncertainty quantification in non-rigid 3D image registration via VI +
SG-MCMC), built for TPU: functional core over pytrees, `lax.scan` loops,
explicit PRNG keys, chain parallelism over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
