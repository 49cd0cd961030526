"""Model bundle: everything static that defines one registration problem.

Plays the role of the reference's ConfigParser-wired module graph
(/root/reference/parse_config.py:110-213 + trainer construction): the GMM
data likelihood and its priors, the regularisation loss (optionally with
hyperpriors), the transformation model, Sobolev smoothing, uniform-noise and
virtual-decimation switches.  Everything here is static/hashable state —
learnable parameters live in the state pytrees owned by the VI/MCMC engines.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax.numpy as jnp

from ..models.gmm import GMM
from ..models.reg_loss import RegLoss
from ..ops.sobolev import sobolev_kernel_1d, sobolev_smooth


@dataclass
class ModelBundle:
    dims: tuple
    gmm: GMM
    scale_prior: Any  # prior over GMM log-scales
    proportion_prior: Any  # prior over GMM log-proportions
    reg_loss: RegLoss
    transformation: Any  # SVF3D / SVFFD3D
    reg_loc_prior: Optional[Any] = None  # for learnable RegLossLogNormal
    reg_scale_prior: Optional[Any] = None
    reg_w_reg_prior: Optional[Any] = None  # for learnable RegLossL2
    sobolev_s: Optional[int] = 3
    sobolev_lambda: float = 0.5
    uniform_noise_alpha: Optional[float] = 0.1
    # 'post' (default since round 3): exact reference semantics (warp the
    # moving image ONCE at T + noise, utils/util.py:44-53) via the
    # block-gather warp — a single resample of the image.  'pre' (opt-in
    # fast path): jitter the cascade-warped image — noise in the
    # pre-transform sampling position, and the image rides the squaring
    # cascade (8 sequential resamples, whose compounded interpolation
    # smoothing costs measurable registration quality: 128³ Dice 0.963 vs
    # 0.975 — BASELINE.md round 3).
    noise_scheme: str = "post"
    # post-scheme single-resample warp implementation: block-gather (one
    # coarse window gather + in-block residual blend — exact trilinear for
    # in-block variation ≤ block_radius, ops/resample.py) instead of the
    # per-voxel gather XLA serializes on TPU
    block_warp: bool = True
    block_radius: int = 2
    block_size: int = 8
    virtual_decimation: bool = True
    _sobolev_kernel: Optional[jnp.ndarray] = field(default=None, repr=False)

    def __post_init__(self):
        if self.sobolev_s is not None:
            k, _ = sobolev_kernel_1d(self.sobolev_s, self.sobolev_lambda)
            self._sobolev_kernel = jnp.asarray(k, dtype=jnp.float32)

    # ---- smoothing -------------------------------------------------------
    def smooth(self, v: jnp.ndarray) -> jnp.ndarray:
        """Sobolev-smooth a field (identity backward); no-op when disabled."""
        if self._sobolev_kernel is None:
            return v
        return sobolev_smooth(v, self._sobolev_kernel)

    # ---- parameter shapes --------------------------------------------------
    @property
    def field_dims(self) -> tuple:
        """Spatial shape of the sampled state (control grid for SVFFD)."""
        if hasattr(self.transformation, "control_dims"):
            return tuple(self.transformation.control_dims)
        return tuple(self.dims)

    def init_q_v(self, sigma_v_init: float, u_v_init: float) -> dict:
        """Variational parameter init — reference data_loader/datasets.py:57-68."""
        shape = (3,) + self.field_dims
        return {
            "mu": jnp.zeros(shape, jnp.float32),
            "log_var": jnp.full(shape, 2.0 * jnp.log(sigma_v_init), jnp.float32),
            "u": jnp.full(shape, u_v_init, jnp.float32),
        }

    # ---- losses ------------------------------------------------------------
    def gmm_prior_terms(self, gmm_params: dict) -> jnp.ndarray:
        """Sum of GMM hyperprior log-densities (subtracted from the data term)."""
        return jnp.sum(self.scale_prior(gmm_params["log_std"])) + jnp.sum(
            self.proportion_prior(GMM.log_proportions(gmm_params))
        )
