from .grids import (
    count_non_diffeomorphic,
    det_jacobian,
    field_norm,
    identity_grid,
    normalised_to_voxel,
    voxel_to_normalised,
)
from .resample import grid_sample, grid_sample_2d, warp, warp_bounded
from .sobolev import sobolev_kernel_1d, sobolev_smooth
from .stencil import (
    box_filter3d,
    conv1d_axis,
    gradient,
    log_det_jacobian,
    reg_energy,
    separable_conv3d,
)
from .bspline import bspline_kernel_1d, control_grid_size, CubicBSplineFFD3D

__all__ = [
    "identity_grid",
    "voxel_to_normalised",
    "normalised_to_voxel",
    "det_jacobian",
    "field_norm",
    "count_non_diffeomorphic",
    "grid_sample",
    "grid_sample_2d",
    "warp",
    "warp_bounded",
    "sobolev_kernel_1d",
    "sobolev_smooth",
    "gradient",
    "separable_conv3d",
    "conv1d_axis",
    "box_filter3d",
    "reg_energy",
    "log_det_jacobian",
    "bspline_kernel_1d",
    "control_grid_size",
    "CubicBSplineFFD3D",
]
