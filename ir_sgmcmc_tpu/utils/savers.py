"""Structured artifact savers (NIfTI images, VTK fields).

Host-side equivalents of /root/reference/logger/logger.py:110-238: fixed and
moving images/masks, per-sample warped images + displacements + log|J|
(``chain_i_sample_%07d_*`` naming), the variational-posterior mean, and
masked/unmasked displacement mean / std-dev uncertainty maps.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .nifti import write_nifti
from .vtk_io import write_vtk_field


def _np(x):
    return np.asarray(x)


def _im_path(save_dirs, name):
    return Path(save_dirs["images"]) / f"{name}.nii.gz"


def save_fixed_im(save_dirs, spacing, im):
    write_nifti(_im_path(save_dirs, "im_fixed"), _np(im).squeeze(), spacing)


def save_moving_im(save_dirs, spacing, im):
    write_nifti(_im_path(save_dirs, "im_moving"), _np(im).squeeze(), spacing)


def save_fixed_mask(save_dirs, spacing, mask):
    write_nifti(_im_path(save_dirs, "mask_fixed"), _np(mask).squeeze().astype(np.uint8), spacing)


def save_moving_mask(save_dirs, spacing, mask):
    write_nifti(_im_path(save_dirs, "mask_moving"), _np(mask).squeeze().astype(np.uint8), spacing)


def save_sample(save_dirs, spacing, sample_no, im_warped, displacement, log_det_J, model: str, chain_no=None):
    """Per-sample dump: warped image, displacement field, log|J| map.

    ``model`` is ``'VI'`` or ``'MCMC'``; MCMC samples carry a chain prefix.
    """
    samples_dir = Path(save_dirs["samples"]) / model
    samples_dir.mkdir(parents=True, exist_ok=True)
    prefix = f"chain_{chain_no}_" if chain_no is not None else ""
    name = f"{prefix}sample_{int(sample_no):07d}"

    im = _np(im_warped)
    disp = _np(displacement)
    ldj = _np(log_det_J)
    if chain_no is not None and im.ndim == 4:
        im, disp, ldj = im[chain_no], disp[chain_no], ldj[chain_no]

    write_nifti(samples_dir / f"{name}_im_warped.nii.gz", im.squeeze(), spacing)
    write_nifti(samples_dir / f"{name}_log_det_J.nii.gz", np.nan_to_num(ldj).squeeze(), spacing)
    write_vtk_field(samples_dir / f"{name}_displacement.vtk", disp, spacing)


def save_variational_posterior_mean(save_dirs, spacing, im_warped, displacement):
    write_nifti(_im_path(save_dirs, "im_moving_warped_mu_v"), _np(im_warped).squeeze(), spacing)
    write_vtk_field(Path(save_dirs["fields"]) / "displacement_mu_v.vtk", _np(displacement).squeeze(), spacing)


def save_displacement_mean_and_std_dev(save_dirs, spacing, mean, std_dev, mask, model: str):
    """Posterior mean + per-voxel std-dev maps, masked and unmasked."""
    fields = Path(save_dirs["fields"])
    mean = _np(mean)
    std = _np(std_dev)
    m = _np(mask).squeeze().astype(bool)

    write_vtk_field(fields / f"{model}_displacement_mean.vtk", mean, spacing)
    write_vtk_field(fields / f"{model}_displacement_std_dev.vtk", std, spacing)
    write_vtk_field(fields / f"{model}_displacement_mean_masked.vtk", mean * m, spacing)
    write_vtk_field(fields / f"{model}_displacement_std_dev_masked.vtk", std * m, spacing)

    # scalar uncertainty magnitude as NIfTI for viewers
    write_nifti(fields / f"{model}_uncertainty_norm.nii.gz", np.linalg.norm(std, axis=0), spacing)
