"""Minimal nibabel stand-in (reference logger/logger.py:84-102 surface).

``Nifti1Image`` + ``to_filename`` backed by this framework's NIfTI writer
so the reference's artifact dumps produce real, loadable .nii.gz files for
the head-to-head comparison.
"""

from __future__ import annotations

import numpy as np


class _Header:
    def __init__(self):
        self.zooms = (1.0, 1.0, 1.0)

    def set_xyzt_units(self, *_args, **_kw):
        pass

    def set_zooms(self, zooms):
        z = np.ravel(np.asarray(zooms, dtype=float))
        if z.size == 1:
            z = np.repeat(z, 3)
        self.zooms = tuple(z[:3])


class Nifti1Image:
    def __init__(self, dataobj, affine=None, header=None):
        self.dataobj = np.asarray(dataobj)
        self.affine = affine
        self.header = header or _Header()

    def to_filename(self, path):
        from ir_sgmcmc_tpu.utils.nifti import write_nifti

        write_nifti(path, self.dataobj, spacing=self.header.zooms)


def save(img: Nifti1Image, path):
    img.to_filename(path)


def load(path):
    from ir_sgmcmc_tpu.utils.nifti import read_nifti

    arr, spacing = read_nifti(path)
    img = Nifti1Image(arr, np.eye(4))
    img.header.set_zooms(spacing)
    return img
