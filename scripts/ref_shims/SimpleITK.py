"""Minimal SimpleITK stand-in for running the PyTorch reference on this image.

SimpleITK is not installed here; the reference uses exactly this surface:

* ``ReadImage`` / ``GetArrayFromImage`` / ``sitkFloat32`` — NIfTI ingestion
  (reference data_loader/datasets.py:70-105).  Backed by this framework's
  self-contained NIfTI reader; ``GetArrayFromImage`` returns (z, y, x) like
  the real library, which the reference transposes back to (x, y, z).
* ``GetImageFromArray`` / ``Image.SetSpacing`` / ``LabelContour`` /
  ``HausdorffDistanceImageFilter`` — the ASD metric
  (reference utils/util.py:157-205).  Average Hausdorff distance is
  computed from scipy exact EDTs over face-connected label contours, the
  same construction this framework's utils/metrics.py validates against
  brute force.
* ``LabelOverlapMeasuresImageFilter`` — only touched on the GPU=False
  path, which the reference never takes; present as a guard stub.

This is harness code for the head-to-head baseline (scripts/head_to_head.py),
not part of the framework itself.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

sitkFloat32 = "float32"


class Image:
    def __init__(self, array: np.ndarray, spacing=(1.0, 1.0, 1.0)):
        # stored exactly as handed over; sitk's array convention (z, y, x)
        # is the caller's concern, mirroring the real library
        self.array = np.asarray(array)
        self._spacing = tuple(float(s) for s in spacing)

    def SetSpacing(self, spacing):
        if np.ndim(spacing) == 0:
            spacing = (spacing,) * 3
        self._spacing = tuple(float(s) for s in np.ravel(spacing)[:3]) or (1.0,) * 3
        if len(self._spacing) == 1:
            self._spacing = self._spacing * 3

    def GetSpacing(self):
        return self._spacing


def ReadImage(path, dtype=sitkFloat32):
    from ir_sgmcmc_tpu.utils.nifti import read_nifti

    arr, spacing = read_nifti(path)
    # real sitk's GetArrayFromImage returns (z, y, x); our reader returns
    # the stored (x, y, z) order, so present the reversed view
    return Image(np.ascontiguousarray(arr.transpose(2, 1, 0)).astype(np.float32),
                 spacing)


def GetArrayFromImage(im: Image) -> np.ndarray:
    return im.array


def GetImageFromArray(array: np.ndarray) -> Image:
    return Image(np.asarray(array))


def LabelContour(im: Image) -> Image:
    """Face-connected boundary voxels of each nonzero label."""
    arr = im.array
    contour = np.zeros_like(arr)
    for label in np.unique(arr):
        if label == 0:
            continue
        binary = arr == label
        interior = ndimage.binary_erosion(
            binary, structure=ndimage.generate_binary_structure(binary.ndim, 1))
        contour[binary & ~interior] = label
    out = Image(contour)
    out._spacing = im._spacing
    return out


class HausdorffDistanceImageFilter:
    """Average Hausdorff distance between nonzero voxel sets.

    Matches sitk's definition: the mean, over both directions, of the mean
    distance from each nonzero voxel of one image to the nearest nonzero
    voxel of the other, in physical units.
    """

    def __init__(self):
        self._avg = None

    def Execute(self, a: Image, b: Image):
        mask_a = a.array != 0
        mask_b = b.array != 0
        if not mask_a.any() or not mask_b.any():
            raise RuntimeError("empty label in HausdorffDistanceImageFilter")
        # spacing tuple is (x, y, z) in sitk; arrays here are (z, y, x)
        sampling = tuple(reversed(a._spacing[: mask_a.ndim]))
        d_to_b = ndimage.distance_transform_edt(~mask_b, sampling=sampling)
        d_to_a = ndimage.distance_transform_edt(~mask_a, sampling=sampling)
        self._avg = 0.5 * (float(d_to_b[mask_a].mean())
                           + float(d_to_a[mask_b].mean()))

    def GetAverageHausdorffDistance(self):
        if self._avg is None:
            raise RuntimeError("Execute not called")
        return self._avg


class LabelOverlapMeasuresImageFilter:
    def Execute(self, a, b):  # pragma: no cover - GPU=False path unused
        raise NotImplementedError("shim: only the GPU Dice path is supported")

    def GetDiceCoefficient(self):  # pragma: no cover
        raise NotImplementedError
