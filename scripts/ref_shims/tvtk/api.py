"""Minimal tvtk.api stand-in (reference logger/logger.py:35-81 surface).

``tvtk.ImageData`` + ``write_data`` produce real legacy-VTK
structured-points files via this framework's vtk_io, so the reference's
displacement/mean/std-dev dumps are loadable for the head-to-head
comparison.  ``StructuredGrid`` (deformed-grid dumps, never called from the
reference trainer) is accepted and written as a no-op marker file.
"""

from __future__ import annotations

import numpy as np


class _NamedVectors:
    def __init__(self, array):
        self.array = np.asarray(array)
        self.name = None


class _PointData:
    def __init__(self):
        self._vectors = None

    @property
    def vectors(self):
        return self._vectors

    @vectors.setter
    def vectors(self, value):
        self._vectors = _NamedVectors(value)


class _ImageData:
    def __init__(self, spacing=(1.0, 1.0, 1.0), origin=(0, 0, 0),
                 dimensions=None):
        self.spacing = tuple(np.ravel(np.asarray(spacing, dtype=float)))
        if len(self.spacing) == 1:
            self.spacing = self.spacing * 3
        self.origin = origin
        self.dimensions = tuple(int(d) for d in dimensions)  # (W, H, D)
        self.point_data = _PointData()


class _StructuredGrid:
    def __init__(self, dimensions=None, points=None):
        self.dimensions = dimensions
        self.points = points


class _TvtkNamespace:
    ImageData = _ImageData
    StructuredGrid = _StructuredGrid


tvtk = _TvtkNamespace()


def write_data(obj, path):
    from ir_sgmcmc_tpu.utils.vtk_io import write_vtk_field

    path = str(path)
    if not path.endswith(".vtk"):
        path = path + ".vtk"
    if isinstance(obj, _ImageData):
        W, H, D = obj.dimensions
        vecs = obj.point_data.vectors.array.reshape(D, H, W, 3)
        field = np.moveaxis(vecs, -1, 0).astype(np.float32)
        write_vtk_field(path, field, spacing=obj.spacing)
    else:  # StructuredGrid — not needed for the comparison
        with open(path, "w") as f:
            f.write("# structured-grid dump skipped by tvtk shim\n")
