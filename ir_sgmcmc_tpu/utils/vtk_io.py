"""Minimal VTK structured-points I/O for vector fields and grids.

The reference saves displacement fields and deformed grids as VTK
structured-points datasets via tvtk (logger/logger.py:35-81) and loads them
with vtkStructuredPointsReader (utils/util.py:94-111).  tvtk/vtk aren't in
this image; the legacy VTK file format is simple enough to emit and parse
directly (binary, big-endian, one POINT_DATA vector array named 'field').
"""

from __future__ import annotations

import numpy as np


def write_vtk_field(path, field: np.ndarray, spacing=(1.0, 1.0, 1.0)) -> None:
    """Write a ``(3, D, H, W)`` vector field (channel 0 = x/W axis).

    Points are laid out x-fastest, matching VTK's structured-points order.
    """
    assert field.ndim == 4 and field.shape[0] == 3, field.shape
    D, H, W = field.shape[1:]
    # (D,H,W,3) with x-fastest flattening: iterate z (D) slowest
    vecs = np.moveaxis(field.astype(">f4"), 0, -1).reshape(-1, 3)

    header = (
        "# vtk DataFile Version 3.0\n"
        "ir-sgmcmc-tpu field\n"
        "BINARY\n"
        "DATASET STRUCTURED_POINTS\n"
        f"DIMENSIONS {W} {H} {D}\n"
        "ORIGIN 0 0 0\n"
        f"SPACING {spacing[0]} {spacing[1]} {spacing[2]}\n"
        f"POINT_DATA {D * H * W}\n"
        "VECTORS field float\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(vecs.tobytes())
        f.write(b"\n")


def read_vtk_field(path) -> np.ndarray:
    """Read a field written by :func:`write_vtk_field` -> ``(3, D, H, W)``."""
    with open(path, "rb") as f:
        raw = f.read()
    head_end = raw.index(b"VECTORS field float\n") + len(b"VECTORS field float\n")
    header = raw[:head_end].decode("ascii", errors="replace")
    dims_line = next(l for l in header.splitlines() if l.startswith("DIMENSIONS"))
    W, H, D = (int(t) for t in dims_line.split()[1:4])
    n = D * H * W
    vecs = np.frombuffer(raw, dtype=">f4", count=n * 3, offset=head_end)
    field = vecs.reshape(D, H, W, 3).astype(np.float32)
    return np.moveaxis(field, -1, 0)
