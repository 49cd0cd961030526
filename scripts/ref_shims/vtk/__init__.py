"""Minimal vtk stand-in (reference utils/util.py:13-14 imports).

Only ``load_field`` touches this (reference utils/util.py:94-111), and only
the reference's own tests call ``load_field`` — the trainer never does.
The class is a guard stub so the import succeeds.
"""


class vtkStructuredPointsReader:  # pragma: no cover - never exercised
    def SetFileName(self, *_):
        raise NotImplementedError("vtk shim: load_field is not supported")
