"""vtk.util.numpy_support stub — only imported, never called by the trainer."""


def vtk_to_numpy(_array):  # pragma: no cover - never exercised
    raise NotImplementedError("vtk shim: load_field is not supported")
