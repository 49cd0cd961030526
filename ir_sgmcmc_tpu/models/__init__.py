from .transformation import BSplineFFD3D, SVF3D, SVFFD3D, make_transformation

__all__ = ["SVF3D", "SVFFD3D", "BSplineFFD3D", "make_transformation"]
