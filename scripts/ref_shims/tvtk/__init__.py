"""tvtk package shim — see tvtk/api.py."""
