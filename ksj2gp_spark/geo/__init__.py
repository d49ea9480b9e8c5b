"""Vectorized numpy geometry kernels: WKB, PIP/distance, datum
transforms, and three cell-index schemes (square grid / hex / S2)."""

from . import geom, grid, hexgrid, s2, transform, wkb

__all__ = ["geom", "grid", "hexgrid", "s2", "transform", "wkb"]
