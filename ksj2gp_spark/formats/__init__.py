"""File-format codecs: PNG, deterministic image codec, dBASE,
Shapefile, and ZIP-bundle source helpers."""

from . import dbf, imagecodec, png, shp, zipsrc

__all__ = ["dbf", "imagecodec", "png", "shp", "zipsrc"]
