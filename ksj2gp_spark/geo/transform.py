"""Datum transforms: Tokyo (Bessel) → WGS84, vectorized in numpy.

Behavioral spec: /root/reference/rust/src/transform_coord.rs:111-164 and
the proj strings at /root/reference/rust/src/crs/mod.rs:12-20 — a
3-parameter Helmert shift ``+towgs84=-146.414,507.337,680.507`` from the
Bessel 1841 ellipsoid, which is exactly what proj applies for
EPSG:4301→EPSG:4326. JGD2000/JGD2011 → WGS84 is identity (the
reference's documented decision, docs/design.md:81-87).

Pipeline: geodetic(Bessel) → ECEF → +Δ → geodetic(WGS84), all numpy,
safe to call inside pandas UDFs on whole Arrow batches.
"""

from __future__ import annotations

import numpy as np

# Ellipsoids: (semi-major axis a, inverse flattening 1/f)
BESSEL = (6377397.155, 299.1528128)
WGS84 = (6378137.0, 298.257223563)

# towgs84 shift for Tokyo datum (crs/mod.rs:15-20)
TOKYO_TOWGS84 = np.array([-146.414, 507.337, 680.507])


def _geodetic_to_ecef(lon_deg, lat_deg, h, ellps):
    a, inv_f = ellps
    f = 1.0 / inv_f
    e2 = f * (2 - f)
    lon = np.radians(lon_deg)
    lat = np.radians(lat_deg)
    sin_lat = np.sin(lat)
    n = a / np.sqrt(1 - e2 * sin_lat * sin_lat)
    x = (n + h) * np.cos(lat) * np.cos(lon)
    y = (n + h) * np.cos(lat) * np.sin(lon)
    z = (n * (1 - e2) + h) * sin_lat
    return x, y, z


def _ecef_to_geodetic(x, y, z, ellps, iters: int = 15):
    a, inv_f = ellps
    f = 1.0 / inv_f
    e2 = f * (2 - f)
    lon = np.arctan2(y, x)
    p = np.hypot(x, y)
    # Bowring-style fixed-point iteration; converges to sub-mm in a few
    # rounds for surface points.
    lat = np.arctan2(z, p * (1 - e2))
    for _ in range(iters):
        sin_lat = np.sin(lat)
        n = a / np.sqrt(1 - e2 * sin_lat * sin_lat)
        h = p / np.cos(lat) - n
        lat = np.arctan2(z, p * (1 - e2 * n / (n + h)))
    sin_lat = np.sin(lat)
    n = a / np.sqrt(1 - e2 * sin_lat * sin_lat)
    h = p / np.cos(lat) - n
    return np.degrees(lon), np.degrees(lat), h


def tokyo_to_wgs84(
    lon: np.ndarray, lat: np.ndarray, h: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Transform Tokyo-datum geodetic coords to WGS84 (vectorized)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    hh = np.zeros_like(lon) if h is None else np.asarray(h, dtype=np.float64)
    x, y, z = _geodetic_to_ecef(lon, lat, hh, BESSEL)
    x = x + TOKYO_TOWGS84[0]
    y = y + TOKYO_TOWGS84[1]
    z = z + TOKYO_TOWGS84[2]
    return _ecef_to_geodetic(x, y, z, WGS84)


def wgs84_to_tokyo(
    lon: np.ndarray, lat: np.ndarray, h: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse transform (used by tests to build Tokyo-datum fixtures)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    hh = np.zeros_like(lon) if h is None else np.asarray(h, dtype=np.float64)
    x, y, z = _geodetic_to_ecef(lon, lat, hh, WGS84)
    x = x - TOKYO_TOWGS84[0]
    y = y - TOKYO_TOWGS84[1]
    z = z - TOKYO_TOWGS84[2]
    return _ecef_to_geodetic(x, y, z, BESSEL)


def to_wgs84(
    lon: np.ndarray, lat: np.ndarray, crs: str
) -> tuple[np.ndarray, np.ndarray]:
    """CRS dispatch used by the indexing lane: Tokyo transforms,
    JGD2000/JGD2011/WGS84 are identity (reference semantics)."""
    if crs == "Tokyo":
        lo, la, _ = tokyo_to_wgs84(lon, lat)
        return lo, la
    return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)


def tokyo_geometry_to_wgs84(g):
    """Structure-preserving Tokyo→WGS84 over a parsed Geometry:
    MultiPolygon parts stay parts (flattening them into one Polygon
    would turn every extra exterior into a hole under the even-odd
    PIP rule), rings stay rings, Z is dropped (the 2-D engine lanes)."""
    from . import wkb

    def rp(arr: np.ndarray) -> np.ndarray:
        lo, la, _ = tokyo_to_wgs84(arr[:, 0], arr[:, 1])
        return np.column_stack([lo, la])

    if g.kind == wkb.POINT:
        lo, la, _ = tokyo_to_wgs84(
            np.array([g.coords[0]]), np.array([g.coords[1]])
        )
        return wkb.Geometry(wkb.POINT, np.array([lo[0], la[0]]))
    if g.kind in (wkb.LINESTRING, wkb.MULTIPOINT):
        return wkb.Geometry(g.kind, rp(g.coords))
    if g.kind in (wkb.POLYGON, wkb.MULTILINESTRING):
        return wkb.Geometry(g.kind, [rp(r) for r in g.coords])
    if g.kind == wkb.MULTIPOLYGON:
        return wkb.Geometry(
            wkb.MULTIPOLYGON, [[rp(r) for r in part] for part in g.coords]
        )
    raise ValueError(f"reproject on {g.name}")
