"""Minimal WKB (well-known binary) codec on numpy arrays.

The engine's geometry column is WKB bytes, mirroring the reference's
GeoArrow-WKB physical layout (/root/reference/rust/src/builder.rs:237-240,
322-328). Supports Point, LineString, Polygon, MultiPoint,
MultiLineString, MultiPolygon in 2D and Z variants (ISO +1000 codes and
the 0x80000000 EWKB flag, both accepted on read; ISO written).

Coordinates are numpy float64 arrays of shape (n, 2+has_z+has_m) with
column order x, y, [z], [m]; a Polygon is a list of rings (first
exterior, rest holes); Multi* are lists of parts. This is the exchange
format all geo kernels share.

M (measure) ordinates mirror the reference's GPKG lane, which accepts
M-typed shapefiles and declares Dimension::Xym / Xyzm
(/root/reference/rust/src/writer/gpkg_writer.rs:93-127). ISO codes
+2000 (XYM) and +3000 (XYZM) plus the EWKB 0x40000000 flag are read;
ISO is written.
"""

from __future__ import annotations

import struct

import numpy as np

POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6

_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
}


class WkbError(ValueError):
    pass


class Geometry:
    """Parsed geometry: ``kind`` is the base WKB code, ``coords`` layout
    depends on kind (see module docstring)."""

    __slots__ = ("kind", "coords", "has_z", "has_m")

    def __init__(
        self, kind: int, coords, has_z: bool = False, has_m: bool = False
    ):
        self.kind = kind
        self.coords = coords
        self.has_z = has_z
        self.has_m = has_m

    def drop_m(self) -> "Geometry":
        """Strip the M ordinate (reference's GeoParquet/GeoJSON transform
        path carries XY/XYZ only, transform_coord.rs:21-107)."""
        if not self.has_m:
            return self
        keep = 3 if self.has_z else 2

        def cut(a):
            return np.ascontiguousarray(np.asarray(a)[..., :keep])

        k = self.kind
        if k == POINT:
            coords = np.asarray(self.coords)[:keep].copy()
        elif k in (LINESTRING, MULTIPOINT):
            coords = cut(self.coords)
        elif k in (POLYGON, MULTILINESTRING):
            coords = [cut(r) for r in self.coords]
        else:  # MULTIPOLYGON
            coords = [[cut(r) for r in poly] for poly in self.coords]
        return Geometry(k, coords, self.has_z, False)

    @property
    def name(self) -> str:
        return _NAMES[self.kind]

    def rings(self) -> list[np.ndarray]:
        """All rings for Polygon/MultiPolygon (exterior+holes, flattened)."""
        if self.kind == POLYGON:
            return list(self.coords)
        if self.kind == MULTIPOLYGON:
            return [r for poly in self.coords for r in poly]
        raise WkbError(f"rings() on {self.name}")

    def exterior_rings(self) -> list[np.ndarray]:
        """Exterior ring per polygon part; holes via hole_rings()."""
        if self.kind == POLYGON:
            return [self.coords[0]]
        if self.kind == MULTIPOLYGON:
            return [poly[0] for poly in self.coords]
        raise WkbError(f"exterior_rings() on {self.name}")

    def all_coords(self) -> np.ndarray:
        """Every vertex as one (n, dims) array."""
        if self.kind == POINT:
            return self.coords.reshape(1, -1)
        if self.kind in (LINESTRING, MULTIPOINT):
            return self.coords
        if self.kind in (POLYGON, MULTILINESTRING):
            return (
                np.concatenate(self.coords)
                if self.coords
                else np.empty((0, 2))
            )
        arrs = [r for poly in self.coords for r in poly]
        return np.concatenate(arrs) if arrs else np.empty((0, 2))

    def bounds(self) -> tuple[float, float, float, float]:
        c = self.all_coords()
        return (
            float(c[:, 0].min()),
            float(c[:, 1].min()),
            float(c[:, 0].max()),
            float(c[:, 1].max()),
        )


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def geometry(self) -> Geometry:
        byte_order = self.buf[self.pos]
        self.pos += 1
        self.end = "<" if byte_order == 1 else ">"
        (code,) = struct.unpack_from(self.end + "I", self.buf, self.pos)
        self.pos += 4
        has_z = False
        has_m = False
        if code & 0x80000000:  # EWKB Z flag
            has_z = True
        if code & 0x40000000:  # EWKB M flag
            has_m = True
        code &= 0x0FFFFFFF
        if code >= 3000:  # ISO ZM
            has_z = has_m = True
            code -= 3000
        elif code >= 2000:  # ISO M
            has_m = True
            code -= 2000
        elif code >= 1000:  # ISO Z
            has_z = True
            code -= 1000
        dims = 2 + has_z + has_m
        if code == POINT:
            return Geometry(POINT, self._coords(1, dims)[0], has_z, has_m)
        if code in (LINESTRING, MULTIPOINT):
            if code == MULTIPOINT:
                n = self._u32()
                pts = []
                for _ in range(n):
                    g = self.geometry()
                    if g.kind != POINT:
                        raise WkbError("MultiPoint member not Point")
                    pts.append(g.coords)
                arr = (
                    np.vstack(pts) if pts else np.empty((0, dims))
                )
                return Geometry(MULTIPOINT, arr, has_z, has_m)
            return Geometry(
                code, self._coords(self._u32(), dims), has_z, has_m
            )
        if code == POLYGON:
            return Geometry(POLYGON, self._rings(dims), has_z, has_m)
        if code in (MULTILINESTRING, MULTIPOLYGON):
            n = self._u32()
            parts = []
            for _ in range(n):
                g = self.geometry()
                parts.append(g.coords)
                has_z = has_z or g.has_z
                has_m = has_m or g.has_m
            return Geometry(code, parts, has_z, has_m)
        raise WkbError(f"Unsupported WKB geometry code: {code}")

    def _u32(self) -> int:
        (v,) = struct.unpack_from(self.end + "I", self.buf, self.pos)
        self.pos += 4
        return v

    def _coords(self, n: int, dims: int) -> np.ndarray:
        nbytes = n * dims * 8
        arr = np.frombuffer(
            self.buf, dtype=self.end + "f8", count=n * dims, offset=self.pos
        ).reshape(n, dims)
        self.pos += nbytes
        return arr.astype(np.float64, copy=True)

    def _rings(self, dims: int) -> list[np.ndarray]:
        return [self._coords(self._u32(), dims) for _ in range(self._u32())]


def loads(buf: bytes) -> Geometry:
    """Parse one WKB geometry."""
    if not buf:
        raise WkbError("empty WKB buffer")
    try:
        return _Reader(bytes(buf)).geometry()
    except (struct.error, IndexError, ValueError) as e:
        if isinstance(e, WkbError):
            raise
        raise WkbError(f"truncated or malformed WKB: {e}") from e


def _code(kind: int, has_z: bool, has_m: bool = False) -> int:
    return kind + (1000 if has_z else 0) + (2000 if has_m else 0)


def _write_coords(out: list[bytes], arr: np.ndarray) -> None:
    out.append(np.ascontiguousarray(arr, dtype="<f8").tobytes())


def dumps(geom: Geometry) -> bytes:
    """Serialize a Geometry to little-endian ISO WKB."""
    out: list[bytes] = [
        b"\x01",
        struct.pack("<I", _code(geom.kind, geom.has_z, geom.has_m)),
    ]
    k = geom.kind
    if k == POINT:
        _write_coords(out, np.asarray(geom.coords, dtype=np.float64))
    elif k == LINESTRING:
        out.append(struct.pack("<I", len(geom.coords)))
        _write_coords(out, geom.coords)
    elif k == MULTIPOINT:
        pts = np.asarray(geom.coords, dtype=np.float64)
        out.append(struct.pack("<I", len(pts)))
        for p in pts:
            out.append(b"\x01")
            out.append(struct.pack("<I", _code(POINT, geom.has_z, geom.has_m)))
            _write_coords(out, p)
    elif k == POLYGON:
        out.append(struct.pack("<I", len(geom.coords)))
        for ring in geom.coords:
            out.append(struct.pack("<I", len(ring)))
            _write_coords(out, ring)
    elif k in (MULTILINESTRING, MULTIPOLYGON):
        child = LINESTRING if k == MULTILINESTRING else POLYGON
        out.append(struct.pack("<I", len(geom.coords)))
        for part in geom.coords:
            out.append(dumps(Geometry(child, part, geom.has_z, geom.has_m)))
    else:
        raise WkbError(f"Unsupported geometry kind: {k}")
    return b"".join(out)


def point(x: float, y: float, z: float | None = None) -> bytes:
    coords = [x, y] if z is None else [x, y, z]
    return dumps(Geometry(POINT, np.array(coords), z is not None))


def polygon(*rings) -> bytes:
    """Build polygon WKB from rings (sequences of (x, y) pairs). Rings
    are closed automatically if needed."""
    closed = []
    for r in rings:
        arr = np.asarray(r, dtype=np.float64)
        if not np.array_equal(arr[0], arr[-1]):
            arr = np.vstack([arr, arr[:1]])
        closed.append(arr)
    return dumps(Geometry(POLYGON, closed))


def multipolygon(polys) -> bytes:
    """polys: list of list-of-rings."""
    parts = []
    for rings in polys:
        closed = []
        for r in rings:
            arr = np.asarray(r, dtype=np.float64)
            if not np.array_equal(arr[0], arr[-1]):
                arr = np.vstack([arr, arr[:1]])
            closed.append(arr)
        parts.append(closed)
    return dumps(Geometry(MULTIPOLYGON, parts))
