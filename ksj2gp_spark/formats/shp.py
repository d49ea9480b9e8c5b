"""ESRI Shapefile (.shp/.shx) reader/writer.

Behavioral spec: the reference reads shapes via the ``shapefile`` crate
and maps shape variants at /root/reference/rust/src/transform_coord.rs:
21-107 and writer/geoparquet_writer.rs:55-84: Point→Point,
Polyline→MultiLineString, Polygon rings→Polygon, Multipoint→MultiPoint,
Z variants flattened to 2D+optional z; NullShape and Multipatch are
rejected. The writer exists for deterministic test fixtures only.

Output geometries are ksj2gp_spark.geo.wkb.Geometry values so the rest
of the engine is format-agnostic.
"""

from __future__ import annotations

import struct

import numpy as np

from ..geo import wkb

SHAPE_NULL = 0
SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5
SHAPE_MULTIPOINT = 8
SHAPE_POINT_Z = 11
SHAPE_POLYLINE_Z = 13
SHAPE_POLYGON_Z = 15
SHAPE_MULTIPOINT_Z = 18
SHAPE_MULTIPATCH = 31


class ShpError(ValueError):
    pass


def read_shp(buf: bytes) -> list[wkb.Geometry | None]:
    """Parse all records of a .shp file. NullShape → None (rejected
    later with a quarantine count, matching the reference's error)."""
    if len(buf) < 100:
        raise ShpError("shp file too short")
    (code,) = struct.unpack_from(">i", buf, 0)
    if code != 9994:
        raise ShpError(f"bad shapefile magic: {code}")
    (file_len_words,) = struct.unpack_from(">i", buf, 24)
    end = min(len(buf), file_len_words * 2)
    geoms: list[wkb.Geometry | None] = []
    pos = 100
    while pos + 8 <= end:
        _recno, content_words = struct.unpack_from(">ii", buf, pos)
        if content_words <= 0:
            raise ShpError(f"corrupt record length: {content_words}")
        pos += 8
        rec = buf[pos : pos + content_words * 2]
        pos += content_words * 2
        try:
            geoms.append(_parse_record(rec))
        except ShpError:
            raise
        except (struct.error, ValueError, IndexError) as e:
            # corrupt counts/offsets inside a record: typed rejection,
            # never a raw struct/numpy error (fuzz-tested)
            raise ShpError(f"corrupt shp record: {e}") from e
    return geoms


def _parse_record(rec: bytes) -> wkb.Geometry | None:
    (stype,) = struct.unpack_from("<i", rec, 0)
    if stype == SHAPE_NULL:
        return None
    if stype == SHAPE_MULTIPATCH:
        raise ShpError("Multipatch is not supported")
    has_z = stype in (SHAPE_POINT_Z, SHAPE_POLYLINE_Z, SHAPE_POLYGON_Z, SHAPE_MULTIPOINT_Z)
    base = {
        SHAPE_POINT: SHAPE_POINT,
        SHAPE_POINT_Z: SHAPE_POINT,
        SHAPE_POLYLINE: SHAPE_POLYLINE,
        SHAPE_POLYLINE_Z: SHAPE_POLYLINE,
        SHAPE_POLYGON: SHAPE_POLYGON,
        SHAPE_POLYGON_Z: SHAPE_POLYGON,
        SHAPE_MULTIPOINT: SHAPE_MULTIPOINT,
        SHAPE_MULTIPOINT_Z: SHAPE_MULTIPOINT,
    }.get(stype)
    if base is None:
        raise ShpError(f"unsupported shape type: {stype}")

    if base == SHAPE_POINT:
        x, y = struct.unpack_from("<dd", rec, 4)
        if has_z:
            (z,) = struct.unpack_from("<d", rec, 20)
            return wkb.Geometry(wkb.POINT, np.array([x, y, z]), True)
        return wkb.Geometry(wkb.POINT, np.array([x, y]))

    if base == SHAPE_MULTIPOINT:
        (n,) = struct.unpack_from("<i", rec, 36)
        pts = np.frombuffer(rec, dtype="<f8", count=n * 2, offset=40).reshape(
            n, 2
        )
        if has_z:
            zoff = 40 + n * 16 + 16
            zs = np.frombuffer(rec, dtype="<f8", count=n, offset=zoff)
            pts = np.column_stack([pts, zs])
        return wkb.Geometry(wkb.MULTIPOINT, pts.copy(), has_z)

    # Polyline / Polygon: bbox(32) + numparts + numpoints + parts[] + pts
    nparts, npoints = struct.unpack_from("<ii", rec, 36)
    parts = list(
        struct.unpack_from(f"<{nparts}i", rec, 44)
    ) + [npoints]
    pts_off = 44 + nparts * 4
    pts = np.frombuffer(
        rec, dtype="<f8", count=npoints * 2, offset=pts_off
    ).reshape(npoints, 2)
    if has_z:
        zoff = pts_off + npoints * 16 + 16
        zs = np.frombuffer(rec, dtype="<f8", count=npoints, offset=zoff)
        pts = np.column_stack([pts, zs])
    else:
        pts = pts.copy()
    rings = [
        pts[parts[i] : parts[i + 1]].copy() for i in range(nparts)
    ]
    if base == SHAPE_POLYLINE:
        # Polyline → MultiLineString (transform_coord.rs:37-48)
        return wkb.Geometry(wkb.MULTILINESTRING, rings, has_z)
    # Polygon: all rings become one Polygon (transform_coord.rs:60-71)
    return wkb.Geometry(wkb.POLYGON, rings, has_z)


def write_shp(geoms: list[wkb.Geometry]) -> tuple[bytes, bytes]:
    """Serialize geometries to (.shp bytes, .shx bytes) — fixtures only.
    Supports Point and Polygon."""
    records = []
    offsets = []
    pos = 100
    stype_file = None
    for i, g in enumerate(geoms):
        if g.kind == wkb.POINT:
            stype = SHAPE_POINT
            content = struct.pack(
                "<idd", stype, float(g.coords[0]), float(g.coords[1])
            )
        elif g.kind == wkb.POLYGON:
            stype = SHAPE_POLYGON
            rings = g.coords
            npoints = sum(len(r) for r in rings)
            allpts = np.concatenate(rings)
            minx, miny = allpts[:, 0].min(), allpts[:, 1].min()
            maxx, maxy = allpts[:, 0].max(), allpts[:, 1].max()
            parts = []
            acc = 0
            for r in rings:
                parts.append(acc)
                acc += len(r)
            content = struct.pack(
                "<idddd", stype, minx, miny, maxx, maxy
            )
            content += struct.pack("<ii", len(rings), npoints)
            content += struct.pack(f"<{len(parts)}i", *parts)
            content += np.ascontiguousarray(
                allpts[:, :2], dtype="<f8"
            ).tobytes()
        else:
            raise ShpError(f"fixture writer supports Point/Polygon, not {g.name}")
        stype_file = stype if stype_file is None else stype_file
        header = struct.pack(">ii", i + 1, len(content) // 2)
        records.append(header + content)
        offsets.append((pos // 2, len(content) // 2))
        pos += len(header) + len(content)

    all_coords = (
        np.concatenate([g.all_coords()[:, :2] for g in geoms])
        if geoms
        else np.zeros((1, 2))
    )
    bbox = (
        float(all_coords[:, 0].min()),
        float(all_coords[:, 1].min()),
        float(all_coords[:, 0].max()),
        float(all_coords[:, 1].max()),
    )

    def file_header(total_words: int) -> bytes:
        h = struct.pack(">i", 9994) + bytes(20) + struct.pack(">i", total_words)
        h += struct.pack("<ii", 1000, stype_file or SHAPE_NULL)
        h += struct.pack("<dddd", *bbox)
        h += struct.pack("<dddd", 0, 0, 0, 0)  # z/m ranges
        return h

    body = b"".join(records)
    shp = file_header((100 + len(body)) // 2) + body
    shx_body = b"".join(
        struct.pack(">ii", off, length) for off, length in offsets
    )
    shx = file_header((100 + len(shx_body)) // 2) + shx_body
    return shp, shx
