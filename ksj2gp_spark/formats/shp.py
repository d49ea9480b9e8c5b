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
SHAPE_POINT_M = 21
SHAPE_POLYLINE_M = 23
SHAPE_POLYGON_M = 25
SHAPE_MULTIPOINT_M = 28
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
    # M-typed shapes (21/23/25/28) map to the same base geometry classes
    # as the reference's GPKG lane (gpkg_writer.rs:93-111). The spec's
    # trailing M block is optional on Z- and M-typed records; presence is
    # detected from the record length.
    is_m = stype in (SHAPE_POINT_M, SHAPE_POLYLINE_M, SHAPE_POLYGON_M, SHAPE_MULTIPOINT_M)
    base = {
        SHAPE_POINT: SHAPE_POINT,
        SHAPE_POINT_Z: SHAPE_POINT,
        SHAPE_POINT_M: SHAPE_POINT,
        SHAPE_POLYLINE: SHAPE_POLYLINE,
        SHAPE_POLYLINE_Z: SHAPE_POLYLINE,
        SHAPE_POLYLINE_M: SHAPE_POLYLINE,
        SHAPE_POLYGON: SHAPE_POLYGON,
        SHAPE_POLYGON_Z: SHAPE_POLYGON,
        SHAPE_POLYGON_M: SHAPE_POLYGON,
        SHAPE_MULTIPOINT: SHAPE_MULTIPOINT,
        SHAPE_MULTIPOINT_Z: SHAPE_MULTIPOINT,
        SHAPE_MULTIPOINT_M: SHAPE_MULTIPOINT,
    }.get(stype)
    if base is None:
        raise ShpError(f"unsupported shape type: {stype}")

    if base == SHAPE_POINT:
        x, y = struct.unpack_from("<dd", rec, 4)
        if has_z:
            (z,) = struct.unpack_from("<d", rec, 20)
            if len(rec) >= 36:  # optional trailing M on PointZ
                (m,) = struct.unpack_from("<d", rec, 28)
                return wkb.Geometry(
                    wkb.POINT, np.array([x, y, z, m]), True, True
                )
            return wkb.Geometry(wkb.POINT, np.array([x, y, z]), True)
        if is_m:
            (m,) = struct.unpack_from("<d", rec, 20)
            return wkb.Geometry(wkb.POINT, np.array([x, y, m]), False, True)
        return wkb.Geometry(wkb.POINT, np.array([x, y]))

    if base == SHAPE_MULTIPOINT:
        (n,) = struct.unpack_from("<i", rec, 36)
        pts = np.frombuffer(rec, dtype="<f8", count=n * 2, offset=40).reshape(
            n, 2
        )
        end = 40 + n * 16
        if has_z:
            zs = np.frombuffer(rec, dtype="<f8", count=n, offset=end + 16)
            pts = np.column_stack([pts, zs])
            end += 16 + n * 8
        has_m = (is_m or has_z) and len(rec) >= end + 16 + n * 8
        if has_m:
            ms = np.frombuffer(rec, dtype="<f8", count=n, offset=end + 16)
            pts = np.column_stack([pts, ms])
        return wkb.Geometry(wkb.MULTIPOINT, pts.copy(), has_z, has_m)

    # Polyline / Polygon: bbox(32) + numparts + numpoints + parts[] + pts
    nparts, npoints = struct.unpack_from("<ii", rec, 36)
    parts = list(
        struct.unpack_from(f"<{nparts}i", rec, 44)
    ) + [npoints]
    pts_off = 44 + nparts * 4
    pts = np.frombuffer(
        rec, dtype="<f8", count=npoints * 2, offset=pts_off
    ).reshape(npoints, 2)
    end = pts_off + npoints * 16
    if has_z:
        zs = np.frombuffer(rec, dtype="<f8", count=npoints, offset=end + 16)
        pts = np.column_stack([pts, zs])
        end += 16 + npoints * 8
    has_m = (is_m or has_z) and len(rec) >= end + 16 + npoints * 8
    if has_m:
        ms = np.frombuffer(rec, dtype="<f8", count=npoints, offset=end + 16)
        pts = np.column_stack([pts, ms])
    if not (has_z or has_m):
        pts = pts.copy()
    rings = [
        pts[parts[i] : parts[i + 1]].copy() for i in range(nparts)
    ]
    if base == SHAPE_POLYLINE:
        # Polyline → MultiLineString (transform_coord.rs:37-48)
        return wkb.Geometry(wkb.MULTILINESTRING, rings, has_z, has_m)
    # Polygon: all rings become one Polygon (transform_coord.rs:60-71)
    return wkb.Geometry(wkb.POLYGON, rings, has_z, has_m)


def write_shp(geoms: list[wkb.Geometry]) -> tuple[bytes, bytes]:
    """Serialize geometries to (.shp bytes, .shx bytes) — fixtures only.
    Supports Point, Polygon, MultiPoint, MultiLineString, each in base
    and M variants (M column is the last coordinate column)."""
    records = []
    offsets = []
    pos = 100
    stype_file = None
    for i, g in enumerate(geoms):
        if g.has_z:
            raise ShpError("fixture writer does not emit Z shapefiles")
        if g.kind == wkb.POINT:
            c = np.asarray(g.coords, dtype=np.float64)
            if g.has_m:
                content = struct.pack(
                    "<iddd", SHAPE_POINT_M, c[0], c[1], c[2]
                )
                stype = SHAPE_POINT_M
            else:
                stype = SHAPE_POINT
                content = struct.pack("<idd", stype, c[0], c[1])
        elif g.kind == wkb.MULTIPOINT:
            pts = np.asarray(g.coords, dtype=np.float64)
            stype = SHAPE_MULTIPOINT_M if g.has_m else SHAPE_MULTIPOINT
            content = struct.pack(
                "<idddd",
                stype,
                pts[:, 0].min(),
                pts[:, 1].min(),
                pts[:, 0].max(),
                pts[:, 1].max(),
            )
            content += struct.pack("<i", len(pts))
            content += np.ascontiguousarray(pts[:, :2], dtype="<f8").tobytes()
            if g.has_m:
                ms = pts[:, 2]
                content += struct.pack("<dd", ms.min(), ms.max())
                content += np.ascontiguousarray(ms, dtype="<f8").tobytes()
        elif g.kind in (wkb.POLYGON, wkb.MULTILINESTRING):
            if g.kind == wkb.POLYGON:
                stype = SHAPE_POLYGON_M if g.has_m else SHAPE_POLYGON
            else:
                stype = SHAPE_POLYLINE_M if g.has_m else SHAPE_POLYLINE
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
            if g.has_m:
                ms = allpts[:, 2]
                content += struct.pack("<dd", ms.min(), ms.max())
                content += np.ascontiguousarray(ms, dtype="<f8").tobytes()
        else:
            raise ShpError(
                f"fixture writer supports Point/Polygon/MultiPoint/"
                f"MultiLineString, not {g.name}"
            )
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
