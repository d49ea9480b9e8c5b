"""GeoPackage sink (reference S7, ``rust/src/writer/gpkg_writer.rs:14-91``).

A GeoPackage is a single SQLite file — inherently a single-node export,
exactly like the reference's writer (row-by-row inserts into one
``.gpkg``, gpkg_writer.rs:68-78). The sink therefore collects the
DataFrame driver-side (``toPandas``) and writes with the stdlib
``sqlite3``; the distributed/scale output path remains GeoParquet
(sinks/geoparquet.py). Use this for interoperable small exports — the
role GPKG plays in the reference.

Semantics matched to the reference:

* SRS registration when the dataset CRS is not EPSG:4326
  (gpkg_writer.rs:42-52) — JGD2011→6668, JGD2000→4612, Tokyo→4301.
* Layer creation with fid primary key + typed attribute columns
  (gpkg_writer.rs:57-66); dBASE-derived Spark types map back to SQLite
  TEXT/REAL/INTEGER/BOOLEAN/DATE.
* Shape *classes* map to geometry types: Point→Point,
  MultiPoint→MultiPoint, LineString→MultiLineString,
  Polygon→MultiPolygon (gpkg_writer.rs:93-127); single-part values are
  promoted to the declared multi-class.
* Unsupported geometry kinds are rejected (the NullShape/Multipatch
  rule, gpkg_writer.rs:109-112).
"""

from __future__ import annotations

import os
import sqlite3
import struct

import numpy as np
import pandas as pd

from ..geo import wkb

# GPKG application_id 'GPKG' and user_version 1.3.0 (spec §1.1.1.1.1)
_APPLICATION_ID = 0x47504B47
_USER_VERSION = 10300

# CRS name → (srs_id, organization, org_coordsys_id, definition name)
_SRS = {
    "WGS84": 4326,
    "JGD2011": 6668,
    "JGD2000": 4612,
    "Tokyo": 4301,
}

# shape class → declared GPKG geometry type (gpkg_writer.rs:93-127)
_DECLARED = {
    wkb.POINT: "POINT",
    wkb.MULTIPOINT: "MULTIPOINT",
    wkb.LINESTRING: "MULTILINESTRING",
    wkb.MULTILINESTRING: "MULTILINESTRING",
    wkb.POLYGON: "MULTIPOLYGON",
    wkb.MULTIPOLYGON: "MULTIPOLYGON",
}

_PROMOTE = {
    "MULTILINESTRING": (wkb.LINESTRING, wkb.MULTILINESTRING),
    "MULTIPOLYGON": (wkb.POLYGON, wkb.MULTIPOLYGON),
    "POINT": (wkb.POINT,),
    "MULTIPOINT": (wkb.MULTIPOINT,),
}


def _promote(g: wkb.Geometry, declared: str) -> wkb.Geometry:
    """Promote a single-part geometry to the declared multi-class."""
    if declared == "MULTIPOLYGON" and g.kind == wkb.POLYGON:
        return wkb.Geometry(
            wkb.MULTIPOLYGON, [list(g.coords)], g.has_z, g.has_m
        )
    if declared == "MULTILINESTRING" and g.kind == wkb.LINESTRING:
        return wkb.Geometry(wkb.MULTILINESTRING, [g.coords], g.has_z, g.has_m)
    return g


def gpkg_geometry_blob(g: wkb.Geometry, srs_id: int) -> bytes:
    """GeoPackageBinary: 'GP' magic, version 0, flags (little-endian,
    XY envelope), srs_id, envelope, then standard WKB (spec §2.1.3)."""
    minx, miny, maxx, maxy = g.bounds()
    # flags: bit0 byte-order=1 (LE), envelope indicator 1 (XY) → 0b0011
    header = struct.pack(
        "<2sBBi4d", b"GP", 0, 0b0011, srs_id, minx, maxx, miny, maxy
    )
    return header + wkb.dumps(g)


def parse_gpkg_blob(buf: bytes) -> wkb.Geometry:
    """Inverse of :func:`gpkg_geometry_blob` (header-size from flags)."""
    if buf[:2] != b"GP":
        raise wkb.WkbError("not a GeoPackageBinary blob")
    flags = buf[3]
    envelope_ind = (flags >> 1) & 0b111
    n_env = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}[envelope_ind]
    return wkb.loads(buf[8 + 8 * n_env :])


def _sqlite_type(dtype) -> str:
    if pd.api.types.is_bool_dtype(dtype):
        return "BOOLEAN"
    if pd.api.types.is_integer_dtype(dtype):
        return "INTEGER"
    if pd.api.types.is_float_dtype(dtype):
        return "REAL"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "DATE"
    return "TEXT"


def _ensure_gpkg_tables(cur: sqlite3.Cursor) -> None:
    cur.execute(f"PRAGMA application_id = {_APPLICATION_ID}")
    cur.execute(f"PRAGMA user_version = {_USER_VERSION}")
    cur.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
             srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
             organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
             definition TEXT NOT NULL, description TEXT)"""
    )
    cur.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_contents (
             table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
             identifier TEXT UNIQUE, description TEXT DEFAULT '',
             last_change DATETIME NOT NULL DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
             min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
             srs_id INTEGER,
             CONSTRAINT fk_gc_r_srs_id FOREIGN KEY (srs_id)
               REFERENCES gpkg_spatial_ref_sys(srs_id))"""
    )
    cur.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
             table_name TEXT NOT NULL, column_name TEXT NOT NULL,
             geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
             z TINYINT NOT NULL, m TINYINT NOT NULL,
             CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"""
    )
    # Mandatory SRS rows (spec §1.1.2.1.2): undefined cartesian (-1),
    # undefined geographic (0), WGS84 (4326).
    cur.executemany(
        "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        [
            ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
            ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
            (
                "WGS 84 geodetic",
                4326,
                "EPSG",
                4326,
                'GEOGCS["WGS 84",DATUM["WGS_1984",'
                'SPHEROID["WGS 84",6378137,298.257223563]],'
                'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
                "WGS 84",
            ),
        ],
    )


def _register_srs(cur: sqlite3.Cursor, crs_name: str) -> int:
    """Register the dataset SRS if it is not already present — the
    reference registers only when not 4326 (gpkg_writer.rs:42-52)."""
    srs_id = _SRS.get(crs_name)
    if srs_id is None:
        raise ValueError(f"unknown CRS for GPKG export: {crs_name}")
    if srs_id != 4326:
        cur.execute(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            (
                crs_name,
                srs_id,
                "EPSG",
                srs_id,
                f'GEOGCS["{crs_name}"]',  # minimal definition; EPSG id is authoritative
                f"{crs_name} geographic 2D (EPSG:{srs_id})",
            ),
        )
    return srs_id


def write_gpkg(
    df,
    path: str,
    layer: str = "layer1",
    geometry_col: str = "geometry",
    crs_name: str = "JGD2011",
) -> None:
    """Export a (small) geometry DataFrame to a ``.gpkg`` file.

    ``df`` may be a Spark DataFrame (collected driver-side — GPKG is a
    single-file format, same single-writer model as the reference) or a
    pandas DataFrame with a WKB ``geometry`` column.
    """
    pdf = df.toPandas() if hasattr(df, "toPandas") else df.copy()
    if geometry_col not in pdf.columns:
        raise ValueError(f"missing geometry column {geometry_col!r}")

    geoms = [wkb.loads(bytes(b)) for b in pdf[geometry_col]]
    if not geoms:
        raise ValueError("empty layer")
    declared = {_DECLARED.get(g.kind) for g in geoms}
    declared.discard(None)
    if len(declared) != 1:
        kinds = sorted({g.name for g in geoms})
        raise wkb.WkbError(f"unsupported/mixed geometry classes for GPKG: {kinds}")
    gtype = declared.pop()
    has_z = any(g.has_z for g in geoms)
    # M-typed shapefiles declare dimension Xym in gpkg_geometry_columns,
    # matching gpkg_writer.rs:116-127 (Dimension::Xym for *M shapes).
    has_m = any(g.has_m for g in geoms)

    attr_cols = [c for c in pdf.columns if c != geometry_col]
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        _ensure_gpkg_tables(cur)
        srs_id = _register_srs(cur, crs_name)

        col_defs = ", ".join(
            f'"{c}" {_sqlite_type(pdf[c].dtype)}' for c in attr_cols
        )
        sep = ", " if col_defs else ""
        cur.execute(
            f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY AUTOINCREMENT, '
            f'"{geometry_col}" BLOB{sep}{col_defs})'
        )
        cur.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,?,?)",
            (
                layer,
                geometry_col,
                gtype,
                srs_id,
                1 if has_z else 0,
                1 if has_m else 0,
            ),
        )

        blobs = [
            gpkg_geometry_blob(_promote(g, gtype), srs_id) for g in geoms
        ]
        rows = []
        for i in range(len(pdf)):
            vals = []
            for c in attr_cols:
                v = pdf[c].iloc[i]
                if v is None or (np.isscalar(v) and pd.isna(v)):
                    vals.append(None)
                elif isinstance(v, (np.integer,)):
                    vals.append(int(v))
                elif isinstance(v, (np.floating,)):
                    vals.append(float(v))
                elif isinstance(v, (pd.Timestamp,)):
                    vals.append(v.isoformat())
                else:
                    vals.append(v)
            rows.append((blobs[i], *vals))
        ph = ", ".join("?" * (1 + len(attr_cols)))
        quoted = "".join(f', "{c}"' for c in attr_cols)
        cur.executemany(
            f'INSERT INTO "{layer}" ("{geometry_col}"{quoted}) VALUES ({ph})',
            rows,
        )

        bounds = np.array([g.bounds() for g in geoms])
        cur.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
            "min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
            (
                layer,
                "features",
                layer,
                float(bounds[:, 0].min()),
                float(bounds[:, 1].min()),
                float(bounds[:, 2].max()),
                float(bounds[:, 3].max()),
                srs_id,
            ),
        )
        con.commit()
    finally:
        con.close()


def read_gpkg(path: str, layer: str | None = None) -> pd.DataFrame:
    """Read a feature layer back (test/inspection helper): returns a
    pandas DataFrame with the geometry column as standard WKB bytes."""
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        if layer is None:
            layer, geom_col = cur.execute(
                "SELECT table_name, column_name FROM gpkg_geometry_columns"
            ).fetchone()
        else:
            (geom_col,) = cur.execute(
                "SELECT column_name FROM gpkg_geometry_columns WHERE table_name=?",
                (layer,),
            ).fetchone()
        rows = cur.execute(f'SELECT * FROM "{layer}"').fetchall()
        cols = [d[0] for d in cur.description]
        pdf = pd.DataFrame(rows, columns=cols)
        pdf[geom_col] = [
            wkb.dumps(parse_gpkg_blob(b)) for b in pdf[geom_col]
        ]
        return pdf
    finally:
        con.close()
