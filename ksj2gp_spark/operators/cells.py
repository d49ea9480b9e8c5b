"""Cell-indexing operators: attach H3-style hex / S2 / grid cell ids to
point DataFrames and build polygon cell covers.

Spark mapping (SURVEY.md §2, operators "Index"):
* point → cell is a vectorized pandas UDF (Arrow batches, numpy inside;
  no per-row Python) — except the grid scheme, which is pure Catalyst
  integer arithmetic (whole-stage codegen, no Python at all).
* polygon → cover is computed once per polygon; the polygons side of
  the join is small (KSJ admin layers), so covers are built driver-side
  and broadcast. A distributed ``applyInPandas`` path exists for large
  layers.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from ..geo import geom as geom_mod
from ..geo import grid, hexgrid, s2, transform, wkb

SCHEMES = ("hex", "s2", "grid")


def _cell_fn(scheme: str, res: int):
    if scheme == "hex":
        return lambda lon, lat: hexgrid.latlng_to_cell(lon, lat, res)
    if scheme == "s2":
        return lambda lon, lat: s2.latlng_to_cell(lon, lat, res)
    if scheme == "grid":
        return lambda lon, lat: grid.latlng_to_cell(lon, lat, res)
    raise ValueError(f"unknown cell scheme: {scheme}")


def with_cell(
    df: DataFrame,
    scheme: str,
    res: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    out_col: str = "cell",
    crs: str | None = None,
) -> DataFrame:
    """Add a cell-id column. ``crs`` (e.g. "Tokyo") reprojects to WGS84
    inside the same Arrow batch before indexing."""
    if scheme == "grid":
        # Pure Catalyst: identical arithmetic to grid.oracle_sql_expr.
        size = 360.0 / (1 << res)
        i = F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(size)).cast("long")
        j = F.floor((F.col(lat_col) + F.lit(90.0)) / F.lit(size)).cast("long")
        return df.withColumn(
            out_col,
            (F.lit(res) * F.lit(1 << 58) + i * F.lit(1 << 29) + j).cast("long"),
        )

    fn = _cell_fn(scheme, res)
    crs_name = crs

    @pandas_udf("long")
    def cell_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
        lo = lon.to_numpy(dtype=np.float64)
        la = lat.to_numpy(dtype=np.float64)
        if crs_name:
            lo, la = transform.to_wgs84(lo, la, crs_name)
        return pd.Series(fn(lo, la))

    return df.withColumn(out_col, cell_udf(F.col(lon_col), F.col(lat_col)))


def cover_fn(scheme: str, res: int):
    if scheme == "hex":
        return lambda g: hexgrid.cover_geometry(g, res)
    if scheme == "s2":
        return lambda g: s2.cover_geometry(g, res)
    if scheme == "grid":
        return lambda g: grid.cover_geometry(g, res)
    raise ValueError(f"unknown cell scheme: {scheme}")


def normalize_polygons(pdf: pd.DataFrame) -> pd.DataFrame:
    """Reproject polygon WKB to WGS84 per the ``crs`` column (Tokyo →
    Helmert; JGD2000/2011 identity — reference semantics)."""
    if "crs" not in pdf.columns:
        return pdf
    out = pdf.copy()
    geoms = []
    for buf, crs in zip(out["geometry"], out["crs"]):
        if crs == "Tokyo":
            buf = wkb.dumps(
                transform.tokyo_geometry_to_wgs84(wkb.loads(buf))
            )
        geoms.append(buf)
    out["geometry"] = geoms
    out["crs"] = "WGS84"
    return out


def simplify_polygons(pdf: pd.DataFrame, tol: float) -> pd.DataFrame:
    """Douglas-Peucker-simplify the WKB ``geometry`` column (driver-side;
    the polygon layer is broadcast-small). Shrinks the vertex payload
    the spatial join ships to every executor — KSJ coastline/admin
    rings carry survey-resolution vertex counts, and at ``tol`` below
    the cell size the candidate-join cover is unchanged while the PIP
    refine only moves classifications within ``tol`` of the boundary
    (the DP deviation guarantee, geo/geom.py:simplify_chain)."""
    if tol <= 0.0:
        return pdf
    out = pdf.copy()
    out["geometry"] = [
        wkb.dumps(geom_mod.simplify_geometry(wkb.loads(buf), tol))
        for buf in out["geometry"]
    ]
    return out


def polygon_cover_pdf(
    polygons: pd.DataFrame,
    scheme: str,
    res: int,
    id_col: str = "polygon_id",
    extra_cols: Iterable[str] = (),
) -> pd.DataFrame:
    """Driver-side cover: long (cell, polygon_id, *extra) DataFrame.
    The polygons layer is assumed broadcast-small (KSJ scale)."""
    fn = cover_fn(scheme, res)
    cells_out: list[np.ndarray] = []
    ids_out: list[str] = []
    extras: dict[str, list] = {c: [] for c in extra_cols}
    for _, row in polygons.iterrows():
        cells = fn(wkb.loads(row["geometry"]))
        cells_out.append(cells)
        ids_out.extend([row[id_col]] * len(cells))
        for c in extra_cols:
            extras[c].extend([row[c]] * len(cells))
    data = {
        "cell": np.concatenate(cells_out) if cells_out else np.array([], dtype=np.int64),
        id_col: ids_out,
    }
    data.update(extras)
    return pd.DataFrame(data)


def polygon_cover_df(
    polygons: DataFrame,
    scheme: str,
    res: int,
    id_col: str = "polygon_id",
) -> DataFrame:
    """Distributed cover for large polygon layers: one applyInPandas
    pass, output long (cell, polygon_id). Partitioned by polygon id so
    cover computation parallelizes across executors."""
    fn = cover_fn(scheme, res)

    def explode(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                cells = fn(wkb.loads(row["geometry"]))
                yield pd.DataFrame(
                    {"cell": cells, id_col: [row[id_col]] * len(cells)}
                )

    return polygons.mapInPandas(explode, schema=f"cell long, {id_col} string")
