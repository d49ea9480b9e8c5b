"""GeoParquet-style sink (reference S5) and GeoJSON sink (S6).

S5 semantics (geoparquet_writer.rs:15-100): WKB geometry column, a
**bbox covering** (the reference sets ``set_generate_covering(true)``)
and GeoParquet ``geo`` file metadata. In Spark the covering becomes
explicit ``bbox_xmin/ymin/xmax/ymax`` columns computed vectorized —
they land in parquet column statistics, so any engine (including this
one) gets min/max row-group pruning for spatial range predicates: the
reference's one optimizer-adjacent trick, generalized to a cluster.

S6 semantics (geojson_writer.rs:14-62): GeoJSON is the only sink that
reprojects — features are transformed to WGS84 before serialization.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..geo import transform, wkb

GEO_METADATA_VERSION = "1.1.0"


def with_bbox_covering(
    df: DataFrame, geometry_col: str = "geometry"
) -> DataFrame:
    """Add bbox covering columns from WKB (vectorized per Arrow batch).

    M ordinates are stripped here: the reference's GeoParquet/GeoJSON
    lane carries XY/XYZ only (transform_coord.rs:21-107; M survives only
    on the GPKG lane, gpkg_writer.rs:116-127)."""

    def add_bbox(batches):
        for pdf in batches:
            n = len(pdf)
            xmin = np.empty(n)
            ymin = np.empty(n)
            xmax = np.empty(n)
            ymax = np.empty(n)
            geo_out = None
            for i, buf in enumerate(pdf[geometry_col]):
                g = wkb.loads(buf)
                if g.has_m:
                    if geo_out is None:
                        geo_out = list(pdf[geometry_col])
                    geo_out[i] = wkb.dumps(g.drop_m())
                xmin[i], ymin[i], xmax[i], ymax[i] = g.bounds()
            out = pdf.copy()
            if geo_out is not None:
                out[geometry_col] = geo_out
            out["bbox_xmin"] = xmin
            out["bbox_ymin"] = ymin
            out["bbox_xmax"] = xmax
            out["bbox_ymax"] = ymax
            yield out

    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(c, T.DoubleType()) for c in
           ("bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax")]
    )
    return df.mapInPandas(add_bbox, schema=schema)


def geo_file_metadata(
    geometry_col: str = "geometry",
    crs_name: str = "JGD2011",
    geometry_types: list[str] | None = None,
) -> str:
    """GeoParquet ``geo`` metadata JSON for the parquet footer
    key-value blob (geoparquet_writer.rs:95-97 appends the same via
    ``append_key_value_metadata``). CRS is embedded as PROJJSON
    (builder.rs:322; geo/projjson.py carries the public EPSG
    definitions); unknown names → null, which GeoParquet reads as
    OGC:CRS84 (WGS84 lon-lat)."""
    from ..geo.projjson import PROJJSON

    return json.dumps(
        {
            "version": GEO_METADATA_VERSION,
            "primary_column": geometry_col,
            "columns": {
                geometry_col: {
                    "encoding": "WKB",
                    "geometry_types": geometry_types or [],
                    "crs": PROJJSON.get(crs_name),
                    "covering": {
                        "bbox": {
                            "xmin": ["bbox_xmin"],
                            "ymin": ["bbox_ymin"],
                            "xmax": ["bbox_xmax"],
                            "ymax": ["bbox_ymax"],
                        }
                    },
                }
            },
        },
        ensure_ascii=False,
    )


def hilbert_key_udf(level: int = 16):
    """bbox → int64 Hilbert-curve position (S2 cell id of the bbox
    center at ``level``, >>1 so the uint64 order survives int64).

    S2 cell ids at a fixed level are positions along a face-wise
    Hilbert curve, so range-partitioning on this key clusters rows
    into compact 2-D tiles instead of the x-then-y lexicographic
    strips a (xmin, ymin) sort produces. At 100 TB that is the
    difference between a bbox query touching O(√files) tiles and
    touching every x-strip that crosses the query's x-range."""
    from ..geo import s2

    @F.pandas_udf("long")
    def hk(
        xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series
    ) -> pd.Series:
        lon = ((xmin + xmax) * 0.5).to_numpy(dtype=np.float64)
        lat = ((ymin + ymax) * 0.5).to_numpy(dtype=np.float64)
        cells = s2.latlng_to_cell(lon, lat, level)
        return pd.Series((cells >> 1).astype(np.int64))

    return hk


def write_geoparquet(
    df: DataFrame,
    path: str,
    geometry_col: str = "geometry",
    crs_name: str = "JGD2011",
    sort_spatially: bool | str = True,
    n_files: int | None = None,
) -> list[dict]:
    """Write WKB rows as GeoParquet: bbox covering columns + the
    ``geo`` key-value blob in every file's parquet FOOTER, so
    third-party readers (GDAL, geopandas) recognize the output without
    any sidecar. Spark's JVM writer can't set footer metadata, so each
    partition writes its own file through pyarrow inside one
    ``mapInPandas`` pass — still fully distributed (one file per
    partition, shared filesystem assumed, same as any Spark sink).

    ``sort_spatially`` clusters rows so the bbox column min/max
    statistics become an effective spatial index at read time (tight
    per-file/row-group bounds instead of full-extent bounds):

    * ``True`` / ``"hilbert"`` (default) — range-partition + sort on
      the Hilbert-curve position of the bbox center (S2 cell id at
      level 16): files are compact 2-D tiles, so a bbox query touches
      O(√files) of them;
    * ``"range"`` — the round-1 lexicographic (bbox_xmin, bbox_ymin)
      sort: files are x-strips spanning the full y-extent, every strip
      crossing the query's x-range is touched;
    * ``False`` — keep the incoming partitioning.

    Returns the per-file manifest [{file, rows}, ...].
    """
    import os
    import shutil

    if sort_spatially not in (True, False, "hilbert", "range"):
        raise ValueError(
            f"sort_spatially must be bool|'hilbert'|'range', "
            f"got {sort_spatially!r}"
        )
    out = with_bbox_covering(df, geometry_col)
    n_parts = n_files or max(
        df.sparkSession.sparkContext.defaultParallelism, 1
    )
    persisted = None
    if sort_spatially is not False:
        # repartitionByRange runs a range-boundary sampling job over
        # the child plan BEFORE the real shuffle, so without a persist
        # the whole upstream pipeline (ZIP parse, translation, bbox
        # covering) executes twice per write. Cache the covered rows
        # across the sample + shuffle jobs; spills to disk when they
        # don't fit executor memory, released before returning.
        from pyspark import StorageLevel

        persisted = out = out.persist(StorageLevel.MEMORY_AND_DISK)
    if sort_spatially in (True, "hilbert"):
        hk = hilbert_key_udf()
        out = (
            out.withColumn(
                "_hilbert",
                hk("bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax"),
            )
            .repartitionByRange(n_parts, "_hilbert")
            .sortWithinPartitions("_hilbert")
            .drop("_hilbert")
        )
    elif sort_spatially == "range":
        out = out.repartitionByRange(
            n_parts, "bbox_xmin", "bbox_ymin"
        ).sortWithinPartitions("bbox_xmin", "bbox_ymin")
    meta_bytes = geo_file_metadata(geometry_col, crs_name).encode()
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    spark_schema = out.schema

    def write_part(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(spark_schema)
        tables = [
            pa.Table.from_pandas(pdf, schema=target, preserve_index=False)
            for pdf in batches
            if len(pdf)
        ]
        if tables:
            ctx = TaskContext.get()
            pid = ctx.partitionId()
            tbl = pa.concat_tables(tables)
            tbl = tbl.replace_schema_metadata(
                {**(tbl.schema.metadata or {}), b"geo": meta_bytes}
            )
            fname = os.path.join(path, f"part-{pid:05d}.parquet")
            # task-attempt-unique temp + atomic rename: a retried or
            # speculative attempt can never leave a torn final file
            tmp = f"{fname}.inprogress-{ctx.taskAttemptId()}"
            pq.write_table(tbl, tmp)
            os.replace(tmp, fname)
            yield pd.DataFrame({"file": [fname], "rows": [tbl.num_rows]})

    try:
        manifest = [
            r.asDict()
            for r in out.mapInPandas(
                write_part, schema="file string, rows long"
            ).collect()
        ]
    finally:
        # release the sampling/shuffle cache even when the write job
        # fails — repeated failed writes must not accumulate pinned
        # memory+spill blocks
        if persisted is not None:
            persisted.unpersist()
    # Sidecar kept as a convenience copy (the authoritative metadata is
    # in each file's footer).
    with open(os.path.join(path, "_geo_metadata.json"), "w") as f:
        f.write(meta_bytes.decode())
    return manifest


def read_geoparquet_bbox(
    spark, path: str, minx: float, miny: float, maxx: float, maxy: float
) -> DataFrame:
    """Spatial range scan using the covering columns — the predicate is
    plain column comparisons, so it pushes down to parquet row-group
    statistics (check PushedFilters in .explain)."""
    return spark.read.parquet(path).filter(
        (F.col("bbox_xmax") >= minx)
        & (F.col("bbox_xmin") <= maxx)
        & (F.col("bbox_ymax") >= miny)
        & (F.col("bbox_ymin") <= maxy)
    )


def _geometry_to_geojson(g: wkb.Geometry) -> dict:
    def ring_coords(r):
        return [[float(x), float(y)] for x, y in np.asarray(r)[:, :2]]

    if g.kind == wkb.POINT:
        return {
            "type": "Point",
            "coordinates": [float(g.coords[0]), float(g.coords[1])],
        }
    if g.kind == wkb.MULTIPOINT:
        return {"type": "MultiPoint", "coordinates": ring_coords(g.coords)}
    if g.kind == wkb.LINESTRING:
        return {"type": "LineString", "coordinates": ring_coords(g.coords)}
    if g.kind == wkb.MULTILINESTRING:
        return {
            "type": "MultiLineString",
            "coordinates": [ring_coords(p) for p in g.coords],
        }
    if g.kind == wkb.POLYGON:
        return {
            "type": "Polygon",
            "coordinates": [ring_coords(r) for r in g.coords],
        }
    if g.kind == wkb.MULTIPOLYGON:
        return {
            "type": "MultiPolygon",
            "coordinates": [
                [ring_coords(r) for r in poly] for poly in g.coords
            ],
        }
    raise wkb.WkbError(f"GeoJSON: unsupported {g.name}")


def to_geojson_features(
    df: DataFrame,
    geometry_col: str = "geometry",
    crs_col: str = "crs",
) -> DataFrame:
    """(id…, geometry WKB, crs) → one GeoJSON Feature JSON string per
    row, reprojected to WGS84 first (the reference's GeoJSON sink is
    the only one that transforms, geojson_writer.rs:22,51)."""
    prop_cols = [
        f.name
        for f in df.schema.fields
        if f.name not in (geometry_col, crs_col)
    ]

    def convert(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                g = wkb.loads(row[geometry_col])
                crs = row.get(crs_col, "JGD2011") if crs_col in pdf else "JGD2011"
                if crs == "Tokyo":
                    g = transform.tokyo_geometry_to_wgs84(g)
                feature = {
                    "type": "Feature",
                    "geometry": _geometry_to_geojson(g),
                    "properties": {
                        c: (None if pd.isna(row[c]) else row[c])
                        for c in prop_cols
                    },
                }
                out.append(json.dumps(feature, ensure_ascii=False))
            yield pd.DataFrame({"feature": out})

    return df.mapInPandas(convert, schema="feature string")


def write_geojson(df: DataFrame, path: str, **kw) -> None:
    to_geojson_features(df, **kw).write.mode("overwrite").text(path)
