"""GeoJSON reader — the inverse of the engine's GeoJSON sink
(sinks/geoparquet.py::to_geojson_features, which mirrors the
reference's only reprojecting writer, geojson_writer.rs:14-62).

Two physical layouts:

* ``lines`` (the sink's own output): one Feature JSON document per
  text line — embarrassingly parallel, ``spark.read.text`` splits by
  line and every task parses independently; the 100 TB path.
* ``collection``: classic single-document FeatureCollection files —
  parallel BY FILE (``wholetext``), the same per-file granularity as
  the GML lane.

Rows that fail to parse are QUARANTINED, not crashed: the output
carries (properties, geometry, error) and bad inputs surface as
rows with a NULL geometry and a typed message — the repo-wide
error-lane convention (formats/zipsrc.py).

Properties stay a JSON string column: schemas vary per layer, and
Spark's JVM-side ``get_json_object`` / ``from_json`` project them
without a Python round-trip.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from ..geo import wkb


class GeoJsonError(ValueError):
    pass


_SIMPLE = {
    "Point": wkb.POINT,
    "MultiPoint": wkb.MULTIPOINT,
    "LineString": wkb.LINESTRING,
    "MultiLineString": wkb.MULTILINESTRING,
    "Polygon": wkb.POLYGON,
    "MultiPolygon": wkb.MULTIPOLYGON,
}


def geometry_to_wkb(gj: dict) -> bytes:
    """GeoJSON geometry object → WKB bytes (inverse of the sink's
    _geometry_to_geojson). XY only — a third ordinate is accepted and
    dropped, matching the reference's transform path (XY/XYZ in,
    XY out)."""
    if not isinstance(gj, dict) or "type" not in gj:
        raise GeoJsonError("not a GeoJSON geometry object")
    t = gj.get("type")
    if t not in _SIMPLE:
        raise GeoJsonError(f"unsupported GeoJSON type: {t!r}")
    kind = _SIMPLE[t]
    c = gj.get("coordinates")
    if c is None:
        raise GeoJsonError(f"{t} without coordinates")

    def arr(rows):
        a = np.asarray(rows, dtype="float64")
        if a.ndim != 2 or a.shape[1] < 2:
            raise GeoJsonError(f"bad coordinate array shape {a.shape}")
        return np.ascontiguousarray(a[:, :2])

    try:
        if kind == wkb.POINT:
            a = np.asarray(c, dtype="float64")
            if a.ndim != 1 or a.shape[0] < 2:
                # a bare scalar, a short position, or a nested array
                # would otherwise serialize as corrupt WKB (wrong
                # number of doubles) — quarantine, never emit.
                raise GeoJsonError(
                    f"bad Point coordinates shape {a.shape}"
                )
            g = wkb.Geometry(kind, np.ascontiguousarray(a[:2]))
        elif kind in (wkb.MULTIPOINT, wkb.LINESTRING):
            g = wkb.Geometry(kind, arr(c))
        elif kind in (wkb.MULTILINESTRING, wkb.POLYGON):
            g = wkb.Geometry(kind, [arr(r) for r in c])
        else:  # MultiPolygon
            g = wkb.Geometry(kind, [[arr(r) for r in poly] for poly in c])
    except (TypeError, ValueError) as ex:
        raise GeoJsonError(f"bad {t} coordinates: {ex}") from ex
    return wkb.dumps(g)


def parse_feature(doc: str) -> tuple[str, bytes]:
    """One Feature JSON document → (properties JSON string, WKB).
    Raises GeoJsonError on anything malformed."""
    try:
        f = json.loads(doc)
    except json.JSONDecodeError as ex:
        raise GeoJsonError(f"invalid JSON: {ex}") from ex
    if not isinstance(f, dict) or f.get("type") != "Feature":
        raise GeoJsonError("not a GeoJSON Feature")
    geometry = f.get("geometry")
    if geometry is None:
        raise GeoJsonError("Feature without geometry")
    props = f.get("properties") or {}
    return (
        json.dumps(props, ensure_ascii=False),
        geometry_to_wkb(geometry),
    )


def iter_features(doc: str):
    """Yield Feature documents from a text blob: a FeatureCollection,
    a single Feature, or newline-delimited Features (the sink's own
    layout)."""
    s = doc.strip()
    if not s:
        return
    if s.startswith("{"):
        try:
            obj = json.loads(s)
        except json.JSONDecodeError:
            obj = None
        if isinstance(obj, dict):
            if obj.get("type") == "FeatureCollection":
                feats = obj.get("features")
                if not isinstance(feats, list):
                    raise GeoJsonError(
                        "FeatureCollection without features list"
                    )
                for f in feats:
                    yield json.dumps(f, ensure_ascii=False)
                return
            yield s
            return
    for line in s.splitlines():
        if line.strip():
            yield line


def features_frame(lines_df, text_col: str = "value"):
    """Distributed parse: a DataFrame of Feature JSON strings →
    (properties string, geometry binary, error string). Good rows
    have error NULL; quarantined rows keep the raw head of the bad
    document in ``properties`` and a NULL geometry."""

    def parse(batches):
        for pdf in batches:
            rows = []
            for doc in pdf[text_col]:
                try:
                    props, g = parse_feature(doc)
                    rows.append((props, g, None))
                except GeoJsonError as ex:
                    rows.append((str(doc)[:200], None, str(ex)))
            yield pd.DataFrame(
                rows, columns=["properties", "geometry", "error"]
            )

    return lines_df.mapInPandas(
        parse, schema="properties string, geometry binary, error string"
    )


def read_geojson(spark, path: str, mode: str = "lines"):
    """Read GeoJSON into (properties, geometry WKB, error).

    ``lines``: feature-per-line files (the sink's output) — splits by
    line, fully parallel. ``collection``: whole-file FeatureCollection
    documents — parallel by file; features explode in the same Arrow
    pass."""
    if mode == "lines":
        return features_frame(spark.read.text(path))
    if mode != "collection":
        raise ValueError("mode must be 'lines' or 'collection'")
    whole = spark.read.text(path, wholetext=True)

    def explode_docs(batches):
        for pdf in batches:
            rows = []
            for doc in pdf["value"]:
                try:
                    for feat in iter_features(doc):
                        try:
                            props, g = parse_feature(feat)
                            rows.append((props, g, None))
                        except GeoJsonError as ex:
                            rows.append((feat[:200], None, str(ex)))
                except GeoJsonError as ex:
                    rows.append((str(doc)[:200], None, str(ex)))
            yield pd.DataFrame(
                rows, columns=["properties", "geometry", "error"]
            )

    return whole.mapInPandas(
        explode_docs,
        schema="properties string, geometry binary, error string",
    )
