"""GeoJSON reader (formats/geojson.py): sink→reader WKB round-trip,
all six geometry types, FeatureCollection mode, and the quarantine
error lane."""

import json

import numpy as np
import pandas as pd
import pytest

from ksj2gp_spark import fixtures
from ksj2gp_spark.formats import geojson as gj
from ksj2gp_spark.geo import wkb
from ksj2gp_spark.sinks.geoparquet import to_geojson_features


def test_sink_reader_roundtrip_wkb_parity(spark):
    """Every fixture polygon (incl. holes/multiparts) must survive the
    write→read loop byte-for-byte in WKB."""
    layer = fixtures.polygon_layer()
    df = spark.createDataFrame(layer)
    feats = to_geojson_features(df)
    back = gj.features_frame(feats, text_col="feature").toPandas()
    assert back["error"].isna().all()
    by_id = {
        json.loads(p)["polygon_id"]: g
        for p, g in zip(back["properties"], back["geometry"])
    }
    for _, row in layer.iterrows():
        assert bytes(by_id[row["polygon_id"]]) == bytes(row["geometry"])


@pytest.mark.parametrize(
    "geom",
    [
        {"type": "Point", "coordinates": [1.5, 2.5]},
        {"type": "MultiPoint", "coordinates": [[0, 0], [1, 1]]},
        {"type": "LineString", "coordinates": [[0, 0], [2, 3], [4, 0]]},
        {
            "type": "MultiLineString",
            "coordinates": [[[0, 0], [1, 1]], [[2, 2], [3, 3]]],
        },
        {
            "type": "Polygon",
            "coordinates": [
                [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
                [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]],
            ],
        },
        {
            "type": "MultiPolygon",
            "coordinates": [
                [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
                [[[5, 5], [6, 5], [6, 6], [5, 6], [5, 5]]],
            ],
        },
    ],
)
def test_all_types_roundtrip(geom):
    from ksj2gp_spark.sinks.geoparquet import _geometry_to_geojson

    b = gj.geometry_to_wkb(geom)
    assert _geometry_to_geojson(wkb.loads(b)) == geom


@pytest.mark.parametrize(
    "coords",
    [
        [1.0],                    # too short — would emit 1 double
        [[1, 2], [3, 4]],         # nested — would emit 4 doubles
        [[[1, 2]]],               # deeper nesting
        1.0,                      # bare scalar (0-d array)
        [],                       # empty
    ],
)
def test_bad_point_shapes_quarantine(coords):
    # malformed Point coordinates must raise GeoJsonError (the
    # quarantine contract), never serialize as corrupt WKB
    with pytest.raises(gj.GeoJsonError):
        gj.geometry_to_wkb({"type": "Point", "coordinates": coords})


def test_point_z_dropped():
    g = wkb.loads(
        gj.geometry_to_wkb({"type": "Point", "coordinates": [1, 2, 9]})
    )
    assert list(g.coords) == [1.0, 2.0]


def test_bad_point_lands_in_error_lane(spark, tmp_path):
    doc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {"type": "Point", "coordinates": [1.0]},
                "properties": {"name": "short"},
            },
            {
                "type": "Feature",
                "geometry": {"type": "Point", "coordinates": [3, 4]},
                "properties": {"name": "ok"},
            },
        ],
    }
    p = tmp_path / "pt.json"
    p.write_text(json.dumps(doc))
    out = gj.read_geojson(spark, str(p), mode="collection").toPandas()
    ok = out[out["error"].isna()]
    bad = out[out["error"].notna()]
    assert len(ok) == 1 and len(bad) == 1
    assert json.loads(ok.iloc[0]["properties"])["name"] == "ok"
    assert "Point" in bad.iloc[0]["error"]


def test_third_ordinate_dropped():
    b = gj.geometry_to_wkb(
        {"type": "LineString", "coordinates": [[0, 0, 9], [1, 1, 9]]}
    )
    g = wkb.loads(b)
    assert g.coords.shape == (2, 2) and not g.has_z


def test_collection_mode_and_quarantine(spark, tmp_path):
    doc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {"type": "Point", "coordinates": [10, 20]},
                "properties": {"name": "a"},
            },
            {
                "type": "Feature",
                "geometry": {"type": "Ring", "coordinates": []},
                "properties": {"name": "bad"},
            },
        ],
    }
    p = tmp_path / "fc.json"
    p.write_text(json.dumps(doc))
    out = gj.read_geojson(spark, str(p), mode="collection").toPandas()
    ok = out[out["error"].isna()]
    bad = out[out["error"].notna()]
    assert len(ok) == 1 and len(bad) == 1
    assert json.loads(ok.iloc[0]["properties"])["name"] == "a"
    assert "unsupported GeoJSON type" in bad.iloc[0]["error"]
    assert bad.iloc[0]["geometry"] is None


def test_lines_mode_reads_sink_output(spark, tmp_path):
    layer = fixtures.polygon_layer()
    df = spark.createDataFrame(layer)
    path = str(tmp_path / "lines")
    from ksj2gp_spark.sinks.geoparquet import write_geojson

    write_geojson(df, path)
    back = gj.read_geojson(spark, path, mode="lines").toPandas()
    assert back["error"].isna().all()
    assert len(back) == len(layer)


def test_invalid_json_quarantined(spark):
    df = spark.createDataFrame(pd.DataFrame({"value": ["{not json", ""]}))
    out = gj.features_frame(df).toPandas()
    assert out["error"].notna().all()


def test_jvm_side_property_projection(spark):
    """Properties project via get_json_object — no Python node."""
    from pyspark.sql import functions as F

    feats = to_geojson_features(
        spark.createDataFrame(fixtures.polygon_layer())
    )
    parsed = gj.features_frame(feats, text_col="feature")
    got = (
        parsed.filter(F.col("error").isNull())
        .select(
            F.get_json_object("properties", "$.polygon_id").alias("pid"),
            F.get_json_object("properties", "$['行政区域コード']").alias(
                "code"
            ),
        )
        .toPandas()
    )
    layer = fixtures.polygon_layer()
    assert set(got["pid"]) == set(layer["polygon_id"])
    assert set(got["code"]) == set(layer["行政区域コード"])
