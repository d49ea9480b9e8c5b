"""GeoPackage sink (S7, gpkg_writer.rs semantics) round-trip tests."""

import sqlite3

import numpy as np
import pytest

from ksj2gp_spark import fixtures
from ksj2gp_spark.geo import wkb
from ksj2gp_spark.sinks import gpkg


def test_gpkg_roundtrip_polygons(spark, tmp_path):
    layer = fixtures.polygon_layer()
    sdf = spark.createDataFrame(layer)
    out = str(tmp_path / "admin.gpkg")
    gpkg.write_gpkg(sdf, out, layer="admin", crs_name="JGD2011")

    back = gpkg.read_gpkg(out, "admin")
    assert len(back) == len(layer)
    # Polygon class declared (and promoted to) MultiPolygon, like the
    # reference (gpkg_writer.rs:93-127)
    con = sqlite3.connect(out)
    gtype, srs_id, z = con.execute(
        "SELECT geometry_type_name, srs_id, z FROM gpkg_geometry_columns"
    ).fetchone()
    assert (gtype, srs_id, z) == ("MULTIPOLYGON", 6668, 0)
    # SRS registered because CRS != 4326 (gpkg_writer.rs:42-52)
    assert con.execute(
        "SELECT count(*) FROM gpkg_spatial_ref_sys WHERE srs_id=6668"
    ).fetchone()[0] == 1
    app_id = con.execute("PRAGMA application_id").fetchone()[0]
    assert app_id == 0x47504B47
    (minx, miny, maxx, maxy) = con.execute(
        "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents"
    ).fetchone()
    con.close()

    # geometry survives promotion: same bounds, same vertices per part
    src = sorted(
        (r["polygon_id"], wkb.loads(r["geometry"]).bounds())
        for _, r in layer.iterrows()
    )
    got = sorted(
        (r["polygon_id"], wkb.loads(r["geometry"]).bounds())
        for _, r in back.iterrows()
    )
    for (pid_a, ba), (pid_b, bb) in zip(src, got):
        assert pid_a == pid_b
        assert np.allclose(ba, bb)
    all_b = np.array([b for _, b in src])
    assert np.allclose(
        [minx, miny, maxx, maxy],
        [all_b[:, 0].min(), all_b[:, 1].min(), all_b[:, 2].max(), all_b[:, 3].max()],
    )


def test_gpkg_blob_header_roundtrip():
    g = wkb.loads(wkb.polygon([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]))
    blob = gpkg.gpkg_geometry_blob(g, 4326)
    assert blob[:2] == b"GP" and blob[2] == 0
    back = gpkg.parse_gpkg_blob(blob)
    assert back.kind == wkb.POLYGON
    assert np.allclose(back.bounds(), g.bounds())


def test_gpkg_wgs84_needs_no_extra_srs(tmp_path):
    import pandas as pd

    pdf = pd.DataFrame(
        {"name": ["a"], "geometry": [wkb.point(139.5, 35.5)]}
    )
    out = str(tmp_path / "pt.gpkg")
    gpkg.write_gpkg(pdf, out, layer="pts", crs_name="WGS84")
    con = sqlite3.connect(out)
    # only the three mandatory SRS rows
    assert con.execute(
        "SELECT count(*) FROM gpkg_spatial_ref_sys"
    ).fetchone()[0] == 3
    gtype = con.execute(
        "SELECT geometry_type_name FROM gpkg_geometry_columns"
    ).fetchone()[0]
    con.close()
    assert gtype == "POINT"


def test_gpkg_rejects_mixed_classes(tmp_path):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "geometry": [
                wkb.point(0, 0),
                wkb.polygon([(0, 0), (1, 0), (1, 1), (0, 0)]),
            ]
        }
    )
    with pytest.raises(wkb.WkbError, match="mixed"):
        gpkg.write_gpkg(pdf, str(tmp_path / "bad.gpkg"))


def test_gpkg_attribute_types_and_nulls(tmp_path):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "名称": ["札幌市", None],
            "code": np.array([1, 2], dtype=np.int64),
            "ratio": [0.5, np.nan],
            "geometry": [wkb.point(141.3, 43.06), wkb.point(139.7, 35.68)],
        }
    )
    out = str(tmp_path / "attrs.gpkg")
    gpkg.write_gpkg(pdf, out, layer="cities", crs_name="WGS84")
    back = gpkg.read_gpkg(out)
    assert list(back["名称"]) == ["札幌市", None]
    assert list(back["code"]) == [1, 2]
    assert back["ratio"].iloc[1] is None or np.isnan(back["ratio"].iloc[1])
    con = sqlite3.connect(out)
    info = {r[1]: r[2] for r in con.execute('PRAGMA table_info("cities")')}
    con.close()
    assert info["code"] == "INTEGER" and info["ratio"] == "REAL"
    assert info["名称"] == "TEXT"
