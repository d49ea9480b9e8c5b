"""M-variant shapefile types (PointM=21, PolylineM=23, PolygonM=25,
MultipointM=28).

The reference accepts M shapes on its GPKG lane and declares
Dimension::Xym (/root/reference/rust/src/writer/gpkg_writer.rs:93-127);
its GeoParquet/GeoJSON transform path carries XY/XYZ only
(transform_coord.rs:21-107), so those lanes drop the M ordinate here.
"""

import io
import sqlite3
import struct
import zipfile

import numpy as np
import pandas as pd

from ksj2gp_spark.formats import dbf, shp
from ksj2gp_spark.geo import wkb
from ksj2gp_spark.operators import ingest
from ksj2gp_spark.sinks import geoparquet, gpkg

META_JGD2011 = (
    "<referenceSystemIdentifier><code>JGD2011 / (B, L)</code>"
    "</referenceSystemIdentifier>"
).encode("cp932")


def _point_m(x, y, m):
    return wkb.Geometry(wkb.POINT, np.array([x, y, m]), False, True)


def _polygon_m():
    ring = np.array(
        [[0.0, 0.0, 10.0], [4.0, 0.0, 11.0], [4.0, 3.0, 12.0],
         [0.0, 3.0, 13.0], [0.0, 0.0, 10.0]]
    )
    return wkb.Geometry(wkb.POLYGON, [ring], False, True)


class TestWkbM:
    def test_point_xym_roundtrip(self):
        g = _point_m(139.7, 35.6, 42.5)
        buf = wkb.dumps(g)
        # ISO XYM code = 2000 + 1
        assert struct.unpack_from("<I", buf, 1)[0] == 2001
        back = wkb.loads(buf)
        assert back.has_m and not back.has_z
        assert np.allclose(back.coords, [139.7, 35.6, 42.5])

    def test_point_xyzm_roundtrip(self):
        g = wkb.Geometry(wkb.POINT, np.array([1.0, 2.0, 3.0, 4.0]), True, True)
        buf = wkb.dumps(g)
        assert struct.unpack_from("<I", buf, 1)[0] == 3001
        back = wkb.loads(buf)
        assert back.has_z and back.has_m
        assert np.allclose(back.coords, [1, 2, 3, 4])

    def test_polygon_xym_roundtrip(self):
        g = _polygon_m()
        back = wkb.loads(wkb.dumps(g))
        assert back.has_m and not back.has_z
        assert np.allclose(back.coords[0], g.coords[0])
        assert back.bounds() == (0.0, 0.0, 4.0, 3.0)

    def test_ewkb_m_flag_read(self):
        # EWKB M flag 0x40000000 on a point
        buf = b"\x01" + struct.pack("<I", 0x40000001) + struct.pack(
            "<ddd", 1.0, 2.0, 9.0
        )
        g = wkb.loads(buf)
        assert g.has_m and not g.has_z
        assert np.allclose(g.coords, [1, 2, 9])

    def test_drop_m(self):
        g = _polygon_m()
        d = g.drop_m()
        assert not d.has_m
        assert d.coords[0].shape == (5, 2)
        zm = wkb.Geometry(
            wkb.POINT, np.array([1.0, 2.0, 3.0, 4.0]), True, True
        ).drop_m()
        assert zm.has_z and not zm.has_m
        assert np.allclose(zm.coords, [1, 2, 3])

    def test_multi_dispatch_drop_m(self):
        part = np.array([[0.0, 0.0, 1.0], [1.0, 1.0, 2.0]])
        mls = wkb.Geometry(wkb.MULTILINESTRING, [part], False, True)
        back = wkb.loads(wkb.dumps(mls))
        assert back.has_m
        d = back.drop_m()
        assert d.coords[0].shape == (2, 2)
        mp = wkb.Geometry(wkb.MULTIPOLYGON, [[part]], False, True).drop_m()
        assert mp.coords[0][0].shape == (2, 2)


class TestShpM:
    def test_point_m_roundtrip(self):
        geoms = [_point_m(139.7, 35.6, 7.25), _point_m(135.5, 34.7, -3.0)]
        buf, _ = shp.write_shp(geoms)
        back = shp.read_shp(buf)
        assert all(g.has_m and not g.has_z for g in back)
        assert np.allclose(back[0].coords, [139.7, 35.6, 7.25])
        assert np.allclose(back[1].coords, [135.5, 34.7, -3.0])

    def test_polygon_m_roundtrip(self):
        g = _polygon_m()
        back = shp.read_shp(shp.write_shp([g])[0])
        assert back[0].kind == wkb.POLYGON and back[0].has_m
        assert np.allclose(back[0].coords[0], g.coords[0])

    def test_polyline_m_roundtrip(self):
        parts = [
            np.array([[0.0, 0.0, 1.0], [1.0, 0.5, 2.0], [2.0, 1.0, 3.0]]),
            np.array([[5.0, 5.0, 4.0], [6.0, 6.0, 5.0]]),
        ]
        g = wkb.Geometry(wkb.MULTILINESTRING, parts, False, True)
        back = shp.read_shp(shp.write_shp([g])[0])
        assert back[0].kind == wkb.MULTILINESTRING and back[0].has_m
        assert len(back[0].coords) == 2
        assert np.allclose(back[0].coords[0], parts[0])
        assert np.allclose(back[0].coords[1], parts[1])

    def test_multipoint_m_roundtrip(self):
        pts = np.array([[1.0, 2.0, 0.5], [3.0, 4.0, 1.5], [5.0, 6.0, 2.5]])
        g = wkb.Geometry(wkb.MULTIPOINT, pts, False, True)
        back = shp.read_shp(shp.write_shp([g])[0])
        assert back[0].kind == wkb.MULTIPOINT and back[0].has_m
        assert np.allclose(back[0].coords, pts)

    def test_pointz_with_trailing_m(self):
        # Z record carrying the optional measure block → XYZM
        rec = struct.pack("<idddd", shp.SHAPE_POINT_Z, 1.0, 2.0, 3.0, 4.0)
        g = shp._parse_record(rec)
        assert g.has_z and g.has_m
        assert np.allclose(g.coords, [1, 2, 3, 4])
        # without the measure block → plain XYZ
        rec = struct.pack("<iddd", shp.SHAPE_POINT_Z, 1.0, 2.0, 3.0)
        g = shp._parse_record(rec)
        assert g.has_z and not g.has_m

    def test_polygonz_with_trailing_m(self):
        ring = np.array(
            [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]
        )
        zs = np.array([9.0, 8.0, 7.0, 6.0])
        ms = np.array([0.1, 0.2, 0.3, 0.4])
        content = struct.pack(
            "<idddd", shp.SHAPE_POLYGON_Z, 0.0, 0.0, 1.0, 1.0
        )
        content += struct.pack("<ii", 1, 4)
        content += struct.pack("<i", 0)
        content += np.ascontiguousarray(ring, dtype="<f8").tobytes()
        content += struct.pack("<dd", zs.min(), zs.max())
        content += np.ascontiguousarray(zs, dtype="<f8").tobytes()
        content += struct.pack("<dd", ms.min(), ms.max())
        content += np.ascontiguousarray(ms, dtype="<f8").tobytes()
        g = shp._parse_record(content)
        assert g.kind == wkb.POLYGON and g.has_z and g.has_m
        assert np.allclose(g.coords[0][:, 2], zs)
        assert np.allclose(g.coords[0][:, 3], ms)


def _m_zip_bytes() -> bytes:
    geoms = [_polygon_m()]
    shp_buf, shx_buf = shp.write_shp(geoms)
    fields = [dbf.DbfField("N03_007", "C", 5)]
    dbf_buf = dbf.write_dbf(fields, [["13101"]], encoding="cp932", ldid=13)
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as zf:
        zf.writestr("N03-20240101_13_GML/adminm.shp", shp_buf)
        zf.writestr("N03-20240101_13_GML/adminm.shx", shx_buf)
        zf.writestr("N03-20240101_13_GML/adminm.dbf", dbf_buf)
        zf.writestr("N03-20240101_13_GML/KS-META-N03.xml", META_JGD2011)
    return bio.getvalue()


class TestMEndToEnd:
    def test_ingest_and_gpkg_xym(self, spark, tmp_path):
        zpath = tmp_path / "N03-20240101_13_GML.zip"
        zpath.write_bytes(_m_zip_bytes())
        ingested = ingest.ingest_zips(spark, str(zpath)).toPandas()
        assert ingested["error"].isna().all()
        g = wkb.loads(ingested.iloc[0]["geometry"])
        assert g.has_m and not g.has_z

        out = str(tmp_path / "out.gpkg")
        pdf = pd.DataFrame({"geometry": list(ingested["geometry"])})
        gpkg.write_gpkg(pdf, out, layer="layer1", crs_name="JGD2011")
        con = sqlite3.connect(out)
        gtype, z, m = con.execute(
            "SELECT geometry_type_name, z, m FROM gpkg_geometry_columns"
        ).fetchone()
        # Dimension::Xym on the GPKG lane (gpkg_writer.rs:116-121)
        assert (gtype, z, m) == ("MULTIPOLYGON", 0, 1)
        blob = con.execute('SELECT "geometry" FROM "layer1"').fetchone()[0]
        con.close()
        back = gpkg.parse_gpkg_blob(blob)
        assert back.has_m
        assert np.allclose(back.coords[0][0][:, 2], _polygon_m().coords[0][:, 2])

    def test_geoparquet_lane_drops_m(self, spark, tmp_path):
        pdf = pd.DataFrame(
            {
                "id": ["a"],
                "geometry": [wkb.dumps(_polygon_m())],
            }
        )
        df = spark.createDataFrame(pdf)
        out = geoparquet.with_bbox_covering(df).toPandas()
        g = wkb.loads(out.iloc[0]["geometry"])
        assert not g.has_m
        assert g.coords[0].shape == (5, 2)
        assert (
            out.iloc[0]["bbox_xmin"],
            out.iloc[0]["bbox_ymin"],
            out.iloc[0]["bbox_xmax"],
            out.iloc[0]["bbox_ymax"],
        ) == (0.0, 0.0, 4.0, 3.0)
