"""JPGIS-GML lane: kernel parsing, codelist bridging, shapefile-lane
parity (identical WKB for the same features), and distributed ingest.

The reference reads only .shp members (rust/src/lib.rs:23-35); the GML
lane is graft capability named by the north_star ("Shapefile/GML"), so
its contract is parity with the shapefile lane, not with the reference.
"""

import io
import zipfile

import numpy as np
import pytest

from ksj2gp_spark import fixtures
from ksj2gp_spark.formats import dbf, gml, shp, zipsrc
from ksj2gp_spark.geo import wkb
from ksj2gp_spark.operators import ingest


def _poslist(coords_xy: np.ndarray) -> str:
    """(x=lon, y=lat) rows → KSJ "lat lon" posList text."""
    return " ".join(f"{y:.17g} {x:.17g}" for x, y in coords_xy)


def _gml_doc(features, srs="JGD2011 / (B, L)") -> bytes:
    """Build a KSJ-style GML document: Curves referenced by Surfaces
    referenced by app-namespace features — the real N03 layout.

    ``features``: list of (attrs_xml, rings) where rings is a list of
    (x, y) arrays (first exterior) or None for a geometry-less row."""
    geoms, feats = [], []
    cid = 0
    for i, (attrs_xml, rings) in enumerate(features):
        if rings is None:
            feats.append(
                f'<ksj:AdministrativeBoundary gml:id="AB_{i}">'
                f"{attrs_xml}</ksj:AdministrativeBoundary>"
            )
            continue
        ring_xml = []
        for j, ring in enumerate(rings):
            geoms.append(
                f'<gml:Curve gml:id="cv_{cid}" srsName="{srs}">'
                "<gml:segments><gml:LineStringSegment><gml:posList>"
                f"{_poslist(ring)}"
                "</gml:posList></gml:LineStringSegment></gml:segments>"
                "</gml:Curve>"
            )
            side = "exterior" if j == 0 else "interior"
            ring_xml.append(
                f"<gml:{side}><gml:Ring>"
                f'<gml:curveMember xlink:href="#cv_{cid}"/>'
                f"</gml:Ring></gml:{side}>"
            )
            cid += 1
        geoms.append(
            f'<gml:Surface gml:id="sf_{i}"><gml:patches><gml:PolygonPatch>'
            f'{"".join(ring_xml)}'
            "</gml:PolygonPatch></gml:patches></gml:Surface>"
        )
        feats.append(
            f'<ksj:AdministrativeBoundary gml:id="AB_{i}">'
            f'<ksj:bounds xlink:href="#sf_{i}"/>'
            f"{attrs_xml}</ksj:AdministrativeBoundary>"
        )
    doc = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<ksj:Dataset gml:id="DS0"'
        ' xmlns:gml="http://www.opengis.net/gml/3.2"'
        ' xmlns:xlink="http://www.w3.org/1999/xlink"'
        ' xmlns:ksj="http://nlftp.mlit.go.jp/ksj/schemas/ksj-app">'
        "<gml:description>synthetic</gml:description>"
        f'{"".join(geoms)}{"".join(feats)}'
        "</ksj:Dataset>"
    )
    return doc.encode("utf-8")


SQUARE = np.array(
    [[139.0, 35.0], [139.1, 35.0], [139.1, 35.1], [139.0, 35.1], [139.0, 35.0]]
)
HOLE = np.array(
    [[139.03, 35.03], [139.07, 35.03], [139.07, 35.07], [139.03, 35.07],
     [139.03, 35.03]]
)


class TestGmlKernel:
    def test_polygon_feature_roundtrip(self):
        attrs = (
            "<ksj:prefectureName>東京都</ksj:prefectureName>"
            '<ksj:administrativeAreaCode codeSpace="AdminAreaCd.xml">13101'
            "</ksj:administrativeAreaCode>"
        )
        feats, crs = gml.read_gml(_gml_doc([(attrs, [SQUARE])]))
        assert crs == "JGD2011"
        assert len(feats) == 1
        ftype, raw_attrs, geom = feats[0]
        assert ftype == "AdministrativeBoundary"
        assert raw_attrs["prefectureName"] == ("東京都", None)
        assert raw_attrs["administrativeAreaCode"] == (
            "13101", "AdminAreaCd.xml"
        )
        assert geom.kind == wkb.POLYGON
        np.testing.assert_allclose(geom.coords[0], SQUARE)

    def test_hole_and_ring_closure(self):
        # pass the hole ring unclosed: the parser must close it
        feats, _ = gml.read_gml(
            _gml_doc([("<ksj:x>1</ksj:x>", [SQUARE, HOLE[:-1]])])
        )
        geom = feats[0][2]
        assert geom.kind == wkb.POLYGON
        assert len(geom.coords) == 2
        np.testing.assert_allclose(geom.coords[1][0], geom.coords[1][-1])

    def test_point_feature(self):
        doc = (
            '<?xml version="1.0"?>'
            '<ksj:Dataset xmlns:gml="http://www.opengis.net/gml/3.2"'
            ' xmlns:xlink="http://www.w3.org/1999/xlink" xmlns:ksj="http://x/y">'
            '<gml:Point gml:id="pt_0" srsName="TD / (B, L)">'
            "<gml:pos>35.5 139.5</gml:pos></gml:Point>"
            '<ksj:Station gml:id="ST_0"><ksj:position xlink:href="#pt_0"/>'
            "<ksj:stationName>駅</ksj:stationName></ksj:Station>"
            "</ksj:Dataset>"
        ).encode()
        feats, crs = gml.read_gml(doc)
        assert crs == "Tokyo"
        ftype, attrs, geom = feats[0]
        assert ftype == "Station"
        assert geom.kind == wkb.POINT
        np.testing.assert_allclose(geom.coords, [139.5, 35.5])  # lon, lat

    def test_inline_linearring(self):
        doc = (
            '<?xml version="1.0"?>'
            '<ksj:Dataset xmlns:gml="http://www.opengis.net/gml/3.2"'
            ' xmlns:xlink="http://www.w3.org/1999/xlink" xmlns:ksj="http://x/y">'
            '<gml:Surface gml:id="sf_0"><gml:patches><gml:PolygonPatch>'
            "<gml:exterior><gml:LinearRing><gml:posList>"
            f"{_poslist(SQUARE)}"
            "</gml:posList></gml:LinearRing></gml:exterior>"
            "</gml:PolygonPatch></gml:patches></gml:Surface>"
            '<ksj:Area gml:id="AR_0"><ksj:are xlink:href="#sf_0"/></ksj:Area>'
            "</ksj:Dataset>"
        ).encode()
        feats, crs = gml.read_gml(doc)
        assert feats[0][2].kind == wkb.POLYGON
        assert crs == "JGD2011"  # default when no srsName anywhere

    def test_multisegment_curve_dedups_join_vertex(self):
        half1, half2 = SQUARE[:3], SQUARE[2:]
        doc = (
            '<?xml version="1.0"?>'
            '<ksj:Dataset xmlns:gml="http://www.opengis.net/gml/3.2"'
            ' xmlns:xlink="http://www.w3.org/1999/xlink" xmlns:ksj="http://x/y">'
            '<gml:Curve gml:id="cv_0"><gml:segments>'
            f"<gml:LineStringSegment><gml:posList>{_poslist(half1)}"
            "</gml:posList></gml:LineStringSegment>"
            f"<gml:LineStringSegment><gml:posList>{_poslist(half2)}"
            "</gml:posList></gml:LineStringSegment>"
            "</gml:segments></gml:Curve>"
            '<gml:Surface gml:id="sf_0"><gml:patches><gml:PolygonPatch>'
            '<gml:exterior><gml:Ring><gml:curveMember xlink:href="#cv_0"/>'
            "</gml:Ring></gml:exterior></gml:PolygonPatch></gml:patches>"
            "</gml:Surface>"
            '<ksj:Area gml:id="AR_0"><ksj:are xlink:href="#sf_0"/></ksj:Area>'
            "</ksj:Dataset>"
        ).encode()
        feats, _ = gml.read_gml(doc)
        np.testing.assert_allclose(feats[0][2].coords[0], SQUARE)

    def test_error_lanes(self):
        with pytest.raises(gml.GmlError, match="XML parse"):
            gml.read_gml(b"<not-closed")
        with pytest.raises(gml.GmlError, match="dangling"):
            gml.read_gml(
                _gml_doc([('<ksj:a>1</ksj:a>', [SQUARE])]).replace(
                    b'href="#sf_0"', b'href="#sf_missing"'
                )
            )
        with pytest.raises(gml.GmlError, match="not divisible"):
            gml._parse_poslist("35.0 139.0 35.1")
        bad = np.array([[139.0, 35.0], [139.1, 35.0]])
        with pytest.raises(gml.GmlError, match="degenerate"):
            gml.read_gml(_gml_doc([("<ksj:a>1</ksj:a>", [bad])]))

    def test_srs_dimension_3_drops_height(self):
        """srsDimension=3 posLists (legal JPGIS: lat lon h) parse with
        the ellipsoidal height dropped — previously an even 3-D count
        was silently mis-reshaped into scrambled lon/lat pairs."""
        # element-level attribute
        got = gml._parse_poslist("35.0 139.0 12.5 35.1 139.1 13.0", dim=3)
        np.testing.assert_allclose(
            got, [[139.0, 35.0], [139.1, 35.1]]
        )
        # non-multiple-of-3 count errors clearly
        with pytest.raises(gml.GmlError, match="srsDimension=3"):
            gml._parse_poslist("35.0 139.0 12.5 35.1", dim=3)
        with pytest.raises(gml.GmlError, match="unsupported srsDimension"):
            gml._parse_poslist("35.0 139.0", dim=4)

    def test_srs_dimension_3_document_roundtrip(self):
        """A full document whose posLists declare srsDimension=3 yields
        the same 2-D geometry as the plain 2-D document."""
        sq3 = " ".join(
            f"{y:.17g} {x:.17g} {10.0 + i}"
            for i, (x, y) in enumerate(SQUARE)
        )
        doc = _gml_doc([("<ksj:a>1</ksj:a>", [SQUARE])]).replace(
            b"<gml:posList>",
            b'<gml:posList srsDimension="3">',
        ).replace(_poslist(SQUARE).encode(), sq3.encode())
        feats, _ = gml.read_gml(doc)
        geom = feats[0][2]
        assert geom.kind == wkb.POLYGON
        np.testing.assert_allclose(geom.coords[0], SQUARE)

    def test_srs_dimension_document_level_default(self):
        """srsDimension declared once at document level (on the root)
        applies to posLists that don't repeat it."""
        sq3 = " ".join(f"{y:.17g} {x:.17g} 0" for x, y in SQUARE)
        doc = _gml_doc([("<ksj:a>1</ksj:a>", [SQUARE])]).replace(
            b'<ksj:Dataset gml:id="DS0"',
            b'<ksj:Dataset gml:id="DS0" srsDimension="3"',
        ).replace(_poslist(SQUARE).encode(), sq3.encode())
        feats, _ = gml.read_gml(doc)
        np.testing.assert_allclose(feats[0][2].coords[0], SQUARE)

    def test_codespace_bridge(self):
        m = gml.codelist_for_codespace("LandUseCd-09.xml")
        assert m is not None and len(m) > 0
        m2 = gml.codelist_for_codespace("PrefCd.xml")
        assert m2 is not None and m2["13"] == "東京都"
        assert gml.codelist_for_codespace("NoSuchList.xml") is None
        assert gml.codelist_for_codespace(None) is None


class TestGmlIngest:
    def _zip(self, member: str, payload: bytes) -> bytes:
        bio = io.BytesIO()
        with zipfile.ZipFile(bio, "w") as zf:
            zf.writestr(member, payload)
        return bio.getvalue()

    def test_parse_gml_zip_translates_codes(self):
        attrs = (
            '<ksj:prefectureCode codeSpace="PrefCd.xml">13</ksj:prefectureCode>'
        )
        z = self._zip(
            "N03-20240101_13_GML/N03-24_13.xml", _gml_doc([(attrs, [SQUARE])])
        )
        pdf = ingest.parse_gml_zip_bytes("N03-20240101_13_GML.zip", z)
        assert len(pdf) == 1
        row = pdf.iloc[0]
        assert row["error"] is None
        assert row["ksj_id"] == "N03" and row["year"] == 2024
        assert row["crs"] == "JGD2011"
        assert row["attrs"]["prefectureCode"] == "東京都"
        assert row["attrs"]["featureType"] == "AdministrativeBoundary"
        g = wkb.loads(row["geometry"])
        np.testing.assert_allclose(g.coords[0], SQUARE)

    def test_parse_gml_zip_no_translate(self):
        attrs = (
            '<ksj:prefectureCode codeSpace="PrefCd.xml">13</ksj:prefectureCode>'
        )
        z = self._zip("a/N03-24_13.xml", _gml_doc([(attrs, [SQUARE])]))
        pdf = ingest.parse_gml_zip_bytes(
            "N03-20240101_13_GML.zip", z, translate=False
        )
        assert pdf.iloc[0]["attrs"]["prefectureCode"] == "13"

    def test_shapefile_lane_parity(self):
        """The same polygon layer through the GML lane and the shapefile
        lane produces byte-identical WKB geometry."""
        layer = fixtures.polygon_layer()
        geoms = [wkb.loads(b) for b in layer["geometry"]]

        gml_feats = []
        for (_, r), g in zip(layer.iterrows(), geoms):
            attrs = (
                f"<ksj:administrativeAreaCode>{r['行政区域コード']}"
                "</ksj:administrativeAreaCode>"
            )
            gml_feats.append((attrs, list(g.coords)))
        z_gml = self._zip(
            "N03-20240101_13_GML/N03-24_13.xml", _gml_doc(gml_feats)
        )
        gml_pdf = ingest.parse_gml_zip_bytes("N03-20240101_13_GML.zip", z_gml)

        shp_buf, shx_buf = shp.write_shp(geoms)
        fields = [dbf.DbfField("N03_007", "C", 5)]
        rows = [[r["行政区域コード"]] for _, r in layer.iterrows()]
        bio = io.BytesIO()
        with zipfile.ZipFile(bio, "w") as zf:
            zf.writestr("d/admin.shp", shp_buf)
            zf.writestr("d/admin.shx", shx_buf)
            zf.writestr(
                "d/admin.dbf", dbf.write_dbf(fields, rows, encoding="cp932", ldid=13)
            )
            zf.writestr(
                "d/KS-META-N03.xml",
                "<referenceSystemIdentifier><code>JGD2011 / (B, L)</code>"
                "</referenceSystemIdentifier>".encode("cp932"),
            )
        shp_pdf = ingest.parse_zip_bytes(
            "N03-20240101_13_GML.zip", bio.getvalue()
        )

        assert len(gml_pdf) == len(shp_pdf) == len(layer)
        assert list(gml_pdf["crs"]) == list(shp_pdf["crs"])
        for gb, sb in zip(gml_pdf["geometry"], shp_pdf["geometry"]):
            assert gb == sb

    def test_distributed_ingest_auto_lane(self, spark, tmp_path):
        """source="auto": shapefile members win when present; a
        GML-only ZIP falls through to the GML lane."""
        attrs = "<ksj:name>x</ksj:name>"
        z = self._zip("a/N03-24_13.xml", _gml_doc([(attrs, [SQUARE])] * 3))
        p = tmp_path / "N03-20240101_13_GML.zip"
        p.write_bytes(z)
        out = ingest.ingest_zips(spark, str(p), source="auto").toPandas()
        assert len(out) == 3
        assert out["error"].isna().all()
        assert (out["geom_type"] == "Polygon").all()
        # explicit gml source gives the same rows
        out2 = ingest.ingest_zips(spark, str(p), source="gml").toPandas()
        assert sorted(out2["feature_idx"]) == sorted(out["feature_idx"])

    def test_bad_source_rejected(self, spark):
        with pytest.raises(ValueError, match="shp|gml|auto"):
            ingest.ingest_zips(spark, "/nope/*.zip", source="bogus")

    def test_gml_error_lane(self, spark, tmp_path):
        z = self._zip("a/broken.xml", b"<unclosed")
        p = tmp_path / "A09-06_02_GML.zip"
        p.write_bytes(z)
        out = ingest.ingest_zips(spark, str(p), source="gml").toPandas()
        assert len(out) == 1
        assert "GmlError" in out.iloc[0]["error"]


class TestHostileInputs:
    """DoS-hardening: entity expansion and zip bombs quarantine, never
    expand. stdlib ElementTree DOES expand nested internal entities
    (verified: 6-level nest → 3×10⁵ chars from <1 KB), so the parser
    rejects any DOCTYPE at the expat level before a declaration lands."""

    BILLION_LAUGHS = (
        b'<?xml version="1.0"?>\n'
        b"<!DOCTYPE lolz [<!ENTITY lol 'lol'>"
        b"<!ENTITY lol2 '&lol;&lol;&lol;&lol;&lol;&lol;&lol;&lol;'>"
        b"<!ENTITY lol3 '&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;'>"
        b"]>\n<lolz>&lol3;</lolz>"
    )

    def test_entity_expansion_rejected(self):
        with pytest.raises(gml.GmlError, match="DOCTYPE"):
            gml.read_gml(self.BILLION_LAUGHS)

    def test_plain_doctype_rejected(self):
        doc = b'<?xml version="1.0"?><!DOCTYPE d><d/>'
        with pytest.raises(gml.GmlError, match="DOCTYPE"):
            gml.read_gml(doc)

    def test_non_numeric_poslist_is_typed(self):
        doc = (
            b'<?xml version="1.0"?>'
            b'<d xmlns:gml="http://www.opengis.net/gml/3.2"'
            b' xmlns:xlink="http://www.w3.org/1999/xlink"'
            b' xmlns:k="http://x/app">'
            b'<gml:Point gml:id="p"><gml:pos>35.0 abc</gml:pos>'
            b"</gml:Point>"
            b'<k:Station gml:id="st"><k:position xlink:href="#p"/>'
            b"</k:Station></d>"
        )
        with pytest.raises(gml.GmlError, match="non-numeric"):
            gml.read_gml(doc)

    def test_entity_bomb_quarantines_in_ingest(self):
        bio = io.BytesIO()
        with zipfile.ZipFile(bio, "w") as zf:
            zf.writestr("d/N03-20240101.xml", self.BILLION_LAUGHS)
        pdf = ingest.parse_gml_zip_bytes(
            "N03-20240101_13_GML.zip", bio.getvalue()
        )
        assert len(pdf) == 1
        assert "DOCTYPE" in pdf.iloc[0]["error"]

    def test_zip_bomb_declared_size_rejected(self):
        bio = io.BytesIO()
        with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("d/big.xml", b"\0" * 4096)  # 4 KB member
        with pytest.raises(zipsrc.ZipSourceError, match="zip-bomb"):
            zipsrc.read_member(bio.getvalue(), "d/big.xml", max_bytes=1024)

    def test_zip_bomb_member_quarantines_bundle(self, monkeypatch):
        layer = fixtures.polygon_layer()
        geoms = [wkb.loads(b) for b in layer["geometry"]]
        shp_buf, shx_buf = shp.write_shp(geoms)
        dbf_buf = dbf.write_dbf(
            [dbf.DbfField("N03_007", "C", 5)],
            [[r["行政区域コード"]] for _, r in layer.iterrows()],
            encoding="cp932",
            ldid=13,
        )
        bio = io.BytesIO()
        with zipfile.ZipFile(bio, "w") as zf:
            zf.writestr("d/admin.shp", shp_buf)
            zf.writestr("d/admin.shx", shx_buf)
            zf.writestr("d/admin.dbf", dbf_buf)
        monkeypatch.setattr(zipsrc, "MAX_MEMBER_BYTES", 8)
        pdf = ingest.parse_zip_bytes("N03-20240101_13_GML.zip", bio.getvalue())
        assert len(pdf) == 1
        assert "zip-bomb" in pdf.iloc[0]["error"]
