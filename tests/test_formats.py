"""Format codec tests: PNG round-trips, image codec PSNR/phash, dBASE
round-trips, shapefile round-trips, and the ZIP-source heuristics
(fixtures built per FIXTURES.md §3)."""

import datetime
import io
import struct
import zipfile
import zlib

import numpy as np
import pytest

from ksj2gp_spark.formats import dbf, imagecodec, png, shp, zipsrc
from ksj2gp_spark.geo import wkb


class TestPng:
    def test_rgb_roundtrip(self):
        arr = imagecodec.make_test_image(7, 32, 48, rgb=True)
        assert np.array_equal(png.decode(png.encode(arr)), arr)

    def test_gray_roundtrip(self):
        arr = imagecodec.make_test_image(3, 16, 16, rgb=False)
        assert np.array_equal(png.decode(png.encode(arr)), arr)

    def test_decode_filtered_rows(self):
        # Build a PNG with every filter type and check reconstruction
        # against the filter definitions.
        h, w = 5, 4
        arr = imagecodec.make_test_image(1, h, w, rgb=True)
        flat = arr.reshape(h, w * 3).astype(np.int32)
        rows = []
        for y, ftype in enumerate([0, 1, 2, 3, 4]):
            cur = flat[y]
            prev = flat[y - 1] if y > 0 else np.zeros(w * 3, np.int32)
            filt = np.zeros(w * 3, np.int32)
            for x in range(w * 3):
                left = cur[x - 3] if x >= 3 else 0
                up = prev[x]
                ul = prev[x - 3] if x >= 3 else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = left
                elif ftype == 2:
                    pred = up
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                filt[x] = (cur[x] - pred) % 256
            rows.append(bytes([ftype]) + bytes(filt.astype(np.uint8)))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        buf = (
            b"\x89PNG\r\n\x1a\n"
            + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + png._chunk(b"IEND", b"")
        )
        assert np.array_equal(png.decode(buf), arr)

    def test_not_png(self):
        with pytest.raises(png.PngError):
            png.decode(b"JFIF not a png")


class TestImageCodec:
    def test_png_lossless(self):
        arr = imagecodec.make_test_image(11, 24, 24)
        buf = imagecodec.encode_image(arr, "png")
        dec = imagecodec.decode_image(buf, "png")
        assert np.array_equal(dec, arr)
        assert imagecodec.psnr(arr, dec) == float("inf")

    def test_jpeg_lossy_but_over_40db(self):
        arr = imagecodec.make_test_image(13, 32, 32)
        buf = imagecodec.encode_image(arr, "jpeg")
        assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"  # real JFIF
        dec = imagecodec.decode_image(buf, "jpeg")
        p = imagecodec.psnr(arr, dec)
        assert 40.0 <= p < float("inf")

    def test_legacy_fjpg_standin_still_decodes(self):
        # round-2 tables carry FJPG bytes; the decode lane stays
        # readable after the real-codec swap
        from ksj2gp_spark.formats import png as png_mod

        arr = imagecodec.make_test_image(13, 16, 16)
        legacy = imagecodec.FAKE_JPEG_MAGIC + png_mod.encode((arr >> 1) << 1)
        dec = imagecodec.decode_image(legacy, "jpeg")
        assert imagecodec.psnr(arr, dec) >= 40.0

    def test_truncated_jpeg_rejected_with_typed_error(self):
        from ksj2gp_spark.formats.jpeg import JpegError

        with pytest.raises(JpegError):
            imagecodec.decode_image(b"\xff\xd8\xff\xe0real-jpeg", "jpeg")

    def test_phash_stability_and_sensitivity(self):
        a = imagecodec.make_test_image(5, 64, 64)
        h1 = imagecodec.phash64(a)
        h2 = imagecodec.phash64(a.copy())
        assert h1 == h2
        assert -(2**63) <= h1 < 2**63
        # quantization (fake-jpeg loss) barely moves the hash
        dec = imagecodec.decode_image(imagecodec.encode_image(a, "jpeg"), "jpeg")
        assert imagecodec.hamming64(h1, imagecodec.phash64(dec)) <= 4
        # a very different image moves it a lot
        b = imagecodec.make_test_image(6, 64, 64)[::-1, ::-1]
        assert imagecodec.hamming64(h1, imagecodec.phash64(b)) > 4


class TestDbf:
    FIELDS = [
        dbf.DbfField("N03_001", "C", 20),
        dbf.DbfField("N03_007", "C", 5),
        dbf.DbfField("POP", "N", 10),
        dbf.DbfField("AREA", "N", 12, 3),
        dbf.DbfField("ACTIVE", "L", 1),
        dbf.DbfField("SINCE", "D", 8),
    ]
    ROWS = [
        ["東京都", "13101", 12345, 1.5, True, datetime.date(2020, 1, 2)],
        ["大阪府", "27100", None, 2.25, False, None],
        [None, "01100", 7, None, None, datetime.date(1999, 12, 31)],
    ]

    def test_roundtrip_cp932(self):
        buf = dbf.write_dbf(self.FIELDS, self.ROWS, encoding="cp932", ldid=13)
        n, hs, rs, ldid = dbf.read_header(buf)
        assert n == 3 and ldid == 13
        fields, rows = dbf.read_dbf(buf, encoding="cp932")
        assert [f.name for f in fields] == [f.name for f in self.FIELDS]
        assert rows == self.ROWS

    def test_roundtrip_utf8(self):
        buf = dbf.write_dbf(self.FIELDS, self.ROWS, encoding="utf-8")
        _, rows = dbf.read_dbf(buf, encoding="utf-8")
        assert rows == self.ROWS

    def test_type_mapping_matches_reference(self):
        # builder.rs:290-318: N→float64/int, C→utf8, L→bool, D→date
        _, rows = dbf.read_dbf(dbf.write_dbf(self.FIELDS, self.ROWS))
        assert isinstance(rows[0][2], int)
        assert isinstance(rows[0][3], float)
        assert isinstance(rows[0][4], bool)
        assert isinstance(rows[0][5], datetime.date)


def _poly(coords):
    return wkb.loads(wkb.polygon(coords))


class TestShp:
    def test_polygon_roundtrip(self):
        g1 = _poly([(139.0, 35.0), (140.0, 35.0), (140.0, 36.0), (139.0, 36.0)])
        g2 = _poly([(135.0, 34.0), (136.0, 34.0), (136.0, 35.0), (135.0, 34.5)])
        shp_buf, shx_buf = shp.write_shp([g1, g2])
        geoms = shp.read_shp(shp_buf)
        assert len(geoms) == 2
        assert geoms[0].kind == wkb.POLYGON
        assert np.allclose(geoms[0].coords[0], g1.coords[0])
        assert len(shx_buf) == 100 + 2 * 8

    def test_point_roundtrip(self):
        pts = [
            wkb.Geometry(wkb.POINT, np.array([139.7, 35.7])),
            wkb.Geometry(wkb.POINT, np.array([135.5, 34.7])),
        ]
        shp_buf, _ = shp.write_shp(pts)
        geoms = shp.read_shp(shp_buf)
        assert [g.kind for g in geoms] == [wkb.POINT, wkb.POINT]
        assert geoms[0].coords[0] == 139.7

    def test_bad_magic(self):
        with pytest.raises(shp.ShpError):
            shp.read_shp(b"\x00" * 128)


def _build_zip(members: dict[str, bytes]) -> bytes:
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return bio.getvalue()


def _tiny_bundle(prj: bytes | None = None, cpg: bytes | None = None,
                 meta: bytes | None = None, ldid: int = 0):
    g = _poly([(139.0, 35.0), (140.0, 35.0), (140.0, 36.0), (139.0, 36.0)])
    shp_buf, shx_buf = shp.write_shp([g])
    dbf_buf = dbf.write_dbf(
        [dbf.DbfField("N03_007", "C", 5)], [["13101"]], ldid=ldid
    )
    members = {"data.shp": shp_buf, "data.dbf": dbf_buf, "data.shx": shx_buf}
    if prj is not None:
        members["data.prj"] = prj
    if cpg is not None:
        members["data.cpg"] = cpg
    if meta is not None:
        members["KS-META-data.xml"] = meta
    return members


META_TD = (
    "<referenceSystemIdentifier><code>TD / (B, L)</code>"
    "</referenceSystemIdentifier>"
).encode("cp932")


class TestZipSource:
    def test_list_and_probe(self):
        z = _build_zip(_tiny_bundle(meta=META_TD))
        assert zipsrc.list_shp_files(z) == ["data.shp"]
        assert zipsrc.find_meta_xml(z) == "KS-META-data.xml"

    def test_crs_prj_wins(self):
        z = _build_zip(
            _tiny_bundle(prj=b'GEOGCS["GCS_JGD_2011",...]', meta=META_TD)
        )
        b = zipsrc.read_bundle(z, "data.shp")
        assert b.crs == "JGD2011"

    def test_crs_meta_fallback(self):
        z = _build_zip(_tiny_bundle(meta=META_TD))
        b = zipsrc.read_bundle(z, "data.shp")
        assert b.crs == "Tokyo"

    def test_encoding_ldid(self):
        z = _build_zip(_tiny_bundle(meta=META_TD, ldid=13, cpg=b"UTF-8"))
        assert zipsrc.read_bundle(z, "data.shp").encoding == "cp932"

    def test_encoding_cpg(self):
        z = _build_zip(_tiny_bundle(meta=META_TD, cpg=b"UTF-8"))
        assert zipsrc.read_bundle(z, "data.shp").encoding == "utf-8"

    def test_missing_dbf_errors(self):
        members = _tiny_bundle(meta=META_TD)
        del members["data.dbf"]
        z = _build_zip(members)
        with pytest.raises(zipsrc.ZipSourceError, match="data.dbf"):
            zipsrc.read_bundle(z, "data.shp")

    def test_no_crs_errors(self):
        z = _build_zip(_tiny_bundle())
        from ksj2gp_spark.ksj import CrsError

        with pytest.raises(CrsError):
            zipsrc.read_bundle(z, "data.shp")

    def test_mangled_member_names(self):
        # Member stored with CP932 bytes (exposed as CP437 text): the
        # lister must repair it and read_bundle must re-mangle to match.
        members = _tiny_bundle(meta=META_TD)
        mangled = {}
        for name, data in members.items():
            if name.startswith("data"):
                name = "札幌市" + name[4:]
            mangled[name.encode("cp932").decode("cp437")] = data
        bio = io.BytesIO()
        with zipfile.ZipFile(bio, "w") as zf:
            for name, data in mangled.items():
                # Force the non-UTF8 flag path by writing raw CP437 text
                zf.writestr(name, data)
        z = bio.getvalue()
        names = zipsrc.list_shp_files(z)
        assert names == ["札幌市.shp"]
        b = zipsrc.read_bundle(z, "札幌市.shp")
        assert b.crs == "Tokyo"


def test_parse_zip_target_shp_selection():
    """Multi-layer ZIP: target_shp restricts to one member; a wrong
    target lands in the error lane (reference candidate workflow)."""
    import io
    import zipfile

    import numpy as np

    from ksj2gp_spark.formats import dbf as dbf_mod, shp as shp_mod
    from ksj2gp_spark.geo import wkb
    from ksj2gp_spark.operators.ingest import parse_zip_bytes

    g = [wkb.loads(wkb.polygon([(0, 0), (1, 0), (1, 1), (0, 0)]))]
    shp_buf, shx_buf = shp_mod.write_shp(g)
    fields = [dbf_mod.DbfField("N03_007", "C", 5)]
    dbf_buf = dbf_mod.write_dbf(fields, [["13101"]], ldid=13)
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as zf:
        for layer in ("a", "b"):
            zf.writestr(f"{layer}.shp", shp_buf)
            zf.writestr(f"{layer}.shx", shx_buf)
            zf.writestr(f"{layer}.dbf", dbf_buf)
        zf.writestr(
            "KS-META.xml",
            "<referenceSystemIdentifier><code>JGD2011 / (B, L)</code>"
            "</referenceSystemIdentifier>".encode("cp932"),
        )
    zb = bio.getvalue()

    all_rows = parse_zip_bytes("N03-20240101_13_GML.zip", zb)
    assert sorted(all_rows["shp_name"].unique()) == ["a.shp", "b.shp"]

    only_b = parse_zip_bytes("N03-20240101_13_GML.zip", zb, target_shp="b.shp")
    ok = only_b[only_b["error"].isnull()]
    assert list(ok["shp_name"].unique()) == ["b.shp"]

    bad = parse_zip_bytes("N03-20240101_13_GML.zip", zb, target_shp="zzz.shp")
    assert bad["error"].notna().all()
    assert "zzz.shp" in bad["error"].iloc[0]
    del np


def test_dbf_datetime_roundtrip():
    """dBASE 'T' (DateTime): JDN + ms-since-midnight pairs round-trip.
    The reference panics on this type (builder.rs:310 unimplemented!());
    decoding it is an engine extension."""
    import datetime as dt

    from ksj2gp_spark.formats import dbf as dbf_mod

    fields = [dbf_mod.DbfField("STAMP", "T", 8)]
    vals = [
        dt.datetime(1970, 1, 1, 0, 0, 0),
        dt.datetime(2024, 2, 29, 23, 59, 59),
        dt.datetime(1999, 12, 31, 12, 30, 15),
        None,
    ]
    buf = dbf_mod.write_dbf(fields, [[v] for v in vals])
    got_fields, rows = dbf_mod.read_dbf(buf)
    assert got_fields[0].ftype == "T"
    assert [r[0] for r in rows] == vals


def test_dbf_memo_currency_double_roundtrip():
    """dBASE 'M'/'Y'/'B' per builder.rs:291-296: Currency and Double map
    to float64, Memo resolves to text through the .dbt sidecar (null
    when the sidecar is absent)."""
    from ksj2gp_spark.formats import dbf as dbf_mod

    texts = ["memo one", None, "メモ三"]
    dbt, blocks = dbf_mod.write_dbt(texts, encoding="cp932")
    fields = [
        dbf_mod.DbfField("NOTE", "M", 10),
        dbf_mod.DbfField("PRICE", "Y", 8),
        dbf_mod.DbfField("RATIO", "B", 8),
    ]
    rows_in = [
        [blocks[0], 1234.5678, 0.125],
        [blocks[1], -0.0001, -2.5],
        [blocks[2], 42.0, 1e100],
    ]
    buf = dbf_mod.write_dbf(fields, rows_in, encoding="cp932")

    got_fields, rows = dbf_mod.read_dbf(buf, encoding="cp932", memo=dbt)
    assert [f.ftype for f in got_fields] == ["M", "Y", "B"]
    assert [r[0] for r in rows] == texts
    assert [r[1] for r in rows] == [1234.5678, -0.0001, 42.0]
    assert [r[2] for r in rows] == [0.125, -2.5, 1e100]
    assert all(isinstance(r[1], float) and isinstance(r[2], float) for r in rows)

    # no sidecar → memo cells are null, numerics unaffected
    _, rows_nomemo = dbf_mod.read_dbf(buf, encoding="cp932")
    assert [r[0] for r in rows_nomemo] == [None, None, None]
    assert [r[1] for r in rows_nomemo] == [1234.5678, -0.0001, 42.0]

    # dangling block reference (past end of sidecar) → null, not a crash
    _, rows_dangling = dbf_mod.read_dbf(buf, encoding="cp932", memo=dbt[:512])
    assert rows_dangling[0][0] is None


def test_ingest_zip_with_memo_sidecar():
    """End-to-end: a ZIP whose .dbf has M/Y/B fields and a .dbt member
    converts with memo text resolved (the reference converts these
    types; round-2 quarantined them)."""
    import io
    import zipfile

    from ksj2gp_spark.formats import dbf as dbf_mod, shp as shp_mod
    from ksj2gp_spark.geo import wkb
    from ksj2gp_spark.operators.ingest import parse_zip_bytes

    g = [
        wkb.loads(wkb.polygon([(0, 0), (1, 0), (1, 1), (0, 0)])),
        wkb.loads(wkb.polygon([(2, 2), (3, 2), (3, 3), (2, 2)])),
    ]
    shp_buf, shx_buf = shp_mod.write_shp(g)
    dbt, blocks = dbf_mod.write_dbt(["first note", None], encoding="cp932")
    fields = [
        dbf_mod.DbfField("N03_007", "C", 5),
        dbf_mod.DbfField("NOTE", "M", 10),
        dbf_mod.DbfField("PRICE", "Y", 8),
        dbf_mod.DbfField("RATIO", "B", 8),
    ]
    dbf_buf = dbf_mod.write_dbf(
        fields,
        [["13101", blocks[0], 12.5, 0.5], ["27100", blocks[1], -1.0, 2.0]],
        ldid=13,
    )
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as zf:
        zf.writestr("data.shp", shp_buf)
        zf.writestr("data.shx", shx_buf)
        zf.writestr("data.dbf", dbf_buf)
        zf.writestr("data.dbt", dbt)
        zf.writestr(
            "KS-META.xml",
            "<referenceSystemIdentifier><code>JGD2011 / (B, L)</code>"
            "</referenceSystemIdentifier>".encode("cp932"),
        )
    pdf = parse_zip_bytes("N03-20240101_13_GML.zip", bio.getvalue())
    ok = pdf[pdf["error"].isnull()]
    assert len(ok) == 2
    attrs = list(ok["attrs"])
    assert attrs[0]["NOTE"] == "first note"
    assert attrs[1]["NOTE"] is None
    assert attrs[0]["PRICE"] == "12.5" and attrs[1]["PRICE"] == "-1.0"
    assert attrs[0]["RATIO"] == "0.5" and attrs[1]["RATIO"] == "2.0"
