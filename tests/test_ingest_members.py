"""Member-parallel ingestion (`ingest.ingest_zip_members`) — row-set
equality with the per-ZIP path, listing semantics, and error-lane
parity. The point of the variant: a single multi-layer bundle must not
serialize into one straggler task (reference converts one archive at a
time, lib.rs:23-48; the member split is scale capability)."""

from __future__ import annotations

import io
import zipfile

import pytest

from ksj2gp_spark import fixtures
from ksj2gp_spark.formats import dbf, shp
from ksj2gp_spark.geo import wkb
from ksj2gp_spark.operators import ingest

META_JGD2011 = (
    "<referenceSystemIdentifier><code>JGD2011 / (B, L)</code>"
    "</referenceSystemIdentifier>"
).encode("cp932")


def _shp_layer_bytes(code_prefix: str) -> tuple[bytes, bytes, bytes]:
    layer = fixtures.polygon_layer()
    geoms = [wkb.loads(b) for b in layer["geometry"]]
    shp_buf, shx_buf = shp.write_shp(geoms)
    fields = [
        dbf.DbfField("N03_001", "C", 20),
        dbf.DbfField("N03_004", "C", 20),
        dbf.DbfField("N03_007", "C", 5),
    ]
    rows = [
        [r["都道府県名"], code_prefix + r["区町村名"], r["行政区域コード"]]
        for _, r in layer.iterrows()
    ]
    dbf_buf = dbf.write_dbf(fields, rows, encoding="cp932", ldid=13)
    return shp_buf, shx_buf, dbf_buf


def _multi_shp_zip() -> bytes:
    """One KSJ ZIP holding TWO shapefile layers with distinct attrs."""
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as zf:
        for name, prefix in (("admin", "A_"), ("landuse", "B_")):
            s, x, d = _shp_layer_bytes(prefix)
            zf.writestr(f"N03-20240101_13_GML/{name}.shp", s)
            zf.writestr(f"N03-20240101_13_GML/{name}.shx", x)
            zf.writestr(f"N03-20240101_13_GML/{name}.dbf", d)
        zf.writestr("N03-20240101_13_GML/KS-META-N03.xml", META_JGD2011)
    return bio.getvalue()


def _gml_member(n: int, tag: int) -> bytes:
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<Dataset xmlns:gml="http://www.opengis.net/gml/3.2" '
        'xmlns:xlink="http://www.w3.org/1999/xlink" '
        'xmlns="http://nlftp.mlit.go.jp/ksj/schemas/ksj-app" '
        'gml:id="ds">'
    ]
    for i in range(n):
        x, y = 135.0 + 0.02 * i + tag, 35.0 + 0.01 * i
        pl = (
            f"{y:.6f} {x:.6f} {y:.6f} {x + 0.01:.6f} "
            f"{y + 0.01:.6f} {x + 0.01:.6f} {y:.6f} {x:.6f}"
        )
        parts.append(
            f'<gml:Surface gml:id="sf{i}" srsName="fguuid:jgd2011.bl">'
            f"<gml:patches><gml:PolygonPatch><gml:exterior>"
            f"<gml:LinearRing><gml:posList>{pl}</gml:posList>"
            f"</gml:LinearRing></gml:exterior></gml:PolygonPatch>"
            f"</gml:patches></gml:Surface>"
            f'<AdministrativeBoundary gml:id="ab{i}">'
            f'<bounds xlink:href="#sf{i}"/>'
            f'<administrativeAreaCode codeSpace="AdminAreaCd.xml">'
            f"13{(i + tag) % 900 + 100:03d}</administrativeAreaCode>"
            f"<name>city{i}</name>"
            f"</AdministrativeBoundary>"
        )
    parts.append("</Dataset>")
    return "\n".join(parts).encode()


def _multi_gml_zip() -> bytes:
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as zf:
        zf.writestr("d/N03-24_01.xml", _gml_member(7, 0))
        zf.writestr("d/N03-24_02.xml", _gml_member(5, 1))
    return bio.getvalue()


def _collect_canon(df):
    rows = df.collect()
    out = []
    for r in rows:
        d = r.asDict()
        d["attrs"] = tuple(sorted((d["attrs"] or {}).items()))
        d["geometry"] = bytes(d["geometry"]) if d["geometry"] else None
        out.append(tuple(sorted(d.items())))
    return sorted(out)


class TestListZipMembers:
    def test_one_row_per_member(self, spark, tmp_path):
        (tmp_path / "N03-20240101_13_GML.zip").write_bytes(_multi_shp_zip())
        listed = ingest.list_zip_members(
            spark, str(tmp_path / "*.zip"), source="shp"
        ).collect()
        members = sorted(r["member"] for r in listed)
        assert members == [
            "N03-20240101_13_GML/admin.shp",
            "N03-20240101_13_GML/landuse.shp",
        ]
        assert all(r["lane"] == "shp" and r["err"] is None for r in listed)

    def test_auto_prefers_shp_never_both(self, spark, tmp_path):
        bio = io.BytesIO()
        with zipfile.ZipFile(bio, "w") as zf:
            s, x, d = _shp_layer_bytes("A_")
            zf.writestr("a/admin.shp", s)
            zf.writestr("a/admin.shx", x)
            zf.writestr("a/admin.dbf", d)
            zf.writestr("a/extra.xml", _gml_member(2, 0))
        (tmp_path / "N03-20240101_13_GML.zip").write_bytes(bio.getvalue())
        listed = ingest.list_zip_members(
            spark, str(tmp_path / "*.zip"), source="auto"
        ).collect()
        assert [r["member"] for r in listed] == ["a/admin.shp"]

    def test_bad_archive_and_target_errors(self, spark, tmp_path):
        (tmp_path / "N03-20240101_13_GML.zip").write_bytes(b"not a zip")
        listed = ingest.list_zip_members(
            spark, str(tmp_path / "*.zip"), source="shp"
        ).collect()
        assert len(listed) == 1 and listed[0]["err"].startswith("BadZipFile:")

    def test_rejects_bad_source(self, spark):
        with pytest.raises(ValueError, match="shp|gml|auto"):
            ingest.list_zip_members(spark, "/nope/*.zip", source="tar")


class TestIngestZipMembers:
    def test_shp_rowset_equals_per_zip_path(self, spark, tmp_path):
        (tmp_path / "N03-20240101_13_GML.zip").write_bytes(_multi_shp_zip())
        glob = str(tmp_path / "*.zip")
        per_zip = _collect_canon(ingest.ingest_zips(spark, glob))
        per_member = _collect_canon(ingest.ingest_zip_members(spark, glob))
        assert per_member == per_zip
        assert len(per_member) > 0

    def test_gml_rowset_equals_per_zip_path(self, spark, tmp_path):
        (tmp_path / "N03-20240101_13_GML.zip").write_bytes(_multi_gml_zip())
        glob = str(tmp_path / "*.zip")
        per_zip = _collect_canon(ingest.ingest_zips(spark, glob, source="gml"))
        per_member = _collect_canon(
            ingest.ingest_zip_members(spark, glob, source="gml")
        )
        assert per_member == per_zip
        assert len(per_member) == 12  # 7 + 5 features across two members

    def test_target_shp_restriction_matches(self, spark, tmp_path):
        (tmp_path / "N03-20240101_13_GML.zip").write_bytes(_multi_shp_zip())
        glob = str(tmp_path / "*.zip")
        target = "N03-20240101_13_GML/admin.shp"
        per_zip = _collect_canon(
            ingest.ingest_zips(spark, glob, target_shp=target)
        )
        per_member = _collect_canon(
            ingest.ingest_zip_members(spark, glob, target_shp=target)
        )
        assert per_member == per_zip

    def test_error_rows_byte_identical(self, spark, tmp_path):
        # bad archive + missing target_shp both reproduce the per-ZIP
        # kernels' error text exactly
        (tmp_path / "N03-20240101_13_GML.zip").write_bytes(b"not a zip")
        glob = str(tmp_path / "*.zip")
        per_zip = _collect_canon(ingest.ingest_zips(spark, glob))
        per_member = _collect_canon(ingest.ingest_zip_members(spark, glob))
        assert per_member == per_zip

        (tmp_path / "N03-20240101_13_GML.zip").write_bytes(_multi_shp_zip())
        missing = "N03-20240101_13_GML/nope.shp"
        per_zip = _collect_canon(
            ingest.ingest_zips(spark, glob, target_shp=missing)
        )
        per_member = _collect_canon(
            ingest.ingest_zip_members(spark, glob, target_shp=missing)
        )
        assert per_member == per_zip
        assert "target_shp" in str(per_member)  # the error text survived

    def test_members_spread_across_partitions(self, spark, tmp_path):
        # the exploded rows are tiny strings carrying heavy parse work:
        # AQE's size-based coalescing folded the original column-hash
        # repartition into ONE partition (zero parallelism — the exact
        # straggler this variant exists to kill), so the spread must
        # hold with AQE ON, via explicit-count round-robin
        bio = io.BytesIO()
        with zipfile.ZipFile(bio, "w") as zf:
            for k in range(8):
                zf.writestr(f"d/N03-24_{k:02d}.xml", _gml_member(3, k))
        (tmp_path / "N03-20240101_13_GML.zip").write_bytes(bio.getvalue())
        from pyspark.sql import functions as F

        n_parts = max(
            spark.sparkContext.defaultParallelism * 2,
            int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        )
        spread = (
            ingest.list_zip_members(
                spark, str(tmp_path / "*.zip"), source="gml"
            )
            .repartition(n_parts)
            .sortWithinPartitions("path", "member")
        )
        counts = (
            spread.groupBy(F.spark_partition_id().alias("p"))
            .count()
            .collect()
        )
        # round-robin: 8 members spread one-per-partition (count-balanced)
        assert len(counts) == 8
        assert max(r["count"] for r in counts) == 1
        out = ingest.ingest_zip_members(
            spark, str(tmp_path / "*.zip"), source="gml"
        )
        assert out.filter(out.error.isNull()).count() == 24


class TestAutoStrategy:
    """ingest_zips_auto routing — the same no-manual-knob posture as
    pipeline.spatial_join's big-layer switch."""

    def test_member_for_one_member_heavy_bundle(self, spark, tmp_path):
        bio = io.BytesIO()
        with zipfile.ZipFile(bio, "w") as zf:
            for k in range(8):
                zf.writestr(f"d/N03-24_{k:02d}.xml", _gml_member(3, k))
        (tmp_path / "N03-20240101_13_GML.zip").write_bytes(bio.getvalue())
        strategy, listing = ingest._auto_ingest_strategy(
            spark, str(tmp_path / "*.zip"), source="gml",
            min_parallelism=4,
        )
        assert strategy == "member"
        # the probe's listing is handed to the member route (persisted)
        # so the central directories are never scanned twice
        assert listing is not None and listing.count() == 8

    def test_zip_when_archives_fill_cluster(self, spark, tmp_path):
        # 5 archives > min_parallelism=4: the limit-probe short-circuits
        # to per-archive without opening a single central directory
        for z in range(5):
            bio = io.BytesIO()
            with zipfile.ZipFile(bio, "w") as zf:
                zf.writestr("d/N03-24_01.xml", _gml_member(2, z))
            (tmp_path / f"N03-2024010{z}_13_GML.zip").write_bytes(
                bio.getvalue()
            )
        assert ingest._auto_ingest_strategy(
            spark, str(tmp_path / "*.zip"), source="gml",
            min_parallelism=4,
        ) == ("zip", None)

    def test_zip_for_single_member_archives(self, spark, tmp_path):
        # under-filled cluster but nothing to split: per-member would
        # only add the listing shuffle, so stay per-archive
        for z in range(2):
            bio = io.BytesIO()
            with zipfile.ZipFile(bio, "w") as zf:
                zf.writestr("d/N03-24_01.xml", _gml_member(2, z))
            (tmp_path / f"N03-2024010{z}_13_GML.zip").write_bytes(
                bio.getvalue()
            )
        assert ingest._auto_ingest_strategy(
            spark, str(tmp_path / "*.zip"), source="gml",
            min_parallelism=8,
        ) == ("zip", None)

    def test_auto_rowset_equals_per_zip(self, spark, tmp_path):
        (tmp_path / "N03-20240101_13_GML.zip").write_bytes(_multi_gml_zip())
        glob = str(tmp_path / "*.zip")
        auto = _collect_canon(
            ingest.ingest_zips_auto(spark, glob, source="gml",
                                    min_parallelism=8)
        )
        per_zip = _collect_canon(ingest.ingest_zips(spark, glob, source="gml"))
        assert auto == per_zip
        assert len(auto) == 12

    def test_mixed_health_bundle_routes_agree(self, spark, tmp_path):
        # one archive: good layer + corrupt layer + good layer. Member
        # quarantine means BOTH routes convert the healthy layers and
        # emit one error row naming the bad member — the route choice
        # (i.e. the cluster size the auto probe sees) must never change
        # the output row set
        bio = io.BytesIO()
        with zipfile.ZipFile(bio, "w") as zf:
            for name, prefix in (("a_good", "A_"), ("c_good", "C_")):
                s, x, d = _shp_layer_bytes(prefix)
                zf.writestr(f"L/{name}.shp", s)
                zf.writestr(f"L/{name}.shx", x)
                zf.writestr(f"L/{name}.dbf", d)
            s, x, _ = _shp_layer_bytes("B_")
            zf.writestr("L/b_bad.shp", s)
            zf.writestr("L/b_bad.shx", x)
            zf.writestr("L/b_bad.dbf", b"\x03corrupt")
            zf.writestr("L/KS-META-N03.xml", META_JGD2011)
        (tmp_path / "N03-20240101_13_GML.zip").write_bytes(bio.getvalue())
        glob = str(tmp_path / "*.zip")
        per_zip = _collect_canon(ingest.ingest_zips(spark, glob))
        per_member = _collect_canon(ingest.ingest_zip_members(spark, glob))
        assert per_member == per_zip
        flat = str(per_zip)
        assert "b_bad.shp" in flat  # the error row names the member
        assert "A_" in flat and "C_" in flat  # later layer survived

    def test_empty_gml_member_routes_agree(self, spark, tmp_path):
        # member2 is valid XML with zero features: both routes emit the
        # same loud per-member quarantine row, and member1 converts
        empty = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<Dataset xmlns:gml="http://www.opengis.net/gml/3.2" '
            'xmlns="http://nlftp.mlit.go.jp/ksj/schemas/ksj-app" '
            'gml:id="ds"></Dataset>'
        ).encode()
        bio = io.BytesIO()
        with zipfile.ZipFile(bio, "w") as zf:
            zf.writestr("d/N03-24_01.xml", _gml_member(4, 0))
            zf.writestr("d/N03-24_02.xml", empty)
        (tmp_path / "N03-20240101_13_GML.zip").write_bytes(bio.getvalue())
        glob = str(tmp_path / "*.zip")
        per_zip = _collect_canon(ingest.ingest_zips(spark, glob, source="gml"))
        per_member = _collect_canon(
            ingest.ingest_zip_members(spark, glob, source="gml")
        )
        assert per_member == per_zip
        errs = [r for r in per_zip if "contains no features" in str(r)]
        assert len(errs) == 1 and "N03-24_02.xml" in str(errs[0])
        assert len(per_zip) == 5  # 4 features + 1 quarantine row

    def test_pipeline_strategy_param(self, spark, tmp_path):
        from ksj2gp_spark import pipeline

        (tmp_path / "N03-20240101_13_GML.zip").write_bytes(_multi_shp_zip())
        glob = str(tmp_path / "*.zip")
        base = sorted(
            map(tuple, pipeline.ingest_polygons(
                spark, glob, strategy="zip"
            ).collect())
        )
        for strat in ("auto", "member"):
            got = sorted(
                map(tuple, pipeline.ingest_polygons(
                    spark, glob, strategy=strat
                ).collect())
            )
            assert got == base, strat
        with pytest.raises(ValueError, match="auto|zip|member"):
            pipeline.ingest_polygons(spark, glob, strategy="rdd")


class TestPyarrowUriTranslation:
    """Hadoop scheme aliases must map to pyarrow.fs names — Spark's
    binaryFile hands the member route s3a:// URIs that pyarrow
    rejects verbatim (ArrowInvalid), which would silently quarantine
    every archive on object storage."""

    def test_hadoop_aliases_translate(self):
        from ksj2gp_spark.operators.ingest import _pyarrow_uri

        assert (
            _pyarrow_uri("s3a://bucket/dir/a.zip") == "s3://bucket/dir/a.zip"
        )
        assert _pyarrow_uri("s3n://b/k.zip") == "s3://b/k.zip"
        # already-canonical and local schemes pass through untouched
        for u in (
            "s3://bucket/a.zip",
            "hdfs://nn:8020/a.zip",
            "gs://bucket/a.zip",
            "/local/a.zip",
        ):
            assert _pyarrow_uri(u) == u
