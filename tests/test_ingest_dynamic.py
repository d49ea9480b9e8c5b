"""End-to-end ingest of the dynamic-schema datasets (A42 / L01 / S12)
through ``ingest_zips``: synthetic KSJ ZIPs whose filenames and member
shapefiles drive the year-band / target-shp / arithmetic column-name
dispatch, asserted against the reference's own band-edge expectations
(colnames.rs:230-271) — at the ZIP level, not just the function level.
"""

import io
import zipfile

import pytest

from ksj2gp_spark import fixtures
from ksj2gp_spark.formats import dbf, shp
from ksj2gp_spark.geo import wkb
from ksj2gp_spark.ksj._colname_data import (
    A42_COLNAMES_NORMAL,
    A42_COLNAMES_SPECIAL,
    L01_COLNAMES_1983,
    L01_COLNAMES_2014,
    L01_COLNAMES_2018,
    L01_COLNAMES_2022,
    L01_COLNAMES_2024,
)
from ksj2gp_spark.operators import ingest

META_JGD2011 = (
    "<referenceSystemIdentifier><code>JGD2011 / (B, L)</code>"
    "</referenceSystemIdentifier>"
).encode("cp932")


def _bundle(cols: list[str], n_rows: int = 2) -> tuple[bytes, bytes, bytes]:
    """(shp, shx, dbf) for a layer of n_rows small boxes with string
    columns named ``cols`` holding deterministic values."""
    layer = fixtures.polygon_layer().head(n_rows)
    geoms = [wkb.loads(b) for b in layer["geometry"]]
    shp_buf, shx_buf = shp.write_shp(geoms)
    fields = [dbf.DbfField(c, "C", 12) for c in cols]
    rows = [[f"v{r}_{i}" for i in range(len(cols))] for r in range(n_rows)]
    dbf_buf = dbf.write_dbf(fields, rows, encoding="cp932", ldid=13)
    return shp_buf, shx_buf, dbf_buf


def _zip_bytes(members: dict[str, bytes]) -> bytes:
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return bio.getvalue()


@pytest.mark.parametrize(
    ("fname", "cols", "expected"),
    [
        # one year per L01 band, columns straddling each band edge
        (
            "L01-13_13_GML.zip",
            ["L01_001", "L01_031"],
            {"L01_001": L01_COLNAMES_1983[0], "L01_031": L01_COLNAMES_1983[30]},
        ),
        (
            "L01-14_13_GML.zip",
            ["L01_047", "L01_048", "L01_079", "L01_080"],
            {
                "L01_047": L01_COLNAMES_2014[46],
                "L01_048": "調査価格_1983年",
                "L01_079": "調査価格_2014年",
                "L01_080": "属性移動_1984年",
            },
        ),
        (
            "L01-18_13_GML.zip",
            ["L01_055", "L01_056", "L01_091", "L01_092"],
            {
                "L01_055": L01_COLNAMES_2018[54],
                "L01_056": "調査価格_1983年",
                "L01_091": "調査価格_2018年",
                "L01_092": "属性移動_1984年",
            },
        ),
        (
            "L01-22_13_GML.zip",
            ["L01_060", "L01_061", "L01_100", "L01_101"],
            {
                "L01_060": L01_COLNAMES_2022[59],
                "L01_061": "調査価格_1983年",
                "L01_100": "調査価格_2022年",
                "L01_101": "属性移動_1984年",
            },
        ),
        (
            "L01-24_13_GML.zip",
            ["L01_061", "L01_062", "L01_103", "L01_104"],
            {
                "L01_061": L01_COLNAMES_2024[60],
                "L01_062": "調査価格_1983年",
                "L01_103": "調査価格_2024年",
                "L01_104": "属性移動_1984年",
            },
        ),
        # S12: fixed names + arithmetic (重複/データ有無/備考/乗降客数)+year
        (
            "S12-19_GML.zip",
            ["S12_001", "S12_001c", "S12_004", "S12_006", "S12_009", "S12_058"],
            {
                "S12_001": "駅名",
                "S12_001c": "駅コード",
                "S12_004": "鉄道区分",
                "S12_006": "重複コード2011",
                "S12_009": "乗降客数2011",
                "S12_058": "重複コード2024",
            },
        ),
    ],
)
def test_l01_s12_zip_ingest_band_edges(spark, tmp_path, fname, cols, expected):
    shp_buf, shx_buf, dbf_buf = _bundle(cols)
    stem = fname[:-4]
    z = _zip_bytes(
        {
            f"{stem}/layer.shp": shp_buf,
            f"{stem}/layer.shx": shx_buf,
            f"{stem}/layer.dbf": dbf_buf,
            f"{stem}/KS-META.xml": META_JGD2011,
        }
    )
    (tmp_path / fname).write_bytes(z)
    pdf = ingest.ingest_zips(spark, str(tmp_path / fname)).toPandas()
    assert pdf["error"].isna().all()
    attrs = pdf.iloc[0]["attrs"]
    for col, name in expected.items():
        assert name in attrs, f"{col} should translate to {name}; got {sorted(attrs)}"


def test_a42_two_shapefile_dispatch(spark, tmp_path):
    """One A42 ZIP carries BOTH layouts; each member translates with
    its own column table keyed by the shapefile name suffix."""
    normal_cols = ["A42_000", "A42_003", "A42_008"]
    special_cols = ["A42_000", "A42_003", "A42_009"]
    n_shp, n_shx, n_dbf = _bundle(normal_cols)
    s_shp, s_shx, s_dbf = _bundle(special_cols)
    stem = "A42-18_GML"
    base_n = "Preservation_Area_of_Historic_Landscape"
    base_s = "Spacial_Preservation_Area_of_Historic_Landscape"
    z = _zip_bytes(
        {
            f"{stem}/{base_n}.shp": n_shp,
            f"{stem}/{base_n}.shx": n_shx,
            f"{stem}/{base_n}.dbf": n_dbf,
            f"{stem}/{base_s}.shp": s_shp,
            f"{stem}/{base_s}.shx": s_shx,
            f"{stem}/{base_s}.dbf": s_dbf,
            f"{stem}/KS-META.xml": META_JGD2011,
        }
    )
    (tmp_path / f"{stem}.zip").write_bytes(z)
    pdf = ingest.ingest_zips(spark, str(tmp_path / f"{stem}.zip")).toPandas()
    assert pdf["error"].isna().all()
    assert (pdf["ksj_id"] == "A42").all() and (pdf["year"] == 2018).all()
    by_shp = {
        name: grp.iloc[0]["attrs"] for name, grp in pdf.groupby("shp_name")
    }
    normal_attrs = by_shp[f"{stem}/{base_n}.shp"]
    special_attrs = by_shp[f"{stem}/{base_s}.shp"]
    assert A42_COLNAMES_NORMAL[0] in normal_attrs
    assert A42_COLNAMES_NORMAL[8] in normal_attrs
    assert A42_COLNAMES_SPECIAL[9] in special_attrs
    # the two layouts differ where the tables differ
    assert A42_COLNAMES_SPECIAL[3] in special_attrs
    assert normal_attrs.keys() != special_attrs.keys()


def test_strict_mode_raises_nothing_for_known_columns(tmp_path):
    """ignore_translation_errors=False over every fixture ZIP: the full
    colname table means no TranslationError for any real column id."""
    for fname, cols in [
        ("L01-18_13_GML.zip", ["L01_001", "L01_056"]),
        ("S12-19_GML.zip", ["S12_001", "S12_061"]),
        ("N03-20240101_13_GML.zip", ["N03_001", "N03_004", "N03_007"]),
    ]:
        shp_buf, shx_buf, dbf_buf = _bundle(cols)
        stem = fname[:-4]
        z = _zip_bytes(
            {
                f"{stem}/x.shp": shp_buf,
                f"{stem}/x.shx": shx_buf,
                f"{stem}/x.dbf": dbf_buf,
                f"{stem}/KS-META.xml": META_JGD2011,
            }
        )
        pdf = ingest.parse_zip_bytes(
            fname, z, translate=True, ignore_translation_errors=False
        )
        assert pdf["error"].isna().all(), pdf["error"].tolist()
