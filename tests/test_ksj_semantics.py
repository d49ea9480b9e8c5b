"""Golden tests for encoding / CRS / colname / codelist semantics,
ported from the reference's unit tests:
- encoding round-trips: /root/reference/rust/src/encoding.rs:140-161
- CRS from meta XML:    /root/reference/rust/src/crs/mod.rs:86-124
- colnames (A03/A42/L01 bands/S12): .../translate/colnames.rs:160-298
- codelist dispatch:    .../translate/codelists.rs:332-380
- guess_encoding rules: .../zip_reader.rs:143-183
"""

import pytest

from ksj2gp_spark.ksj import (
    CrsError,
    TranslateOptions,
    TranslationError,
    decode_cp437cp932_to_utf8,
    encode_utf8_to_cp437cp932,
    format_numeric_code,
    get_codelist_map,
    guess_crs,
    guess_crs_from_esri_wkt,
    guess_crs_from_meta_xml,
    guess_encoding,
    translate_colnames,
    translate_value,
)
from ksj2gp_spark.ksj._colname_data import (
    A42_COLNAMES_NORMAL,
    A42_COLNAMES_SPECIAL,
    L01_COLNAMES_1983,
    L01_COLNAMES_2014,
    L01_COLNAMES_2018,
    L01_COLNAMES_2022,
    L01_COLNAMES_2024,
)
from ksj2gp_spark.ksj.colnames import translate_colnames_l01


class TestEncoding:
    def test_ascii_passthrough(self):
        assert decode_cp437cp932_to_utf8("Hello, world!") == "Hello, world!"

    def test_mangled_sjis(self):
        assert decode_cp437cp932_to_utf8("ÄDûyÄs") == "札幌市"

    def test_utf8_passthrough(self):
        assert decode_cp437cp932_to_utf8("札幌市") == "札幌市"

    def test_roundtrip(self):
        assert encode_utf8_to_cp437cp932("札幌市") == "ÄDûyÄs"


def _meta_xml(code: str) -> str:
    return f"""
<referenceSystemInfo>
    <MD_ReferenceSystem>
        <referenceSystemIdentifier>
            <code>{code} / (B, L)</code>
        </referenceSystemIdentifier>
    </MD_ReferenceSystem>
</referenceSystemInfo>
"""


class TestCrs:
    @pytest.mark.parametrize(
        "code,expected",
        [("TD", "Tokyo"), ("JGD2000", "JGD2000"), ("JGD2011", "JGD2011")],
    )
    def test_from_meta_xml(self, code, expected):
        assert guess_crs_from_meta_xml(_meta_xml(code)) == expected

    def test_from_meta_xml_unknown(self):
        with pytest.raises(CrsError):
            guess_crs_from_meta_xml(_meta_xml("WGS84"))

    @pytest.mark.parametrize(
        "frag,expected",
        [
            ("GCS_JGD_2011", "JGD2011"),
            ("GCS_JGD_2000", "JGD2000"),
            ("GCS_Tokyo", "Tokyo"),
        ],
    )
    def test_from_esri_wkt(self, frag, expected):
        wkt = f'GEOGCS["{frag}",DATUM["D_JGD",SPHEROID["GRS_1980",6378137,298.25]]]'
        assert guess_crs_from_esri_wkt(wkt) == expected

    def test_fallback_order(self):
        # .prj wins over meta XML; meta XML used when .prj unusable.
        assert guess_crs('GEOGCS["GCS_JGD_2011"]', _meta_xml("TD")) == "JGD2011"
        assert guess_crs("garbage", _meta_xml("TD")) == "Tokyo"
        assert guess_crs(None, _meta_xml("JGD2000")) == "JGD2000"
        with pytest.raises(CrsError):
            guess_crs(None, None)


class TestGuessEncoding:
    def _hdr(self, ldid=0):
        return bytes(28) + bytes([ldid]) + bytes(3)

    def test_ldid_wins(self):
        assert guess_encoding(self._hdr(13), "UTF-8", "a.shp") == "cp932"

    def test_cpg_utf8(self):
        assert guess_encoding(self._hdr(0), "UTF-8", "a.shp") == "utf-8"

    def test_cpg_cp932(self):
        assert guess_encoding(self._hdr(0), "CP932", "a.shp") == "cp932"

    def test_path_heuristic(self):
        assert guess_encoding(self._hdr(0), None, "x_UTF-8_x.shp") == "utf-8"
        assert guess_encoding(self._hdr(0), None, "data_utf_8.shp") == "utf-8"

    def test_default_sjis(self):
        assert guess_encoding(self._hdr(0), None, "plain.shp") == "cp932"


def _opts(ksj_id, target_shp="", year=2024, **kw):
    return TranslateOptions(ksj_id=ksj_id, target_shp=target_shp, year=year, **kw)


class TestColnames:
    def test_a03_static(self):
        cases = [
            ("A03_001", "行政区域コード"),
            ("A03_002", "都道府県名"),
            ("A03_003", "郡市名"),
            ("A03_004", "区町村名"),
            ("A03_005", "陸水等区分"),
            ("A03_006", "区域区分"),
            ("A03_007", "区域コード"),
            ("A03_008", "備考"),
        ]
        for code, expected in cases:
            assert translate_colnames(code, _opts("A03")) == expected

    def test_n03_static(self):
        assert translate_colnames("N03_007", _opts("N03")) == "行政区域コード"
        assert translate_colnames("N03_001", _opts("N03")) == "都道府県名"

    def test_disabled_passthrough(self):
        opts = _opts("A03")
        opts.translate_colnames = False
        assert translate_colnames("A03_001", opts) == "A03_001"

    def test_unknown_raises_or_passes(self):
        with pytest.raises(TranslationError):
            translate_colnames("ZZ9_999", _opts("ZZ9"))
        opts = _opts("ZZ9", ignore_translation_errors=True)
        assert translate_colnames("ZZ9_999", opts) == "ZZ9_999"

    def test_a42_normal(self):
        opts = _opts("A42", "Preservation_Area_of_Historic_Landscape.shp")
        for code, expected in [
            ("A42_000", A42_COLNAMES_NORMAL[0]),
            ("A42_003", A42_COLNAMES_NORMAL[3]),
            ("A42_008", A42_COLNAMES_NORMAL[8]),
        ]:
            assert translate_colnames(code, opts) == expected

    def test_a42_special(self):
        opts = _opts("A42", "Spacial_Preservation_Area_of_Historic_Landscape.shp")
        for code, expected in [
            ("A42_000", A42_COLNAMES_SPECIAL[0]),
            ("A42_003", A42_COLNAMES_SPECIAL[3]),
            ("A42_009", A42_COLNAMES_SPECIAL[9]),
        ]:
            assert translate_colnames(code, opts) == expected

    # Year-band boundaries: last fixed idx → first dynamic (調査価格 1983)
    # → dynamic where y == year → first 属性移動 (1984).
    L01_CASES = [
        ("L01_001", 2013, L01_COLNAMES_1983[0]),
        ("L01_031", 2010, L01_COLNAMES_1983[30]),
        ("L01_047", 2014, L01_COLNAMES_2014[46]),
        ("L01_048", 2014, "調査価格_1983年"),
        ("L01_079", 2014, "調査価格_2014年"),
        ("L01_080", 2014, "属性移動_1984年"),
        ("L01_050", 2015, "調査価格_1985年"),
        ("L01_090", 2015, "属性移動_1993年"),
        ("L01_055", 2019, L01_COLNAMES_2018[54]),
        ("L01_056", 2018, "調査価格_1983年"),
        ("L01_091", 2018, "調査価格_2018年"),
        ("L01_092", 2018, "属性移動_1984年"),
        ("L01_058", 2020, "調査価格_1985年"),
        ("L01_100", 2018, "属性移動_1992年"),
        ("L01_060", 2022, L01_COLNAMES_2022[59]),
        ("L01_061", 2022, "調査価格_1983年"),
        ("L01_100", 2022, "調査価格_2022年"),
        ("L01_101", 2022, "属性移動_1984年"),
        ("L01_063", 2023, "調査価格_1985年"),
        ("L01_120", 2022, "属性移動_2003年"),
        ("L01_061", 2024, L01_COLNAMES_2024[60]),
        ("L01_062", 2024, "調査価格_1983年"),
        ("L01_103", 2024, "調査価格_2024年"),
        ("L01_104", 2024, "属性移動_1984年"),
        ("L01_065", 2024, "調査価格_1986年"),
        ("L01_120", 2024, "属性移動_2000年"),
    ]

    @pytest.mark.parametrize("code,year,expected", L01_CASES)
    def test_l01_bands(self, code, year, expected):
        assert translate_colnames_l01(code, year) == expected

    S12_CASES = [
        ("S12_001", "駅名"),
        ("S12_001c", "駅コード"),
        ("S12_001g", "グループコード"),
        ("S12_002", "運営会社"),
        ("S12_003", "路線名"),
        ("S12_004", "鉄道区分"),
        ("S12_005", "事業者種別"),
        ("S12_006", "重複コード2011"),
        ("S12_007", "データ有無コード2011"),
        ("S12_008", "備考2011"),
        ("S12_009", "乗降客数2011"),
        ("S12_058", "重複コード2024"),
        ("S12_059", "データ有無コード2024"),
        ("S12_060", "備考2024"),
        ("S12_061", "乗降客数2024"),
    ]

    @pytest.mark.parametrize("code,expected", S12_CASES)
    def test_s12(self, code, expected):
        assert translate_colnames(code, _opts("S12")) == expected


class TestCodelists:
    def test_a03_region_dispatch(self):
        cases = [
            ("A03-03_KINKI-g_ThreeMajorMetroPlanArea.shp", "既成都市区域"),
            (
                "A03-03_CHUBU-g_ThreeMajorMetroPlanArea.shp",
                "都市整備区域(［保全区域］との重複無し",
            ),
            ("A03-03_SYUTO-g_ThreeMajorMetroPlanArea.shp", "既成市街地"),
        ]
        for target_shp, expected in cases:
            m = get_codelist_map("A03_006", 2024, target_shp)
            assert m is not None and m["1"] == expected

    def test_a42_special_shapefile(self):
        m = get_codelist_map(
            "A42_005", 2024, "Spacial_Preservation_Area_of_Historic_Landscape.shp"
        )
        assert m is not None
        assert m["2"] == "第１種歴史的風土保存地区（明日香村のみ）"
        # The normal shapefile has no codelist for this column.
        assert (
            get_codelist_map(
                "A42_005", 2024, "Preservation_Area_of_Historic_Landscape.shp"
            )
            is None
        )

    def test_l01_year_dispatch(self):
        v1 = get_codelist_map("L01_007", 2019, "")
        v2_2020 = get_codelist_map("L01_007", 2020, "")
        v2_2022 = get_codelist_map("L01_008", 2022, "")
        v2_2024 = get_codelist_map("L01_010", 2024, "")
        assert v1 is not None and v2_2020 is not None
        assert v2_2020 == v2_2022 == v2_2024
        assert v1 != v2_2020

    def test_landuse_year_dispatch(self):
        assert get_codelist_map("土地利用種", 1976, "") is not None
        assert get_codelist_map("土地利用種", 2009, "") is not None
        assert get_codelist_map("土地利用種", 1980, "") is None

    def test_value_semantics(self):
        m = {"1": "既成都市区域"}
        assert translate_value("1", m) == "既成都市区域"
        assert translate_value("9", m) == "9"  # pass-through on miss
        assert translate_value(None, m) is None  # null stays null
        assert translate_value(1.0, m) == "既成都市区域"  # numeric formatting
        assert translate_value("1", None) == "1"

    def test_numeric_code_format_round_half_even(self):
        # Rust {v:.0} is round-half-even; pin the parity cases.
        assert format_numeric_code(0.5) == "0"
        assert format_numeric_code(1.5) == "2"
        assert format_numeric_code(2.5) == "2"
        assert format_numeric_code(3.0) == "3"
        assert format_numeric_code(-1.5) == "-2"


def test_admin_code_codelist_dispatch():
    """P27_007 (管理者コード) dispatches to the curated ADMIN_CODE map;
    numeric codes format via {v:.0} first."""
    from ksj2gp_spark.ksj import get_codelist_map, translate_value

    m = get_codelist_map("P27_007", 2020, "P27-13_5339.shp")
    assert m is not None
    assert translate_value("2", m) == "都道府県"
    assert translate_value(3.0, m) == "市区町村"  # numeric → "{v:.0}"
    assert translate_value("9", m) == "9"  # pass-through on miss
    assert translate_value(None, m) is None


def test_pref_cd_dictionary_available():
    from ksj2gp_spark.ksj._codelist_data import CODELISTS

    pref = CODELISTS["PREF_CD"]
    assert len(pref) == 47
    assert pref["13"] == "東京都" and pref["1"] == "北海道"


def test_land_use_urban_variant_curated():
    from ksj2gp_spark.ksj._codelist_data import CODELISTS

    m = CODELISTS["LAND_USE_CD_09_U"]
    assert m["0701"] == "高層建物" and m["1003"] == "公園・緑地"
    assert m["0100"] == "田" and len(m) == 25
