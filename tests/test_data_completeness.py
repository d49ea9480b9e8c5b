"""Completeness of the transcribed reference data tables.

The reference ships generated dictionaries
(/root/reference/rust/src/translate/data/{codelists,colnames}.rs);
tools/gen_ref_data.py transcribes them into ksj/_codelist_data.py and
ksj/_colname_data.py. These tests pin the transcription: full map
count, full pair count, zero dangling registry targets, and
no-translation-error over the entire column-id universe with
``ignore_translation_errors=False`` (the reference UI default).
"""

from __future__ import annotations

import pytest

from ksj2gp_spark.ksj._codelist_data import CODELISTS, REGISTRY
from ksj2gp_spark.ksj._colname_data import (
    A42_COLNAMES_NORMAL,
    A42_COLNAMES_SPECIAL,
    COLNAMES,
    L01_COLNAMES_1983,
    L01_COLNAMES_2014,
    L01_COLNAMES_2018,
    L01_COLNAMES_2022,
    L01_COLNAMES_2024,
    L02_COLNAMES,
)
from ksj2gp_spark.ksj.codelists import get_codelist_map
from ksj2gp_spark.ksj.colnames import TranslateOptions, translate_colnames


def test_codelist_map_count_matches_reference():
    # 153 static maps in data/codelists.rs + the repo-local PREF_CD extra.
    assert len(CODELISTS) == 154
    # 7,730 literal pairs; 4 in-map duplicate keys collapse last-wins
    # exactly as Rust's collect::<HashMap>() does.
    assert sum(len(m) for n, m in CODELISTS.items() if n != "PREF_CD") == 7726


def test_registry_complete_and_resolvable():
    # 186 map.entry() lines in translate/codelists.rs:65-330 (first-wins).
    assert len(REGISTRY) == 186
    dangling = [k for k, v in REGISTRY.items() if v not in CODELISTS]
    assert dangling == []


def test_every_registry_column_resolves_through_dispatch():
    skip_aliases = {
        # Alias keys used only by the special-case dispatch, not column ids.
        "A03SectionTypeCdKinki", "A03SectionTypeCdCyubu", "A03SectionTypeCdSyuto",
        "A42HistoricalDistrictType", "IndexNumL01",
        "SelectLandStatusL01V1", "SelectLandStatusL01V2",
        "LandUseCd77", "LandUseCd88", "LandUseCdYY", "LandUseCd09",
        "LandUseCd09-u",
    }
    for col_id in REGISTRY:
        if col_id in skip_aliases:
            continue
        assert get_codelist_map(col_id, 2020, "") is not None, col_id


def test_colname_table_matches_reference():
    # 3,813 pairs in data/colnames.rs flatten to 3,737 last-wins keys.
    assert len(COLNAMES) == 3737
    assert len(A42_COLNAMES_NORMAL) == 9
    assert len(A42_COLNAMES_SPECIAL) == 10
    assert len(L01_COLNAMES_1983) == 31
    assert len(L01_COLNAMES_2014) == 47
    assert len(L01_COLNAMES_2018) == 55
    assert len(L01_COLNAMES_2022) == 60
    assert len(L01_COLNAMES_2024) == 61
    assert len(L02_COLNAMES) == 53


def test_l02_extension_translates_by_index():
    """L02 is unimplemented!() in the reference (colnames.rs:34); the
    engine extension maps by index over the shipped table."""
    opts = TranslateOptions(ksj_id="L02")
    assert translate_colnames("L02_001", opts) == L02_COLNAMES[0]
    assert translate_colnames("L02_053", opts) == L02_COLNAMES[52]
    from ksj2gp_spark.ksj.colnames import TranslationError

    with pytest.raises(TranslationError):
        translate_colnames("L02_054", opts)


def test_all_colnames_translate_without_error():
    """With the full table, strict mode raises for no known column id."""
    opts = TranslateOptions(ignore_translation_errors=False, ksj_id="A03")
    for col_id in COLNAMES:
        assert translate_colnames(col_id, opts) == COLNAMES[col_id]


@pytest.mark.parametrize(
    ("col_id", "expected"),
    [
        # Spot checks across families (data/colnames.rs).
        ("A03_001", "行政区域コード"),
        ("N06_014", "設置期間（終了年）"),
        ("W09_004", "水面標高"),
        ("P14_008", "管理者"),
        ("S12_004", "鉄道区分"),  # static table entry (S12 uses dynamic path)
    ],
)
def test_colname_spot_checks(col_id, expected):
    assert COLNAMES[col_id] == expected


@pytest.mark.parametrize(
    ("name", "code", "expected"),
    [
        # Spot checks across codelist maps (data/codelists.rs).
        ("A10_AREA_CD", "14", "根室振興局"),
        ("WATER_SYSTEM_CODE_CD", "010002", "010002:声問川"),
        ("WORLD_HERITAGE_CD", "02", "白神山地"),
        ("RAILWAY_CLASS_CD", "11", "普通鉄道JR"),
        ("LAND_USE_CD_09_U", "0701", "高層建物"),
    ],
)
def test_codelist_spot_checks(name, code, expected):
    assert CODELISTS[name][code] == expected
