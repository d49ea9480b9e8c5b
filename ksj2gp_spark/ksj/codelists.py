"""Codelist (code → Japanese label) dispatch + translation semantics.

Behavioral spec: /root/reference/rust/src/translate/codelists.rs:5-62
(dispatch, incl. A03 region-file / A42 shapefile / L01 year-band /
L03-b year special cases) and /root/reference/rust/src/builder.rs:100-158
(value semantics: pass-through on miss, null stays null, numeric codes
formatted with round-half-even ``{v:.0}`` before lookup).

In the Spark engine each codelist is semantically a broadcast left join
with COALESCE fallback; ``get_codelist_map`` is the *plan-time* choice
of which dimension dictionary applies to a column (it depends on column
id, dataset year, and target shapefile name — never on row data).
"""

from __future__ import annotations

from ._codelist_data import CODELISTS, REGISTRY


def _lookup(name: str) -> dict[str, str] | None:
    return CODELISTS.get(REGISTRY.get(name, name))


def get_codelist_map(
    col_id: str,
    year: int,
    target_shp: str,
    extra: dict[str, dict[str, str]] | None = None,
) -> dict[str, str] | None:
    """Return the code→label dict for a column, or None if untranslated."""
    if extra and col_id in extra:
        return extra[col_id]

    # A03 三大都市圏計画区域: the 区域区分 codelist differs per region file.
    if col_id == "A03_006":
        if "KINKI" in target_shp:
            return _lookup("A03SectionTypeCdKinki")
        if "CHUBU" in target_shp:
            return _lookup("A03SectionTypeCdCyubu")
        if "SYUTO" in target_shp:
            return _lookup("A03SectionTypeCdSyuto")

    # A42: only the "special" shapefile carries the 種別 column codelist.
    if col_id == "A42_005" and target_shp.endswith(
        "Spacial_Preservation_Area_of_Historic_Landscape.shp"
    ):
        return _lookup("A42HistoricalDistrictType")

    # L01 用途区分: column position moved in the 2024 layout.
    if (col_id in ("L01_001", "L01_003") and year <= 2023) or (
        col_id in ("L01_002", "L01_005") and year >= 2024
    ):
        return _lookup("IndexNumL01")

    # L01 選定状況: codelist version and column position vary by year.
    if col_id == "L01_007" and year <= 2019:
        return _lookup("SelectLandStatusL01V1")
    if (
        (col_id == "L01_007" and 2020 <= year <= 2021)
        or (col_id == "L01_008" and 2022 <= year <= 2023)
        or (col_id == "L01_010" and year >= 2024)
    ):
        return _lookup("SelectLandStatusL01V2")

    # L03-b 土地利用種: the land-use code table changed across survey years.
    if col_id == "土地利用種":
        if year == 1976:
            return _lookup("LandUseCd77")
        if year == 1987:
            return _lookup("LandUseCd88")
        if year in (1991, 1997, 2006):
            return _lookup("LandUseCdYY")
        if year >= 2009:
            return _lookup("LandUseCd09")
        return None

    # L03-b-c depends on another column's value; the reference leaves it
    # untranslated (codelists.rs:45-52) and so do we.
    if col_id == "L03b_c_002":
        return None

    return _lookup(col_id)


def format_numeric_code(value: float) -> str:
    """Format a numeric code the way Rust ``format!("{v:.0}")`` does.

    Round-half-even with no decimal point (builder.rs:113-137); Python's
    ``format(v, '.0f')`` has identical semantics.
    """
    return format(value, ".0f")


def translate_value(
    value: object, codelist: dict[str, str] | None
) -> object:
    """Translate one cell: pass-through on miss, null stays null."""
    if value is None or codelist is None:
        return value
    if isinstance(value, float):
        key = format_numeric_code(value)
    elif isinstance(value, bool):
        key = str(value)
    elif isinstance(value, int):
        key = str(value)
    else:
        key = str(value)
    return codelist.get(key, key)
