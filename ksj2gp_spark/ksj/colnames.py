"""Column-name translation: KSJ attribute codes → Japanese labels.

Behavioral spec: /root/reference/rust/src/translate/colnames.rs:21-158.
Column names are *metadata*, so translation happens at plan-build time
on the driver (a ``select(col(c).alias(t(c)))`` projection), never per
row.

Three datasets need dynamic (non-table) translation:

* **A42** — the ZIP contains two shapefiles with different layouts; the
  one whose name ends with ``Spacial_Preservation_Area_of_Historic_
  Landscape.shp`` uses the 10-column "special" layout.
* **L01** — the column layout changes by year band (≤2013 / 2014–17 /
  2018–21 / 2022–23 / 2024–) and the trailing columns are *computed*
  names ``調査価格_{y}年`` / ``属性移動_{y}年`` whose meaning depends on
  both the column index and the dataset year.
* **S12** — column names are derived arithmetically from the index
  (``idx%4``/``idx//4`` → 重複コード/データ有無コード/備考/乗降客数 +
  year 2011+Δ).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ._colname_data import (
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


class TranslationError(ValueError):
    pass


@dataclass
class TranslateOptions:
    """Mirror of the reference's TranslateOptions (translate/mod.rs:10-17)."""

    translate_colnames: bool = True
    translate_contents: bool = True
    ignore_translation_errors: bool = False
    ksj_id: str = ""
    year: int = 0
    target_shp: str = ""
    extra_colnames: dict[str, str] = field(default_factory=dict)


def translate_colnames(col_id: str, opts: TranslateOptions) -> str:
    if not opts.translate_colnames:
        return col_id

    if opts.ksj_id == "A42":
        return translate_colnames_a42(col_id, opts.target_shp)
    if opts.ksj_id == "L01":
        return translate_colnames_l01(col_id, opts.year)
    if opts.ksj_id == "L02":
        return translate_colnames_l02(col_id)
    if opts.ksj_id == "S12":
        return translate_colnames_s12(col_id)

    name = opts.extra_colnames.get(col_id) or COLNAMES.get(col_id)
    if name is not None:
        return name
    if opts.ignore_translation_errors:
        return col_id
    raise TranslationError(f"Unknown column name translation: {col_id}")


def translate_colnames_a42(code: str, target_shp: str) -> str:
    idx = _parse_idx(code)
    if target_shp.endswith("Spacial_Preservation_Area_of_Historic_Landscape.shp"):
        return A42_COLNAMES_SPECIAL[idx]
    if target_shp.endswith("Preservation_Area_of_Historic_Landscape.shp"):
        return A42_COLNAMES_NORMAL[idx]
    raise TranslationError(f"Unknown shapefile: {target_shp}")


# (fixed-name array, first dynamic 1-based idx) per year band
_L01_BANDS = (
    (2014, L01_COLNAMES_1983, None),
    (2018, L01_COLNAMES_2014, 48),
    (2022, L01_COLNAMES_2018, 56),
    (2024, L01_COLNAMES_2022, 61),
    (10_000, L01_COLNAMES_2024, 62),
)


def translate_colnames_l01(code: str, year: int) -> str:
    idx = _parse_idx(code)
    if idx == 0:
        raise TranslationError("L01 column index 0 is invalid")
    for upper, fixed, dyn_start in _L01_BANDS:
        if year < upper:
            if dyn_start is None or idx < dyn_start:
                return fixed[idx - 1]
            # Trailing dynamic columns: first (year-1983+1) are survey
            # prices 調査価格_{1983..year}年, the rest attribute moves
            # 属性移動_{y}年 shifted back by (year-1983).
            y = (idx - dyn_start) + 1983
            if y <= year:
                return f"調査価格_{y}年"
            return f"属性移動_{y - (year - 1983)}年"
    raise TranslationError(f"Unhandled L01 year: {year}")  # pragma: no cover


def translate_colnames_l02(code: str) -> str:
    """L02 (基準地価格) — the reference's own ``unimplemented!()``
    (colnames.rs:34 panics on L02). Its data table ships the 53-entry
    L02_COLNAMES list; this engine extension maps ``L02_0NN`` by index
    the same way the L01 fixed bands do. Attributed as an extension,
    not reference parity."""
    idx = _parse_idx(code)
    if not 1 <= idx <= len(L02_COLNAMES):
        raise TranslationError(f"L02 column index out of range: {code}")
    return L02_COLNAMES[idx - 1]


_S12_FIXED = {
    "S12_001": "駅名",
    "S12_001c": "駅コード",
    "S12_001g": "グループコード",
    "S12_002": "運営会社",
    "S12_003": "路線名",
    "S12_004": "鉄道区分",
    "S12_005": "事業者種別",
}

_S12_KINDS = ("重複コード", "データ有無コード", "備考", "乗降客数")


def translate_colnames_s12(code: str) -> str:
    if code in _S12_FIXED:
        return _S12_FIXED[code]
    idx = _parse_idx(code) - 6  # S12_006 is the 2011 base column
    return f"{_S12_KINDS[idx % 4]}{2011 + idx // 4}"


def _parse_idx(code: str) -> int:
    """``"S12_053"`` → 53 (characters 4..7, like the reference)."""
    try:
        return int(code[4:7])
    except ValueError as e:
        raise TranslationError(f"Failed to parse {code} as int: {e}") from e
