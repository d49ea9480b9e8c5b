"""DataFrame-level KSJ translation operators.

Spark mapping of the reference's P1–P4 (SURVEY.md §2.2): column names
are metadata → a plan-time ``select(alias)`` projection; codelist value
translation is a broadcast-map lookup with COALESCE fallback —
``coalesce(map[format(code)], format(code))`` — entirely JVM-side via a
``create_map`` literal (no Python in the hot path). Nulls stay null
(``element_at`` on null key yields null and coalesce of two nulls is
null). Numeric codes are formatted with round-half-even ``{v:.0}``
semantics first (builder.rs:113-137), matched here by
``format_number``-free casting: Spark's ``bround`` + cast.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from ..ksj import TranslateOptions, get_codelist_map, translate_colnames


def _code_as_string(col: Column, dtype) -> Column:
    """Normalize a code column to the string the codelist is keyed by,
    matching Rust ``format!("{v:.0}")`` for numerics (round-half-even,
    no decimal point)."""
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        # try_cast: NaN/overflow → null (ANSI mode throws on plain cast);
        # nulls stay null, matching the reference's null semantics.
        return F.bround(col, 0).try_cast("long").cast("string")
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType)):
        return col.cast("string")
    return col


def codelist_expr(col: Column, dtype, mapping: dict[str, str]) -> Column:
    """code → label with pass-through-on-miss, null-stays-null."""
    key = _code_as_string(col, dtype)
    m = F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in mapping.items())
    )
    return F.coalesce(F.try_element_at(m, key), key)


def codelist_join(
    df: DataFrame,
    col_name: str,
    mapping: dict[str, str],
    out_col: str | None = None,
) -> DataFrame:
    """Broadcast-join form of :func:`codelist_expr` for LARGE codelists.

    A ``create_map`` literal embeds the whole dictionary in the plan —
    fine for the reference's curated lists (≤ a few hundred entries),
    but a 10^5-entry dimension would bloat the plan and codegen. This
    variant materializes the mapping as a broadcast DataFrame and does
    ``LEFT JOIN + coalesce`` — identical semantics (pass-through on
    miss, null stays null), Catalyst-visible BroadcastHashJoin, O(1)
    plan size.
    """
    spark = df.sparkSession
    out_col = out_col or col_name
    dtype = df.schema[col_name].dataType
    key = _code_as_string(F.col(col_name), dtype)
    dim = spark.createDataFrame(
        list(mapping.items()), "__code string, __label string"
    )
    joined = df.withColumn("__code", key).join(
        F.broadcast(dim), "__code", "left"
    )
    translated = F.coalesce(F.col("__label"), F.col("__code")).alias(out_col)
    if out_col == col_name:
        # Replace in place, preserving the source column order.
        cols = [translated if c == col_name else F.col(c) for c in df.columns]
    else:
        # New output column: keep the source column, append the label.
        cols = [F.col(c) for c in df.columns] + [translated]
    return joined.select(*cols)


def translate_l03bc(
    df: DataFrame,
    code_col: str = "L03b_c_002",
    range_col: str = "L03b_c_004",
    urban_values: tuple[str, ...] = ("1",),
) -> DataFrame:
    """L03-b-c 土地利用種 translation with **cross-column dispatch** —
    the case the reference explicitly punts on (codelists.rs:50-56
    TODO: "depends on L03b_c_004, but the current approach cannot
    access other columns' values"): its one-column-at-a-time builder
    returns the codes untranslated. A row-oriented DataFrame sees the
    whole row, so the dispatch is a plain conditional: rows inside the
    urban range (``L03b_c_004 ∈ urban_values``) translate through the
    urban-detail table (LandUseCd09-u), all others through the base
    2009 table — per-row, JVM-side, no Python."""
    from ..ksj._codelist_data import CODELISTS

    dtype = df.schema[code_col].dataType
    urban = codelist_expr(
        F.col(code_col), dtype, CODELISTS["LAND_USE_CD_09_U"]
    )
    base = codelist_expr(F.col(code_col), dtype, CODELISTS["LAND_USE_CD_09"])
    translated = F.when(
        F.col(range_col).cast("string").isin(list(urban_values)), urban
    ).otherwise(base)
    return df.withColumn(code_col, translated)


def translate_dataframe(
    df: DataFrame,
    opts: TranslateOptions,
    extra_codelists: dict[str, dict[str, str]] | None = None,
    geometry_cols: tuple[str, ...] = ("geometry", "crs"),
) -> DataFrame:
    """Apply the full reference translation to an ingested KSJ frame:
    codelist value translation (per-column broadcast maps chosen at
    plan time) + column renaming, preserving field order."""
    exprs = []
    for field in df.schema.fields:
        name = field.name
        if name in geometry_cols:
            exprs.append(F.col(name))
            continue
        col = F.col(name)
        if opts.translate_contents:
            mapping = get_codelist_map(
                name, opts.year, opts.target_shp, extra_codelists
            )
            if mapping:
                col = codelist_expr(col, field.dataType, mapping)
        new_name = (
            translate_colnames(name, opts) if opts.translate_colnames else name
        )
        exprs.append(col.alias(new_name))
    return df.select(*exprs)
