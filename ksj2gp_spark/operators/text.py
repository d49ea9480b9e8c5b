"""Text-analysis operators over the documents table: language-ID
heuristic, quality scoring, token counting, document fingerprinting.

Quality/token/fingerprint lanes are pure Spark SQL expressions (JVM,
whole-stage codegen); language ID is a vectorized pandas UDF (n-gram
profile scoring needs small dict lookups per doc, still batched)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

# Tiny n-gram profiles for a heuristic language guess. Scores are
# frequencies of highly characteristic character classes / stopwords.
_LANG_MARKERS = {
    "en": (" the ", " and ", " of ", " to ", " is "),
    "ja": tuple("のにはをがでと"),
    "de": (" der ", " die ", " und ", " ist ", " das "),
    "fr": (" le ", " la ", " et ", " les ", " des "),
}


def lang_id_udf():
    """Vectorized language guess: pandas ``.str`` kernels batch-wide —
    no per-row/per-char Python loop. Marker counts are non-overlapping
    substring counts (``Series.str.count`` on escaped patterns), which
    an SQL oracle reproduces as (len(t)−len(replace(t,m,'')))/len(m).
    Ties break to the lexicographically largest language code, matching
    ``max(scores, key=lambda k: (scores[k], k))``."""
    import re

    @pandas_udf("string")
    def lang(texts: pd.Series) -> pd.Series:
        t = " " + texts.fillna("").str.lower() + " "
        cjk = t.str.contains(r"[぀-ヿ一-鿿]", regex=True)
        scores = pd.DataFrame(
            {
                lang_: sum(t.str.count(re.escape(m)) for m in marks)
                for lang_, marks in _LANG_MARKERS.items()
                if lang_ != "ja"
            }
        )
        # idxmax returns the FIRST max; order columns descending so the
        # winner of a tie is the lexicographically largest code.
        ordered = scores[sorted(scores.columns, reverse=True)]
        best = ordered.idxmax(axis=1)
        out = best.where(scores.max(axis=1) > 0, "unknown").where(~cjk, "ja")
        return out

    return lang


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("lang_guess", lang_id_udf()(F.col(text_col)))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score, all JVM-side:
    length, mean word length, punctuation ratio, digit ratio,
    uppercase ratio, stop-token ratio."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = F.split(t, " ")
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))
    n_digits = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    mean_tok_len = (n_chars - (n_tokens - 1)) / n_tokens
    punct_ratio = n_punct / n_chars
    digit_ratio = n_digits / n_chars
    upper_ratio = n_upper / n_chars
    score = (
        F.when(n_tokens < 5, 0.0)
        .otherwise(
            F.lit(1.0)
            - F.least(F.lit(1.0), punct_ratio * 4)
            * F.lit(0.25)
            - F.least(F.lit(1.0), digit_ratio * 4) * F.lit(0.25)
            - F.least(
                F.lit(1.0), F.abs(mean_tok_len - F.lit(5.0)) / F.lit(5.0)
            )
            * F.lit(0.25)
        )
    )
    return df.select(
        "*",
        n_tokens.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(upper_ratio, 6).alias("upper_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (chars/4 is the
    classic LLM rule of thumb; the regex splits off punctuation the way
    byte-pair pretokenizers do)."""
    t = F.col(text_col)
    ws = F.size(F.split(t, r"\s+"))
    pretok = F.size(
        F.split(t, r"(?=[\s\.,;:!\?])|(?<=[\s\.,;:!\?])")
    )
    return df.select(
        "*",
        ws.alias("ws_tokens"),
        pretok.alias("pretokens"),
        F.ceil(F.length(t) / 4).cast("long").alias("approx_bpe_tokens"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", k: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: xxhash of every k-word
    window, keep the min — one stable 64-bit id per document; equal
    fingerprints ⇒ near-identical prefix content. Pure JVM."""
    toks = F.split(F.col(text_col), " ")
    windows = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k))),
    )
    return df.withColumn(
        "fingerprint", F.array_min(windows)
    )
