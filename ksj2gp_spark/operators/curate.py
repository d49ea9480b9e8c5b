"""End-to-end corpus curation — the composed training-data pipeline.

One call chains the four standard curation stages over a (doc_id, text)
table, each stage an operator this engine already ships:

1. **exact dedup** — canonical (min doc_id) per exact text; JVM window.
2. **near-dup dedup** — MinHash+LSH pairs (operators/dedup.py); the
   larger id of each pair is dropped, so transitive near-dup chains
   keep their smallest member.
3. **language filter** — vectorized lang-ID (operators/text.py).
4. **quality filter** — JVM quality score ≥ threshold.

Every stage's drop count is exposed in a LEDGER DataFrame — the
no-silent-drops rule applied to the whole pipeline: a 100 TB curation
job must be able to answer "where did my rows go" per stage without
re-running anything.

Because stages 1/3/4 are pure relational expressions and stage 2's
hash family is exact BIGINT arithmetic, the ENTIRE pipeline has a
DuckDB oracle (contract query ``corpus_curation``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import minhash_lsh_pairs
from .text import quality_score, with_lang_id


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    minhash_threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    n_shingle: int = 3,
    with_ledger: bool = False,
) -> tuple[DataFrame, DataFrame | None]:
    """Returns ``(kept, ledger)``.

    ``kept``: the surviving rows with ``lang_guess`` and the quality
    feature columns attached — a lazy plan, nothing runs until acted
    on. ``ledger`` (only when ``with_ledger=True``): one row per stage
    with (stage, n_in, n_out) — the per-stage audit a production
    curation job logs once per run. Stages 3-4 are row-wise filters,
    so their counts fold into one aggregation over stage 2's output:
    the expensive near-dup stage executes once for the whole ledger.
    """
    spark = df.sparkSession
    s0 = df.select(id_col, text_col)

    # 1. exact dedup: canonical = min id per text (deterministic)
    w = Window.partitionBy(text_col)
    s1 = (
        s0.withColumn("__min_id", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("__min_id"))
        .drop("__min_id")
    )

    # 2. near-dup dedup over the exact-deduped survivors
    pairs = minhash_lsh_pairs(
        s1,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        n_shingle=n_shingle,
        threshold=minhash_threshold,
    )
    near_drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    s2 = s1.join(near_drops, id_col, "left_anti")

    # 3. language filter
    s3 = with_lang_id(s2, text_col=text_col).filter(
        F.col("lang_guess").isin(*langs)
    )

    # 4. quality filter
    s4 = quality_score(s3, text_col=text_col).filter(
        F.col("quality_score") >= min_quality
    )

    if not with_ledger:
        return s4, None
    # Stages 3-4 are row-wise filters over stage 2's output, so their
    # counts come from ONE aggregation over one run of stages 1-2 —
    # the expensive near-dup join runs once for the whole ledger, not
    # once per downstream stage count.
    n0 = s0.count()
    n1 = s1.count()
    feats = quality_score(
        with_lang_id(s2, text_col=text_col), text_col=text_col
    )
    lang_ok = F.col("lang_guess").isin(*langs)
    qual_ok = lang_ok & (F.col("quality_score") >= min_quality)
    row = feats.agg(
        F.count(F.lit(1)).alias("n2"),
        F.coalesce(F.sum(lang_ok.cast("long")), F.lit(0)).alias("n3"),
        F.coalesce(F.sum(qual_ok.cast("long")), F.lit(0)).alias("n4"),
    ).collect()[0]
    n2, n3, n4 = row["n2"], row["n3"], row["n4"]
    ledger_rows = [
        ("0_input", n0, n0),
        ("1_exact_dedup", n0, n1),
        ("2_near_dedup", n1, n2),
        ("3_lang", n2, n3),
        ("4_quality", n3, n4),
    ]
    ledger = spark.createDataFrame(
        ledger_rows, "stage string, n_in long, n_out long"
    )
    return s4, ledger


def dedup_keep_best(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str | None = None,
    minhash_threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    n_shingle: int = 3,
) -> DataFrame:
    """Component-based keep-one-per-cluster: MinHash+LSH pairs →
    connected components → keep exactly ONE document per near-dup
    cluster — the highest ``score_col`` (default: text length), ties
    broken by min id — while documents in no cluster keep themselves.

    This is the curation decision ``curate_corpus``'s pairwise drop
    approximates: pairwise drops discard every ``id_b``, which in a
    chain a−b, b−c keeps only ``a`` even when ``b`` is the best copy;
    the component formulation ranks WITHIN the whole transitive
    cluster. Returns the kept rows of ``df`` with ``component``
    (cluster id = min member id; singletons: own id) and ``csize``
    attached.

    Scale shape: pairs and components are the bucketed/capped LSH and
    contraction lanes; the keep rank is ONE window over components
    (clusters are small by construction — the window partition is
    bounded by cluster size, not corpus size).
    """
    from .dedup import minhash_lsh_pairs
    from .graph import dedup_components

    score = (
        F.col(score_col) if score_col else F.length(F.col(text_col))
    )
    pairs = minhash_lsh_pairs(
        df,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        n_shingle=n_shingle,
        threshold=minhash_threshold,
    )
    comp = dedup_components(pairs).withColumnRenamed("doc_id", id_col)
    joined = (
        df.join(comp, id_col, "left")
        .withColumn("component", F.coalesce("component", F.col(id_col)))
        .withColumn("csize", F.coalesce("csize", F.lit(1).cast("long")))
    )
    w = Window.partitionBy("component").orderBy(
        score.desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def curate_image_captions(
    df: DataFrame,
    id_col: str = "image_id",
    caption_col: str = "caption",
    min_caption_tokens: int = 3,
    min_dim: int = 9,
    max_aspect: float = 1.8,
    phash_band_bits: int = 16,
    max_hamming: int = 4,
    with_ledger: bool = False,
) -> tuple[DataFrame, DataFrame | None]:
    """Composed curation over the image+caption table (the input_hint
    schema: image_id, w, h, caption, phash) — the multimodal twin of
    :func:`curate_corpus`:

    1. **exact caption dedup** — canonical (min image_id) per caption.
    2. **visual near-dup keep-best** — banded-phash LSH pairs →
       connected components → keep ONE image per cluster: the highest
       resolution (w·h), ties min id. Component-based, so a chain
       a−b, b−c keeps its best member, not just the pairwise survivor.
    3. **caption length filter** — ≥ ``min_caption_tokens`` whitespace
       tokens (JVM split/size, no UDF).
    4. **geometry filter** — min(w, h) ≥ ``min_dim`` and aspect ratio
       max(w, h)/min(w, h) ≤ ``max_aspect``.

    Returns ``(kept, ledger)`` like :func:`curate_corpus`: ``kept``
    carries ``component``, ``csize`` and ``n_caption_tokens``; the
    ledger (``with_ledger=True``) is one (stage, n_in, n_out) row per
    stage — no silent drops.

    Scale shape: stage 1 is one window over captions; stage 2 rides
    the bucketed/capped phash LSH + contraction components lanes (the
    keep window partitions by component — bounded by cluster size);
    stages 3–4 are whole-stage-codegen expressions. Image ``bytes``
    are never touched: every stage reads metadata columns only, so the
    binary payload stays pruned out of every shuffle.
    """
    from .graph import dedup_components
    from .images import phash_near_dups

    spark = df.sparkSession
    s0 = df

    # 1. exact caption dedup
    w_cap = Window.partitionBy(caption_col)
    s1 = (
        s0.withColumn("__min_id", F.min(id_col).over(w_cap))
        .filter(F.col(id_col) == F.col("__min_id"))
        .drop("__min_id")
    )

    # 2. phash near-dup components → keep best resolution per cluster
    pairs = phash_near_dups(
        s1.select(F.col(id_col).alias("image_id"), "phash"),
        band_bits=phash_band_bits,
        max_hamming=max_hamming,
    )
    comp = dedup_components(
        pairs, id_a="image_a", id_b="image_b"
    ).withColumnRenamed("doc_id", id_col)
    joined = (
        s1.join(comp, id_col, "left")
        .withColumn("component", F.coalesce("component", F.col(id_col)))
        .withColumn("csize", F.coalesce("csize", F.lit(1).cast("long")))
    )
    w_keep = Window.partitionBy("component").orderBy(
        (F.col("w").cast("long") * F.col("h")).desc(), F.col(id_col).asc()
    )
    s2 = (
        joined.withColumn("__rk", F.row_number().over(w_keep))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )

    # 3. caption token count
    s3 = s2.withColumn(
        "n_caption_tokens", F.size(F.split(F.col(caption_col), " "))
    ).filter(F.col("n_caption_tokens") >= min_caption_tokens)

    # 4. resolution + aspect ratio
    s4 = s3.filter(
        (F.least("w", "h") >= min_dim)
        & (
            F.greatest("w", "h").cast("double")
            / F.least("w", "h").cast("double")
            <= max_aspect
        )
    )

    if not with_ledger:
        return s4, None
    # Stages 3-4 are row-wise filters over stage 2's output, so their
    # counts come from ONE aggregation over one run of stages 1-2 —
    # the phash-LSH components pass runs once for the whole ledger.
    n0 = s0.count()
    n1 = s1.count()
    cap_ok = (
        F.size(F.split(F.col(caption_col), " ")) >= min_caption_tokens
    )
    geo_ok = (
        cap_ok
        & (F.least("w", "h") >= min_dim)
        & (
            F.greatest("w", "h").cast("double")
            / F.least("w", "h").cast("double")
            <= max_aspect
        )
    )
    row = s2.agg(
        F.count(F.lit(1)).alias("n2"),
        F.coalesce(F.sum(cap_ok.cast("long")), F.lit(0)).alias("n3"),
        F.coalesce(F.sum(geo_ok.cast("long")), F.lit(0)).alias("n4"),
    ).collect()[0]
    ledger_rows = [
        ("0_input", n0, n0),
        ("1_caption_dedup", n0, n1),
        ("2_phash_keep_best", n1, row["n2"]),
        ("3_caption_length", row["n2"], row["n3"]),
        ("4_geometry", row["n3"], row["n4"]),
    ]
    ledger = spark.createDataFrame(
        ledger_rows, "stage string, n_in long, n_out long"
    )
    return s4, ledger


# --- deterministic splits & stratified sampling -----------------------
#
# Train/valid/test assignment and per-stratum downsampling for a 100 TB
# corpus must be (a) pure map-side expressions (no shuffle, no state),
# (b) stable under reruns and repartitioning, (c) independent of row
# order. Both operators therefore key on a deterministic integer bucket
# of a row key, never on rand()/sample(). The default bucket uses
# xxhash64 (JVM, whole-stage codegen); pass ``bucket=`` to use an
# engine-portable mix (the contract query does, so DuckDB reproduces
# the exact assignment).

_SPLIT_MOD = 1 << 20
_SPLIT_MIX = 2654435761  # Knuth multiplicative constant (public)
_SPLIT_FOLD = (1 << 31) - 1  # Mersenne fold keeps products < 2^62


def mix_bucket(key, salt_a: int = 1, salt_b: int = 0):
    """Engine-portable bucket in [0, 2^20). Every multiply is preceded
    by a fold modulo 2^31-1 so no intermediate exceeds ~2^62: safe for
    arbitrary 64-bit keys under ANSI mode (no silent Java wrap), and
    bit-for-bit reproducible in any BIGINT SQL engine via
    ``((x % m) + m) % m`` (pmod semantics; see mix_bucket_sql)."""
    k = F.col(key) if isinstance(key, str) else key
    folded = F.pmod(k, F.lit(_SPLIT_FOLD))
    salted = F.pmod(
        folded * F.lit(salt_a) + F.lit(salt_b), F.lit(_SPLIT_FOLD)
    )
    return F.pmod(salted * F.lit(_SPLIT_MIX), F.lit(_SPLIT_MOD))


def mix_bucket_sql(key_expr: str, salt_a: int = 1, salt_b: int = 0) -> str:
    """The exact same bucket as ``mix_bucket`` in portable ANSI SQL
    (pmod spelled out, so negative keys agree with Spark)."""
    m = _SPLIT_FOLD

    def pmod(x: str, mod: int) -> str:
        return f"((({x}) % {mod} + {mod}) % {mod})"

    folded = pmod(key_expr, m)
    salted = pmod(f"{folded} * {salt_a} + {salt_b}", m)
    return pmod(f"{salted} * {_SPLIT_MIX}", _SPLIT_MOD)


def hash_split(
    df: DataFrame,
    key: str = "doc_id",
    weights: dict[str, float] | None = None,
    out_col: str = "split",
    bucket=None,
) -> DataFrame:
    """Assign every row to a named split by deterministic hash bucket
    (default weights 0.98/0.01/0.01 train/valid/test). Map-side only."""
    weights = weights or {"train": 0.98, "valid": 0.01, "test": 0.01}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = bucket if bucket is not None else F.pmod(
        F.xxhash64(F.col(key)), F.lit(_SPLIT_MOD)
    )
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = b < F.lit(int(acc * _SPLIT_MOD))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key: str = "doc_id",
    default_fraction: float = 0.0,
    bucket=None,
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows (hash
    threshold, not rand()): rerun-stable, order-independent, zero
    shuffle. Strata missing from ``fractions`` keep
    ``default_fraction``."""
    b = bucket if bucket is not None else F.pmod(
        F.xxhash64(F.col(key)), F.lit(_SPLIT_MOD)
    )
    thresh = None
    for val, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(val)
        t = F.lit(int(frac * _SPLIT_MOD))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (
        F.lit(int(default_fraction * _SPLIT_MOD))
        if thresh is None
        else thresh.otherwise(int(default_fraction * _SPLIT_MOD))
    )
    return df.filter(b < thresh)


def mixture_sample(
    df: DataFrame,
    source_col: str = "source",
    key: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Temperature-flattened source-mixture sampling — the multinomial
    mixture reweighting of multilingual/multi-source pretraining
    (Conneau & Lample 2019 style, public): with p_s a source's share
    of corpus TOKENS, resample to q_s ∝ p_s^alpha (alpha<1 upweights
    rare sources) under an overall token budget of ``budget_frac`` of
    the corpus. Per-source keep rate = min(1, budget_frac · q_s/p_s);
    a rare source hits the rate-1 cap rather than oversampling.

    Keep decisions are the deterministic engine-portable
    :func:`mix_bucket` hash threshold (rerun-stable, order-independent
    — not rand()), so an SQL oracle reproduces the kept set exactly
    via :func:`mix_bucket_sql`.

    Scale shape: the only aggregation is token counts per source —
    map-side combinable, one shuffle of |sources| keys; the resulting
    rate table (one row per source) is broadcast and the keep filter
    is map-side. The corpus itself never shuffles, and there is no
    per-source window, so a dominant source costs nothing extra.
    """
    shares = (
        df.select(
            source_col,
            F.size(F.split(F.col(text_col), " ")).alias("_ntok"),
        )
        .groupBy(source_col)
        .agg(F.sum("_ntok").alias("c"))
    )
    total = int(shares.agg(F.sum("c")).collect()[0][0])
    a = float(alpha)
    spow = float(
        shares.agg(
            F.sum(F.pow(F.col("c") / F.lit(float(total)), F.lit(a)))
        ).collect()[0][0]
    )
    p = F.col("c") / F.lit(float(total))
    rate = F.least(
        F.lit(1.0),
        F.lit(float(budget_frac)) * (F.pow(p, F.lit(a)) / F.lit(spow)) / p,
    )
    rates = shares.select(
        source_col,
        F.floor(rate * F.lit(_SPLIT_MOD)).cast("long").alias("_thresh"),
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(mix_bucket(key) < F.col("_thresh"))
        .drop("_thresh")
    )


def mixture_sample_sql(
    source_col: str = "source",
    key: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    table: str = "documents",
) -> str:
    """ANSI-SQL twin of :func:`mixture_sample` (same arithmetic shape
    term for term, same portable hash) returning kept (key, source)."""
    a = float(alpha)
    bf = float(budget_frac)
    return f"""
WITH cnt AS (
  SELECT {source_col} AS src,
         CAST(sum(len(string_split({text_col}, ' '))) AS BIGINT) AS c
  FROM {table} GROUP BY {source_col}
),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM cnt),
sp AS (SELECT sum(pow(c / total, {a!r})) AS spow FROM cnt, tot),
r AS (
  SELECT src,
         least(1.0,
               {bf!r} * (pow(c / total, {a!r}) / spow) / (c / total)
         ) AS rate
  FROM cnt, tot, sp
),
t AS (SELECT src, CAST(floor(rate * {_SPLIT_MOD}) AS BIGINT) AS thresh
      FROM r)
SELECT d.{key} AS {key}, d.{source_col} AS {source_col}
FROM {table} d JOIN t ON d.{source_col} = t.src
WHERE {mix_bucket_sql("d." + key)} < t.thresh
"""


# Conservative pattern subset: no backreferences/lookaround, so Java
# regex (Spark) and RE2 (DuckDB) match identically — the parity the
# oracle depends on.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[A-Za-z0-9./_%+#?&=-]+"


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    replacement: str = "<scrubbed>",
) -> DataFrame:
    """PII/URL scrubbing — the redaction stage of a training-data
    pipeline: replaces emails and URLs with a fixed token and reports
    per-row counts. Pure JVM regexp expressions (whole-stage codegen,
    no UDF); the patterns avoid every construct on which Java regex
    and RE2 disagree, so the SQL oracle reproduces counts and cleaned
    text bit-for-bit. Emails scrub BEFORE urls so an address inside a
    URL query string counts once, deterministically."""
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE))
    after_email = F.regexp_replace(t, EMAIL_RE, replacement)
    n_urls = F.regexp_count(after_email, F.lit(URL_RE))
    cleaned = F.regexp_replace(after_email, URL_RE, replacement)
    return df.select(
        "*",
        n_emails.cast("int").alias("n_emails"),
        n_urls.cast("int").alias("n_urls"),
        cleaned.alias("clean_text"),
        F.length(cleaned).alias("clean_len"),
    )
