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


def repetition_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al.
    2021, public — the standard pretraining quality gate this module's
    char-level ratios don't cover):

    - ``dup_ngram_frac`` — fraction of the doc's n-gram OCCURRENCES
      that belong to an n-gram appearing more than once in the doc
      (boilerplate/looping text scores high),
    - ``top_bigram_frac`` — occurrences of the doc's most frequent
      2-gram over its total 2-gram occurrences.

    Pure relational shape: explode → (doc, gram) counts (map-side
    combinable groupBy) → per-doc ratios. Both aggregations key on
    (doc_id, gram), so the shuffle is skew-free at corpus scale — no
    global hot key exists because the doc id is in every key.
    """
    toks = F.split(F.col(text_col), " ")

    def gram_counts(k: int) -> DataFrame:
        grams = F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
        return (
            df.select(F.col(id_col), F.explode(grams).alias("gram"))
            .groupBy(id_col, "gram")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    tri = gram_counts(n).groupBy(id_col).agg(
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
            / F.sum("c"),
            6,
        ).alias("dup_ngram_frac")
    )
    bi = gram_counts(2).groupBy(id_col).agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac")
    )
    return df.join(tri, id_col, "left").join(bi, id_col, "left")


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


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a SET of query terms
    (Robertson/Sparck Jones, public formula) — the ranking step of a
    corpus search / quality-filter lane. Duplicate query terms are
    deduplicated (set semantics — each term contributes once, not
    weighted by query frequency). Returns (id_col, bm25) for
    documents containing at least one query term.

    Shape is the inverted-index one and every stage is JVM-side and
    map-side combinable: token explode → per-(doc,term) tf for the
    query terms only (the explode is filtered BEFORE the shuffle, so
    shuffle volume is O(matching tokens), not O(corpus tokens)); df
    per term and the corpus-wide (N, avgdl) are tiny aggregates that
    broadcast back. No UDFs, no driver loops.

    idf = ln(1 + (N - df + .5)/(df + .5)); contribution per term
    = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)); dl is the
    whitespace token count (size(split)), matching the SQL oracle's
    len(string_split) exactly.
    """
    terms = sorted({t for t in query_terms if t})
    # dl rides through the tf groupBy as a key (functionally dependent
    # on the doc id), so there is NO per-doc dl join afterwards — a
    # (doc_id, dl) relation is O(corpus) and would either broadcast
    # (OOM at scale) or add a full shuffle. Two corpus scans total:
    # this one and the tiny (N, avgdl) aggregate.
    base = df.select(
        id_col,
        F.size(F.split(F.col(text_col), " ")).alias("dl"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term").isin(terms))
    tf = base.groupBy(id_col, "dl", "term").agg(
        F.count("*").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    corpus = df.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size(F.split(F.col(text_col), " "))).alias("avgdl"),
    )
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "c",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return contrib.groupBy(id_col).agg(F.sum("c").alias("bm25"))


def vocab_induction(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    top_n: int | None = None,
) -> DataFrame:
    """Vocabulary induction — the seed step of tokenizer training:
    corpus-wide term counts with a support floor, optionally ranked
    top-N. Returns (term, n) or (rank, term, n) with the deterministic
    (n desc, term asc) total order.

    The count is one map-side-combinable groupBy. Top-N uses
    orderBy+limit — Spark compiles that to TakeOrderedAndProject
    (per-partition heaps merged on the driver), NOT a global sort; the
    rank window then runs over the already-limited ≤top_n rows, so the
    single-partition window is bounded by construction (contrast the
    unbounded global-sort row_number anti-pattern)."""
    from pyspark.sql import Window

    toks = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    counts = toks.groupBy("term").agg(F.count("*").alias("n"))
    if min_count > 1:
        counts = counts.filter(F.col("n") >= min_count)
    if top_n is None:
        return counts
    top = counts.orderBy(F.desc("n"), "term").limit(top_n)
    w = Window.orderBy(F.desc("n"), "term")
    return top.select(F.row_number().over(w).alias("rank"), "term", "n")


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination — the standard pretraining hygiene
    pass (GPT-3 appx. C / PaLM / Llama, all public): flag every corpus
    document that shares at least ``min_overlap`` distinct word
    ``n``-grams with ANY row of an evaluation ``benchmark`` set, so
    those docs can be dropped before training and eval numbers stay
    honest.

    Emits one row per contaminated doc:
    (doc_id, matched_grams = distinct overlapping n-grams,
    bench_docs = distinct benchmark rows hit).

    Scale shape: eval sets are KB–MB scale next to a 100 TB corpus, so
    the benchmark's distinct gram set is BROADCAST and the corpus side
    is explode → broadcast hash join — the corpus never shuffles; the
    only Exchange is the per-doc groupBy over *matched* rows, which is
    tiny (and keyed on doc_id, so skew-free). The corpus explode is
    per-row work fused into the scan stage by whole-stage codegen.
    """

    def grams(frame: DataFrame, idc: str, txc: str, alias: str) -> DataFrame:
        toks = F.split(F.col(txc), " ")
        g = F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
        return frame.select(
            F.col(idc).alias(alias), F.explode(g).alias("gram")
        ).dropDuplicates([alias, "gram"])

    bench_grams = grams(benchmark, bench_id_col, bench_text_col, "bench_id")
    corpus_grams = grams(docs, id_col, text_col, id_col)
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(
            F.countDistinct("gram").alias("matched_grams"),
            F.countDistinct("bench_id").alias("bench_docs"),
        )
        .filter(F.col("matched_grams") >= min_overlap)
    )


def lm_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Corpus-LM perplexity quality filter — the CCNet-style gate
    (Wenzek et al. 2020, public): train a unigram language model on
    the corpus itself (add-``alpha`` smoothed), then score every doc
    by its mean negative log-likelihood. Low-NLL docs look like the
    corpus; high-NLL docs are noise/garble — the standard
    perplexity-bucket filter of pretraining pipelines.

    Emits (doc_id, n_tokens, nll) with nll = -avg log p(token),
    rounded to 6 decimals (FP sum order varies across engines and
    partial aggregations; 6 dp is far above the 1e-14 accumulation
    noise).

    Scale shape: token counts are ONE map-side-combinable groupBy on
    xxhash64(token) (8-byte shuffle keys — the corpus text never
    shuffles; collisions merge two counts with probability ~2^-64 per
    vocab pair, and the string-keyed SQL oracle doubles as the
    collision check). The two LM scalars (total tokens N, vocab size
    V) are a bounded driver collect — two numbers, never data. The
    score pass joins tokens to per-token log-probs on the same 8-byte
    key: AQE broadcasts the vocab when it fits and degrades to a
    shuffle hash join on a 100 TB-corpus vocabulary; the final per-doc
    aggregation is keyed on the doc id, so no global hot key exists.
    """
    tok = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).select(id_col, F.xxhash64("tok").alias("t"))
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    stats = counts.agg(
        F.sum("c").alias("N"), F.count(F.lit(1)).alias("V")
    ).collect()[0]
    denom = float(stats["N"]) + alpha * float(stats["V"])
    logp = counts.select(
        "t", F.log((F.col("c") + F.lit(float(alpha))) / F.lit(denom)).alias("logp")
    )
    return (
        tok.join(logp, "t")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(-F.avg("logp"), 6).alias("nll"),
        )
    )


def dsir_score(
    docs: DataFrame,
    target_sources: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR-style importance scoring (Xie et al. 2023, public): train
    TWO add-``alpha`` unigram LMs — one on the target domain (docs
    whose ``source_col`` is in ``target_sources``), one on the rest —
    and score every doc by its mean per-token log importance ratio
    log p_target(tok) − log p_raw(tok). High-ratio docs "look like"
    the target domain; selecting by this score is the standard
    importance-resampling data-selection step of pretraining
    pipelines (select with ``pack.select_under_budget`` on the score).

    Emits (id_col, n_tokens, logratio) with logratio rounded to 6
    decimals (aggregation order noise is ~1e-14). Both LMs share the
    UNION vocabulary, so a token unseen on one side still gets the
    smoothed floor probability rather than dropping the doc.

    Scale shape mirrors :func:`lm_quality`: one map-side-combinable
    groupBy on xxhash64(token) produces BOTH sides' counts in a single
    shuffle of 8-byte keys (conditional sums — the corpus text never
    shuffles); the three LM scalars (target tokens, raw tokens, union
    vocab size) are a bounded driver collect; the score join runs on
    the same 8-byte key, broadcast while the vocab fits and shuffle
    beyond; the final per-doc aggregation is keyed on the doc id. The
    string-keyed SQL oracle doubles as the hash-collision check.
    """
    is_t = F.col(source_col).isin(list(target_sources)).cast("long")
    tok = docs.select(
        F.col(id_col),
        is_t.alias("is_t"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).select(id_col, "is_t", F.xxhash64("tok").alias("t"))
    counts = tok.groupBy("t").agg(
        F.sum("is_t").alias("ct"),
        F.sum(F.lit(1) - F.col("is_t")).alias("cr"),
    )
    stats = counts.agg(
        F.sum("ct").alias("Nt"),
        F.sum("cr").alias("Nr"),
        F.count(F.lit(1)).alias("V"),
    ).collect()[0]
    dt = float(stats["Nt"]) + alpha * float(stats["V"])
    dr = float(stats["Nr"]) + alpha * float(stats["V"])
    a = F.lit(float(alpha))
    lr = counts.select(
        "t",
        (
            F.log((F.col("ct") + a) / F.lit(dt))
            - F.log((F.col("cr") + a) / F.lit(dr))
        ).alias("lr"),
    )
    return (
        tok.join(lr, "t")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lr"), 6).alias("logratio"),
        )
    )


def classifier_score(
    docs: DataFrame,
    lexicon: dict[str, float],
    bias: float = 0.0,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """fastText-style linear quality classifier (Joulin et al. 2017,
    public; the shape of the distilled "looks like Wikipedia/books"
    gates pretraining pipelines ship): score every doc as
    sigmoid(bias + mean token weight) against a fixed word→weight
    ``lexicon`` (out-of-vocabulary tokens weigh 0 but still count in
    the mean — a doc can't game the gate by padding with junk), and
    keep docs whose score clears ``threshold``.

    Emits (id_col, n_tokens, score, keep) with score rounded to 6
    decimals (FP sum-order noise ~1e-15; threshold comparisons use the
    unrounded value, so pick thresholds away from representable score
    ties).

    Scale shape: the lexicon is a driver-side constant (a distilled
    linear model ships as thousands of rows, not data) broadcast into
    the token join — the corpus text never shuffles; tokenization
    fuses into the scan, the only wide exchange is the per-doc
    aggregation keyed on the doc id. All arithmetic is JVM expressions
    (whole-stage codegen), no UDF.
    """
    spark = docs.sparkSession
    lex = F.broadcast(
        spark.createDataFrame(
            [(k, float(v)) for k, v in sorted(lexicon.items())],
            schema="tok string, w double",
        )
    )
    tok = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    logit = F.lit(float(bias)) + F.sum(F.coalesce(F.col("w"), F.lit(0.0))) / F.count(
        F.lit(1)
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return (
        tok.join(lex, "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(score, 6).alias("score"),
            (score > F.lit(float(threshold))).alias("keep"),
        )
    )


def bigram_pmi(
    docs: DataFrame,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Collocation detection via pointwise mutual information over
    adjacent token pairs (Church & Hanks 1990, public): PMI(a,b) =
    ln(c_ab * N / (c_a * c_b)) with N the total bigram count —
    positive for pairs that co-occur more than independence predicts
    (multiword expressions), the classic corpus-analytics statistic.

    Emits (tok_a, tok_b, n_ab, pmi) for pairs with c_ab >= min_count,
    pmi rounded to 6 decimals.

    Scale shape: bigrams explode fused into the scan (zip of the token
    array with its tail — whole-stage codegen, no UDF); bigram counts
    are ONE map-side-combinable groupBy. Unigram counts ride the SAME
    exploded frame as two more combinable aggregations, and the
    unigram table joins back by token — AQE broadcasts a test-scale
    vocabulary and degrades to shuffle hash joins on a 100 TB corpus
    vocabulary. Scalar N is a one-number driver collect. Token strings
    shuffle only after the count aggregations (vocab-sized, not
    corpus-sized).
    """
    toks = F.split(F.col(text_col), " ")
    pairs = docs.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("tok_a"), F.col("p.b").alias("tok_b"))
    big = pairs.groupBy("tok_a", "tok_b").agg(
        F.count(F.lit(1)).alias("n_ab")
    )
    left = pairs.groupBy("tok_a").agg(F.count(F.lit(1)).alias("n_a"))
    right = pairs.groupBy("tok_b").agg(F.count(F.lit(1)).alias("n_b"))
    n_total = float(pairs.count())
    return (
        big.filter(F.col("n_ab") >= F.lit(int(min_count)))
        .join(left, "tok_a")
        .join(right, "tok_b")
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab") * F.lit(n_total)
                    / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def textrank_keywords(
    docs: DataFrame,
    min_cooccur: int = 3,
    iterations: int = 6,
    damping: float = 0.85,
    top_n: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level TextRank keyword extraction (Mihalcea & Tarau
    2004, public): tokens are graph nodes, adjacent-token
    co-occurrence (window 1, canonical unordered pair, count >=
    ``min_cooccur``) gives the edges, and fixed-iteration PageRank
    scores centrality. Emits the ``top_n`` tokens as (token, rank),
    rank rounded to 6 decimals, ordered and CUT deterministically by
    (rank desc, token) — the tie-break makes the top-n boundary
    engine-portable.

    Composition, not re-implementation: the bigram explode is the
    :func:`bigram_pmi` scan fusion (zip_with of the token array with
    its tail, whole-stage codegen), the scoring loop is
    :func:`~ksj2gp_spark.operators.graph.pagerank` verbatim. The
    symmetrized co-occurrence graph has no dangling nodes (every
    kept token has an edge), so rank mass conservation needs no
    dangling fix-up in the oracle replay.

    Scale shape: token STRINGS shuffle only after the count
    aggregation (vocab-sized, not corpus-sized); the PageRank loop
    moves (token, rank) pairs over the pre-aggregated edge list; the
    top-n is TakeOrderedAndProject (per-partition heads, no global
    sort).
    """
    from .graph import pagerank

    toks = F.split(F.col(text_col), " ")
    pairs = docs.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p")
    ).select(
        F.least(F.col("p.a"), F.col("p.b")).alias("a"),
        F.greatest(F.col("p.a"), F.col("p.b")).alias("b"),
    ).filter(F.col("a") != F.col("b"))
    edges = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= F.lit(int(min_cooccur)))
        .select("a", "b")
    )
    sym = edges.unionAll(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    ranks = pagerank(
        sym, src="a", dst="b", iterations=iterations, damping=damping
    )
    return (
        ranks.orderBy(F.desc("rank"), "node")
        .limit(int(top_n))
        .select(F.col("node").alias("token"), "rank")
    )
