"""Deduplication operators for the documents table — the training-data
pipeline lane (exact, MinHash+LSH, SimHash, n-gram Jaccard).

Scale design:
* exact dedup — hash groupBy, pure JVM (map-side partial agg).
* MinHash+LSH — shingle→minhash inside one vectorized pandas UDF
  (numpy matrix of permutation hashes), then **banding**: equal band
  signature → bucket; candidate pairs come from a self-equi-join on
  (band, bucket) — never an all-pairs cross join. Verification re-reads
  only candidate pairs.
* SimHash — 64-bit weighted-token hash in a pandas UDF; near-dups via
  banded equality on bit chunks + exact Hamming filter.

All UDFs are Arrow-batched; signatures are fixed-width arrays so the
shuffle payload is compact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf

_M31 = (1 << 31) - 1  # Mersenne prime modulus for the hash family
_B1, _B2 = 131, 137  # polynomial bases for the dual shingle hash


# Performance note: all uint64 arithmetic below uses plain Python-int
# scalar operands (131, _M31, shift counts). A np.uint64 SCALAR operand
# sends numpy's binary ufuncs down a ~40× slower path (measured: 48M-
# element `x >> np.uint64(31)` 4.1s vs `x >> 31` 0.10s); with int
# scalars the plain `%` reduction is already memory-bound.


def minhash_params(num_hashes: int = 64) -> list[tuple[int, int]]:
    """Fixed-seed (a, b) pairs for the (a·x + b) mod M31 permutation
    family — exposed so SQL oracles can embed the identical literals."""
    rng = np.random.default_rng(12345)
    a = rng.integers(1, _M31, size=num_hashes)
    b = rng.integers(0, _M31, size=num_hashes)
    return [(int(x), int(y)) for x, y in zip(a, b)]


def _shingles(text: str, n_shingle: int) -> list[str]:
    # _poly_hashes joins shingles with NUL and detects boundaries via
    # codepoint 0, so a NUL *inside* a token (which str.split preserves)
    # would silently corrupt the whole batch's segmentation. NUL carries
    # no signal for dedup — strip it up front.
    if "\x00" in text:
        text = text.replace("\x00", "")
    toks = text.split()
    if len(toks) < n_shingle:
        return [" ".join(toks)]
    return [
        " ".join(toks[i : i + n_shingle])
        for i in range(len(toks) - n_shingle + 1)
    ]


def _poly_hashes(shingles: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized dual polynomial rolling hash per shingle.

    h = fold(acc·B + codepoint) mod M31 for B ∈ {131, 137}. Returns
    (h1, h2) uint64 arrays. The whole batch is hashed with O(max_len)
    numpy column operations — no per-shingle or per-byte Python loop
    (the round-1 anti-pattern). Exactly reproducible in SQL as
    list_reduce over unicode codepoints, which is what gives the
    minhash/simhash contract queries their DuckDB oracles.
    """
    if not shingles:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    big = "\x00".join(shingles)
    arr = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    seps = np.where(arr == 0)[0]
    starts = np.concatenate(([0], seps + 1))
    ends = np.concatenate((seps, [len(arr)]))
    lens = ends - starts
    maxlen = int(lens.max()) if len(lens) else 0
    h1 = np.zeros(len(lens), np.uint64)
    h2 = np.zeros(len(lens), np.uint64)
    if maxlen == 0:
        return h1, h2
    pad = maxlen - lens  # right-align: leading zeros don't change the hash
    # Column-at-a-time gather (no (n_shingles × maxlen) code matrix in
    # memory): per column j the code is arr[start + j - pad] where
    # j ≥ pad, else 0.
    last = len(arr) - 1
    for j in range(maxlen):
        rel = j - pad
        ok = rel >= 0
        # minimum-clip: an empty trailing shingle has start == len(arr);
        # its gather is masked out by `ok` but must stay in bounds.
        c = arr[np.minimum(starts + np.where(ok, rel, 0), last)] * ok
        h1 = (h1 * _B1 + c) % _M31
        h2 = (h2 * _B2 + c) % _M31
    return h1, h2


def _batch_shingle_hashes(
    texts: pd.Series, n_shingle: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h1, h2, doc_offsets) for one Arrow batch: all shingles of all
    docs hashed in one vectorized pass; offsets delimit each doc's
    segment for np.minimum/add.reduceat.

    Shingle boundaries are computed as (start, end) index pairs into
    ONE codepoint array of the whole batch — no per-shingle Python
    string is ever built. The earlier ``_shingles``-per-doc version
    allocated ~40 small strings per document (≈400k PyObjects per 10k-
    row Arrow batch), and that allocator churn was the dominant
    repeat-to-repeat variance on the 100k-doc bench lane. Hash VALUES
    are bit-identical to ``_poly_hashes(_shingles(text))`` — the
    property the golden tests and DuckDB oracles pin — because a
    shingle " ".join(toks[i:i+n]) is exactly a substring of the
    whitespace-normalized document.
    """
    n_docs = len(texts)
    if n_docs == 0:
        z = np.empty(0, np.uint64)
        return z, z, np.empty(0, np.int64)
    # NUL carries no dedup signal and is the document separator below —
    # strip it up front (same rule _shingles applies).
    norm = [
        " ".join(t.replace("\x00", "").split()) if t else "" for t in texts
    ]
    big = "\x00".join(norm)
    arr = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    n_chars = len(arr)
    is_nul = arr == 0
    if n_chars == 0 or is_nul.all() and n_chars == n_docs - 1:
        # every doc empty → one empty shingle (hash 0) per doc
        z = np.zeros(n_docs, np.uint64)
        return z, z.copy(), np.arange(n_docs, dtype=np.int64)

    is_sep = is_nul | (arr == 32)
    not_sep = ~is_sep
    tok_start = not_sep & np.concatenate(([True], is_sep[:-1]))
    tok_end = not_sep & np.concatenate((is_sep[1:], [True]))
    ts = np.where(tok_start)[0]
    te = np.where(tok_end)[0] + 1  # exclusive
    doc_of_tok = np.cumsum(is_nul)[ts]  # nuls before a token = its doc
    tok_counts = np.bincount(doc_of_tok, minlength=n_docs)

    # docs with ≥ n tokens emit k-n+1 shingles; shorter docs emit ONE
    # whole-doc shingle (possibly empty), matching _shingles exactly
    sh_counts = np.maximum(tok_counts - n_shingle + 1, 1)
    off = np.concatenate(([0], np.cumsum(sh_counts)))
    starts = np.zeros(off[-1], np.int64)
    ends = np.zeros(off[-1], np.int64)

    tok_off = np.concatenate(([0], np.cumsum(tok_counts)))[:-1]
    full = tok_counts >= n_shingle
    d_full = np.where(full)[0]
    if len(d_full):
        reps = tok_counts[d_full] - n_shingle + 1
        j = np.arange(int(reps.sum())) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)))[:-1], reps
        )
        g = np.repeat(off[d_full], reps) + j
        t0 = np.repeat(tok_off[d_full], reps) + j
        starts[g] = ts[t0]
        ends[g] = te[t0 + n_shingle - 1]
    d_small = np.where(~full)[0]
    if len(d_small):
        nul_pos = np.where(is_nul)[0]
        doc_start = np.concatenate(([0], nul_pos + 1))
        doc_end = np.concatenate((nul_pos, [n_chars]))
        starts[off[d_small]] = doc_start[d_small]
        ends[off[d_small]] = doc_end[d_small]

    h1, h2 = _hash_segments(arr, starts, ends - starts)
    return h1, h2, off[:-1].astype(np.int64)


def _hash_segments(
    arr: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Dual polynomial hash of arr[start:start+len) segments, column
    at a time (right-aligned, so leading zeros don't change the hash —
    the same O(maxlen) gather loop _poly_hashes uses)."""
    n = len(starts)
    h1 = np.zeros(n, np.uint64)
    h2 = np.zeros(n, np.uint64)
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return h1, h2
    pad = maxlen - lens
    last = len(arr) - 1
    for j in range(maxlen):
        rel = j - pad
        ok = rel >= 0
        c = arr[np.minimum(starts + np.where(ok, rel, 0), last)] * ok
        h1 = (h1 * _B1 + c) % _M31
        h2 = (h2 * _B2 + c) % _M31
    return h1, h2


def _cap_buckets(
    banded: DataFrame, keys: list[str], max_bucket: int | None
) -> DataFrame:
    """Drop LSH buckets with more than ``max_bucket`` members.

    A bucket of size s contributes s·(s−1)/2 candidate pairs, so one
    degenerate bucket (empty texts, boilerplate) turns the self-join
    quadratic. The cap keeps candidate generation O(n·max_bucket).
    No silent truncation: dropped buckets are counted in-plan and
    exposed via :func:`dropped_bucket_stats` for the caller to log.

    Physical shape: bucket sizes come from a map-side-combinable
    groupBy (NOT a window — a partitionBy window shuffles and sorts
    the whole banded table; measured ~6 s of a 10 s lane at 100k
    docs), and the oversized-bucket list — near-empty on healthy
    corpora — is broadcast back as a LEFT ANTI join.
    """
    if max_bucket is None:
        return banded
    oversized = (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__bsz"))
        .filter(F.col("__bsz") > max_bucket)
        .drop("__bsz")
    )
    return banded.join(F.broadcast(oversized), list(keys), "left_anti")


def dropped_bucket_stats(
    banded: DataFrame, keys: list[str], max_bucket: int
) -> DataFrame:
    """(n_buckets_dropped, n_rows_dropped) for a banded/bucketed frame —
    the audit query for the no-silent-caps rule. Lazy: callers decide
    when (and whether) to pay for the count."""
    sizes = banded.groupBy(*keys).agg(F.count(F.lit(1)).alias("sz"))
    return sizes.filter(F.col("sz") > max_bucket).agg(
        F.count(F.lit(1)).alias("n_buckets_dropped"),
        F.coalesce(F.sum("sz"), F.lit(0)).alias("n_rows_dropped"),
    )


def minhash_signature_udf(num_hashes: int = 64, n_shingle: int = 3):
    """pandas UDF: text → array<long> minhash signature. The hash family
    is (a·x + b) mod M31 over 31-bit polynomial shingle hashes — all
    products fit uint64, so numpy and any BIGINT SQL engine agree."""
    params = minhash_params(num_hashes)

    @pandas_udf("array<long>")
    def sig(texts: pd.Series) -> pd.Series:
        h1, _, offsets = _batch_shingle_hashes(texts, n_shingle)
        # One contiguous 1-D pass per hash function (Python-int scalar
        # operands keep numpy on its fast ufunc loops; the equivalent
        # 2-D broadcast measured ~6× slower), then segment-min per doc
        # via reduceat — no per-doc Python loop.
        mins = np.empty((len(params), len(offsets)), np.uint64)
        for hi_, (ai, bi) in enumerate(params):
            mins[hi_] = np.minimum.reduceat((ai * h1 + bi) % _M31, offsets)
        return pd.Series(list(mins.astype(np.int64).T))

    return sig


def minhash_banded(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    n_shingle: int = 3,
) -> tuple[DataFrame, list[str]]:
    """UNCAPPED banded frame: one row per (doc, band) with the band
    signature packed into int64 bucket keys. Public so callers can
    audit cap drops: ``dropped_bucket_stats(banded, ["band",
    *bucket_cols], max_bucket)`` is the ledger the cap inside
    :func:`minhash_lsh_pairs` applies. Returns (banded, bucket_cols).

    No .cache() on purpose: the downstream self-join's two sides are
    identical subplans, so Spark's ReuseExchange computes the
    signature UDF once and replays the shuffle for the other side
    (measured at 40k docs: cache-free within noise of cached). A
    cached frame here leaked for the session's lifetime — every
    composed-pipeline call accumulated storage pressure
    (tests/test_pipeline_ops.py pins the no-new-persistent-RDDs
    contract)."""
    rows_per_band = num_hashes // bands
    sigged = df.select(
        F.col(id_col),
        minhash_signature_udf(num_hashes, n_shingle)(F.col(text_col)).alias("sig"),
    )

    # Bucket key is the band's minhash values packed EXACTLY into
    # int64s (base 2³¹ positional packing, ⌈rows_per_band/2⌉ longs):
    # equal-bucket ⇔ equal band signature — the candidate set is
    # well-defined and the DuckDB oracle reproduces it bit-for-bit —
    # while the shuffle/join keys stay fixed-width integers (the
    # earlier string key measured ~3× slower through the groupBy and
    # self-join at 100k docs).
    n_packs = (rows_per_band + 1) // 2

    def pack(i: int, p: int):
        j = i * rows_per_band + 2 * p
        first = F.col("sig")[j] * F.lit(1 << 31)
        if 2 * p + 1 < rows_per_band:
            return (first + F.col("sig")[j + 1]).alias(f"bk{p}")
        return first.alias(f"bk{p}")

    band_structs = [
        F.struct(
            F.lit(i).alias("band"), *[pack(i, p) for p in range(n_packs)]
        )
        for i in range(bands)
    ]
    bucket_cols = [f"bk{p}" for p in range(n_packs)]
    banded = sigged.select(
        id_col, "sig", F.explode(F.array(*band_structs)).alias("bb")
    ).select(id_col, "sig", "bb.band", *[f"bb.{c}" for c in bucket_cols])
    return banded, bucket_cols


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    n_shingle: int = 3,
    threshold: float = 0.7,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Near-duplicate pairs by MinHash+LSH with signature verification.

    Emits (id_a, id_b, est_jaccard) for pairs whose estimated Jaccard
    (matching minhash fraction) ≥ threshold. Candidate generation is a
    bucket self-join: rows sharing any band signature. Buckets larger
    than ``max_bucket`` (boilerplate/empty-text clusters whose in-bucket
    join would go quadratic at corpus scale) are dropped from candidate
    generation — see :func:`_cap_buckets` for the audit trail."""
    banded, bucket_cols = minhash_banded(
        df, id_col, text_col, num_hashes, bands, n_shingle
    )
    banded = _cap_buckets(banded, ["band", *bucket_cols], max_bucket)

    join_cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    )
    for c in bucket_cols:
        join_cond = join_cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # est_jaccard is a function of the two signatures alone, so it is
    # IDENTICAL for every (band-)duplicate of a pair: compute it (and
    # apply the threshold) BEFORE dropDuplicates, so the dedup shuffle
    # moves 3 scalar columns instead of two 64-long signature arrays
    # (~1 KB/row → ~24 B/row; the array-laden dedup exchange was the
    # dominant shuffle payload and GC source of the 100k-doc lane).
    matches = F.aggregate(
        F.zip_with(
            F.col("a.sig"),
            F.col("b.sig"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        banded.alias("a")
        .join(banded.alias("b"), join_cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (matches / F.lit(num_hashes)).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_lsh_pairs_incremental(
    new_df: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    n_shingle: int = 3,
    threshold: float = 0.7,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Near-dup pairs of a NEW batch against an EXISTING corpus —
    the daily-ingest shape of dedup at corpus scale: signatures are
    computed only for the new rows, and the corpus is probed, never
    re-hashed and never shuffled.

    ``corpus`` is either a raw (id, text) frame or — the production
    path — a PREBUILT banded index (the output of
    :func:`minhash_banded`, e.g. persisted in the Iceberg table and
    appended to on every ingest): detected by its (sig, band) columns.

    Emits (new_id, corpus_id, est_jaccard) for cross-set pairs whose
    estimated Jaccard ≥ ``threshold``. Intra-batch duplicates are a
    separate (small) concern — compose with
    :func:`minhash_lsh_pairs` over the new batch alone.

    Scale shape: the new batch's distinct band keys are BROADCAST as a
    semi-join probe, so only corpus index rows in probed buckets leave
    the scan — the 10^12-row index side sees a partition-pruned,
    stats-pruned columnar read plus one broadcast hash join, zero
    Exchange. The ``max_bucket`` cap is evaluated on the probed subset
    only (O(new batch), not O(corpus)); audit via
    :func:`dropped_bucket_stats` on that subset.
    """
    new_banded, bucket_cols = minhash_banded(
        new_df, id_col, text_col, num_hashes, bands, n_shingle
    )
    if "sig" in corpus.columns and "band" in corpus.columns:
        corpus_banded = corpus
    else:
        corpus_banded, _ = minhash_banded(
            corpus, id_col, text_col, num_hashes, bands, n_shingle
        )
    keys = ["band", *bucket_cols]
    probe = new_banded.select(*keys).distinct()
    hit = corpus_banded.join(F.broadcast(probe), keys, "left_semi")
    hit = _cap_buckets(hit, keys, max_bucket)

    join_cond = F.col("c.band") == F.col("n.band")
    for c in bucket_cols:
        join_cond = join_cond & (F.col(f"c.{c}") == F.col(f"n.{c}"))
    matches = F.aggregate(
        F.zip_with(
            F.col("n.sig"),
            F.col("c.sig"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    # same reorder as minhash_lsh_pairs: est_jaccard is identical for
    # every band-duplicate of a pair, so threshold BEFORE the dedup
    # shuffle — it moves 3 scalars per surviving cross-set pair
    return (
        hit.alias("c")
        .join(F.broadcast(new_banded.alias("n")), join_cond)
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"c.{id_col}").alias("corpus_id"),
            (matches / F.lit(num_hashes)).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .dropDuplicates(["new_id", "corpus_id"])
    )


def simhash_udf(n_shingle: int = 2):
    """pandas UDF: text → 62-bit SimHash (weighted bit voting).

    The per-shingle hash is the dual polynomial hash packed as
    h64 = h1·2³¹ | h2 (62 effective bits, always non-negative), so the
    whole simhash pipeline is reproducible in BIGINT SQL. Bit votes are
    computed batch-wide with one add.reduceat — no per-doc Python loop.
    """
    shifts = np.arange(62, dtype=np.uint64)

    @pandas_udf("long")
    def sh(texts: pd.Series) -> pd.Series:
        h1, h2, offsets = _batch_shingle_hashes(texts, n_shingle)
        h64 = (h1 << 31) | h2
        bits = ((h64[:, None] >> shifts[None, :]) & 1).astype(np.int64)
        sums = np.add.reduceat(bits, offsets, axis=0)  # (n_docs, 62)
        counts = np.diff(np.concatenate((offsets, [len(h64)])))
        votes = sums * 2 - counts[:, None]
        packed = ((votes > 0).astype(np.uint64) << shifts[None, :]).sum(axis=1)
        return pd.Series(packed.astype(np.int64))

    return sh


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    band_bits: int = 16,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Near-dups by SimHash: banded equality candidates + exact Hamming
    distance filter (≤ max_hamming). Oversized bands (e.g. the all-zero
    simhash of empty texts) are capped — see :func:`_cap_buckets`."""
    hashed = df.select(
        F.col(id_col), simhash_udf()(F.col(text_col)).alias("simhash")
    )
    n_bands = 64 // band_bits
    banded = hashed.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftrightunsigned(F.col("simhash"), b * band_bits)
                            % F.lit(1 << band_bits)
                        ).alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select(id_col, "simhash", "bv.band", "bv.band_val")
    banded = _cap_buckets(banded, ["band", "band_val"], max_bucket)
    pairs = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            # hamming is identical for every band-duplicate of a pair:
            # compute + threshold BEFORE the dedup shuffle so it moves
            # only surviving 3-scalar rows
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs.select("id_a", "id_b", "hamming")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 100_000,
) -> DataFrame:
    """Exact n-gram (word) Jaccard similarity — the verification-grade
    dedup lane, built from relational ops only:

    explode shingles → inverted index → pair co-count = |A∩B| →
    Jaccard = co / (|A| + |B| - co). Shares no UDF at all.

    ``max_df`` caps shingle document frequency: a shingle appearing in
    k docs contributes k² candidate rows to the inverted-index
    self-join, so one boilerplate trigram in 10⁶ docs would emit 10¹²
    rows. Shingles with df > max_df are removed from the shingle space
    entirely (both co-counts and sizes), which keeps the result an
    exact Jaccard over the filtered space; an oracle replicates the
    same filter, and :func:`dropped_bucket_stats` on the shingled frame
    reports what was dropped."""
    toks = F.split(F.col(text_col), " ")
    shingled = df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ).alias("shingle"),
    ).dropDuplicates([id_col, "shingle"])
    if max_df is not None:
        shingled = _cap_buckets(shingled, ["shingle"], max_df)
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    co = (
        shingled.alias("a")
        .join(
            shingled.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("co"))
    )
    return (
        co.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("co") / (F.col("sz_a") + F.col("sz_b") - F.col("co")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def embedding_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 4,
    bits_per_table: int = 16,
) -> DataFrame:
    """(id, vec, table, bucket) — the multi-table hyperplane LSH index
    (one row per vector per table). The hyperplanes come from a FIXED
    seed, so indices built at different times over different frames
    collide consistently as long as (dim, n_tables, bits_per_table)
    match — persist this frame as the corpus-side index for
    :func:`embedding_near_dups_incremental` and build the probe side
    with the same parameters."""
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"]
    rng = np.random.default_rng(777)
    planes = rng.standard_normal((n_tables, bits_per_table, dim))
    weights = (1 << np.arange(bits_per_table)).astype(np.int64)

    @pandas_udf("array<int>")
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())
        out = np.empty((len(mat), n_tables), dtype=np.int32)
        for t in range(n_tables):
            signs = (mat @ planes[t].T) > 0
            out[:, t] = signs @ weights
        return pd.Series(list(out))

    return df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("vec"),
        F.posexplode(buckets(F.col(vec_col))).alias("table", "bucket"),
    )


def _cosine(x, y):
    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return dot(x, y) / (F.sqrt(dot(x, x)) * F.sqrt(dot(y, y)))


def embedding_near_dups_incremental(
    new_df: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_tables: int = 4,
    bits_per_table: int = 16,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Embedding-cosine near-dups of a NEW batch against an EXISTING
    corpus — the vector twin of :func:`minhash_lsh_pairs_incremental`
    / :func:`~.images.phash_near_dups_incremental`: buckets are
    computed only for the new rows; the corpus (raw, or a PREBUILT
    persisted :func:`embedding_buckets` index — detected by its
    (table, bucket, vec) columns; must have been built with the same
    n_tables/bits_per_table and vector dim, the hyperplane seed is
    fixed) is probed via a broadcast semi-join of the new batch's
    (table, bucket) keys and joined broadcast-only — the index side
    never shuffles. Emits (new_id, corpus_id, cosine) for cross-set
    pairs with exact cosine ≥ ``threshold``; the ``max_bucket`` cap is
    evaluated on the probed subset only (audit via
    :func:`dropped_bucket_stats`)."""
    new_b = embedding_buckets(
        new_df, id_col, vec_col, n_tables, bits_per_table
    )
    if "table" in corpus.columns and "bucket" in corpus.columns:
        corpus_b = corpus
    else:
        corpus_b = embedding_buckets(
            corpus, id_col, vec_col, n_tables, bits_per_table
        )
    keys = ["table", "bucket"]
    probe = new_b.select(*keys).distinct()
    hit = corpus_b.join(F.broadcast(probe), keys, "left_semi")
    hit = _cap_buckets(hit, keys, max_bucket)
    return (
        hit.alias("c")
        .join(
            F.broadcast(new_b.alias("n")),
            (F.col("c.table") == F.col("n.table"))
            & (F.col("c.bucket") == F.col("n.bucket")),
        )
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"c.{id_col}").alias("corpus_id"),
            # cosine is identical for every bucket-duplicate of a
            # pair: threshold BEFORE the dedup shuffle
            _cosine(F.col("n.vec"), F.col("c.vec")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .dropDuplicates(["new_id", "corpus_id"])
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_tables: int = 4,
    bits_per_table: int = 16,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ threshold via multi-table
    random-hyperplane LSH.

    ``n_tables`` independent tables of ``bits_per_table`` hyperplanes
    each: a pair is a candidate if it collides in ANY table (union →
    distinct), then verified with the exact cosine. 16-bit tables give
    65,536 buckets per table — expected bucket population n/65,536 stays
    join-friendly at 10⁹ rows, vs. the single 8-plane table (256
    buckets, O(n²/256) in-bucket pairs) this replaces. More tables raise
    recall (collision prob. 1−(1−cosᵇ)ᵗ for angle-cos c); oversized
    buckets are capped with an auditable drop count (_cap_buckets).
    """
    withb = embedding_buckets(df, id_col, vec_col, n_tables, bits_per_table)
    withb = _cap_buckets(withb, ["table", "bucket"], max_bucket)

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    # cosine is a function of the two vectors alone, so it is identical
    # for every bucket-duplicate of a pair: compute + threshold BEFORE
    # dropDuplicates, so the dedup shuffle moves 3 scalars per
    # surviving pair instead of two full embedding arrays
    return (
        withb.alias("a")
        .join(
            withb.alias("b"),
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (
                dot(F.col("a.vec"), F.col("b.vec"))
                / (
                    F.sqrt(dot(F.col("a.vec"), F.col("a.vec")))
                    * F.sqrt(dot(F.col("b.vec"), F.col("b.vec")))
                )
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Substring-level exact dedup — the span-finding half of
    "Deduplicating Training Data Makes Language Models Better"
    (Lee et al. 2022, public): find every maximal token span whose
    every length-``k`` window occurs at least ``min_count`` times in
    the whole corpus (across documents OR repeated inside one), so the
    spans can be cut out of training text rather than dropping whole
    docs.

    Emits one row per maximal span:
    (doc_id, span_start, span_end, span_tokens) with token-index
    half-open bounds [span_start, span_end).

    Spark-first shape (the reference algorithm is a suffix array —
    inherently single-machine; the distributed equivalent is a rolling
    k-token window inverted index):

    1. explode each doc into one (pos, xxhash64(gram)) row per token
       position — fused into the scan by whole-stage codegen; docs
       shorter than ``k`` never leave the scan;
    2. gram frequency via groupBy on the 8-byte hash (map-side
       combinable partial agg — the only corpus-sized shuffle, and it
       moves hashes, not text);
    3. join positions back to the >= min_count grams (shuffle hash
       join on the same 8-byte key);
    4. merge adjacent duplicated positions per doc into maximal spans
       (gaps-and-islands: pos - row_number over a per-doc window; the
       window partition is one document, so task size is bounded by
       doc length, never corpus size).

    The 64-bit gram hash admits a ~2^-64-per-pair collision risk in
    exchange for shuffling 8 bytes instead of k tokens per position —
    the standard trade at corpus scale.
    """
    toks = F.split(F.col(text_col), " ")
    grams = (
        docs.filter(F.size(toks) >= k)
        .select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - k),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
                )
            ).alias("pos", "gram"),
        )
        .select(id_col, "pos", F.xxhash64("gram").alias("g"))
    )
    dup = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select("g")
    )
    hits = grams.join(dup, "g").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    isl = hits.withColumn("__isl", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy(id_col, "__isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def line_dedup(
    docs: DataFrame,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Line-level corpus dedup — the CCNet paragraph-dedup stage
    (Wenzek et al. 2020, public): hash every line of every document,
    count occurrences corpus-wide, and remove EVERY occurrence of any
    line that appears at least ``min_count`` times (boilerplate —
    navigation chrome, cookie banners, license footers — appears
    thousands of times; dropping all copies is what CCNet does, and
    unlike keep-first it is order-free, hence deterministic under any
    partitioning). Documents are reassembled from their surviving
    lines in original order; a doc whose every line was boilerplate
    survives with empty text so downstream length gates can drop it
    auditable-y rather than it vanishing silently.

    Emits (id_col, text, n_lines, n_dropped) — text is the rebuilt
    document, n_lines the original line count.

    Scale shape: lines explode fused into the scan; the line-frequency
    groupBy runs on xxhash64(line) — the ONE corpus-sized exchange
    moves 8-byte keys after map-side partial aggregation, never text.
    The duplicated-line set (count >= min_count) joins back on the
    same 8-byte key — AQE broadcasts it while it fits and degrades to
    a shuffle hash join on a boilerplate-heavy 100 TB corpus. The
    rebuild groupBy keys on the doc id (no global hot key; task memory
    is bounded by document length). The 64-bit hash admits a
    ~2^-64-per-pair collision risk in exchange for shuffling 8 bytes
    per line; a string-keyed SQL oracle doubles as the collision
    check.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    ).withColumn("h", F.xxhash64("line"))
    dup = (
        lines.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("h", F.lit(True).alias("is_dup"))
    )
    tagged = lines.join(dup, "h", "left")
    kept_struct = F.when(
        F.col("is_dup").isNull(), F.struct(F.col("pos"), F.col("line"))
    )
    return (
        tagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("is_dup").isNotNull().cast("long")).alias("n_dropped"),
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.filter(
                            F.collect_list(kept_struct), lambda s: s.isNotNull()
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("text"),
        )
        .select(id_col, "text", "n_lines", "n_dropped")
    )
