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
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

_M61 = (1 << 61) - 1  # Mersenne prime modulus for the hash family


def _token_hashes(text: str, n_shingle: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < n_shingle:
        shingles = [" ".join(toks)] if toks else [""]
    else:
        shingles = [
            " ".join(toks[i : i + n_shingle])
            for i in range(len(toks) - n_shingle + 1)
        ]
    # stable 64-bit FNV-1a per shingle (no Python hash() — seed varies)
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        h = np.uint64(0xCBF29CE484222325)
        for b in s.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def minhash_signature_udf(num_hashes: int = 64, n_shingle: int = 3):
    """pandas UDF: text → array<long> minhash signature. The hash family
    is (a*x + b) mod M61 with fixed seeds — deterministic everywhere."""
    rng = np.random.default_rng(12345)
    a = rng.integers(1, _M61, size=num_hashes, dtype=np.int64).astype(object)
    b = rng.integers(0, _M61, size=num_hashes, dtype=np.int64).astype(object)

    @pandas_udf("array<long>")
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            x = _token_hashes(t or "", n_shingle).astype(object)
            # (num_hashes, n_shingles) permutation values, min over shingles
            vals = (a[:, None] * x[None, :] + b[:, None]) % _M61
            out.append(vals.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return sig


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    n_shingle: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs by MinHash+LSH with signature verification.

    Emits (id_a, id_b, est_jaccard) for pairs whose estimated Jaccard
    (matching minhash fraction) ≥ threshold. Candidate generation is a
    bucket self-join: rows sharing any band signature."""
    rows_per_band = num_hashes // bands
    sigged = df.select(
        F.col(id_col), minhash_signature_udf(num_hashes, n_shingle)(F.col(text_col)).alias("sig")
    ).cache()

    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.xxhash64(
                *[F.col("sig")[j] for j in range(i * rows_per_band, (i + 1) * rows_per_band)]
            ).alias("bucket"),
        )
        for i in range(bands)
    ]
    banded = sigged.select(
        id_col, "sig", F.explode(F.array(*band_structs)).alias("bb")
    ).select(id_col, "sig", "bb.band", "bb.bucket")

    pairs = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    matches = F.aggregate(
        F.zip_with(
            "sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        pairs.withColumn("est_jaccard", matches / F.lit(num_hashes))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash_udf(n_shingle: int = 2):
    """pandas UDF: text → 64-bit SimHash (weighted bit voting)."""

    @pandas_udf("long")
    def sh(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        bitcols = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        for i, t in enumerate(texts):
            hs = _token_hashes(t or "", n_shingle)
            if len(hs) == 0:
                out[i] = 0
                continue
            bits = (hs[:, None] & bitcols[None, :]) != 0
            votes = bits.sum(axis=0) * 2 - len(hs)  # +1/-1 voting
            out[i] = np.int64(
                np.uint64(np.packbits(votes > 0, bitorder="little").view(np.uint64)[0])
            )
        return pd.Series(out)

    return sh


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    band_bits: int = 16,
) -> DataFrame:
    """Near-dups by SimHash: banded equality candidates + exact Hamming
    distance filter (≤ max_hamming)."""
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
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram (word) Jaccard similarity — the verification-grade
    dedup lane, built from relational ops only:

    explode shingles → inverted index → pair co-count = |A∩B| →
    Jaccard = co / (|A| + |B| - co). Shares no UDF at all."""
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


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ threshold. Brute-force within
    LSH buckets: random-hyperplane signs bucket the vectors first, so
    the pair join is per-bucket, not all-pairs."""
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"]
    rng = np.random.default_rng(777)
    planes = rng.standard_normal((8, dim))

    @pandas_udf("int")
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())
        signs = (mat @ planes.T) > 0
        vals = (signs * (1 << np.arange(8))).sum(axis=1)
        return pd.Series(vals.astype(np.int32))

    withb = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("vec"),
        bucket(F.col(vec_col)).alias("bucket"),
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    pairs = (
        withb.alias("a")
        .join(
            withb.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
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
    )
    return pairs.filter(F.col("cosine") >= threshold)
