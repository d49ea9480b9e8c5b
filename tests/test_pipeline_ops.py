"""Tests for training-data pipeline operators: dedup (minhash/simhash/
ngram/embedding), text analysis, and the image lane — each against a
brute-force or constructed oracle."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ksj2gp_spark.formats import imagecodec
from ksj2gp_spark.operators import dedup, images as img_ops, text


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "a completely different document about spark joins and shuffles",
        "numbers 12345 and symbols !!! ??? ,,, fill this low quality row",
        "der schnelle braune fuchs springt über den faulen hund im wald und der baum ist das",
        "le renard brun rapide saute par dessus le chien et les arbres des la",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i, t))
    # near-duplicates of doc 0: one word changed / one appended
    rows.append((100, base[0].replace("lazy", "sleepy")))
    rows.append((101, base[0] + " today"))
    # exact duplicate of doc 1
    rows.append((102, base[1]))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


class TestDedup:
    def test_minhash_lsh_finds_near_dups(self, spark, docs):
        pairs = dedup.minhash_lsh_pairs(
            docs, num_hashes=64, bands=16, threshold=0.3
        ).toPandas()
        found = {tuple(sorted((a, b))) for a, b in zip(pairs.id_a, pairs.id_b)}
        assert (0, 100) in found
        assert (0, 101) in found
        assert (1, 102) in found  # exact dup has jaccard 1.0
        ej = pairs.set_index(["id_a", "id_b"])["est_jaccard"]
        assert ej.loc[(1, 102)] == 1.0
        # unrelated docs are not paired
        assert (0, 1) not in found and (3, 4) not in found

    def test_incremental_equals_cross_set_subset(self, spark, docs):
        # new-vs-corpus pairs must be exactly the cross-set subset of
        # the full same-set run, with identical est_jaccard values
        new = docs.filter(F.col("doc_id") >= 100)
        corpus = docs.filter(F.col("doc_id") < 100)
        inc = dedup.minhash_lsh_pairs_incremental(
            new, corpus, threshold=0.3
        ).toPandas()
        full = dedup.minhash_lsh_pairs(docs, threshold=0.3).toPandas()
        expect = {}
        for a, b, ej in zip(full.id_a, full.id_b, full.est_jaccard):
            if (a >= 100) != (b >= 100):
                n, c = (a, b) if a >= 100 else (b, a)
                expect[(n, c)] = ej
        got = {
            (n, c): ej
            for n, c, ej in zip(inc.new_id, inc.corpus_id, inc.est_jaccard)
        }
        assert got == expect
        assert len(got) > 0  # fixture plants cross-set near-dups

    def test_incremental_accepts_prebuilt_banded_index(self, spark, docs):
        # production path: the corpus banded index is persisted once
        # (e.g. in the Iceberg table) and probed on every ingest
        new = docs.filter(F.col("doc_id") >= 100)
        corpus = docs.filter(F.col("doc_id") < 100)
        banded, _ = dedup.minhash_banded(corpus)
        via_raw = (
            dedup.minhash_lsh_pairs_incremental(new, corpus, threshold=0.3)
            .toPandas()
            .sort_values(["new_id", "corpus_id"])
            .reset_index(drop=True)
        )
        via_index = (
            dedup.minhash_lsh_pairs_incremental(new, banded, threshold=0.3)
            .toPandas()
            .sort_values(["new_id", "corpus_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(via_raw, via_index)

    def test_incremental_corpus_side_never_shuffles_for_the_join(
        self, spark, docs
    ):
        # the scale contract: the corpus index is probed via broadcast
        # joins only — no SortMergeJoin (which would shuffle the
        # 10^12-row index side on the bucket keys)
        new = docs.filter(F.col("doc_id") >= 100)
        corpus = docs.filter(F.col("doc_id") < 100)
        plan = (
            dedup.minhash_lsh_pairs_incremental(new, corpus, threshold=0.3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_nul_in_token_does_not_corrupt_signatures(self, spark):
        # _poly_hashes separates shingles with NUL; a NUL embedded in a
        # token (str.split preserves it) must not shift the batch's
        # segmentation. The NUL is stripped, so the two texts hash
        # identically → est_jaccard exactly 1.0.
        df = spark.createDataFrame(
            [
                (0, "alpha beta gamma delta epsilon zeta"),
                (1, "alpha be\x00ta gamma delta epsilon zeta"),
            ],
            "doc_id long, text string",
        )
        pairs = dedup.minhash_lsh_pairs(df, threshold=0.3).toPandas()
        assert len(pairs) == 1
        assert pairs.iloc[0]["est_jaccard"] == 1.0

    def test_embedding_incremental_matches_cross_set_subset(self, spark):
        """Vector twin of the incremental lanes: new-vs-corpus pairs =
        the cross-set subset of the full run, identical cosines; the
        prebuilt embedding_buckets index gives the same answer; the
        corpus side never sort-merge-joins."""
        import numpy as np

        rng = np.random.RandomState(11)
        dim = 16
        corpus_vecs = rng.randn(40, dim)
        new_vecs = np.vstack(
            [
                corpus_vecs[:10] + 0.001 * rng.randn(10, dim),  # twins
                rng.randn(5, dim),  # unrelated
            ]
        )
        corpus = spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": range(40),
                    "embedding": [list(map(float, v)) for v in corpus_vecs],
                }
            )
        )
        new = spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": [1000 + i for i in range(15)],
                    "embedding": [list(map(float, v)) for v in new_vecs],
                }
            )
        )
        inc = dedup.embedding_near_dups_incremental(
            new, corpus, threshold=0.99
        ).toPandas()
        full = dedup.embedding_near_dups(
            new.unionByName(corpus), threshold=0.99
        ).toPandas()
        expect = {}
        for a, b, c in zip(full.id_a, full.id_b, full.cosine):
            if (a >= 1000) != (b >= 1000):
                n_, c_ = (a, b) if a >= 1000 else (b, a)
                expect[(n_, c_)] = round(c, 9)
        got = {
            (n_, c_): round(c, 9)
            for n_, c_, c in zip(inc.new_id, inc.corpus_id, inc.cosine)
        }
        assert got == expect
        assert len(got) >= 10  # every planted twin recovered
        banded = dedup.embedding_buckets(corpus)
        via_index = dedup.embedding_near_dups_incremental(
            new, banded, threshold=0.99
        ).toPandas()
        assert {
            (n_, c_): round(c, 9)
            for n_, c_, c in zip(
                via_index.new_id, via_index.corpus_id, via_index.cosine
            )
        } == got
        plan = (
            dedup.embedding_near_dups_incremental(new, corpus)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_simhash_near_dups(self, spark, docs):
        pairs = dedup.simhash_near_dups(docs, max_hamming=10).toPandas()
        found = {tuple(sorted((a, b))) for a, b in zip(pairs.id_a, pairs.id_b)}
        assert (1, 102) in found
        h = pairs.set_index(["id_a", "id_b"])["hamming"]
        assert h.loc[(1, 102)] == 0
        assert (0, 3) not in found

    def test_ngram_jaccard_exact(self, spark, docs):
        pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2).toPandas()
        found = {tuple(sorted((a, b))): j for a, b, j in
                 zip(pairs.id_a, pairs.id_b, pairs.jaccard)}
        assert found[(1, 102)] == 1.0
        # oracle for (0, 101): compute 3-gram jaccard by hand
        t0 = "the quick brown fox jumps over the lazy dog near the river bank"
        t1 = t0 + " today"

        def sh(t):
            w = t.split()
            return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

        a, b = sh(t0), sh(t1)
        expected = len(a & b) / len(a | b)
        assert found[(0, 101)] == pytest.approx(expected)

    def test_ngram_df_cap_pathological(self, spark):
        """One shingle shared by EVERY doc: with a df cap the candidate
        join stays O(n) (the hot shingle is dropped from the shingle
        space) and the drop is auditable — the no-silent-caps rule."""
        n = 50
        rows = [(i, f"common boiler plate unique{i} word{i} tail{i}") for i in range(n)]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        # Cap df at 10: "common boiler plate" (df=n) is dropped; the
        # unique shingles (df=1) survive → no pairs at all.
        pairs = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.01, max_df=10).toPandas()
        assert len(pairs) == 0
        # Audit: exactly one shingle dropped, n rows.
        toks = None
        from pyspark.sql import functions as F

        t = F.split(F.col("text"), " ")
        shingled = df.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size(t) - 3, F.lit(0))),
                    lambda i: F.concat_ws(" ", F.slice(t, i + 1, 3)),
                )
            ).alias("shingle"),
        ).dropDuplicates(["doc_id", "shingle"])
        stats = dedup.dropped_bucket_stats(shingled, ["shingle"], 10).collect()[0]
        assert stats["n_buckets_dropped"] == 1
        assert stats["n_rows_dropped"] == n
        # Without the cap the hot shingle pairs everything with everything.
        uncapped = dedup.ngram_jaccard_pairs(
            df, n=3, threshold=0.01, max_df=None
        ).toPandas()
        assert len(uncapped) == n * (n - 1) / 2

    def test_minhash_bucket_cap(self, spark):
        """Identical docs all share every band bucket; a small cap
        removes the degenerate bucket (and with it all pairs)."""
        rows = [(i, "same text everywhere in this corpus") for i in range(20)]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        capped = dedup.minhash_lsh_pairs(df, threshold=0.1, max_bucket=5).toPandas()
        assert len(capped) == 0
        uncapped = dedup.minhash_lsh_pairs(df, threshold=0.1, max_bucket=None).toPandas()
        assert len(uncapped) == 20 * 19 / 2

    def test_embedding_near_dups(self, spark):
        rng = np.random.default_rng(5)
        base = rng.standard_normal((20, 16)).astype(np.float32)
        vecs = list(base)
        vecs.append(base[3] + rng.standard_normal(16).astype(np.float32) * 0.01)
        pdf = pd.DataFrame(
            {"vec_id": list(range(21)), "embedding": [v.tolist() for v in vecs]}
        )
        df = spark.createDataFrame(pdf)
        pairs = dedup.embedding_near_dups(df, threshold=0.98).toPandas()
        found = {tuple(sorted((a, b))) for a, b in zip(pairs.id_a, pairs.id_b)}
        assert (3, 20) in found


class TestText:
    def test_lang_id(self, spark, docs):
        out = text.with_lang_id(docs).toPandas().set_index("doc_id")["lang_guess"]
        assert out[0] == "en" and out[3] == "de" and out[4] == "fr"
        ja = spark.createDataFrame(pd.DataFrame({"doc_id": [9], "text": ["これは日本語の文です"]}))
        assert text.with_lang_id(ja).collect()[0]["lang_guess"] == "ja"

    def test_quality_score(self, spark, docs):
        out = text.quality_score(docs).toPandas().set_index("doc_id")
        assert out.loc[2, "quality_score"] < out.loc[0, "quality_score"]
        assert out.loc[2, "digit_ratio"] > 0
        assert (out["n_tokens"] > 0).all()

    def test_token_count(self, spark, docs):
        out = text.token_count(docs).toPandas().set_index("doc_id")
        t0 = "the quick brown fox jumps over the lazy dog near the river bank"
        assert out.loc[0, "ws_tokens"] == len(t0.split())
        assert out.loc[0, "approx_bpe_tokens"] == int(np.ceil(len(t0) / 4))

    def test_fingerprint_stability(self, spark, docs):
        out = text.fingerprint(docs).toPandas().set_index("doc_id")["fingerprint"]
        assert out[1] == out[102]  # identical text → identical fingerprint
        assert out[0] != out[1]


class TestRepetition:
    def test_repetition_metrics_planted(self, spark):
        """Planted extremes: a looping doc scores 1.0 on both signals,
        an all-distinct doc scores 0.0 dup fraction, and a half-looped
        doc gets the exact hand-computed fractions."""
        rows = [
            (0, "spam spam spam spam spam spam"),
            (1, "one two three four five six seven"),
            # 3-grams: [a b a], [b a b], [a b c], [b c d] — the first
            # two are unique, so only exact repeats count
            (2, "a b a b c d"),
        ]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"])
        )
        out = (
            text.repetition_metrics(df)
            .toPandas()
            .set_index("doc_id")
        )
        assert out.loc[0, "dup_ngram_frac"] == 1.0
        assert out.loc[0, "top_bigram_frac"] == 1.0
        assert out.loc[1, "dup_ngram_frac"] == 0.0
        # 7 tokens -> 6 bigrams, all distinct -> top fraction 1/6
        assert out.loc[1, "top_bigram_frac"] == pytest.approx(
            round(1 / 6, 6)
        )
        # doc 2: 3-grams all distinct -> 0.0; bigrams of "a b a b c d"
        # = [a b, b a, a b, b c, c d]: "a b" twice of 5 -> 0.4
        assert out.loc[2, "dup_ngram_frac"] == 0.0
        assert out.loc[2, "top_bigram_frac"] == 0.4


class TestDecontaminate:
    def test_decontaminate_planted(self, spark):
        """Planted overlap: doc 10 shares one 3-gram with bench doc 0,
        doc 11 shares 3-grams with BOTH bench docs, doc 12 shares none
        (and must not appear), doc 13 repeats the same matched gram —
        matched_grams counts DISTINCT grams."""
        corpus = spark.createDataFrame(
            pd.DataFrame(
                [
                    (10, "the quick brown fox sleeps"),
                    (11, "the quick brown cat and lazy dog barks"),
                    (12, "entirely different words here"),
                    (13, "lazy dog barks lazy dog barks"),
                ],
                columns=["doc_id", "text"],
            )
        )
        bench = spark.createDataFrame(
            pd.DataFrame(
                [
                    (0, "the quick brown fox jumps"),
                    (1, "a lazy dog barks loudly"),
                ],
                columns=["doc_id", "text"],
            )
        )
        out = (
            text.decontaminate(corpus, bench, n=3)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert sorted(out.index) == [10, 11, 13]
        # doc 10: "the quick brown" + "quick brown fox" hit bench 0
        assert out.loc[10, "matched_grams"] == 2
        assert out.loc[10, "bench_docs"] == 1
        # doc 11: "the quick brown" (bench 0) + "lazy dog barks" (bench 1)
        assert out.loc[11, "matched_grams"] == 2
        assert out.loc[11, "bench_docs"] == 2
        # doc 13: "lazy dog barks" appears twice but is ONE distinct gram
        assert out.loc[13, "matched_grams"] == 1
        assert out.loc[13, "bench_docs"] == 1

    def test_decontaminate_min_overlap(self, spark):
        corpus = spark.createDataFrame(
            pd.DataFrame(
                [(10, "the quick brown fox sleeps")],
                columns=["doc_id", "text"],
            )
        )
        bench = spark.createDataFrame(
            pd.DataFrame(
                [(0, "the quick brown fox jumps")],
                columns=["doc_id", "text"],
            )
        )
        hits = text.decontaminate(corpus, bench, n=3, min_overlap=3)
        assert hits.count() == 0  # only 2 shared grams < 3


class TestLmQuality:
    def test_lm_quality_hand_computed(self, spark):
        """3-doc corpus, closed-form unigram LM: 'a' appears 3x, 'b'
        2x, 'c' 1x (N=6, V=3, alpha=0.5 -> denom 7.5). Doc NLLs equal
        the hand-computed mean -log p; the all-common doc scores
        better (lower) than the rare-token doc."""
        import math

        corpus = spark.createDataFrame(
            pd.DataFrame(
                [(1, "a a b"), (2, "a b c")],
                columns=["doc_id", "text"],
            )
        )
        from ksj2gp_spark.operators.text import lm_quality

        out = (
            lm_quality(corpus)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        pa = math.log(3.5 / 7.5)
        pb = math.log(2.5 / 7.5)
        pc = math.log(1.5 / 7.5)
        assert out.loc[1, "n_tokens"] == 3
        assert out.loc[2, "n_tokens"] == 3
        assert out.loc[1, "nll"] == round(-(2 * pa + pb) / 3, 6)
        assert out.loc[2, "nll"] == round(-(pa + pb + pc) / 3, 6)
        assert out.loc[1, "nll"] < out.loc[2, "nll"]


class TestDsirScore:
    def test_dsir_hand_computed(self, spark):
        """Two docs, target = 'wiki': counts a(ct=2,cr=1) b(1,0)
        c(0,1); Nt=3 Nr=2 V=3 -> denom_t=4.5, denom_r=3.5. Per-doc
        mean log ratios equal the closed form, and the target-looking
        doc scores HIGHER."""
        import math

        corpus = spark.createDataFrame(
            pd.DataFrame(
                [(1, "wiki", "a a b"), (2, "web", "a c")],
                columns=["doc_id", "source", "text"],
            )
        )
        from ksj2gp_spark.operators.text import dsir_score

        out = (
            dsir_score(corpus, ["wiki"])
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        lr_a = math.log(2.5 / 4.5) - math.log(1.5 / 3.5)
        lr_b = math.log(1.5 / 4.5) - math.log(0.5 / 3.5)
        lr_c = math.log(0.5 / 4.5) - math.log(1.5 / 3.5)
        assert out.loc[1, "n_tokens"] == 3
        assert out.loc[2, "n_tokens"] == 2
        assert out.loc[1, "logratio"] == round((2 * lr_a + lr_b) / 3, 6)
        assert out.loc[2, "logratio"] == round((lr_a + lr_c) / 2, 6)
        assert out.loc[1, "logratio"] > out.loc[2, "logratio"]


class TestMixtureSample:
    def test_mixture_rates_and_kept_set(self, spark):
        """90 'big' docs + 10 'rare' docs, 10 tokens each: p=(0.9,
        0.1), alpha=0.5 -> q=(0.75, 0.25); budget 0.5 -> rate_big =
        0.5*0.75/0.9 = 5/12, rate_rare = min(1, 1.25) = 1 (the cap).
        The kept set equals a pure-Python replay of the portable hash
        threshold, and every rare doc survives."""
        rows = [(i, "big", " ".join(["t"] * 10)) for i in range(90)]
        rows += [
            (100 + i, "rare", " ".join(["u"] * 10)) for i in range(10)
        ]
        docs = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "source", "text"])
        )
        from ksj2gp_spark.operators.curate import mixture_sample

        kept = set(
            r.doc_id
            for r in mixture_sample(docs).select("doc_id").collect()
        )

        def bucket(key: int) -> int:
            m = (1 << 31) - 1
            return (key % m) * 2654435761 % (1 << 20)

        import math

        p_big, p_rare = 0.9, 0.1
        spow = math.pow(p_big, 0.5) + math.pow(p_rare, 0.5)
        t_big = math.floor(
            min(1.0, 0.5 * (math.pow(p_big, 0.5) / spow) / p_big)
            * (1 << 20)
        )
        expect = {i for i in range(90) if bucket(i) < t_big}
        expect |= set(range(100, 110))  # rate 1.0: every rare doc
        assert kept == expect
        assert 0 < len(kept & set(range(90))) < 90

    def test_mixture_alpha_one_is_plain_budget(self, spark):
        """alpha=1 makes q == p, so every source keeps exactly the
        budget fraction threshold."""
        rows = [(i, "a" if i % 2 else "b", "x y z") for i in range(40)]
        docs = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "source", "text"])
        )
        from ksj2gp_spark.operators.curate import mixture_sample

        kept = mixture_sample(docs, alpha=1.0, budget_frac=0.25)

        def bucket(key: int) -> int:
            m = (1 << 31) - 1
            return (key % m) * 2654435761 % (1 << 20)

        t = int(0.25 * (1 << 20))
        expect = {i for i in range(40) if bucket(i) < t}
        assert set(r.doc_id for r in kept.collect()) == expect


class TestPplBuckets:
    def test_ppl_tertile_buckets(self, spark, tmp_path):
        """9 docs, one lang, nll strictly increasing by planting ever
        rarer tokens: type-1 tertile ranks at n=9 are 3 and 7, so
        buckets split 3 head / 4 middle / 2 tail in nll order."""
        common = "the quick brown fox jumps over lazy dogs daily".split()
        rows = []
        for i in range(9):
            # doc i: 9 common tokens + i copies of its own rare token
            toks = common + [f"rare{i}"] * (i + 1)
            rows.append((i, "en", " ".join(toks)))
        pd.DataFrame(rows, columns=["doc_id", "lang", "text"]).to_parquet(
            tmp_path / "documents.parquet"
        )
        import __spark_entry__ as e

        out = (
            e.q_ppl_buckets(spark, str(tmp_path))
            .toPandas()
            .sort_values("nll")
            .reset_index(drop=True)
        )
        assert len(out) == 9
        assert list(out["bucket"]) == (
            ["head"] * 3 + ["middle"] * 4 + ["tail"] * 2
        )


class TestDuplicateSpans:
    def test_duplicate_spans_planted(self, spark):
        """Two docs share a 7-token run -> with k=5, positions 0..2 of
        the run are duplicated windows and merge into ONE maximal span
        of 7 tokens in each doc; a unique doc emits nothing."""
        shared = "alpha beta gamma delta epsilon zeta eta"
        corpus = spark.createDataFrame(
            pd.DataFrame(
                [
                    (1, shared + " unique tail one here now"),
                    (2, "other start words " + shared),
                    (3, "completely different text with no overlap at all"),
                ],
                columns=["doc_id", "text"],
            )
        )
        from ksj2gp_spark.operators.dedup import duplicate_spans

        out = (
            duplicate_spans(corpus, k=5)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert sorted(out.index) == [1, 2]
        # doc 1: run at tokens [0, 7)
        assert out.loc[1, "span_start"] == 0
        assert out.loc[1, "span_end"] == 7
        assert out.loc[1, "span_tokens"] == 7
        # doc 2: run starts after the 3 prefix tokens -> [3, 10)
        assert out.loc[2, "span_start"] == 3
        assert out.loc[2, "span_end"] == 10

    def test_duplicate_spans_within_doc_repeat(self, spark):
        """A k-gram repeated INSIDE one doc counts (corpus-wide
        occurrence count, Lee et al. semantics), and two separated
        duplicated regions stay two spans."""
        # k=3 gram "x y z" appears twice in the same doc, separated by
        # unique filler so the two hits cannot merge
        doc = "x y z a1 b1 c1 d1 x y z"
        corpus = spark.createDataFrame(
            pd.DataFrame([(1, doc)], columns=["doc_id", "text"])
        )
        from ksj2gp_spark.operators.dedup import duplicate_spans

        out = (
            duplicate_spans(corpus, k=3)
            .toPandas()
            .sort_values("span_start")
            .reset_index(drop=True)
        )
        assert len(out) == 2
        assert (
            out.loc[0, "span_start"],
            out.loc[0, "span_end"],
        ) == (0, 3)
        assert (
            out.loc[1, "span_start"],
            out.loc[1, "span_end"],
        ) == (7, 10)

    def test_duplicate_spans_short_docs_skipped(self, spark):
        """Docs shorter than k tokens produce no windows (and no
        descending-sequence crash)."""
        corpus = spark.createDataFrame(
            pd.DataFrame(
                [(1, "too short"), (2, "also tiny")],
                columns=["doc_id", "text"],
            )
        )
        from ksj2gp_spark.operators.dedup import duplicate_spans

        assert duplicate_spans(corpus, k=5).count() == 0


class TestImageOps:
    @pytest.fixture(scope="class")
    def images(self, spark):
        from ksj2gp_spark import fixtures

        return fixtures.images_df(spark, 300, with_bytes=True).cache()

    def test_decode_verify_all_pass(self, spark, images):
        out = img_ops.decode_verify(images).toPandas()
        assert len(out) == 300
        assert out["decode_error"].isna().all()
        assert out["w_ok"].all() and out["h_ok"].all()
        assert out["phash_match"].all()

    def test_psnr_invariant_and_caption_equality(self, spark, images):
        """The input_hint per-row invariant: decoded pixels vs the
        deterministic reference generator; captions exact."""

        def ref(image_id, h, w):
            return imagecodec.make_test_image(int(image_id[3:]), h, w)

        out = img_ops.psnr_vs_reference(images, ref).toPandas()
        assert out["passes_40db"].all()
        png_rows = out.merge(
            images.select("image_id", "fmt").toPandas(), on="image_id"
        )
        assert png_rows.loc[png_rows.fmt == "png", "lossless"].all()
        assert not png_rows.loc[png_rows.fmt == "jpeg", "lossless"].any()
        # caption equality vs regeneration
        cap = images.select("image_id", "caption").toPandas()
        import numpy as np

        from ksj2gp_spark import fixtures

        ids = np.array([int(s[3:]) for s in cap["image_id"]], dtype=np.int64)
        expected = fixtures.images_pdf(ids, with_bytes=False)["caption"]
        assert (cap["caption"].to_numpy() == expected.to_numpy()).all()

    def test_decode_error_lane(self, spark):
        pdf = pd.DataFrame(
            {
                "image_id": ["bad1"],
                "bytes": [b"\xff\xd8\xffnot-a-real-format"],
                "w": np.array([8], dtype=np.int32),
                "h": np.array([8], dtype=np.int32),
                "fmt": ["jpeg"],
                "caption": ["x"],
                "phash": np.array([0], dtype=np.int64),
            }
        )
        df = spark.createDataFrame(pdf)
        out = img_ops.decode_verify(df).toPandas()
        assert out.loc[0, "decode_error"] is not None
        assert "JpegError" in out.loc[0, "decode_error"]

    def test_resize(self, spark, images):
        out = img_ops.resize_images(images.limit(20), 4, 4).toPandas()
        assert (out["w"] == 4).all() and (out["h"] == 4).all()
        arr = imagecodec.decode_image(out.loc[0, "bytes"], "png")
        assert arr.shape[:2] == (4, 4)

    def test_phash_near_dups_on_quantized_pair(self, spark):
        from ksj2gp_spark import fixtures

        arr = imagecodec.make_test_image(42, 32, 32)
        rows = [
            ("a", imagecodec.encode_image(arr, "png"), "png"),
            ("b", imagecodec.encode_image(arr, "jpeg"), "jpeg"),
        ]
        pdf = pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])
        pdf["phash"] = [
            imagecodec.phash64(imagecodec.decode_image(b, f))
            for b, f in zip(pdf["bytes"], pdf["fmt"])
        ]
        del fixtures
        df = spark.createDataFrame(pdf)
        near = img_ops.phash_near_dups(df).toPandas()
        assert len(near) == 1
        assert near.loc[0, "hamming"] <= 4

    @pytest.fixture(scope="class")
    def phash_sets(self, spark):
        """corpus of 200 well-separated phashes + a new batch of 30:
        ids < 20 are hamming-2 twins of corpus images, the rest are
        far from everything."""
        corpus = spark.range(200).select(
            F.concat(F.lit("c"), F.col("id").cast("string")).alias(
                "image_id"
            ),
            (F.col("id") * F.lit(2654435761)).alias("phash"),
        )
        new = spark.range(30).select(
            F.concat(F.lit("n"), F.col("id").cast("string")).alias(
                "image_id"
            ),
            F.when(
                F.col("id") < 20,
                (F.col("id") * F.lit(2654435761)).bitwiseXOR(F.lit(3)),
            )
            .otherwise((F.col("id") + 5000) * F.lit(2654435761))
            .alias("phash"),
        )
        return new, corpus

    def test_phash_incremental_equals_cross_set_subset(
        self, spark, phash_sets
    ):
        """new-vs-corpus pairs must be exactly the cross-set subset of
        the full same-set run, with identical hamming values."""
        new, corpus = phash_sets
        inc = img_ops.phash_near_dups_incremental(new, corpus).toPandas()
        full = img_ops.phash_near_dups(
            new.unionByName(corpus)
        ).toPandas()
        expect = {}
        for a, b, hm in zip(full.image_a, full.image_b, full.hamming):
            if a.startswith("n") != b.startswith("n"):
                n_, c_ = (a, b) if a.startswith("n") else (b, a)
                expect[(n_, c_)] = hm
        got = {
            (n_, c_): hm
            for n_, c_, hm in zip(inc.new_id, inc.corpus_id, inc.hamming)
        }
        assert got == expect
        assert len(got) >= 20  # every planted twin found

    def test_phash_incremental_accepts_prebuilt_index(
        self, spark, phash_sets
    ):
        new, corpus = phash_sets
        banded = img_ops.phash_banded(corpus)
        via_raw = (
            img_ops.phash_near_dups_incremental(new, corpus)
            .toPandas()
            .sort_values(["new_id", "corpus_id"])
            .reset_index(drop=True)
        )
        via_index = (
            img_ops.phash_near_dups_incremental(new, banded)
            .toPandas()
            .sort_values(["new_id", "corpus_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(via_raw, via_index)

    def test_phash_incremental_corpus_never_shuffles(
        self, spark, phash_sets
    ):
        """Scale contract: broadcast joins only — no SortMergeJoin
        (which would shuffle the 10^12-row index side)."""
        new, corpus = phash_sets
        plan = (
            img_ops.phash_near_dups_incremental(new, corpus)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" in plan


def test_codelist_join_matches_expr(spark):
    """Broadcast-join codelist form ≡ create_map literal form, incl.
    pass-through on miss, null stays null, numeric {v:.0} keys."""
    import pandas as pd

    from pyspark.sql import functions as F, types as T

    from ksj2gp_spark.operators.translate import codelist_expr, codelist_join

    mapping = {str(i): f"label_{i}" for i in range(0, 2000, 2)}  # evens only
    pdf = pd.DataFrame({
        "id": range(6),
        "code": [0.0, 3.0, 1998.0, 2001.0, None, 2.5],
    })
    df = spark.createDataFrame(pdf)
    via_expr = (
        df.select(
            "id",
            codelist_expr(F.col("code"), T.DoubleType(), mapping).alias("label"),
        )
        .toPandas()
        .sort_values("id")["label"]
        .tolist()
    )
    via_join = (
        codelist_join(df, "code", mapping, out_col="label")
        .select("id", "label")
        .toPandas()
        .sort_values("id")["label"]
        .tolist()
    )
    assert via_expr == via_join
    # evens translated, odds passed through, null stays null,
    # 2.5 rounds half-even to 2 → translated
    assert via_join[0] == "label_0" and via_join[1] == "3"
    assert via_join[2] == "label_1998" and via_join[3] == "2001"
    assert via_join[4] is None and via_join[5] == "label_2"


def test_l03bc_cross_column_dispatch(spark):
    """The cross-column land-use dispatch the reference TODOs away
    (codelists.rs:50-56): urban rows use the detail table, others the
    base table, per row."""
    import pandas as pd

    from ksj2gp_spark.operators.translate import translate_l03bc

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "L03b_c_002": ["0701", "0701", "0700", "0700", None],
                "L03b_c_004": ["1", "0", "1", "0", "1"],
            }
        )
    )
    out = (
        translate_l03bc(df)
        .toPandas()
        .itertuples(index=False, name=None)
    )
    got = list(out)
    # urban 0701 → 高層建物 (only in the -u table); non-urban 0701 has
    # no base-table entry → pass-through. 0700: urban "-" vs base 建物用地.
    assert got == [
        ("高層建物", "1"),
        ("0701", "0"),
        ("-", "1"),
        ("建物用地", "0"),
        (None, "1"),
    ]


class TestCuration:
    def test_curate_corpus_ledger_accounts_for_every_row(self, spark):
        """The ledger's stage counts chain (n_out[i] == n_in[i+1]) and
        every drop is attributed to exactly one stage."""
        rows = [
            (0, "the quick brown fox jumps over the lazy dog and runs far away"),
            (1, "the quick brown fox jumps over the lazy dog and runs far away"),   # exact dup of 0
            (2, "the quick brown fox jumps over the lazy dog and runs far home"),   # near dup of 0
            (3, "der schnelle braune fuchs springt über den faulen hund und der baum ist das"),  # de
            (4, "!!! ??? ,,, 111 222 333 444 555 the is of and !!!"),  # en junk
            (5, "a perfectly reasonable english sentence with the usual words and the length"),
        ]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        from ksj2gp_spark.operators.curate import curate_corpus

        kept, ledger = curate_corpus(
            df, langs=("en",), min_quality=0.5,
            minhash_threshold=0.5, with_ledger=True,
        )
        led = ledger.toPandas().set_index("stage")
        assert led.loc["0_input", "n_out"] == 6
        assert led.loc["1_exact_dedup", "n_out"] == 5   # doc 1 dropped
        assert led.loc["2_near_dedup", "n_out"] == 4    # doc 2 dropped
        assert led.loc["3_lang", "n_out"] == 3          # doc 3 dropped
        assert led.loc["4_quality", "n_out"] == 2       # doc 4 dropped
        # chained accounting
        stages = ["0_input", "1_exact_dedup", "2_near_dedup", "3_lang", "4_quality"]
        for a, b in zip(stages, stages[1:]):
            assert led.loc[a, "n_out"] == led.loc[b, "n_in"]
        ids = sorted(kept.toPandas()["doc_id"])
        assert ids == [0, 5]

    def test_curate_image_captions_stages_and_keep_best(self, spark):
        """Every stage drops exactly its planted rows, the ledger
        chains, and the phash keep-best keeps the highest-resolution
        member of a TRANSITIVE hamming chain a−b, b−c."""
        rows = [
            # (image_id, w, h, phash, caption) — non-cluster phashes are
            # pairwise ≥24 bits apart (single-bit values like 1<<40 would
            # all sit within hamming 4 of each other and merge everything)
            ("a", 10, 10, 0x0123456789ABCDEF, "a tall ship photo"),
            ("b", 10, 10, 0x7654321089ABCDEF, "a tall ship photo"),  # exact caption dup of a
            # hamming chain: c−d (2 bits), d−e (2 bits), c−e (2 bits);
            # d has the largest area and must be the cluster's keeper
            ("c", 10, 10, 0, "small harbor at dawn"),
            ("d", 12, 12, 3, "boats in the harbor"),
            ("e", 11, 11, 5, "harbor in the evening"),
            ("f", 10, 10, 0x0F0F0F0F0F0F0F0F, "short one"),          # 2 tokens → stage 3
            ("g", 4, 10, 0x00FF00FF00FF00FF, "a narrow strip image"),  # min dim → stage 4
            ("h", 20, 10, 0x3C3C3C3C3C3C3C3C, "a very wide banner image"),  # aspect → stage 4
            ("i", 10, 10, 0x5A5A5A5A5A5A5A5A, "a perfectly fine survivor"),
        ]
        df = spark.createDataFrame(
            pd.DataFrame(
                rows, columns=["image_id", "w", "h", "phash", "caption"]
            )
        )
        from ksj2gp_spark.operators.curate import curate_image_captions

        kept, ledger = curate_image_captions(
            df,
            min_caption_tokens=3,
            min_dim=5,
            max_aspect=1.5,
            with_ledger=True,
        )
        led = ledger.toPandas().set_index("stage")
        assert led.loc["0_input", "n_out"] == 9
        assert led.loc["1_caption_dedup", "n_out"] == 8   # b dropped
        assert led.loc["2_phash_keep_best", "n_out"] == 6  # c, e dropped
        assert led.loc["3_caption_length", "n_out"] == 5   # f dropped
        assert led.loc["4_geometry", "n_out"] == 3         # g, h dropped
        stages = [
            "0_input", "1_caption_dedup", "2_phash_keep_best",
            "3_caption_length", "4_geometry",
        ]
        for s_a, s_b in zip(stages, stages[1:]):
            assert led.loc[s_a, "n_out"] == led.loc[s_b, "n_in"]
        out = kept.toPandas().set_index("image_id")
        assert sorted(out.index) == ["a", "d", "i"]
        # d kept as the best of the transitive cluster {c, d, e}
        assert out.loc["d", "component"] == "c"
        assert out.loc["d", "csize"] == 3
        assert out.loc["i", "csize"] == 1  # singleton passes through

    def test_dedup_keep_best_keeps_best_of_transitive_cluster(self, spark):
        """A chain cluster a−b, b−c must keep its single BEST member —
        here the middle doc, which the pairwise drop in curate_corpus
        would discard — and singletons pass through with csize 1."""
        base = "the quick brown fox jumps over the lazy dog and runs"
        rows = [
            (10, base + " far away"),                   # cluster, short
            (11, base + " far away tonight and then some more words"),  # BEST
            (12, base + " far away tonight"),           # cluster, mid
            (20, "a completely different unrelated sentence about spark plans"),
        ]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"])
        )
        from ksj2gp_spark.operators.curate import dedup_keep_best

        kept = dedup_keep_best(df, minhash_threshold=0.3).toPandas()
        got = {
            int(r["doc_id"]): (int(r["component"]), int(r["csize"]))
            for _, r in kept.iterrows()
        }
        assert set(got) == {11, 20}
        assert got[11] == (10, 3)   # cluster id = min member, size 3
        assert got[20] == (20, 1)   # singleton keeps itself

    def test_curate_corpus_leaves_no_cached_frames(self, spark):
        """Cache hygiene: running the composed pipeline must not leak
        persisted DataFrames into the session (a long-running curation
        service would accumulate storage pressure otherwise)."""
        before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
        df = spark.createDataFrame(
            [(i, f"doc number {i} with some shared words here") for i in range(50)],
            "doc_id long, text string",
        )
        from ksj2gp_spark.operators.curate import curate_corpus

        kept, _ = curate_corpus(df, langs=("en", "unknown"))
        kept.count()
        after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
        assert after - before == set(), "curate_corpus leaked cached RDDs"


class TestPacking:
    """pack.py: sequence packing prefix sum + aspect-bucketed batches."""

    def test_pack_sequences_matches_serial_prefix_sum(self, spark):
        """The distributed (range-partition + offsets) prefix sum must
        equal the serial exclusive cumsum for every row, across a
        partition count that forces multiple offset shifts."""
        import numpy as np

        rng = np.random.RandomState(7)
        n = 2_000
        toks = rng.randint(1, 900, size=n)
        pdf = pd.DataFrame({"doc_id": np.arange(n), "n_tokens": toks})
        df = spark.createDataFrame(pdf)
        from ksj2gp_spark.operators.pack import pack_sequences

        out = (
            pack_sequences(df, budget=4096, num_partitions=7)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        expected_start = np.concatenate([[0], np.cumsum(toks)[:-1]])
        assert (out["start_pos"].to_numpy() == expected_start).all()
        assert (out["seq_id"].to_numpy() == expected_start // 4096).all()
        assert (out["seq_off"].to_numpy() == expected_start % 4096).all()
        # stream is gapless: last doc's start + tokens == total
        assert out["start_pos"].iloc[-1] + toks[-1] == toks.sum()
        # scale contract: the assignment pass reads the persisted
        # partitioning (no second shuffle of the full table — the only
        # exchange lives inside the cache-build lineage), and nothing
        # hash-partitions or single-partitions the data
        plan = (
            pack_sequences(df, budget=4096, num_partitions=7)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "InMemoryTableScan" in plan
        assert plan.split("InMemoryRelation")[0].count("Exchange") == 0
        assert "Exchange hashpartitioning" not in plan
        assert "Exchange SinglePartition" not in plan

    def test_pack_sequences_cache_hygiene_handle(self, spark):
        """The operator persists the range-partitioned frame by
        necessity (both passes must read ONE materialized layout —
        range boundaries re-sample per action); the persist is exposed
        on the result and unpersisting AFTER materialization leaves no
        cached frames behind."""
        before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(500), "n_tokens": [9] * 500})
        )
        from ksj2gp_spark.operators.pack import pack_sequences

        out = pack_sequences(df, budget=64, num_partitions=4)
        got = out.toPandas()
        assert len(got) == 500
        out._pack_source.unpersist(blocking=True)
        after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
        assert after - before == set(), "pack_sequences leaked cached RDDs"

    def test_pack_sequences_doc_spans_chunks(self, spark):
        """A doc longer than the budget belongs to the chunk where it
        STARTS (concat-and-chunk semantics), and later docs land after
        it, not inside it."""
        df = spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": [1, 2, 3], "n_tokens": [10, 250, 10]}
            )
        )
        from ksj2gp_spark.operators.pack import pack_sequences

        out = (
            pack_sequences(df, budget=100, num_partitions=2)
            .toPandas()
            .set_index("doc_id")
        )
        assert out.loc[1, "seq_id"] == 0
        assert out.loc[2, "seq_id"] == 0 and out.loc[2, "seq_off"] == 10
        # doc 2 occupies the stream through position 259
        assert out.loc[3, "start_pos"] == 260 and out.loc[3, "seq_id"] == 2

    def test_pack_sequences_rejects_bad_budget(self, spark):
        from ksj2gp_spark.operators.pack import pack_sequences

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "n_tokens": [5]})
        )
        with pytest.raises(ValueError):
            pack_sequences(df, budget=0)

    def test_select_under_budget_greedy_prefix(self, spark):
        """Selection = the maximal prefix of (score desc, id asc) whose
        cumulative tokens fit: the first doc that overflows is dropped
        AND nothing after it sneaks in, even a doc that would fit."""
        pdf = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "n_tokens": [40, 50, 30, 5, 100],
                "score": [9, 8, 7, 6, 5],
            }
        )
        df = spark.createDataFrame(pdf)
        from ksj2gp_spark.operators.pack import select_under_budget

        out = (
            select_under_budget(df, budget=100, num_partitions=3)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        # 40 + 50 = 90 fits; doc 3 (cum 120) overflows; doc 4 (5
        # tokens) WOULD fit but is after the cut — prefix, not knapsack
        assert sorted(out.index) == [1, 2]
        assert out.loc[1, "start_pos"] == 0
        assert out.loc[2, "start_pos"] == 40

    def test_select_under_budget_ties_and_exact_fit(self, spark):
        """Score ties break by doc_id ascending; a doc ending exactly
        at the budget is kept (start_pos + tokens <= budget)."""
        pdf = pd.DataFrame(
            {
                "doc_id": [10, 11, 12],
                "n_tokens": [60, 40, 1],
                "score": [5, 5, 5],
            }
        )
        df = spark.createDataFrame(pdf)
        from ksj2gp_spark.operators.pack import select_under_budget

        out = (
            select_under_budget(df, budget=100, num_partitions=2)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert sorted(out.index) == [10, 11]  # 60+40 == budget exactly
        assert out.loc[11, "start_pos"] == 60

    def test_select_under_budget_matches_serial(self, spark):
        """Random corpus: distributed selection equals the serial
        sort-and-cumsum selection row for row."""
        import numpy as np

        rng = np.random.RandomState(11)
        n = 1_500
        pdf = pd.DataFrame(
            {
                "doc_id": np.arange(n),
                "n_tokens": rng.randint(1, 500, size=n),
                "score": rng.randint(0, 50, size=n),  # many ties
            }
        )
        budget = 60_000
        ref = pdf.sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        cum = ref["n_tokens"].cumsum()
        want = set(ref.loc[cum <= budget, "doc_id"])
        df = spark.createDataFrame(pdf)
        from ksj2gp_spark.operators.pack import select_under_budget

        out = select_under_budget(
            df, budget=budget, num_partitions=7
        ).toPandas()
        assert set(out["doc_id"]) == want
        # start_pos is the serial exclusive cumsum over the kept prefix
        got = out.sort_values("start_pos")["n_tokens"].to_numpy()
        starts = out.sort_values("start_pos")["start_pos"].to_numpy()
        assert starts[0] == 0
        assert (starts[1:] == starts[:-1] + got[:-1]).all()

    def test_bucket_batches_boundaries_and_sizes(self, spark):
        """Exact-ratio images (w/h == 3/4 or 4/3) are square (strict
        inequalities); every batch is full except at most one trailing
        partial per (bucket, shard); drop_incomplete keeps only full
        batches."""
        rows = []
        for i in range(400):
            if i % 3 == 0:
                w, h = 30, 40  # exactly 3/4 -> square (boundary)
            elif i % 3 == 1:
                w, h = 20, 41  # portrait
            else:
                w, h = 41, 20  # landscape
            rows.append((f"im{i:05d}", w, h, i))
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["image_id", "w", "h", "seq"])
        )
        from ksj2gp_spark.operators.curate import mix_bucket
        from ksj2gp_spark.operators.pack import bucket_batches

        out = bucket_batches(
            df,
            batch_size=8,
            n_shards=3,
            shard_key=F.pmod(mix_bucket(F.col("seq")), F.lit(3)),
        ).toPandas()
        assert set(out["bucket"]) == {"square", "portrait", "landscape"}
        assert (out[out["w"] == 30]["bucket"] == "square").all()
        # per (bucket, shard): all batches full except possibly the last
        for (_, _), g in out.groupby(["bucket", "shard"]):
            sizes = g.groupby("batch_idx")["image_id"].count().sort_index()
            assert (sizes.iloc[:-1] == 8).all()
            assert sizes.iloc[-1] <= 8
            # batch indices are contiguous from 0
            assert list(sizes.index) == list(range(len(sizes)))
        full_only = bucket_batches(
            df,
            batch_size=8,
            n_shards=3,
            shard_key=F.pmod(mix_bucket(F.col("seq")), F.lit(3)),
            drop_incomplete=True,
        ).toPandas()
        assert (full_only["batch_n"] == 8).all()

    def test_bucket_batches_default_shard_handles_string_ids(self, spark):
        """Without an explicit shard_key the shard comes from xxhash64,
        which accepts any key type (mix_bucket needs numeric keys)."""
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "image_id": [f"s{i:03d}" for i in range(60)],
                    "w": [10] * 60,
                    "h": [10] * 60,
                }
            )
        )
        from ksj2gp_spark.operators.pack import bucket_batches

        out = bucket_batches(df, batch_size=4, n_shards=4).toPandas()
        assert out["shard"].between(0, 3).all()
        assert len(out) == 60
        for _, g in out.groupby(["bucket", "shard"]):
            sizes = g.groupby("batch_idx")["image_id"].count().sort_index()
            assert (sizes.iloc[:-1] == 4).all()

    def test_bucket_batches_shard_numbering_is_independent(self, spark):
        """Batch ids restart per shard — the property that keeps the
        window parallel when one bucket dominates the corpus."""
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "image_id": [f"i{i:04d}" for i in range(100)],
                    "w": [10] * 100,
                    "h": [10] * 100,
                    "seq": list(range(100)),
                }
            )
        )
        from ksj2gp_spark.operators.curate import mix_bucket
        from ksj2gp_spark.operators.pack import bucket_batches

        out = bucket_batches(
            df,
            batch_size=4,
            n_shards=5,
            shard_key=F.pmod(mix_bucket(F.col("seq")), F.lit(5)),
        ).toPandas()
        assert (out["bucket"] == "square").all()
        assert out["shard"].nunique() == 5
        for _, g in out.groupby("shard"):
            assert g["batch_idx"].min() == 0


class TestHashSplit:
    """Deterministic splits: stable under repartitioning/rerun, weights
    validated, per-stratum sampling honors thresholds exactly."""

    def _docs(self, spark, n=2000):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).cast("string").alias("stratum"),
        )

    def test_split_deterministic_and_partition_independent(self, spark):
        from ksj2gp_spark.operators.curate import hash_split

        d = self._docs(spark)
        a = hash_split(d, key="doc_id").toPandas()
        b = hash_split(d.repartition(13), key="doc_id").toPandas()
        a = a.sort_values("doc_id").reset_index(drop=True)
        b = b.sort_values("doc_id").reset_index(drop=True)
        assert (a["split"] == b["split"]).all()
        frac = (a["split"] == "train").mean()
        assert 0.95 < frac < 1.0  # ~0.98 default

    def test_split_weights_validated(self, spark):
        from ksj2gp_spark.operators.curate import hash_split

        with pytest.raises(ValueError, match="sum to 1"):
            hash_split(self._docs(spark), weights={"a": 0.5, "b": 0.4})

    def test_stratified_sample_exact_thresholds(self, spark):
        from ksj2gp_spark.operators.curate import (
            _SPLIT_MOD, mix_bucket, stratified_sample,
        )

        d = self._docs(spark)
        got = stratified_sample(
            d,
            "stratum",
            {"0": 0.5, "1": 0.0},
            bucket=mix_bucket("doc_id"),
            default_fraction=1.0,
        ).toPandas()
        # stratum 1 gone, stratum 2 complete, stratum 0 = exact bucket rule
        assert (got["stratum"] != "1").all()
        n2 = (got["stratum"] == "2").sum()
        assert n2 == 2000 // 3
        ids = np.arange(0, 2000, 3)  # stratum 0
        want0 = ((ids * 2654435761) % _SPLIT_MOD < _SPLIT_MOD // 2).sum()
        assert (got["stratum"] == "0").sum() == want0

    def test_sample_rerun_stable(self, spark):
        from ksj2gp_spark.operators.curate import stratified_sample

        d = self._docs(spark)
        s1 = set(
            stratified_sample(d, "stratum", {"0": 0.3, "1": 0.7, "2": 0.5})
            .toPandas()["doc_id"]
        )
        s2 = set(
            stratified_sample(
                d.repartition(7), "stratum", {"0": 0.3, "1": 0.7, "2": 0.5}
            ).toPandas()["doc_id"]
        )
        assert s1 == s2


class TestMixBucketRobustness:
    """mix_bucket must survive 64-bit and negative keys (ANSI-safe
    folds) and agree with its SQL spelling in DuckDB."""

    def test_large_and_negative_keys_match_duckdb(self, spark):
        import duckdb

        from ksj2gp_spark.operators.curate import mix_bucket, mix_bucket_sql

        keys = [
            0, 1, 2**31 - 2, 2**31, 2**40 + 123, 2**62, -1, -(2**35),
            9_223_372_036_854_775_807,
        ]
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        got = {
            r["k"]: r["b"]
            for r in df.select(
                "k", mix_bucket("k", 31, 7).alias("b")
            ).collect()
        }
        con = duckdb.connect()
        want = {
            r[0]: r[1]
            for r in con.sql(
                "SELECT k, "
                + mix_bucket_sql("k", 31, 7)
                + " AS b FROM (VALUES "
                + ", ".join(f"(CAST({k} AS BIGINT))" for k in keys)
                + ") t(k)"
            ).fetchall()
        }
        assert got == want
        assert all(0 <= b < 2**20 for b in got.values())


class TestLineDedup:
    def test_line_dedup_planted(self, spark):
        """Lines duplicated corpus-wide (including within one doc) are
        removed in EVERY occurrence; docs rebuild from surviving lines
        in order; an all-boilerplate doc survives with empty text."""
        corpus = spark.createDataFrame(
            pd.DataFrame(
                [
                    (1, "keep me\nshared one\nshared two"),
                    (2, "shared one\nonly here"),
                    (3, "shared two\nshared two"),
                ],
                columns=["doc_id", "text"],
            )
        )
        from ksj2gp_spark.operators.dedup import line_dedup

        rows = {
            r["doc_id"]: r
            for r in line_dedup(corpus, min_count=2).collect()
        }
        assert rows[1]["text"] == "keep me"
        assert (rows[1]["n_lines"], rows[1]["n_dropped"]) == (3, 2)
        assert rows[2]["text"] == "only here"
        assert (rows[2]["n_lines"], rows[2]["n_dropped"]) == (2, 1)
        assert rows[3]["text"] == ""
        assert (rows[3]["n_lines"], rows[3]["n_dropped"]) == (2, 2)

    def test_line_dedup_order_preserved(self, spark):
        """Surviving lines keep ORIGINAL order even when the dropped
        lines interleave them (the array_sort key is the position)."""
        corpus = spark.createDataFrame(
            pd.DataFrame(
                [
                    (1, "z last\ndup\na first\ndup\nm middle"),
                    (2, "dup"),
                ],
                columns=["doc_id", "text"],
            )
        )
        from ksj2gp_spark.operators.dedup import line_dedup

        rows = {
            r["doc_id"]: r
            for r in line_dedup(corpus, min_count=2).collect()
        }
        assert rows[1]["text"] == "z last\na first\nm middle"
        assert rows[1]["n_dropped"] == 2


class TestClassifierScore:
    def test_planted_lexicon_scores(self, spark):
        """sigmoid(bias + mean weight) with OOV tokens weighing 0 but
        counting in the mean; keep is a strict > threshold."""
        import math

        corpus = spark.createDataFrame(
            pd.DataFrame(
                [
                    (1, "good good noise"),
                    (2, "bad noise noise noise"),
                    (3, "noise other"),
                ],
                columns=["doc_id", "text"],
            )
        )
        from ksj2gp_spark.operators.text import classifier_score

        rows = {
            r["doc_id"]: r
            for r in classifier_score(
                corpus, {"good": 1.0, "bad": -1.0}, bias=0.0, threshold=0.5
            ).collect()
        }
        sig = lambda x: 1.0 / (1.0 + math.exp(-x))  # noqa: E731
        assert rows[1]["n_tokens"] == 3
        assert abs(rows[1]["score"] - round(sig(2.0 / 3.0), 6)) < 1e-9
        assert rows[1]["keep"] is True
        assert abs(rows[2]["score"] - round(sig(-0.25), 6)) < 1e-9
        assert rows[2]["keep"] is False
        # all-OOV doc sits exactly at sigmoid(0)=0.5: strict > drops it
        assert rows[3]["score"] == 0.5
        assert rows[3]["keep"] is False

    def test_no_python_udf_in_plan(self, spark):
        """The classifier is JVM expressions end-to-end — no
        BatchEvalPython/ArrowEvalPython node may appear."""
        corpus = spark.createDataFrame(
            pd.DataFrame([(1, "good")], columns=["doc_id", "text"])
        )
        from ksj2gp_spark.operators.text import classifier_score

        plan = classifier_score(
            corpus, {"good": 1.0}
        )._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


class TestDihedralPhash:
    def test_rotated_and_mirrored_copies_hash_equal(self, spark):
        """A rotated/flipped re-encode of an image produces the SAME
        canonical dihedral hash — exact, because orientations are pixel
        permutations enumerated from the decoded array."""
        import numpy as np
        from ksj2gp_spark.formats import imagecodec
        from ksj2gp_spark.operators.images import (
            dihedral_orientations,
            dihedral_phash,
        )

        arr = imagecodec.make_test_image(7, 12, 9)
        rows = [("img00000001", imagecodec.encode_image(arr, "png"), "png")]
        for o in range(8):
            g = dihedral_orientations(arr)[o]
            rows.append(
                (
                    f"img0000001{o}",
                    imagecodec.encode_image(g, "png"),
                    "png",
                )
            )
        df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
        out = {r["image_id"]: r["dihedral_phash"] for r in dihedral_phash(df).collect()}
        base = out["img00000001"]
        assert all(v == base for v in out.values())

    def test_jpeg_base_variant_matches_and_errors_quarantine(self, spark):
        """Lossy-decoded JPEG pixels, dihedral-permuted and PNG
        re-encoded, still hash-equal (permutation of the SAME decoded
        array); garbage bytes land in the error lane."""
        import numpy as np
        from ksj2gp_spark.formats import imagecodec
        from ksj2gp_spark.operators.images import (
            dihedral_orientations,
            dihedral_phash,
        )

        arr = imagecodec.make_test_image(3, 10, 14)
        jb = imagecodec.encode_image(arr, "jpeg")
        decoded = imagecodec.decode_image(jb, "jpeg")
        rot = dihedral_orientations(decoded)[3]
        rows = [
            ("img00000002", jb, "jpeg"),
            ("img00000002r", imagecodec.encode_image(rot, "png"), "png"),
            ("img00000bad", b"junk-bytes", "png"),
        ]
        df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
        out = {r["image_id"]: r for r in dihedral_phash(df).collect()}
        assert (
            out["img00000002"]["dihedral_phash"]
            == out["img00000002r"]["dihedral_phash"]
        )
        assert out["img00000bad"]["decode_error"] is not None

    def test_different_images_differ(self, spark):
        from ksj2gp_spark.formats import imagecodec
        from ksj2gp_spark.operators.images import dihedral_phash

        rows = [
            (
                f"img0000000{s}",
                imagecodec.encode_image(
                    imagecodec.make_test_image(s, 16, 16), "png"
                ),
                "png",
            )
            for s in (1, 2)
        ]
        df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
        out = [r["dihedral_phash"] for r in dihedral_phash(df).collect()]
        assert out[0] != out[1]


class TestBigramPmi:
    def test_hand_computed(self, spark):
        """'x y x y x y': bigrams (x,y)x3 (y,x)x2, N=5; PMI(x,y) =
        ln(3*5/(3*3)), PMI(y,x) = ln(2*5/(2*2))."""
        import math

        corpus = spark.createDataFrame(
            pd.DataFrame([(1, "x y x y x y")], columns=["doc_id", "text"])
        )
        from ksj2gp_spark.operators.text import bigram_pmi

        rows = {
            (r["tok_a"], r["tok_b"]): r
            for r in bigram_pmi(corpus, min_count=2).collect()
        }
        assert rows[("x", "y")]["n_ab"] == 3
        assert abs(rows[("x", "y")]["pmi"] - round(math.log(5.0 / 3.0), 6)) < 1e-9
        assert abs(rows[("y", "x")]["pmi"] - round(math.log(10.0 / 4.0), 6)) < 1e-9

    def test_min_count_and_single_token_docs(self, spark):
        corpus = spark.createDataFrame(
            pd.DataFrame(
                [(1, "a b"), (2, "a b"), (3, "c d"), (4, "solo")],
                columns=["doc_id", "text"],
            )
        )
        from ksj2gp_spark.operators.text import bigram_pmi

        out = bigram_pmi(corpus, min_count=2).collect()
        assert len(out) == 1 and (out[0]["tok_a"], out[0]["tok_b"]) == ("a", "b")


class TestLineDedupProperty:
    def test_matches_python_reference_on_planted_corpora(self, spark):
        """line_dedup == a 10-line pure-Python reference on a batch of
        deterministic pseudo-random corpora (drop-ALL-occurrences,
        rebuild in order, counts) — covers empty-survivor docs,
        within-doc repeats, and min_count variation."""
        import random

        from ksj2gp_spark.operators.dedup import line_dedup

        rng = random.Random(20260818)
        vocab = [f"l{k}" for k in range(12)]
        for trial, min_count in [(0, 2), (1, 2), (2, 3)]:
            docs = {
                d: "\n".join(
                    rng.choice(vocab)
                    for _ in range(rng.randint(1, 8))
                )
                for d in range(30)
            }
            from collections import Counter

            freq = Counter(
                ln for t in docs.values() for ln in t.split("\n")
            )
            expect = {}
            for d, t in docs.items():
                lines = t.split("\n")
                kept = [ln for ln in lines if freq[ln] < min_count]
                expect[d] = (
                    "\n".join(kept),
                    len(lines),
                    len(lines) - len(kept),
                )
            sdf = spark.createDataFrame(
                pd.DataFrame(
                    {"doc_id": list(docs), "text": list(docs.values())}
                )
            )
            got = {
                r["doc_id"]: (r["text"], r["n_lines"], r["n_dropped"])
                for r in line_dedup(sdf, min_count=min_count).collect()
            }
            assert got == expect, f"trial {trial}"


class TestSemDedupPartitionInvariance:
    def test_same_result_at_different_partition_counts(self, spark):
        """The keep/drop set must be identical under repartitioning —
        the order-free drop rule's contract."""
        from pyspark.sql import functions as F

        from ksj2gp_spark.operators.similarity import semdedup

        vecs = spark.range(64).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda i: (
                    F.when(i == F.col("vec_id") % 4, F.lit(1.0)).otherwise(
                        F.lit(0.0)
                    )
                    + ((F.col("vec_id") * 13 + i * 7) % 5 - 2).cast("double")
                    * 0.005
                ),
            ).alias("embedding"),
        )
        outs = []
        for parts in (1, 7):
            out = semdedup(
                vecs.repartition(parts), k=4, dim=8, threshold=0.997, n_iter=2
            )
            outs.append(
                sorted(
                    (r["vec_id"], r["cluster"], r["kept"])
                    for r in out.collect()
                )
            )
        assert outs[0] == outs[1]
        assert any(not k for (_, _, k) in outs[0])  # non-trivial drops


class TestGroupTrend:
    def test_exact_line_and_r2(self, spark):
        """Points on y=2x+1 give slope 2, intercept 1, r2=1; a noisy
        group gets the closed-form OLS values; constant-x groups drop."""
        corpus = spark.createDataFrame(
            pd.DataFrame(
                {
                    "g": ["a"] * 3 + ["b"] * 4 + ["c"] * 2,
                    "x": [0.0, 1.0, 2.0, 0.0, 1.0, 2.0, 3.0, 5.0, 5.0],
                    "y": [1.0, 3.0, 5.0, 0.0, 2.0, 1.0, 3.0, 7.0, 9.0],
                }
            )
        )
        from ksj2gp_spark.operators.stats import group_trend

        rows = {
            r["g"]: r
            for r in group_trend(corpus, "g", "x", "y").collect()
        }
        assert rows["a"]["slope"] == 2.0 and rows["a"]["intercept"] == 1.0
        assert rows["a"]["r2"] == 1.0
        # group b: n=4, sx=6, sy=6, sxy=13, sxx=14
        # -> slope = (4*13-36)/(4*14-36) = 16/20 = 0.8
        assert rows["b"]["slope"] == 0.8
        assert "c" not in rows  # zero x-variance dropped

    def test_constant_y_r2_is_one(self, spark):
        corpus = spark.createDataFrame(
            pd.DataFrame({"g": ["a"] * 3, "x": [0.0, 1.0, 2.0], "y": [5.0] * 3})
        )
        from ksj2gp_spark.operators.stats import group_trend

        r = group_trend(corpus, "g", "x", "y").collect()[0]
        assert r["slope"] == 0.0 and r["r2"] == 1.0


class TestTextrankKeywords:
    @staticmethod
    def _run(spark, texts, **kw):
        import pandas as pd
        from ksj2gp_spark.operators.text import textrank_keywords

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )
        return textrank_keywords(df, **kw).toPandas()

    def test_hub_token_ranks_first(self, spark):
        # 'hub' co-occurs with every spoke >=3x; spokes only with hub:
        # the star center must out-rank every spoke
        texts = ["hub a hub b hub c hub d"] * 3
        out = self._run(spark, texts, min_cooccur=3, top_n=10)
        assert out.iloc[0]["token"] == "hub"
        assert set(out["token"]) == {"hub", "a", "b", "c", "d"}
        # symmetric spokes tie -> ordered by token (deterministic cut)
        spokes = out[out.token != "hub"]
        assert list(spokes["token"]) == sorted(spokes["token"])
        assert spokes["rank"].nunique() == 1

    def test_rank_mass_conserves(self, spark):
        texts = ["a b a b c d c d"] * 4
        out = self._run(spark, texts, min_cooccur=2, top_n=100)
        assert abs(out["rank"].sum() - 1.0) < 1e-4

    def test_min_cooccur_prunes_rare_pairs(self, spark):
        texts = ["a b a b a b", "x y"]
        out = self._run(spark, texts, min_cooccur=2, top_n=10)
        assert set(out["token"]) == {"a", "b"}

    def test_top_n_cut(self, spark):
        texts = ["a b a b c d c d e f e f"] * 3
        out = self._run(spark, texts, min_cooccur=2, top_n=3)
        assert len(out) == 3
