"""IVF ANN tests: recall vs the exact brute-force baseline, and
determinism of the centroid fit across parallelism."""

import numpy as np
import pandas as pd
import pytest

from ksj2gp_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_ivf_recall_vs_bruteforce(spark, emb):
    exact = similarity.brute_force_topk(emb, k=5).cache()
    # These synthetic embeddings have weak cluster structure (pairwise
    # cosines < 0.52), the hard case for IVF: recall must still be
    # useful at nprobe=nlist/2, improve monotonically with nprobe, and
    # reach exactness at full probe.
    r4 = similarity.recall_at_k(
        exact, similarity.ivf_topk(emb, k=5, nlist=8, nprobe=4)
    )
    r6 = similarity.recall_at_k(
        exact, similarity.ivf_topk(emb, k=5, nlist=8, nprobe=6)
    )
    r8 = similarity.recall_at_k(
        exact, similarity.ivf_topk(emb, k=5, nlist=8, nprobe=8)
    )
    assert r4 >= 0.7, f"recall@nprobe4 {r4}"
    assert r4 <= r6 <= r8
    assert r8 == 1.0


def test_bruteforce_guard_trips_above_max_rows(spark, emb):
    # the O(n²) crossJoin lane must be opt-in: above max_rows it raises
    # and points at the IVF scale path instead of silently planning an
    # all-pairs join
    with pytest.raises(similarity.BruteForceScaleError, match="ivf_topk"):
        similarity.brute_force_topk(emb, k=5, max_rows=10)
    # explicit opt-in still works
    assert similarity.brute_force_topk(
        emb.limit(20), k=2, max_rows=None
    ).count() > 0


def test_centroids_deterministic(spark, emb):
    c1 = similarity.fit_centroids(emb, nlist=8)
    c2 = similarity.fit_centroids(emb.repartition(7), nlist=8)
    np.testing.assert_allclose(c1, c2)


def test_assign_lists_partition(spark, emb):
    cent = similarity.fit_centroids(emb, nlist=8)
    base = emb.selectExpr("vec_id", "cast(embedding as array<double>) as embedding")
    lists = similarity.assign_lists(base, cent).toPandas()
    assert lists["list_id"].between(0, 7).all()
    sizes = lists.groupby("list_id").size()
    assert len(sizes) >= 4  # vectors actually spread across lists


class TestKmeansLloyd:
    def test_recovers_planted_clusters(self, spark):
        import numpy as np
        import pandas as pd

        from ksj2gp_spark.operators.similarity import kmeans_lloyd

        rng = np.random.default_rng(3)
        k, per, dim = 4, 30, 8
        rows = []
        for c in range(k):
            center = np.zeros(dim)
            center[c] = 10.0
            for m in range(per):
                v = center + rng.normal(0, 0.05, dim)
                rows.append((c * per + m, [float(x) for x in v]))
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["vec_id", "embedding"])
        )
        # seeds: one vector from each planted cluster
        got = kmeans_lloyd(
            df, k=k, dim=dim, n_iter=3,
            init_ids=[0, per, 2 * per, 3 * per],
        ).toPandas()
        got["true"] = got["vec_id"] // per
        # cluster labels == seed order == planted order here
        assert (got["cluster"] == got["true"]).all()

    def test_bad_init_raises(self, spark):
        import pandas as pd

        from ksj2gp_spark.operators.similarity import kmeans_lloyd

        df = spark.createDataFrame(
            pd.DataFrame({"vec_id": [0], "embedding": [[1.0, 2.0]]})
        )
        import pytest as _pytest

        with _pytest.raises(ValueError, match="init_ids"):
            kmeans_lloyd(df, k=3, dim=2)


class TestKmeansEdgeCases:
    def test_init_order_preserved_and_nulls_skipped(self, spark):
        import pandas as pd

        from ksj2gp_spark.operators.similarity import kmeans_lloyd

        rows = pd.DataFrame(
            {
                "vec_id": [7, 42, 100, 101, 102],
                "embedding": [
                    [0.0, 10.0], [10.0, 0.0],
                    [9.9, 0.1], [0.1, 9.9], None,
                ],
            }
        )
        df = spark.createDataFrame(rows)
        got = {
            r["vec_id"]: r["cluster"]
            for r in kmeans_lloyd(
                df, k=2, dim=2, n_iter=2, init_ids=[42, 7]
            ).collect()
        }
        # cluster 0 seeded from vec 42 = (10, 0): members 42, 100
        assert got[42] == 0 and got[100] == 0
        assert got[7] == 1 and got[101] == 1
        assert got[102] is None  # null vector -> null cluster, no crash


def test_ivf_search_cross_set_exactness_and_index_path(spark, emb):
    """Cross-set retrieval: queries are near-copies of corpus rows, so
    the true top-1 is the source row; ivf_search must recover it, the
    prebuilt assign_lists index path must agree with the raw path, and
    the corpus side must never sort-merge-join."""
    from pyspark.sql import functions as F

    corpus = emb.select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 30).select(
        "vec_id",
        F.transform(
            F.col("embedding"), lambda x, i: x + 0.001 * ((i * 3) % 5 - 2)
        ).alias("embedding"),
    ).select((F.col("vec_id") + 10_000).alias("vec_id"), "embedding")

    got = similarity.ivf_search(
        queries, corpus, k=1, nlist=8, nprobe=4
    ).toPandas()
    assert len(got) == 30
    assert (got["neighbor_id"] == got["query_id"] - 10_000).all()
    assert (got["sim"] > 0.999).all()

    cent = similarity.fit_centroids(corpus, nlist=8)
    index = similarity.assign_lists(
        corpus.selectExpr(
            "vec_id", "cast(embedding as array<double>) as embedding"
        ),
        cent,
    )
    via_index = similarity.ivf_search(
        queries, index, k=1, nlist=8, nprobe=4, centroids=cent
    ).toPandas()
    pd.testing.assert_frame_equal(
        got.sort_values("query_id").reset_index(drop=True),
        via_index.sort_values("query_id").reset_index(drop=True),
    )
    with pytest.raises(ValueError, match="centroids"):
        similarity.ivf_search(queries, index, k=1)
    plan = (
        similarity.ivf_search(queries, corpus, k=1, nlist=8, nprobe=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


class TestHardNegatives:
    def test_exact_lane_planted(self, spark):
        """4 vectors, 2 labels: anchors must rank ONLY different-label
        vectors, ordered by cosine. v0=(1,0) A, v1=(0.9,0.1) A,
        v2=(1,0.01) B (nearly parallel to v0), v3=(0,1) B. v0's
        negatives are v2 (sim~1) then v3 (sim 0) — v1 (same label)
        never appears."""
        rows = [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),
            (2, [1.0, 0.01], 1),
            (3, [0.0, 1.0], 1),
        ]
        df = spark.createDataFrame(
            rows, "vec_id int, embedding array<double>, label int"
        )
        out = similarity.hard_negatives(df, k=2).toPandas()
        v0 = out[out.vec_id == 0].sort_values("rank")
        assert list(v0.neighbor_id) == [2, 3]
        # same-label pairs are never emitted
        merged = out.merge(
            pd.DataFrame(rows, columns=["vec_id", "e", "label"])[
                ["vec_id", "label"]
            ],
            on="vec_id",
        ).merge(
            pd.DataFrame(rows, columns=["neighbor_id", "e", "nlabel"])[
                ["neighbor_id", "nlabel"]
            ],
            on="neighbor_id",
        )
        assert (merged.label != merged.nlabel).all()

    def test_ivf_lane_recall_and_label_purity(self, spark, emb):
        exact = similarity.hard_negatives(emb, k=5).cache()
        approx = similarity.hard_negatives(
            emb, k=5, use_ivf=True, nlist=8, nprobe=8
        )
        # full probe == exact (every list searched, label filter equal)
        assert similarity.recall_at_k(exact, approx) == 1.0
        r4 = similarity.recall_at_k(
            exact,
            similarity.hard_negatives(
                emb, k=5, use_ivf=True, nlist=8, nprobe=4
            ),
        )
        assert r4 >= 0.7, f"recall@nprobe4 {r4}"

    def test_exact_guard_trips(self, spark, emb):
        with pytest.raises(similarity.BruteForceScaleError, match="use_ivf"):
            similarity.hard_negatives(emb, k=5, max_rows=10)


class TestSemDedup:
    def test_planted_clusters_keep_min_id(self, spark):
        """Exact/near duplicates inside a cluster drop in favor of the
        lowest id; members below the threshold survive; cluster labels
        follow the seed order (n_iter=1 pins assignment to the seeds)."""
        import pandas as pd

        vecs = pd.DataFrame(
            {
                "vec_id": [0, 1, 2, 3, 4, 5],
                "embedding": [
                    [1.0, 0.0, 0.0, 0.0],   # seed cluster 0
                    [0.0, 1.0, 0.0, 0.0],   # seed cluster 1
                    [1.0, 0.0, 0.0, 0.0],   # exact dup of 0 -> dropped
                    [0.0, 1.0, 0.01, 0.0],  # near dup of 1 -> dropped
                    [0.9, 0.1, 0.0, 0.0],   # cluster 0, cos~0.9939 < tau
                    [0.1, 0.9, 0.0, 0.0],   # cluster 1, cos~0.9939 < tau
                ],
            }
        )
        from ksj2gp_spark.operators.similarity import semdedup

        out = {
            r["vec_id"]: r
            for r in semdedup(
                spark.createDataFrame(vecs), k=2, dim=4,
                threshold=0.999, n_iter=1,
            ).collect()
        }
        assert {v: out[v]["cluster"] for v in out} == {
            0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1,
        }
        assert {v for v in out if out[v]["kept"]} == {0, 1, 4, 5}

    def test_drop_rule_is_order_free(self, spark):
        """b drops because of a even when a itself drops because of an
        earlier c: a chain c<a<b of pairwise near-dups keeps ONLY c."""
        import pandas as pd

        vecs = pd.DataFrame(
            {
                "vec_id": [0, 1, 10, 11, 12],
                "embedding": [
                    [1.0, 0.0, 0.0, 0.0],
                    [0.0, 1.0, 0.0, 0.0],
                    [1.0, 0.001, 0.0, 0.0],
                    [1.0, 0.002, 0.0, 0.0],
                    [1.0, 0.003, 0.0, 0.0],
                ],
            }
        )
        from ksj2gp_spark.operators.similarity import semdedup

        out = {
            r["vec_id"]: r["kept"]
            for r in semdedup(
                spark.createDataFrame(vecs), k=2, dim=4,
                threshold=0.999, n_iter=1,
            ).collect()
        }
        assert out == {0: True, 1: True, 10: False, 11: False, 12: False}
