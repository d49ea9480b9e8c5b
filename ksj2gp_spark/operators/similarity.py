"""Similarity search over embedding columns (array<float>).

Two lanes (SURVEY training-data mandate):

* ``brute_force_topk`` — exact cosine top-k via JVM-side
  ``zip_with``/``aggregate`` expressions (the correctness baseline; the
  contract query ``similarity_topk`` uses this shape).
* ``ivf_topk`` — the scale path: an IVF (inverted-file) index. Centroids
  are fit driver-side on a deterministic sample (k-means with fixed
  seeding — the sample is small even when the table is not), broadcast,
  and each vector is assigned to its nearest centroid in a vectorized
  pandas UDF. Queries search only the ``nprobe`` nearest inverted lists,
  so the pair join is per-list instead of all-pairs:
  cost O(n·k·d) fit + O(n·d·k/nlist·nprobe) search vs O(n²·d) brute.

At cluster scale the assignment and search are both single map passes
over the embedding table; only the (tiny) centroid matrix is broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda a, v: a + v
    )


class BruteForceScaleError(ValueError):
    """The all-pairs lane was pointed at a table too large for O(n²)."""


def brute_force_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Exact cosine top-k neighbors for every vector (all-pairs).

    This is the correctness BASELINE: an explicit crossJoin whose cost
    is O(n²·d). To keep the quadratic plan opt-in, the input cardinality
    is checked against ``max_rows`` (default 100k ≈ 10¹⁰ pairs) and a
    larger table raises :class:`BruteForceScaleError` pointing at
    :func:`ivf_topk`, the scale path. Pass ``max_rows=None`` to
    explicitly accept the O(n²) cost AND skip the guard's count job.

    NOTE the guard runs one eager action per call — but a BOUNDED one:
    ``limit(max_rows + 1).count()`` short-circuits the scan as soon as
    max_rows+1 rows are found (a LocalLimit per task + GlobalLimit),
    so its cost is capped regardless of input size, unlike a full
    ``df.count()``.
    """
    if max_rows is not None:
        over = df.limit(max_rows + 1).count() > max_rows
        if over:
            raise BruteForceScaleError(
                f"brute_force_topk input exceeds max_rows={max_rows}: "
                f"the all-pairs plan would build >{max_rows**2:.2e} "
                "candidate pairs. Use ivf_topk() for large tables, or "
                "pass max_rows=None to force the exact all-pairs plan."
            )
    a = df.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).cast("array<double>").alias("a_vec"),
    )
    b = df.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).cast("array<double>").alias("b_vec"),
    )
    pairs = a.crossJoin(b).filter(F.col("a_id") != F.col("b_id"))
    sim = _dot(F.col("a_vec"), F.col("b_vec")) / (
        F.sqrt(_dot(F.col("a_vec"), F.col("a_vec")))
        * F.sqrt(_dot(F.col("b_vec"), F.col("b_vec")))
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("sim"), F.col("b_id"))
    return (
        pairs.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("a_id").alias(id_col),
            "rank",
            F.col("b_id").alias("neighbor_id"),
            "sim",
        )
    )


def hard_negatives(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_rows: int | None = 100_000,
    use_ivf: bool = False,
    nlist: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every anchor
    vector, the top-``k`` most cosine-similar vectors with a DIFFERENT
    ``label_col`` — the negatives that sit closest to the decision
    boundary, which is what contrastive/triplet losses want.

    Two lanes, same output schema (id, rank, neighbor_id, sim):

    * exact (default): the brute-force pair join with the
      label-inequality predicate fused into the join filter — the
      correctness baseline, guarded by ``max_rows`` exactly like
      :func:`brute_force_topk`.
    * ``use_ivf=True``: the scale path — IVF list assignment bounds
      the candidate join per inverted list (O(n·d·k/nlist·nprobe)),
      and the label predicate prunes candidates BEFORE the top-k
      window, so a label-skewed corpus (one dominant class) never
      materializes same-label pairs past the join filter.
    """
    if not use_ivf and max_rows is not None:
        over = df.limit(max_rows + 1).count() > max_rows
        if over:
            raise BruteForceScaleError(
                f"hard_negatives exact lane exceeds max_rows={max_rows}; "
                "pass use_ivf=True for the bounded-list plan, or "
                "max_rows=None to force the all-pairs baseline."
            )
    base = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("vec"),
        F.col(label_col).alias("lbl"),
    )
    sim = _dot(F.col("a_vec"), F.col("b_vec")) / (
        F.sqrt(_dot(F.col("a_vec"), F.col("a_vec")))
        * F.sqrt(_dot(F.col("b_vec"), F.col("b_vec")))
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("sim"), F.col("b_id"))
    if use_ivf:
        cent = fit_centroids(df, nlist=nlist, id_col=id_col, vec_col=vec_col)

        @pandas_udf("array<int>")
        def probes(vecs: pd.Series) -> pd.Series:
            x = np.vstack(vecs.to_numpy()).astype(np.float64)
            x /= np.maximum(
                np.linalg.norm(x, axis=1, keepdims=True), 1e-12
            )
            order = np.argsort(-(x @ cent.T), axis=1)[:, :nprobe]
            return pd.Series(list(order.astype(np.int32)))

        build = assign_lists(base, cent, id_col, "vec").select(
            F.col(id_col).alias("b_id"),
            F.col("vec").alias("b_vec"),
            F.col("lbl").alias("b_lbl"),
            F.col("list_id"),
        )
        probe = base.select(
            F.col(id_col).alias("a_id"),
            F.col("vec").alias("a_vec"),
            F.col("lbl").alias("a_lbl"),
            F.explode(probes(F.col("vec"))).alias("list_id"),
        )
        pairs = probe.join(build, "list_id").filter(
            (F.col("a_id") != F.col("b_id"))
            & (F.col("a_lbl") != F.col("b_lbl"))
        )
        scored = pairs.select(
            "a_id", "b_id", sim.alias("sim")
        ).dropDuplicates(["a_id", "b_id"])
    else:
        a = base.select(
            F.col(id_col).alias("a_id"),
            F.col("vec").alias("a_vec"),
            F.col("lbl").alias("a_lbl"),
        )
        b = base.select(
            F.col(id_col).alias("b_id"),
            F.col("vec").alias("b_vec"),
            F.col("lbl").alias("b_lbl"),
        )
        pairs = a.crossJoin(b).filter(
            (F.col("a_id") != F.col("b_id"))
            & (F.col("a_lbl") != F.col("b_lbl"))
        )
        scored = pairs.select("a_id", "b_id", sim.alias("sim"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("a_id").alias(id_col),
            "rank",
            F.col("b_id").alias("neighbor_id"),
            "sim",
        )
    )


def fit_centroids(
    df: DataFrame,
    nlist: int = 16,
    sample: int = 4096,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 20260816,
) -> np.ndarray:
    """Deterministic k-means on a bounded sample (driver-side numpy).

    Sampling uses a hash order on ids so the same centroids come out at
    any parallelism. Vectors are L2-normalized first (cosine ≡ dot)."""
    sampled = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(sample)
        .toPandas()
    )
    x = np.vstack(sampled[vec_col].to_numpy()).astype(np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def assign_lists(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One map pass: each vector → its nearest centroid (list id)."""
    cent = centroids

    @pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        x = np.vstack(vecs.to_numpy()).astype(np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return pd.Series((x @ cent.T).argmax(axis=1).astype(np.int32))

    return df.withColumn("list_id", nearest(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: search only the nprobe nearest lists.

    Build side: vectors exploded once per owning list. Probe side: each
    query exploded to its nprobe closest lists. The join is an
    equi-join on list_id — the all-pairs cross join never materializes.
    """
    cent = fit_centroids(df, nlist=nlist, id_col=id_col, vec_col=vec_col)

    @pandas_udf("array<int>")
    def probes(vecs: pd.Series) -> pd.Series:
        x = np.vstack(vecs.to_numpy()).astype(np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(x @ cent.T), axis=1)[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    base = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec")
    )
    build = assign_lists(base, cent, id_col, "vec").select(
        F.col(id_col).alias("b_id"),
        F.col("vec").alias("b_vec"),
        F.col("list_id"),
    )
    probe = base.select(
        F.col(id_col).alias("a_id"),
        F.col("vec").alias("a_vec"),
        F.explode(probes(F.col("vec"))).alias("list_id"),
    )
    pairs = probe.join(build, "list_id").filter(F.col("a_id") != F.col("b_id"))
    sim = _dot(F.col("a_vec"), F.col("b_vec")) / (
        F.sqrt(_dot(F.col("a_vec"), F.col("a_vec")))
        * F.sqrt(_dot(F.col("b_vec"), F.col("b_vec")))
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("sim"), F.col("b_id"))
    return (
        # project the vectors away before the dedup shuffle — sim is
        # identical for every multi-probe duplicate of a pair, and the
        # embedding arrays are the dominant row payload
        pairs.select("a_id", "b_id", sim.alias("sim"))
        .dropDuplicates(["a_id", "b_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("a_id").alias(id_col),
            "rank",
            F.col("b_id").alias("neighbor_id"),
            "sim",
        )
    )


def ivf_search(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Cross-set IVF retrieval: top-``k`` CORPUS neighbors for every
    QUERY row — the serving/ingest shape of ANN (a new batch looks up
    its neighbors in the big table), vs :func:`ivf_topk`'s same-set
    all-pairs shape.

    ``corpus`` is either a raw (id, vec) frame or — the production
    path — a PREBUILT index (the output of :func:`assign_lists`,
    persisted list_id-partitioned and appended on every ingest),
    detected by its ``list_id`` column; the prebuilt path requires
    ``centroids=`` (the :func:`fit_centroids` array the index was
    built with).

    Scale shape: centroids fit on a bounded sample; each query is
    routed to its ``nprobe`` nearest lists; the distinct probed
    list_ids are BROADCAST as a semi-join (a list_id-partitioned index
    gets partition pruning), then the query batch itself is broadcast
    into the candidate join — the corpus side never shuffles. The
    top-k window partitions by query id and sees only probed-list
    candidates. Emits (query_id, rank, neighbor_id, sim).
    """
    if "list_id" in corpus.columns:
        if centroids is None:
            raise ValueError(
                "a prebuilt assign_lists index needs centroids= "
                "(the fit_centroids array it was built with)"
            )
        cent = centroids
        build = corpus.select(
            F.col(id_col).alias("b_id"),
            F.col(vec_col).cast("array<double>").alias("b_vec"),
            "list_id",
        )
    else:
        cent = fit_centroids(
            corpus, nlist=nlist, id_col=id_col, vec_col=vec_col
        )
        build = assign_lists(
            corpus.select(
                F.col(id_col),
                F.col(vec_col).cast("array<double>").alias("b_vec"),
            ),
            cent,
            id_col,
            "b_vec",
        ).select(F.col(id_col).alias("b_id"), "b_vec", "list_id")

    @pandas_udf("array<int>")
    def probes(vecs: pd.Series) -> pd.Series:
        x = np.vstack(vecs.to_numpy()).astype(np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(x @ cent.T), axis=1)[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    probe = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
        F.explode(probes(F.col(vec_col))).alias("list_id"),
    )
    probed_lists = probe.select("list_id").distinct()
    hit = build.join(F.broadcast(probed_lists), "list_id", "left_semi")
    sim = _dot(F.col("q_vec"), F.col("b_vec")) / (
        F.sqrt(_dot(F.col("q_vec"), F.col("q_vec")))
        * F.sqrt(_dot(F.col("b_vec"), F.col("b_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.col("b_id"))
    return (
        hit.join(F.broadcast(probe), "list_id")
        # sim is identical for every multi-probe duplicate of a pair:
        # project the vectors away before the dedup shuffle
        .select("q_id", "b_id", sim.alias("sim"))
        .dropDuplicates(["q_id", "b_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            "rank",
            F.col("b_id").alias("neighbor_id"),
            "sim",
        )
    )


def recall_at_k(exact: DataFrame, approx: DataFrame, id_col: str = "vec_id") -> float:
    """Fraction of exact top-k pairs recovered by the approximate lane."""
    e = exact.select(id_col, "neighbor_id")
    a = approx.select(id_col, "neighbor_id")
    hit = e.join(a, [id_col, "neighbor_id"]).count()
    total = e.count()
    return hit / total if total else 1.0


def kmeans_lloyd(
    df: DataFrame,
    k: int,
    dim: int,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_ids: list[int] | None = None,
) -> DataFrame:
    """Fully DISTRIBUTED Lloyd k-means over an embedding column (the
    ivf_topk fit is driver-side on a sample; this is the whole-table
    trainer). Deterministic: centroids initialize from the vectors
    with ``init_ids`` (default ids 0..k-1), the assign step is a
    codegen'd argmin over k broadcast-literal centroids (squared
    euclidean via zip_with/aggregate; first-min ties), and the update
    step is per-dimension AVG — one map-side-combinable aggregation.
    Per iteration: one shuffle (the k-row centroid aggregate) + one
    k×dim collect (the legitimate driver-side aggregate); the vector
    table itself never moves. Empty clusters keep their previous
    centroid. Returns the LAST iteration's assignment
    (id_col, cluster)."""
    init = init_ids if init_ids is not None else list(range(k))
    rows = (
        df.filter(F.col(id_col).isin(init))
        .select(id_col, vec_col)
        .collect()
    )
    if len(rows) != k:
        raise ValueError(f"init_ids matched {len(rows)} rows, need {k}")
    # preserve the CALLER's seed order: cluster c is seeded from
    # init_ids[c] (a sorted fetch would silently permute the labels)
    by_id = {r[0]: [float(x) for x in r[1]] for r in rows}
    cents = [by_id[i] for i in init]
    assigned = None
    for it in range(n_iter):
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.array(*[F.lit(c_j) for c_j in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for c in cents
            ]
        )
        assigned = df.withColumn(
            "cluster",
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
        )
        if it == n_iter - 1:
            break  # the last update would be computed and discarded
        cent_rows = (
            # null/short vectors assign to cluster NULL — they carry no
            # information for the update (and int(None) would crash it)
            assigned.filter(F.col("cluster").isNotNull())
            .groupBy("cluster")
            .agg(*[F.avg(F.col(vec_col)[j]).alias(f"c{j}") for j in range(dim)])
            .collect()
        )
        by_cl = {
            int(r["cluster"]): [float(r[f"c{j}"]) for j in range(dim)]
            for r in cent_rows
        }
        cents = [by_cl.get(i, cents[i]) for i in range(k)]
    return assigned.select(id_col, "cluster")


def semdedup(
    df: DataFrame,
    k: int,
    dim: int,
    threshold: float = 0.98,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_ids: list[int] | None = None,
) -> DataFrame:
    """SemDeDup — semantic deduplication (Abbas et al. 2023, public):
    k-means-cluster the embeddings, then within each cluster drop
    every vector that has a LOWER-id cluster-mate with cosine
    similarity >= ``threshold``. The paper keeps one arbitrary member
    per semantic-duplicate group; keep-min-id is the deterministic
    instance of that choice (and the drop rule is evaluated against
    ALL lower-id mates, so it is order-free under any partitioning —
    b drops because of a even when a itself drops because of an
    earlier-still c).

    Emits (id_col, cluster, kept) for every input vector.

    Scale shape — the whole point of SemDeDup is that clustering makes
    near-dup search tractable: the pair join is an equi-join on
    cluster id, so candidates are sum-of-squares over cluster sizes
    (~n^2/k), never corpus^2. At 100 TB, k scales with the corpus
    (n / target cluster size), the per-cluster join parallelizes
    across clusters, and an oversized hot cluster is exactly the
    skewed-join case AQE's skew handling splits. The cosine kernel is
    zip_with/aggregate — JVM expressions inside the join, no UDF;
    :func:`kmeans_lloyd` supplies assignments with one k-row
    aggregate per iteration (the vector table never moves).
    """
    assign = kmeans_lloyd(
        df, k=k, dim=dim, n_iter=n_iter, id_col=id_col,
        vec_col=vec_col, init_ids=init_ids,
    )
    vecs = df.select(id_col, F.col(vec_col).cast("array<double>").alias("vec")).join(
        assign, id_col
    )
    a = vecs.select(
        F.col(id_col).alias("a_id"), F.col("vec").alias("a_vec"), "cluster"
    )
    b = vecs.select(
        F.col(id_col).alias("b_id"), F.col("vec").alias("b_vec"), "cluster"
    )
    sim = _dot(F.col("a_vec"), F.col("b_vec")) / (
        F.sqrt(_dot(F.col("a_vec"), F.col("a_vec")))
        * F.sqrt(_dot(F.col("b_vec"), F.col("b_vec")))
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(sim >= F.lit(float(threshold)))
        .select(F.col("b_id").alias(id_col))
        .distinct()
        .withColumn("dropped", F.lit(True))
    )
    return (
        vecs.join(dropped, id_col, "left")
        .select(
            id_col,
            "cluster",
            F.col("dropped").isNull().alias("kept"),
        )
    )
