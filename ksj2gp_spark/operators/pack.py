"""Training-batch packing — the last mile of a pretraining data
pipeline, after curation and dedup have decided WHAT to train on:

1. :func:`pack_sequences` — concat-and-chunk sequence packing for LLM
   pretraining: lay every document's tokens end-to-end in a
   deterministic global order and cut the stream into fixed ``budget``
   chunks; each doc is assigned the chunk where it STARTS. Implemented
   as a distributed prefix sum (range partition → vectorized
   per-partition Arrow cumsum → per-partition offsets), so the
   10^12-row table sees exactly ONE wide shuffle and no single-task
   global window.

2. :func:`select_under_budget` — greedy data selection under a token
   budget: rank docs by a quality score and keep the best prefix that
   fits. Shares the prefix-sum core (:func:`global_prefix_sum`), so
   "pick the best N tokens out of 100 TB" is one wide shuffle plus a
   map-side filter.

3. :func:`bucket_batches` — aspect-ratio bucketed batch assignment for
   image training (the diffusion-training "aspect bucketing" shape):
   images are binned portrait/square/landscape by exact integer cross-
   multiplication (no float boundary drift between engines), sharded by
   a deterministic hash so one giant bucket cannot serialize into one
   window task, and numbered into fixed-size batches per (bucket,
   shard).

Both are pure integer arithmetic end-to-end, so both have exact DuckDB
oracles (contract queries ``seq_pack`` and ``batch_pack``).

Scale notes (100 TB posture):
- The prefix sum's only driver-side materialization is one row per
  partition (bounded by the partition count, never by data size).
- Range-exchange boundaries are sampled with an RDD-id-derived seed
  that changes per ACTION, so the two passes (totals, then assignment)
  pin one materialized partitioning via persist — a measured desync,
  not a precaution (see pack_sequences; bench/pack_scaling.py asserts
  the closed-form invariants that caught it).
- ``bucket_batches`` shuffles once on (bucket, shard); with B buckets
  and S shards the sort parallelism is B×S tasks, independent of how
  skewed the bucket sizes are. Incomplete trailing batches appear per
  shard (S-1 extra partials worst-case per bucket) — the documented
  price of not serializing the bucket through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def global_prefix_sum(
    df: DataFrame,
    order_by: list,
    token_col: str,
    num_partitions: int | None = None,
    out_col: str = "start_pos",
) -> DataFrame:
    """Exclusive prefix sum of ``token_col`` in the total order given
    by ``order_by`` (strings or Column expressions, which may carry
    ``.desc()``). Adds ``out_col`` = sum of ``token_col`` over all rows
    strictly before this one in that order.

    Distributed prefix sum: range-partition on the order keys, locally
    sort, persist (both passes must read ONE materialized partitioning
    — range boundaries are re-sampled per action otherwise; see the
    inline note), cumsum inside each partition (vectorized numpy over
    Arrow batches, carry across batches), shifted by the total of the
    partitions before it (one bounded collect: one row per partition,
    shipped in the task closure). One wide shuffle total; no
    single-task window. The persisted intermediate rides on the result
    as ``._pack_source`` — unpersist it after materializing.
    """
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    from pyspark import StorageLevel

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    # ONE wide shuffle (the range partition), then a LOCAL sort. A
    # Window.partitionBy(spark_partition_id()) would re-shuffle the
    # whole table a second time (Catalyst can't prove range
    # partitioning satisfies a hash-partition requirement on the
    # partition id), so the per-partition cumsum runs as a vectorized
    # Arrow pass with a running carry instead — no per-row Python.
    #
    # The persist is CORRECTNESS, not caching hygiene: range-exchange
    # boundaries come from a reservoir sample whose seed derives from
    # the RDD id, and each ACTION compiles a fresh plan with fresh RDD
    # ids — so without it the totals pass and the assignment pass can
    # land rows in different partitions (measured: max seq_id off by
    # 130 chunks at 200k rows; bench/pack_scaling.py asserts the
    # closed-form invariants that caught it). Persisting pins one
    # materialized partitioning for both passes, and recompute after
    # eviction reuses the same partitioner object, so the layout stays
    # consistent even under memory pressure. zipWithIndex makes the
    # same two-pass-over-one-RDD bargain.
    part = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = (
        part.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(F.sum(F.col(token_col).cast("long")).alias("__tot"))
        .collect()
    )
    acc = 0
    offmap: dict[int, int] = {}
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offmap[row["__pid"]] = acc
        acc += row["__tot"]

    out_schema = StructType(
        list(part.schema.fields) + [StructField(out_col, LongType())]
    )
    tok = token_col

    def assign(iterator):
        from pyspark import TaskContext

        # reads the persisted partitioning the totals pass measured
        run = offmap.get(TaskContext.get().partitionId(), 0)
        for pdf in iterator:
            toks = pdf[tok].to_numpy().astype(np.int64, copy=False)
            ends = np.cumsum(toks) + run
            pdf = pdf.copy()
            pdf[out_col] = ends - toks
            if len(ends):
                run = int(ends[-1])
            yield pdf

    out = part.mapInPandas(assign, out_schema)
    # the persisted intermediate; callers may free it after
    # materializing the result: result._pack_source.unpersist()
    out._pack_source = part
    return out


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in
    ascending ``id_col`` order and the token stream is cut every
    ``budget`` tokens. Adds:

    - ``start_pos`` — the doc's first token's position in the global
      stream (exclusive prefix sum of ``token_col``),
    - ``seq_id``  — ``floor(start_pos / budget)``: the training
      sequence in which the doc starts (docs may span chunks, exactly
      like the standard concat-and-chunk pretraining layout),
    - ``seq_off`` — offset of the doc's first token inside that
      sequence (``start_pos % budget``).

    Rides on :func:`global_prefix_sum` (one wide shuffle, no
    single-task window); the chunk columns are pure JVM integer
    expressions over ``start_pos``. The persisted intermediate rides on
    the result as ``._pack_source`` — unpersist it after materializing.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    ps = global_prefix_sum(
        df, [F.col(id_col)], token_col, num_partitions=num_partitions
    )
    b = int(budget)
    out = ps.select(
        "*",
        F.expr(f"start_pos div {b}").alias("seq_id"),
        F.pmod(F.col("start_pos"), F.lit(b)).cast("long").alias("seq_off"),
    )
    out._pack_source = ps._pack_source
    return out


def select_under_budget(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    score_col: str = "score",
    id_col: str = "doc_id",
    order_by: list | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Data selection under a token budget — the "spend my compute on
    the best data" step of a pretraining pipeline (the selection shape
    of DSIR / quality-filtered corpora, public): rank documents by
    ``score_col`` descending (ties broken by ``id_col`` ascending) and
    keep the maximal prefix whose cumulative token count fits
    ``budget``. A doc is kept iff its whole token span fits:
    ``start_pos + tokens <= budget``. Because the cumulative sum is
    monotone along the ranking, the filter IS the greedy prefix — no
    early-exit scan is needed, so the selection stays fully
    distributed.

    Adds ``start_pos`` (cumulative tokens of all better-ranked docs).
    One wide shuffle via :func:`global_prefix_sum`; the budget filter
    is a map-side JVM comparison. ``order_by`` overrides the ranking
    expression list entirely when given. The persisted intermediate
    rides on the result as ``._pack_source``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    order = order_by or [F.col(score_col).desc(), F.col(id_col).asc()]
    ps = global_prefix_sum(
        df, order, token_col, num_partitions=num_partitions
    )
    out = ps.filter(
        F.col("start_pos") + F.col(token_col).cast("long") <= int(budget)
    )
    out._pack_source = ps._pack_source
    return out


def bucket_batches(
    df: DataFrame,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
    batch_size: int = 32,
    n_shards: int = 8,
    shard_key=None,
    portrait_num: int = 3,
    portrait_den: int = 4,
    landscape_num: int = 4,
    landscape_den: int = 3,
    drop_incomplete: bool = False,
) -> DataFrame:
    """Aspect-ratio bucketed batch assignment. Adds:

    - ``bucket`` — ``portrait`` (w/h < portrait_num/portrait_den),
      ``landscape`` (w/h > landscape_num/landscape_den), else
      ``square``; decided by integer cross-multiplication
      (``w*den < h*num``) so the boundary is exact in every engine,
    - ``shard``  — deterministic hash shard in [0, n_shards): keeps
      batch numbering parallel even when one bucket holds 90% of the
      corpus (Tokyo-skew analogue for aspect distribution),
    - ``batch_idx`` — 0-based fixed-size batch number within
      (bucket, shard), ordered by ``id_col``,
    - ``batch_n``  — rows in that batch (== batch_size except the
      trailing partial per shard).

    ``shard_key`` overrides the shard expression (default:
    ``xxhash64(id_col) % n_shards`` — JVM, any key type; pass an
    engine-portable :func:`~.curate.mix_bucket`-based expression when
    an external oracle must reproduce the assignment, as the contract
    query does). ``drop_incomplete=True`` keeps only full batches (the
    usual training-loader behavior of dropping the remainder).
    """
    if batch_size <= 0 or n_shards <= 0:
        raise ValueError("batch_size and n_shards must be positive")
    w_, h_ = F.col(w_col).cast("long"), F.col(h_col).cast("long")
    bucket = (
        F.when(w_ * portrait_den < h_ * portrait_num, "portrait")
        .when(w_ * landscape_den > h_ * landscape_num, "landscape")
        .otherwise("square")
    )
    # default shard: xxhash64 (JVM, any key type). Pass an engine-
    # portable mix_bucket-based shard_key when an external oracle must
    # reproduce the assignment (the contract query does).
    shard = (
        shard_key
        if shard_key is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    )
    tagged = df.withColumn("bucket", bucket).withColumn(
        "shard", shard.cast("int")
    )
    win = Window.partitionBy("bucket", "shard").orderBy(id_col)
    out = (
        tagged.withColumn(
            "__rn0", (F.row_number().over(win) - F.lit(1)).cast("long")
        )
        .withColumn("batch_idx", F.expr(f"__rn0 div {int(batch_size)}"))
        .drop("__rn0")
    )
    cnt = Window.partitionBy("bucket", "shard", "batch_idx")
    out = out.withColumn("batch_n", F.count(F.lit(1)).over(cnt).cast("int"))
    if drop_incomplete:
        out = out.filter(F.col("batch_n") == batch_size)
    return out
