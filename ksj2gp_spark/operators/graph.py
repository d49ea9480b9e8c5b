"""Connected components over an edge list — the clustering step that
turns near-duplicate PAIRS (minhash/simhash/phash LSH output) into
canonical dedup GROUPS (component id = min doc_id in the group).

The reference has no graph step (its dedup story ends at file-level
conversion); this is part of the training-data-pipeline lane the graft
mandates: pairs → components → keep-one-per-component.

Algorithm: filtering / graph contraction (the MPC scheme of Lattanzi
et al. "Filtering: a method for solving graph problems in MapReduce"
and Kiveris et al. "Connected Components in MapReduce and Beyond" —
both public), with a vectorized numpy union kernel per partition:

  round k (input: quotient edge list E_k):
    1. hash-partition E_k by src, so each node's out-edges co-locate;
    2. per-partition numpy min-label union → emit (value, local_root)
       for every endpoint value in the partition — the partition's
       local components collapse in ONE pass (a whole chain that lands
       together contracts immediately, where per-hop label propagation
       needs diameter rounds);
    3. groupBy(node): m_k(v) = min local root, plus the set of v's
       distinct local roots across partitions. Since every class
       {v : m_k(v)=r} is connected through r inside G, contracting by
       m_k preserves component structure; cross-partition connectivity
       is exactly captured by ROOT-LINK edges (min_root, other_root)
       per multi-rooted node — these form E_{k+1}, the quotient graph.
    4. E_{k+1} is empty  ⇔  every node has one root  ⇔  classes are
       full components: termination is an exact count, not a
       fingerprint. Otherwise recurse on E_{k+1} (≤ one edge per
       (node, extra root) — the quotient SHRINKS geometrically).
  backward pass: comp_k(v) = comp_{k+1}(m_k(v)), defaulting to m_k(v)
  for roots already final — one left-join per round over shrinking
  mapping tables.

Component minima survive every round (min(v ∪ local comps of v) = v
when v is its component's minimum), so the final representative is the
component's global minimum — deterministic and reproducible by the
DuckDB recursive-CTE oracle.

Scale shape: round 1 touches the edge list ONCE (one hash repartition
+ one Arrow kernel pass + one combinable groupBy of ~2|E| mapping
rows); later rounds run on quotient graphs that shrink by the local
contraction factor (~#partition-locality), so total shuffle volume is
O(|E|) + a geometric tail — vs O(|E|) per round for label
propagation. Every per-round frame is lineage-truncated so plans do
not grow with iteration count — ``localCheckpoint`` by default, or
reliable ``checkpoint()`` when a ``checkpoint_dir`` is given (the
executor-loss-safe mode; see :func:`_checkpointer`). Known skew caveat: a node of degree
d puts d rows in one kernel partition; upstream LSH pair generation
caps bucket sizes (operators/dedup.py max_bucket), which bounds d.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _checkpointer(spark, checkpoint_dir: str | None):
    """Per-round lineage-truncation strategy for iterative operators.

    Default (``checkpoint_dir=None``): ``localCheckpoint()`` — round
    frames live in executor memory/disk. Fastest, but the blocks die
    with their executor: on a real cluster ONE executor loss
    mid-iteration makes every later round's lineage unrecoverable and
    kills the job.

    With ``checkpoint_dir`` set: reliable ``DataFrame.checkpoint()``
    into that directory (an HDFS-compatible shared path on a real
    cluster, a local dir in tests). Executor loss then replays the
    affected tasks from the checkpoint FILES and the job completes —
    the fault-tolerance posture the engine's resumable sinks already
    promise (crash-injection test:
    tests/test_graph_joins.py::TestReliableCheckpoint). Checkpoint
    files accumulate one round-frame per iteration and are reclaimed
    when the application exits (or by
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` as
    rounds fall out of scope); the backward pass reads every round's
    mapping, so files must outlive the loop anyway.

    Caveat (inherent to Spark's API): the checkpoint directory is a
    SparkContext-GLOBAL setting — one per application, not one per
    DataFrame. Passing ``checkpoint_dir`` redirects it for the whole
    session (sequential redirects are safe; each checkpoint resolves
    its directory at write time), so CONCURRENT iterative ops asking
    for different directories would interleave their round files —
    the redirect is warned loudly rather than silent.
    """
    if checkpoint_dir is None:
        return lambda df: df.localCheckpoint()
    sc = spark.sparkContext
    current = sc.getCheckpointDir()
    if current is not None and _strip_uri_scheme(current) != _strip_uri_scheme(
        checkpoint_dir
    ):
        import warnings

        warnings.warn(
            f"redirecting the session-global Spark checkpoint dir "
            f"{current!r} -> {checkpoint_dir!r}; concurrent iterative "
            "operators must share one directory",
            stacklevel=3,
        )
    sc.setCheckpointDir(checkpoint_dir)
    return lambda df: df.checkpoint()


def _strip_uri_scheme(uri: str) -> str:
    """file:/tmp/x, file:///tmp/x, hdfs://nn/tmp/x → a comparable
    path-ish suffix (getCheckpointDir returns a RESOLVED uri, the
    caller passes a raw path)."""
    import re

    return re.sub(r"^[A-Za-z][\w+.-]*:(//[^/]*)?", "", uri).rstrip("/")


def _local_components(n_values: int, ea: np.ndarray, eb: np.ndarray):
    """Min-label union of a partition subgraph over value indices
    0..n_values-1 (indices of SORTED distinct values, so min-index ==
    min-value — type-agnostic: lexicographic on strings, numeric on
    ids, matching F.least semantics). Returns per-value root index."""
    lbl = np.arange(n_values, dtype=np.int64)
    while True:
        prev = lbl.copy()
        m = np.minimum(lbl[ea], lbl[eb])
        np.minimum.at(lbl, ea, m)
        np.minimum.at(lbl, eb, m)
        lbl = lbl[lbl]  # pointer jump: halves chain depth per sweep
        # fixpoint must cover BOTH passes: the jump can be a no-op
        # while the edge-min pass still lowered labels this sweep
        if np.array_equal(lbl, prev):
            return lbl


def _contract_kernel(batches):
    """mapInPandas kernel: partition edge rows (src, dst) → one
    (node, root) mapping row per distinct endpoint value present,
    pointing at its partition-local component minimum."""
    pdfs = [pdf for pdf in batches if len(pdf)]
    if not pdfs:
        return
    pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
    a = pdf["src"].to_numpy()
    b = pdf["dst"].to_numpy()
    values, codes = np.unique(np.concatenate([a, b]), return_inverse=True)
    n = len(a)
    lbl = _local_components(len(values), codes[:n], codes[n:])
    yield pd.DataFrame({"node": values, "root": values[lbl]})


def _minlink_kernel(batches):
    """mapInPandas kernel over (node, root) mapping rows co-located by
    node: per node emit its min root (kind=0 mapping row) plus one
    root-link row (min, other) per additional distinct root (kind=1).
    A numpy sort-reduceat pass — replaces a JVM collect_set aggregate
    whose per-group array buffers (and the localCheckpoint of array
    columns) dominated the round wall at 8M nodes."""
    pdfs = [pdf for pdf in batches if len(pdf)]
    if not pdfs:
        return
    pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
    node = pdf["node"].to_numpy()
    root = pdf["root"].to_numpy()
    order = np.argsort(node, kind="stable")
    ns, rs = node[order], root[order]
    starts = np.concatenate(([True], ns[1:] != ns[:-1]))
    start_idx = np.where(starts)[0]
    gmin = np.minimum.reduceat(rs, start_idx)
    rmin_per_row = gmin[np.cumsum(starts) - 1]
    link_mask = rs != rmin_per_row
    yield pd.DataFrame(
        {
            "node": np.concatenate([ns[starts], rmin_per_row[link_mask]]),
            "root": np.concatenate([gmin, rs[link_mask]]),
            "kind": np.concatenate(
                [
                    np.zeros(len(start_idx), np.int8),
                    np.ones(int(link_mask.sum()), np.int8),
                ]
            ),
        }
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Return (node, component) for every node appearing in ``edges``
    (undirected; direction of the input rows is ignored). ``component``
    is the minimum node id of the node's connected component — a
    deterministic canonical representative, reproducible by any engine
    (the DuckDB oracle computes it with a recursive CTE).

    ``checkpoint_dir``: when set, per-round frames use reliable
    ``checkpoint()`` into that (shared-filesystem) directory instead of
    ``localCheckpoint()``, so the job survives executor loss
    mid-iteration — see :func:`_checkpointer`.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iter`` rounds (contraction shrinks the quotient by the
    partition-locality factor per round; 30 covers any graph that fits
    on a real cluster).
    """
    spark = edges.sparkSession
    ckpt = _checkpointer(spark, checkpoint_dir)
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    id_t = edges.schema[src].dataType
    simple = id_t.simpleString()
    map_schema = f"node {simple}, root {simple}"

    # No distinct() on the input: duplicate edges are free extra rows
    # in the kernel, and skipping the dedup saves a full edge shuffle.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).cast(id_t).alias("dst")
    )
    mappings: list[DataFrame] = []

    for it in range(max_iter):
        # Rounds ≥2 symmetrize so EVERY node sees all its incident
        # edges in its own partition (not just out-edges) — this is
        # what lets a node's min cross fragment boundaries every round;
        # without it a path quotient shrinks by only
        # (1 - 1/partitions) per round. Round 1 skips the symmetrize:
        # it halves the dominant shuffle+Arrow volume (the full edge
        # list), costs at most extra rounds over the ALREADY-contracted
        # quotient, and correctness never depends on it (root links tie
        # every node's roots regardless).
        # Range partitioning (vs hash) exploits id locality: edge lists
        # whose components live in contiguous id ranges (LSH buckets,
        # chained ids) collapse whole components in round 1; for
        # permuted ids it degrades to hash-equivalent mixing.
        sym = (
            e
            if it == 0
            else e.union(
                e.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
            )
        )
        # Round 1 range-partitions to exploit id locality (contiguous
        # components collapse in one pass); quotient rounds hash-
        # partition instead — repartitionByRange costs a SAMPLING JOB
        # per call, and the multi-JVM probe (BENCH_SCALING.md round 5)
        # showed per-round fixed job latency, not transport, is what
        # bounds local scaling. Root-id locality is already mixed by
        # round 2, so the range pass buys nothing there.
        part = (
            sym.repartitionByRange(nparts, "src")
            if it == 0
            else sym.repartition(nparts, "src")
        )
        contracted = part.mapInPandas(_contract_kernel, schema=map_schema)
        # second numpy pass, co-located by node: per-node min root +
        # root links in one compact 3-column frame (ONE checkpoint of
        # fixed-width rows per round; the groupBy collect_set + explode
        # formulation measured ~3× this round's wall at 8M nodes —
        # per-group JVM array buffers plus an array-column checkpoint)
        # Termination reads a LINK-COUNT ACCUMULATOR updated by the
        # kernel tasks the eager checkpoint below already runs —
        # replacing the per-round isEmpty() action (one whole extra
        # job of scheduling latency). Retry-safe for zero-vs-nonzero:
        # the kernel is deterministic per partition, so any task
        # attempt sees links iff the partition has links.
        acc = spark.sparkContext.accumulator(0)

        def counting_minlink(batches, _acc=acc):
            for out in _minlink_kernel(batches):
                _acc.add(int((out["kind"] == 1).sum()))
                yield out

        combined = ckpt(
            contracted.repartition(nparts, "node").mapInPandas(
                counting_minlink, schema=f"{map_schema}, kind tinyint"
            )
        )
        mappings.append(
            combined.filter(F.col("kind") == 0).select("node", "root")
        )
        e = combined.filter(F.col("kind") == 1).select(
            F.col("node").alias("src"), F.col("root").alias("dst")
        )
        if acc.value == 0:
            # backward composition: comp_k(v) = comp_{k+1}(m_k(v)),
            # falling back to m_k(v) for roots that were already final
            comp = mappings[-1]
            for m_k in reversed(mappings[:-1]):
                comp = (
                    m_k.join(
                        comp.select(
                            F.col("node").alias("_r"),
                            F.col("root").alias("_c"),
                        ),
                        m_k["root"] == F.col("_r"),
                        "left",
                    )
                    .select(
                        "node",
                        F.coalesce("_c", "root").alias("root"),
                    )
                )
            return comp.select("node", F.col("root").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def connected_components_labelprop(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Baseline kept for A/B equality tests and the scaling sweep:
    min-label propagation with pointer jumping (Rastogi et al.,
    "Finding Connected Components in Map-Reduce in Logarithmic
    Rounds"). Two SQL joins + two checkpoints per round over the full
    edge list; ``connected_components`` (contraction) is the
    production path."""
    ckpt = _checkpointer(edges.sparkSession, checkpoint_dir)
    sym = ckpt(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = ckpt(
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )

    for _ in range(max_iter):
        nbr = (
            sym.join(
                labels.select(
                    F.col("node").alias("v"), F.col("label").alias("nl")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("nl").alias("nl"))
            .withColumnRenamed("u", "node")
        )
        # least() skips nulls, so unmatched left rows keep their label.
        l1 = ckpt(
            labels.join(nbr, "node", "left").select(
                "node",
                F.least("label", "nl").alias("label"),
                F.col("label").alias("_old"),
            )
        )
        jump = l1.select(
            F.col("node").alias("label"), F.col("label").alias("jl")
        )
        l2 = l1.join(jump, "label", "left").select(
            "node", F.least("label", "jl").alias("label"), "_old"
        )
        l2 = ckpt(l2)
        changed = l2.agg(
            F.sum((F.col("label") != F.col("_old")).cast("long")).alias("c")
        ).collect()[0]["c"]
        labels = l2.drop("_old")
        if not changed:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Near-dup clustering: LSH pair list → (doc_id, component, csize).
    ``component`` is the min doc_id of the cluster; ``csize`` its
    member count — the keep-one / weight-by-cluster decisions a
    curation pipeline makes downstream both read directly off this.
    """
    from pyspark.sql import Window

    comp = connected_components(
        pairs,
        src=id_a,
        dst=id_b,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
    )
    # window count, not a broadcast of per-component sizes: component
    # count is O(nodes) at scale, so it must stay distributed — one
    # shuffle on component and the count rides along
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("doc_id"),
        "component",
        F.count("*").over(w).alias("csize"),
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph —
    the graph-shape statistic of a dedup/co-occurrence pair list
    (clustering structure of LSH components, co-purchase cliques).
    Returns (node, triangles) for every node on >= 1 triangle.

    Algorithm: degree-ordered node-iterator (Schank & Wagner 2005 /
    the MapReduce formulation of Suri & Vassilvitskii "Counting
    Triangles and the Curse of the Last Reducer", WWW'11 — public).
    Each edge is oriented from its (degree, id)-smaller endpoint, so
    every triangle x<y<z in that total order is found exactly once as
    the wedge (x->y, x->z) closed by (y->z):

      1. canonicalize: (a=min, b=max) distinct, self-loops dropped;
      2. degrees via one map-side-combinable groupBy;
      3. orient by (deg, id) — out-degree is then O(sqrt(|E|)) for
         ANY graph (arboricity bound), so the wedge self-join below
         cannot blow up on a high-degree hub: the curse-of-the-last-
         reducer skew case is structurally capped;
      4. wedge self-join on the source + one equi-join against the
         oriented edges to close the wedge;
      5. triangle corners union -> groupBy count.

    All-JVM shuffle equi-joins, no UDF, no driver collect. The wedge
    set is the scale driver (sum of C(outdeg, 2) <= |E|^{3/2}); AQE
    handles residual key skew.
    """
    canon = (
        edges.select(F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = canon.join(
        deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a"
    ).join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oe = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    e1 = oe.select("u", F.col("v").alias("v1"), F.col("dv").alias("d1"))
    e2 = oe.select("u", F.col("v").alias("v2"), F.col("dv").alias("d2"))
    wedges = e1.join(e2, "u").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    tri = wedges.join(
        oe.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
        ["v1", "v2"],
    ).select(F.col("u").alias("x"), F.col("v1").alias("y"), F.col("v2").alias("z"))
    return (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 8,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank (Brin & Page 1998, public) over a
    directed edge list. Returns (node, rank) with rank rounded to 6
    decimals (summation-order noise across engines is ~1e-15/term;
    the round is the engine-portable canon, same policy as bm25).

    Update: r'(v) = (1-d)/n + d * (sum_{u->v} r(u)/out(u) + D/n)
    where D is the total rank of dangling (out-degree-0) nodes —
    redistributed uniformly, the standard stochastic-matrix fix-up.

    Scale shape: the edge list never moves after the first hash
    partition — each iteration is one broadcast-or-shuffle equi-join
    of the O(n) rank vector against the edges plus a map-side-
    combinable groupBy; the dangling mass is a 1-row aggregate
    crossJoin (never a driver collect inside the loop). Per-iteration
    ``localCheckpoint`` keeps the plan O(1) in iteration count.
    The only driver action is the upfront node count (one scalar).
    """
    ckpt = _checkpointer(edges.sparkSession, checkpoint_dir)
    links = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    nodes = ckpt(
        links.select(F.col("u").alias("node"))
        .unionAll(links.select(F.col("v").alias("node")))
        .distinct()
    )
    outdeg = links.groupBy("u").agg(F.count(F.lit(1)).alias("od"))
    n = nodes.count()
    if n == 0:
        # empty edge list: no nodes, no mass to distribute — return
        # an empty (node, rank) frame rather than dividing by zero.
        return nodes.select(
            "node", F.lit(0.0).cast("double").alias("rank")
        )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    base = F.lit((1.0 - damping) / n)
    for _ in range(iterations):
        contribs = (
            links.join(outdeg, "u")
            .join(
                ranks.select(F.col("node").alias("u"), F.col("rank").alias("_r")),
                "u",
            )
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("_r") / F.col("od")).alias("_s"))
        )
        dang = (
            ranks.join(outdeg, ranks["node"] == outdeg["u"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_d"))
        )
        ranks = ckpt(
            nodes.join(contribs, "node", "left")
            .crossJoin(dang)
            .select(
                "node",
                (
                    base
                    + F.lit(damping)
                    * (F.coalesce(F.col("_s"), F.lit(0.0)) + F.col("_d") / F.lit(float(n)))
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def bfs_distances(
    edges: DataFrame,
    source=None,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Single-source shortest hop distances (unweighted BFS) over an
    undirected graph. Returns (node, hop) for every node reachable
    from ``source`` (default: the minimum node id — deterministic and
    reproducible by the DuckDB recursive-CTE oracle). Hops are exact
    integers — no FP canon needed.

    Frontier iteration: each round expands only the NEW frontier
    (one equi-join frontier x edges + one anti-join against settled
    nodes), so total join work is O(|E| * diameter-locality), not
    O(|E| * rounds); ``localCheckpoint`` per round keeps plans flat.
    Termination is exact (empty frontier). Raises ``RuntimeError``
    beyond ``max_iter`` (a diameter bound, not a convergence guess).
    """
    spark = edges.sparkSession
    ckpt = _checkpointer(spark, checkpoint_dir)
    sym = ckpt(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if source is None:
        source = sym.agg(F.min("a")).collect()[0][0]
        if source is None:
            raise ValueError(
                "bfs_distances: graph has no edges and no explicit "
                "source was given"
            )
    id_t = sym.schema["a"].dataType.simpleString()
    dist = ckpt(
        spark.createDataFrame([(source, 0)], schema=f"node {id_t}, hop int")
    )
    frontier = dist.select("node")
    for hop in range(1, max_iter + 1):
        nxt = ckpt(
            frontier.join(sym, frontier["node"] == sym["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).cast("int").alias("hop"))
        )
        if nxt.isEmpty():
            return dist
        dist = ckpt(dist.unionAll(nxt))
        frontier = nxt.select("node")
    raise RuntimeError(f"bfs_distances exceeded max_iter={max_iter}")


def sssp_distances(
    edges: DataFrame,
    source=None,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    max_iter: int = 60,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Single-source shortest WEIGHTED distances (frontier
    Bellman-Ford, public textbook algorithm) over an undirected
    graph with strictly positive edge weights. Returns (node, dist)
    for every node reachable from ``source`` (default: the minimum
    node id — deterministic, recursive-CTE-reproducible). Integer
    weights give exact integer distances — the contract query uses
    them so no FP canon is needed.

    Frontier relaxation: each round joins only the IMPROVED frontier
    against the edge list (equi-join + groupBy(min) + an anti-join
    merge into the settled map), so a round's work is proportional
    to the frontier's out-edges, not |E|; after k rounds every
    shortest path of <= k hops is final, and termination is exact
    (empty improvement set). ``localCheckpoint`` per round keeps the
    plan O(1) in iterations. Distance labels shuffle as (node, dist)
    pairs only.

    Positive weights are VALIDATED (one bounded min() aggregate —
    a zero or negative weight breaks Bellman-Ford's settling
    argument and the oracle's distance-capped recursion).

    Raises ``RuntimeError`` past ``max_iter`` rounds (a bound on the
    hop count of the longest shortest path, not a convergence
    guess).
    """
    spark = edges.sparkSession
    ckpt = _checkpointer(spark, checkpoint_dir)
    sym = ckpt(
        edges.select(
            F.col(src).alias("a"),
            F.col(dst).alias("b"),
            F.col(weight).alias("w"),
        )
        .unionAll(
            edges.select(
                F.col(dst).alias("a"),
                F.col(src).alias("b"),
                F.col(weight).alias("w"),
            )
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )
    wmin = sym.agg(F.min("w")).collect()[0][0]
    if wmin is not None and wmin <= 0:
        raise ValueError(
            f"sssp_distances requires strictly positive weights "
            f"(min weight = {wmin})"
        )
    if source is None:
        source = sym.agg(F.min("a")).collect()[0][0]
        if source is None:
            raise ValueError(
                "sssp_distances: graph has no edges and no explicit "
                "source was given"
            )
    id_t = sym.schema["a"].dataType.simpleString()
    w_t = sym.schema["w"].dataType.simpleString()
    dist = ckpt(
        spark.createDataFrame(
            [(source, 0)], schema=f"node {id_t}, dist {w_t}"
        )
    )
    frontier = dist
    for _ in range(max_iter):
        cand = (
            frontier.join(sym, frontier["node"] == sym["a"])
            .select(
                F.col("b").alias("node"),
                (frontier["dist"] + sym["w"]).alias("_nd"),
            )
            .groupBy("node")
            .agg(F.min("_nd").alias("_nd"))
        )
        improved = ckpt(
            cand.join(
                dist.select(
                    F.col("node").alias("_n"), F.col("dist").alias("_d")
                ),
                cand["node"] == F.col("_n"),
                "left",
            )
            .filter(F.col("_d").isNull() | (F.col("_nd") < F.col("_d")))
            .select("node", F.col("_nd").alias("dist"))
        )
        if improved.isEmpty():
            return dist
        dist = ckpt(
            dist.join(improved.select("node"), "node", "left_anti")
            .unionAll(improved)
        )
        frontier = improved
    raise RuntimeError(f"sssp_distances exceeded max_iter={max_iter}")
