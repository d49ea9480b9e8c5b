"""Connected components over an edge list — the clustering step that
turns near-duplicate PAIRS (minhash/simhash/phash LSH output) into
canonical dedup GROUPS (component id = min doc_id in the group).

The reference has no graph step (its dedup story ends at file-level
conversion); this is part of the training-data-pipeline lane the graft
mandates: pairs → components → keep-one-per-component.

Algorithm: min-label propagation with pointer jumping ("path
doubling"), the standard MapReduce-era formulation (Rastogi et al.,
"Finding Connected Components in Map-Reduce in Logarithmic Rounds",
public). Each round does

  1. neighbor-min: L(v) <- min(L(v), min_{u in N(v)} L(u))
  2. pointer jump: L(v) <- min(L(v), L(L(v)))

Step 2 squares the distance a label travels per round, so convergence
is O(log n) rounds even on a path graph — a plain neighbor-min loop
would need O(diameter) rounds, which on a 10^9-node chain is the
difference between ~30 shuffles and 10^9. Every round is two shuffles
(one groupBy, one self-join) over data that only shrinks; labels are
``localCheckpoint``-ed each round so the plan does not grow with the
iteration count (Spark re-executes unbounded lineage otherwise).

The per-round convergence probe is a driver-side ``isEmpty()`` on the
changed-label set — inherent to any iterative fixpoint on Spark and
O(1) data back to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """Return (node, component) for every node appearing in ``edges``
    (undirected; direction of the input rows is ignored). ``component``
    is the minimum node id of the node's connected component — a
    deterministic canonical representative, reproducible by any engine
    (the DuckDB oracle computes it with a recursive CTE).

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iter`` rounds (pointer jumping needs ~log2(n) + slack; 30
    covers any graph that fits on a real cluster).
    """
    # materialized once: every round's neighbor-min joins against sym,
    # and without the checkpoint the union+distinct (a shuffle) would
    # re-execute from lineage EVERY round — at scale that is a full
    # re-read of the edge table per iteration
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # 1. min label among neighbors (map-side combinable min)
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
        # l1 feeds BOTH sides of the pointer-jump self-join; checkpoint
        # it so the labels⋈nbr join runs once per round, not twice.
        # The round's INPUT label rides along as _old so convergence is
        # one aggregate scan of the checkpointed result — type-agnostic
        # (string node ids work; a numeric-cast probe would NULL out
        # and falsely converge), no old-vs-new self-join.
        l1 = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least("label", "nl").alias("label"),
                F.col("label").alias("_old"),
            )
            .localCheckpoint()
        )
        # 2. pointer jump: follow the label one hop (labels are node
        # ids, so they resolve against the same relation)
        jump = l1.select(
            F.col("node").alias("label"), F.col("label").alias("jl")
        )
        l2 = l1.join(jump, "label", "left").select(
            "node", F.least("label", "jl").alias("label"), "_old"
        )
        l2 = l2.localCheckpoint()
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
) -> DataFrame:
    """Near-dup clustering: LSH pair list → (doc_id, component, csize).
    ``component`` is the min doc_id of the cluster; ``csize`` its
    member count — the keep-one / weight-by-cluster decisions a
    curation pipeline makes downstream both read directly off this.
    """
    from pyspark.sql import Window

    comp = connected_components(pairs, src=id_a, dst=id_b, max_iter=max_iter)
    # window count, not a broadcast of per-component sizes: component
    # count is O(nodes) at scale, so it must stay distributed — one
    # shuffle on component and the count rides along
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("doc_id"),
        "component",
        F.count("*").over(w).alias("csize"),
    )
