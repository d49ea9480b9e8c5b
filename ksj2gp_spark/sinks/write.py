"""Partitioned tile sink with per-partition lineage manifests and
resumable, idempotent commits (BASELINE north_rule: "resumes from the
last committed checkpoint after executor loss without reprocessing
completed partitions").

Design (SURVEY.md §2.8): a batch job with an explicit commit log — the
Spark-native equivalent of an Iceberg snapshot at the granularity the
driver controls. The job is split into logical **chunks** (input key
ranges, dataset partitions, …). Each chunk is processed end-to-end and
written with ``mode=overwrite`` into its own subdirectory (idempotent:
a crashed half-written chunk is simply rewritten), and only then is the
chunk's lineage manifest committed via atomic rename. On restart,
chunks with a committed manifest are skipped without touching data.

Manifest contents per chunk: row count, approx distinct cells,
per-admin-code histogram, wall time, engine version — the "per-partition
lineage manifests and row-count + cell-assignment metrics" of the
north_star.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Iterable

from pyspark.sql import DataFrame, functions as F

from .. import __version__

MANIFEST_DIR = "_lineage"


def _manifest_path(base: str, chunk: str) -> str:
    return os.path.join(base, MANIFEST_DIR, f"{chunk}.json")


def committed_chunks(base: str) -> set[str]:
    d = os.path.join(base, MANIFEST_DIR)
    if not os.path.isdir(d):
        return set()
    return {f[:-5] for f in os.listdir(d) if f.endswith(".json")}


def _write_manifest(base: str, chunk: str, payload: dict) -> None:
    d = os.path.join(base, MANIFEST_DIR)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{chunk}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f, ensure_ascii=False, indent=1)
    os.replace(tmp, _manifest_path(base, chunk))  # atomic commit


def tile_metrics(df: DataFrame, cell_col: str = "cell") -> dict:
    """One aggregation pass: rows, approx distinct cells, admin
    histogram, plus a MERGEABLE DataSketches HLL sketch of image_id
    (base64 in the manifest). Mergeability is the point: per-chunk
    sketches union into exact-algebra global distinct estimates
    without re-reading any data — see :func:`global_distinct_images`.
    """
    import base64

    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.approx_count_distinct(cell_col).alias("approx_cells"),
    ]
    has_img = "image_id" in df.columns
    if has_img:
        aggs.append(F.hll_sketch_agg("image_id").alias("img_sketch"))
    agg = df.agg(*aggs).collect()[0]
    hist = {
        r["admin_code"]: r["n"]
        for r in df.groupBy("admin_code")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    } if "admin_code" in df.columns else {}
    out = {
        "rows": agg["rows"],
        "approx_cells": agg["approx_cells"],
        "admin_histogram": hist,
    }
    if has_img and agg["img_sketch"] is not None:
        out["image_hll_b64"] = base64.b64encode(
            bytes(agg["img_sketch"])
        ).decode("ascii")
    return out


def global_distinct_images(spark, base: str) -> int:
    """Union the per-chunk HLL sketches recorded in the committed
    manifests → global approx-distinct image count. Reads ONLY the
    manifest JSONs (bytes, not data) — the incremental-metrics path for
    a 100 TB output: each new chunk contributes its sketch once, and
    the global estimate is a driver-side merge."""
    import base64
    import json as _json

    sketches = []
    for c in sorted(committed_chunks(base)):
        with open(_manifest_path(base, c)) as f:
            m = _json.load(f)
        if "image_hll_b64" in m:
            sketches.append(base64.b64decode(m["image_hll_b64"]))
    if not sketches:
        return 0
    df = spark.createDataFrame(
        [(bytearray(s),) for s in sketches], "sketch binary"
    )
    row = df.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n")
    ).collect()[0]
    return int(row["n"])


def write_chunk(
    df: DataFrame,
    base: str,
    chunk: str,
    cell_col: str = "cell",
    partition_cols: tuple[str, ...] = (),
) -> dict:
    """Write one chunk idempotently and commit its manifest.
    ``partition_cols`` (e.g. ``("admin_code",)``) produces hive-style
    subdirectories inside the chunk so downstream per-admin reads
    prune at the directory level. Partitioning happens on derived
    ``_p_<col>`` copies, so the data columns keep their exact types
    and every file still carries the full row schema."""
    t0 = time.time()
    out = os.path.join(base, f"chunk={chunk}")
    writer_df = df
    if partition_cols:
        from pyspark.sql import functions as _F

        for c in partition_cols:
            writer_df = writer_df.withColumn(f"_p_{c}", _F.col(c))
    writer = writer_df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*[f"_p_{c}" for c in partition_cols])
    writer.parquet(out)
    written = df.sparkSession.read.parquet(out)
    payload = {
        "chunk": chunk,
        "engine_version": __version__,
        "path": out,
        "partition_cols": list(partition_cols),
        "elapsed_sec": round(time.time() - t0, 3),
        **tile_metrics(written, cell_col),
    }
    _write_manifest(base, chunk, payload)
    return payload


def run_resumable(
    base: str,
    chunks: Iterable[str],
    process: Callable[[str], DataFrame],
    cell_col: str = "cell",
    partition_cols: tuple[str, ...] = (),
) -> dict:
    """Process chunks, skipping committed ones. Returns a run summary
    {chunk: manifest}, with skipped chunks loaded from their manifests."""
    done = committed_chunks(base)
    summary: dict[str, dict] = {}
    for chunk in chunks:
        if chunk in done:
            with open(_manifest_path(base, chunk)) as f:
                summary[chunk] = json.load(f)
            summary[chunk]["skipped"] = True
            continue
        summary[chunk] = write_chunk(
            process(chunk), base, chunk, cell_col, partition_cols
        )
    return summary


def _read_chunk(spark, path: str) -> DataFrame:
    df = spark.read.option("basePath", path).parquet(path)
    return df.drop(*[c for c in df.columns if c.startswith("_p_")])


def _chunk_layout(base: str, chunk: str) -> tuple[str, ...]:
    """Partition layout of a committed chunk. Preferred source is the
    manifest's ``partition_cols`` record; manifests written before that
    field existed fall back to detecting ``_p_<col>=`` directory levels
    under the chunk (driver-side listdir — bytes, not data)."""
    with open(_manifest_path(base, chunk)) as f:
        m = json.load(f)
    if "partition_cols" in m:
        return tuple(m["partition_cols"])
    cols: list[str] = []
    d = os.path.join(base, f"chunk={chunk}")
    while os.path.isdir(d):
        subs = [
            n
            for n in os.listdir(d)
            if n.startswith("_p_") and "=" in n
            and os.path.isdir(os.path.join(d, n))
        ]
        if not subs:
            break
        cols.append(subs[0].split("=", 1)[0][len("_p_"):])
        d = os.path.join(d, subs[0])
    return tuple(cols)


def read_tiles(spark, base: str) -> DataFrame:
    """Read back all committed chunks (uncommitted ones are excluded —
    their data may be partial). One multi-path scan PER PARTITION
    LAYOUT, not a union per chunk: a union chain builds an
    O(n_chunks)-deep plan that stalls Catalyst at the 10³⁺ chunks a
    season of incremental runs produces. Chunks written with different
    ``partition_cols`` (run_resumable accepts them per run) cannot
    share one scan — Spark's partition discovery rejects a conflicting
    layout — so chunks are grouped by the layout recorded in their
    lineage manifests and the (few) per-layout scans are unioned; plan
    depth is O(n_layouts), which is O(1) in practice."""
    done = sorted(committed_chunks(base))
    if not done:
        raise FileNotFoundError(f"no committed chunks under {base}")
    by_layout: dict[tuple[str, ...], list[str]] = {}
    for c in done:
        by_layout.setdefault(_chunk_layout(base, c), []).append(c)
    frames = []
    for chunks in by_layout.values():
        paths = [os.path.join(base, f"chunk={c}") for c in chunks]
        # basePath=base makes chunk= (and any _p_*) partition
        # directories resolve against ONE table root, so only the
        # committed chunk paths are scanned and the discovered
        # partition columns drop cleanly.
        df = spark.read.option("basePath", base).parquet(*paths)
        frames.append(
            df.drop("chunk", *[c for c in df.columns if c.startswith("_p_")])
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
