"""Iceberg-style table layer: snapshot/manifest metadata over parquet.

The north_rule mandates operating "over Iceberg tables of image +
caption pairs". No Iceberg runtime jar ships in this environment, so
this module implements the Iceberg *table format contract* directly on
the filesystem — the same metadata architecture, scoped to what the
engine needs:

* **Snapshot isolation + atomic commits.** Data files are immutable;
  a commit writes data first, then the snapshot manifest, then a new
  ``v{N}.metadata.json``, and finally swaps ``version-hint.text`` via
  atomic rename. Readers resolve the hint → metadata → manifest → file
  list, so a crashed writer can never corrupt a readable table.
* **Time travel / rollback.** Every snapshot keeps its parent id;
  ``read(..., snapshot_id=...)`` reads any retained snapshot and
  ``rollback`` commits a new metadata version pointing at an old one
  (history is preserved, exactly like Iceberg's rollback).
* **File-level stats pruning.** Each manifest records per-file row
  counts and per-column min/max taken from the parquet footers;
  ``scan`` prunes files by those stats before Spark ever opens them —
  Iceberg's manifest-filtering behavior, and the mechanism that makes
  bbox/cell range scans cheap at 100 TB (entire files skipped, not
  just row groups).

Layout::

    table/
      metadata/version-hint.text      # current metadata version
      metadata/v{N}.metadata.json     # schema + snapshot log + current id
      metadata/snap-{id}.json         # manifest: data files + stats
      data/snap-{id}/part-*.parquet   # immutable data files

On a real cluster the same protocol works on any atomic-rename store
(HDFS); for S3-class stores the hint swap would go through a catalog
service — the reader/writer contract here is unchanged.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

FORMAT_VERSION = 2


class CommitError(RuntimeError):
    pass


def _meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def _hint_path(path: str) -> str:
    return os.path.join(_meta_dir(path), "version-hint.text")


def current_version(path: str) -> int:
    """0 when the table doesn't exist yet."""
    try:
        with open(_hint_path(path)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def _load_metadata(path: str, version: int | None = None) -> dict:
    v = version if version is not None else current_version(path)
    if v == 0:
        raise FileNotFoundError(f"no iceberg-style table at {path}")
    with open(os.path.join(_meta_dir(path), f"v{v}.metadata.json")) as f:
        return json.load(f)


def _load_manifest(path: str, snapshot_id: int) -> dict:
    with open(os.path.join(_meta_dir(path), f"snap-{snapshot_id}.json")) as f:
        return json.load(f)


def _file_stats(file_path: str) -> dict:
    """Row count + per-column min/max from the parquet footer (scalar
    columns only — the stats that drive manifest pruning)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(file_path).metadata
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            name = col.path_in_schema
            lo, hi = st.min, st.max
            if isinstance(lo, bytes) or isinstance(hi, bytes):
                continue  # binary stats are not order-meaningful here
            if name not in mins or lo < mins[name]:
                mins[name] = lo
            if name not in maxs or hi > maxs[name]:
                maxs[name] = hi

    def _jsonable(d):
        return {
            k: (v.isoformat() if hasattr(v, "isoformat") else v)
            for k, v in d.items()
        }

    return {
        "rows": md.num_rows,
        "bytes": os.path.getsize(file_path),
        "min": _jsonable(mins),
        "max": _jsonable(maxs),
    }


def _commit(
    path: str,
    df: DataFrame,
    operation: str,
    parent_files: list[dict],
) -> int:
    meta_dir = _meta_dir(path)
    os.makedirs(meta_dir, exist_ok=True)
    version = current_version(path)
    parent_meta = _load_metadata(path, version) if version else None
    snapshot_id = (
        max((s["snapshot_id"] for s in parent_meta["snapshots"]), default=0) + 1
        if parent_meta
        else 1
    )

    # 1. data files (immutable, snapshot-owned directory)
    data_dir = os.path.join(path, "data", f"snap-{snapshot_id}")
    df.write.mode("overwrite").parquet(data_dir)
    new_files = []
    for name in sorted(os.listdir(data_dir)):
        if not name.endswith(".parquet"):
            continue
        fp = os.path.join(data_dir, name)
        new_files.append(
            {"path": os.path.relpath(fp, path), **_file_stats(fp)}
        )

    all_files = parent_files + new_files
    # 2. snapshot manifest
    manifest = {
        "snapshot_id": snapshot_id,
        "parent_snapshot_id": (
            parent_meta["current_snapshot_id"] if parent_meta else None
        ),
        "operation": operation,
        "timestamp_ms": int(time.time() * 1000),
        "files": all_files,
        "summary": {
            "added_files": len(new_files),
            "total_files": len(all_files),
            "added_rows": sum(f["rows"] for f in new_files),
            "total_rows": sum(f["rows"] for f in all_files),
        },
    }
    with open(os.path.join(meta_dir, f"snap-{snapshot_id}.json"), "w") as f:
        json.dump(manifest, f, indent=1)

    # 3. new metadata version
    snapshots = (parent_meta["snapshots"] if parent_meta else []) + [
        {
            "snapshot_id": snapshot_id,
            "parent_snapshot_id": manifest["parent_snapshot_id"],
            "operation": operation,
            "timestamp_ms": manifest["timestamp_ms"],
            "summary": manifest["summary"],
        }
    ]
    new_meta = {
        "format_version": FORMAT_VERSION,
        "schema": json.loads(df.schema.json()),
        "current_snapshot_id": snapshot_id,
        "snapshots": snapshots,
    }
    # Optimistic concurrency: claim a metadata version with
    # O_CREAT|O_EXCL — never overwrite an existing file (it may belong
    # to an in-flight concurrent writer; overwriting would silently
    # discard their snapshot). An existing-but-uncommitted file (crash
    # orphan or in-flight peer) is skipped by taking the next free
    # version number — versions don't need to be dense, the hint names
    # the current one. If the hint moved past our read version at any
    # point, a peer COMMITTED first → fail with CommitError (real
    # Iceberg losing-commit semantics); the final re-check below
    # narrows the unavoidable check-then-rename window of a
    # filesystem hint catalog (a real catalog closes it with CAS).
    new_version = version + 1
    while True:
        meta_path = os.path.join(meta_dir, f"v{new_version}.metadata.json")
        try:
            fd = os.open(meta_path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
            break
        except FileExistsError:
            if current_version(path) != version:
                raise CommitError(
                    f"concurrent commit at {path}: table moved past "
                    f"v{version} while committing; re-read and retry"
                ) from None
            new_version += 1
    with os.fdopen(fd, "w") as f:
        json.dump(new_meta, f, indent=1)
    if current_version(path) != version:
        raise CommitError(
            f"concurrent commit detected at {path} before publish; "
            "aborting (claimed v{new_version} left orphaned, hint untouched)"
        )

    # 4. atomic hint swap — THE commit point
    tmp = _hint_path(path) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(new_version))
    os.replace(tmp, _hint_path(path))
    return snapshot_id


def append(df: DataFrame, path: str) -> int:
    """Append a snapshot; returns the new snapshot id."""
    version = current_version(path)
    parent_files: list[dict] = []
    if version:
        meta = _load_metadata(path, version)
        parent_files = _load_manifest(path, meta["current_snapshot_id"])[
            "files"
        ]
    return _commit(path, df, "append", parent_files)


def overwrite(df: DataFrame, path: str) -> int:
    """Replace table contents in a new snapshot (old ones stay
    readable until expired)."""
    return _commit(path, df, "overwrite", [])


def _bounds_disjoint(f: dict, bounds: dict[str, tuple]) -> bool:
    """True if the file's manifest stats PROVE it holds no row the
    delete predicate can match (conjunctive per-column value bounds)."""
    for col, (lo, hi) in bounds.items():
        fmin, fmax = f["min"].get(col), f["max"].get(col)
        if fmin is None or fmax is None:
            continue
        if fmax < lo or fmin > hi:
            return True
    return False


def delete_where(
    spark: SparkSession,
    path: str,
    condition: str,
    bounds: dict[str, tuple] | None = None,
) -> dict:
    """Copy-on-write row-level DELETE: a new snapshot in which files
    that may contain matching rows are rewritten without them, and
    every provably-unaffected file is carried over untouched.

    ``bounds`` ({col: (lo, hi)}: the value range the predicate can
    match, conjunctive) drives manifest-stats pruning — on a
    spatially/temporally sorted 100 TB table a targeted delete rewrites
    only the overlapping files and never reads the rest. Rows where
    the predicate evaluates NULL are kept (SQL DELETE semantics).

    Old snapshots still read the pre-delete data (time travel) until
    expired. Returns {snapshot, files_rewritten, files_kept,
    rows_deleted}.
    """
    from pyspark.sql import functions as F

    files = _live_files(path)
    cands, kept = [], []
    for f in files:
        if bounds and _bounds_disjoint(f, bounds):
            kept.append(f)
        else:
            cands.append(f)
    if not cands:
        return {
            "snapshot": _load_metadata(path)["current_snapshot_id"],
            "files_rewritten": 0,
            "files_kept": len(kept),
            "rows_deleted": 0,
        }
    cand_paths = [os.path.join(path, f["path"]) for f in cands]
    df = spark.read.parquet(*cand_paths)
    # keep rows where the predicate is FALSE or NULL
    survivors = df.filter(F.coalesce(~F.expr(condition), F.lit(True)))
    n_before = sum(f["rows"] for f in cands)
    sid = _commit(path, survivors, "delete", kept)
    n_after = _load_manifest(path, sid)["summary"]["added_rows"]
    return {
        "snapshot": sid,
        "files_rewritten": len(cands),
        "files_kept": len(kept),
        "rows_deleted": n_before - n_after,
    }


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
) -> dict:
    """MERGE (upsert by key), copy-on-write: rows in ``updates`` replace
    same-key rows; new keys append. Files that provably contain no
    matching key — by comparing their manifest min/max against the
    updates' own key range (computed in one tiny aggregation) — are
    carried over untouched, so a keyed upsert against a key-sorted
    100 TB table rewrites only the overlapping files.

    Returns {snapshot, files_rewritten, files_kept, rows_updated,
    rows_inserted}.
    """
    from pyspark.sql import functions as F

    files = _live_files(path)
    # auto-bounds from the updates' key range (single-row aggregate)
    aggs = []
    for c in key_cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    r = updates.agg(*aggs).collect()[0]
    bounds = {
        c: (r[f"__lo_{c}"], r[f"__hi_{c}"])
        for c in key_cols
        if r[f"__lo_{c}"] is not None
    }
    cands, kept = [], []
    for f in files:
        if bounds and _bounds_disjoint(f, bounds):
            kept.append(f)
        else:
            cands.append(f)
    updates = updates.dropDuplicates(key_cols)
    if cands:
        cand_paths = [os.path.join(path, f["path"]) for f in cands]
        existing = spark.read.parquet(*cand_paths)
        survivors = existing.join(
            updates.select(*key_cols), key_cols, "left_anti"
        )
        n_before = sum(f["rows"] for f in cands)
        new_data = survivors.unionByName(updates)
    else:
        n_before = 0
        new_data = updates
    sid = _commit(path, new_data, "merge", kept)
    n_written = _load_manifest(path, sid)["summary"]["added_rows"]
    n_updates = updates.count()
    n_survivors = n_written - n_updates
    return {
        "snapshot": sid,
        "files_rewritten": len(cands),
        "files_kept": len(kept),
        "rows_updated": n_before - n_survivors,
        "rows_inserted": n_updates - (n_before - n_survivors),
    }


def history(path: str) -> list[dict]:
    return _load_metadata(path)["snapshots"]


def _live_files(path: str, snapshot_id: int | None = None) -> list[dict]:
    meta = _load_metadata(path)
    sid = snapshot_id if snapshot_id is not None else meta["current_snapshot_id"]
    if sid not in {s["snapshot_id"] for s in meta["snapshots"]}:
        raise CommitError(f"unknown/expired snapshot {sid}")
    return _load_manifest(path, sid)["files"]


def added_files(
    path: str, since_snapshot: int | None, to_snapshot: int | None = None
) -> list[dict]:
    """Incremental-scan primitive: data files present in ``to_snapshot``
    (default: current) but NOT in ``since_snapshot`` — i.e. the files an
    append-only workload added between the two snapshots. With
    ``since_snapshot=None`` every live file is "added" (full scan).

    This is what keeps a 100 TB maintenance job incremental: the tile
    pipeline re-joins only the NEW files after each append instead of
    rescanning the table (real Iceberg's incremental append scan).
    """
    new = {f["path"]: f for f in _live_files(path, to_snapshot)}
    if since_snapshot is not None:
        for f in _live_files(path, since_snapshot):
            new.pop(f["path"], None)
    return list(new.values())


def read(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Read the current (or a time-travel) snapshot. ``merge_schema``
    reconciles files written under evolved schemas (columns added by a
    later append read as null in older files — Iceberg's add-column
    semantics)."""
    files = _live_files(path, snapshot_id)
    if not files:
        raise FileNotFoundError(f"snapshot has no data files: {path}")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*(os.path.join(path, f["path"]) for f in files))


def scan(
    spark: SparkSession,
    path: str,
    bounds: dict[str, tuple] | None = None,
    snapshot_id: int | None = None,
) -> tuple[DataFrame, dict]:
    """Manifest-pruned scan: ``bounds`` maps column → (lo, hi); files
    whose stats ranges don't overlap are never opened. Returns
    (DataFrame, {"files_total", "files_read"}) so callers/tests can see
    the pruning. The residual predicate must still be applied by the
    caller (stats prune files, they don't filter rows)."""
    files = _live_files(path, snapshot_id)
    selected = []
    for fmeta in files:
        keep = True
        for col, (lo, hi) in (bounds or {}).items():
            fmin = fmeta["min"].get(col)
            fmax = fmeta["max"].get(col)
            if fmin is None or fmax is None:
                continue  # no stats → cannot prune
            if fmax < lo or fmin > hi:
                keep = False
                break
        if keep:
            selected.append(fmeta)
    info = {"files_total": len(files), "files_read": len(selected)}
    if not selected:
        schema_df = read(spark, path, snapshot_id).limit(0)
        return schema_df, info
    df = spark.read.parquet(
        *(os.path.join(path, f["path"]) for f in selected)
    )
    return df, info


def rollback(path: str, snapshot_id: int) -> int:
    """Commit a new metadata version whose current snapshot is an
    older one (no data is touched; history is preserved)."""
    version = current_version(path)
    meta = _load_metadata(path, version)
    if snapshot_id not in {s["snapshot_id"] for s in meta["snapshots"]}:
        raise CommitError(f"unknown snapshot {snapshot_id}")
    new_meta = dict(meta, current_snapshot_id=snapshot_id)
    new_version = version + 1
    with open(
        os.path.join(_meta_dir(path), f"v{new_version}.metadata.json"), "w"
    ) as f:
        json.dump(new_meta, f, indent=1)
    tmp = _hint_path(path) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(new_version))
    os.replace(tmp, _hint_path(path))
    return new_version


def compact(
    spark: SparkSession, path: str, target_rows_per_file: int = 1_000_000
) -> int:
    """Rewrite the current snapshot's data into right-sized files (the
    small-files problem: a long append history leaves many tiny files;
    manifest pruning and scan parallelism both degrade). Commits a new
    ``replace`` snapshot; old snapshots stay readable until expired."""
    df = read(spark, path)
    n = df.count()
    n_files = max(1, (n + target_rows_per_file - 1) // target_rows_per_file)
    return _commit(path, df.repartition(n_files), "replace", [])


def vacuum_orphans(path: str, min_age_sec: float = 3600.0) -> dict:
    """Garbage-collect artifacts no snapshot references: data files in
    ``data/snap-*`` directories (crashed writers, failed COW rewrites)
    and metadata versions above the published one (losing commits).

    ``min_age_sec`` protects in-flight writers — only artifacts older
    than the horizon are removed (the same contract as Iceberg's
    remove_orphan_files; pass 0 in tests). The published hint file and
    everything any snapshot references are never touched.

    Returns {"deleted_files": n, "deleted_meta": m}.
    """
    version = current_version(path)
    meta = _load_metadata(path, version)
    referenced: set[str] = set()
    for s in meta["snapshots"]:
        try:
            man = _load_manifest(path, s["snapshot_id"])
        except FileNotFoundError:
            continue
        referenced.update(f["path"] for f in man["files"])
    now = time.time()
    deleted_files = 0
    data_root = os.path.join(path, "data")
    if os.path.isdir(data_root):
        for snap_dir in sorted(os.listdir(data_root)):
            d = os.path.join(data_root, snap_dir)
            for name in sorted(os.listdir(d)):
                fp = os.path.join(d, name)
                rel = os.path.relpath(fp, path)
                if rel in referenced:
                    continue
                if not name.endswith(".parquet"):
                    continue  # _SUCCESS etc. cleaned with the last file
                if now - os.path.getmtime(fp) < min_age_sec:
                    continue
                os.remove(fp)
                deleted_files += 1
            if not any(n.endswith(".parquet") for n in os.listdir(d)):
                import shutil

                shutil.rmtree(d)
    deleted_meta = 0
    meta_dir = _meta_dir(path)
    known_snaps = {s["snapshot_id"] for s in meta["snapshots"]}
    for name in sorted(os.listdir(meta_dir)):
        fp = os.path.join(meta_dir, name)
        if name.startswith("v") and name.endswith(".metadata.json"):
            v = int(name[1:].split(".")[0])
            if v > version and now - os.path.getmtime(fp) >= min_age_sec:
                os.remove(fp)
                deleted_meta += 1
        elif name.startswith("snap-") and name.endswith(".json"):
            sid = int(name[5:].split(".")[0])
            if (
                sid not in known_snaps
                and now - os.path.getmtime(fp) >= min_age_sec
            ):
                os.remove(fp)
                deleted_meta += 1
    return {"deleted_files": deleted_files, "deleted_meta": deleted_meta}


def expire_snapshots(path: str, keep_last: int = 1) -> dict:
    """Drop all but the newest ``keep_last`` snapshots (the current one
    is always kept) and delete data files referenced by no retained
    snapshot. Returns {"expired": [...], "deleted_files": n}."""
    version = current_version(path)
    meta = _load_metadata(path, version)
    snaps = sorted(meta["snapshots"], key=lambda s: s["snapshot_id"])
    keep_ids = {s["snapshot_id"] for s in snaps[-keep_last:]}
    keep_ids.add(meta["current_snapshot_id"])
    expired = [s for s in snaps if s["snapshot_id"] not in keep_ids]
    if not expired:
        return {"expired": [], "deleted_files": 0}

    retained_files = set()
    for sid in keep_ids:
        retained_files.update(f["path"] for f in _load_manifest(path, sid)["files"])
    deleted = 0
    for s in expired:
        man = _load_manifest(path, s["snapshot_id"])
        for fmeta in man["files"]:
            if fmeta["path"] in retained_files:
                continue
            fp = os.path.join(path, fmeta["path"])
            if os.path.exists(fp):
                os.remove(fp)
                deleted += 1
        os.remove(
            os.path.join(_meta_dir(path), f"snap-{s['snapshot_id']}.json")
        )

    new_meta = dict(
        meta,
        snapshots=[s for s in snaps if s["snapshot_id"] in keep_ids],
    )
    new_version = version + 1
    with open(
        os.path.join(_meta_dir(path), f"v{new_version}.metadata.json"), "w"
    ) as f:
        json.dump(new_meta, f, indent=1)
    tmp = _hint_path(path) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(new_version))
    os.replace(tmp, _hint_path(path))
    return {
        "expired": [s["snapshot_id"] for s in expired],
        "deleted_files": deleted,
    }
