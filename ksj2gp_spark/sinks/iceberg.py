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
    parent_files: list[dict] | None,
    expected_version: int | None = None,
) -> int:
    """Create one snapshot under the table's exclusive commit lock.

    The WHOLE commit (parent resolution → data write → metadata claim →
    hint swap) runs inside the lock: concurrent commits to one table
    serialize, exactly like commits through a real Iceberg catalog, so
    a racing writer can never drop a peer's files from the next
    manifest (the subtle lost-update the concurrency test exposed: the
    parent FILE LIST, not just the version number, must be current at
    commit time).

    * ``operation="append"`` (parent_files=None): the current
      snapshot's files are resolved here, under the lock — an append
      composes with ANY concurrent history, so it never fails, it just
      waits its turn.
    * rewriting operations (delete/merge) pass the ``parent_files``
      they computed from their own read along with the
      ``expected_version`` they read it at; if the table moved, their
      file arithmetic is stale → CommitError, caller re-reads and
      retries (losing-commit semantics).
    """
    meta_dir = _meta_dir(path)
    os.makedirs(meta_dir, exist_ok=True)
    lock = _acquire_commit_lock(meta_dir)
    try:
        return _commit_locked(
            path, meta_dir, df, operation, parent_files, expected_version
        )
    finally:
        _release_commit_lock(lock)


def _commit_locked(
    path: str,
    meta_dir: str,
    df: DataFrame,
    operation: str,
    parent_files: list[dict] | None,
    expected_version: int | None,
) -> int:
    version = current_version(path)
    if expected_version is not None and version != expected_version:
        raise CommitError(
            f"concurrent commit at {path}: table moved from "
            f"v{expected_version} to v{version}; re-read and retry"
        )
    parent_meta = _load_metadata(path, version) if version else None
    if parent_files is None:  # append: resolve parents under the lock
        parent_files = (
            _load_manifest(path, parent_meta["current_snapshot_id"])["files"]
            if parent_meta
            else []
        )
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
    # Claim the next free metadata file with O_CREAT|O_EXCL — crash
    # orphans are skipped, never overwritten (versions need not be
    # dense; the hint names the current one).
    new_version = version + 1
    while True:
        meta_path = os.path.join(meta_dir, f"v{new_version}.metadata.json")
        try:
            fd = os.open(meta_path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
            break
        except FileExistsError:
            new_version += 1
    with os.fdopen(fd, "w") as f:
        json.dump(new_meta, f, indent=1)

    # 4. atomic hint swap — THE commit point (still under the lock)
    tmp = _hint_path(path) + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(str(new_version))
    os.replace(tmp, _hint_path(path))
    return snapshot_id


def _acquire_commit_lock(
    meta_dir: str, timeout: float = 30.0, stale_sec: float = 120.0
) -> str:
    """O_EXCL lock file with bounded wait; a lock older than
    ``stale_sec`` (crashed writer) is taken over."""
    lock = os.path.join(meta_dir, "commit.lock")
    deadline = time.time() + timeout
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            return lock
        except FileExistsError:
            try:
                if time.time() - os.path.getmtime(lock) > stale_sec:
                    os.remove(lock)
                    continue
            except FileNotFoundError:
                continue
            if time.time() > deadline:
                raise CommitError(
                    f"commit lock timeout at {lock}"
                ) from None
            time.sleep(0.02)


def _release_commit_lock(lock: str) -> None:
    try:
        os.remove(lock)
    except FileNotFoundError:
        pass


def append(df: DataFrame, path: str) -> int:
    """Append a snapshot; returns the new snapshot id. Parent files are
    resolved inside the commit lock, so concurrent appends serialize
    and compose — neither fails, neither loses the other's files."""
    return _commit(path, df, "append", None)


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

    ver0 = current_version(path)
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
    # kept-file arithmetic is valid only at ver0: CommitError if moved
    sid = _commit(path, survivors, "delete", kept, expected_version=ver0)
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

    ver0 = current_version(path)
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
    sid = _commit(path, new_data, "merge", kept, expected_version=ver0)
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
