"""Iceberg-style table layer: snapshots, time travel, rollback,
manifest pruning, crash-safe commits (sinks/iceberg.py)."""

import json
import os

import numpy as np

import pytest
from pyspark.sql import functions as F

from ksj2gp_spark.sinks import iceberg


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df1 = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 7).alias("bucket")
    )
    s1 = iceberg.append(df1, path)
    df2 = spark.range(100, 250).select(
        F.col("id"), (F.col("id") % 7).alias("bucket")
    )
    s2 = iceberg.append(df2, path)
    return path, s1, s2


def test_append_and_read_current(spark, table):
    path, s1, s2 = table
    assert (s1, s2) == (1, 2)
    assert iceberg.read(spark, path).count() == 250
    hist = iceberg.history(path)
    assert [h["snapshot_id"] for h in hist] == [1, 2]
    assert hist[1]["parent_snapshot_id"] == 1
    assert hist[1]["summary"]["total_rows"] == 250


def test_time_travel_and_rollback(spark, table):
    path, s1, s2 = table
    assert iceberg.read(spark, path, snapshot_id=s1).count() == 100
    iceberg.rollback(path, s1)
    assert iceberg.read(spark, path).count() == 100
    # history preserved; s2 still readable after rollback
    assert iceberg.read(spark, path, snapshot_id=s2).count() == 250


def test_overwrite_starts_fresh(spark, table):
    path, _, _ = table
    df = spark.range(0, 10).select(F.col("id"), F.lit(0).alias("bucket"))
    iceberg.overwrite(df, path)
    assert iceberg.read(spark, path).count() == 10


def test_manifest_pruning_skips_files(spark, tmp_path):
    path = str(tmp_path / "pruned")
    # 4 appends with disjoint id ranges → disjoint file stats
    for lo in (0, 1000, 2000, 3000):
        df = spark.range(lo, lo + 1000).repartition(2)
        iceberg.append(df, path)
    full, info_full = iceberg.scan(spark, path)
    assert info_full["files_read"] == info_full["files_total"]
    df, info = iceberg.scan(spark, path, bounds={"id": (2100, 2200)})
    assert info["files_read"] < info["files_total"]
    # residual predicate on the pruned scan gives the exact answer
    assert df.filter((F.col("id") >= 2100) & (F.col("id") <= 2200)).count() == 101
    # empty-range scan returns schema-only frame
    edf, einfo = iceberg.scan(spark, path, bounds={"id": (10**9, 2 * 10**9)})
    assert einfo["files_read"] == 0 and edf.count() == 0


def test_crashed_commit_invisible(spark, table):
    """Data+manifest written but hint not swapped → readers see the old
    snapshot (the commit point is the atomic hint rename)."""
    path, _, s2 = table
    v_before = iceberg.current_version(path)
    # simulate a crash: write orphan data + manifest + metadata but no hint
    orphan_dir = os.path.join(path, "data", "snap-99")
    spark.range(0, 5).write.parquet(orphan_dir)
    with open(os.path.join(path, "metadata", "snap-99.json"), "w") as f:
        json.dump({"snapshot_id": 99, "files": []}, f)
    with open(
        os.path.join(path, "metadata", f"v{v_before + 1}.metadata.json"), "w"
    ) as f:
        json.dump({"current_snapshot_id": 99, "snapshots": []}, f)
    assert iceberg.current_version(path) == v_before
    assert iceberg.read(spark, path).count() == 250
    # next real commit lands cleanly on top
    iceberg.append(spark.range(0, 3).select(F.col("id"), F.lit(1).alias("bucket")), path)
    assert iceberg.read(spark, path).count() == 253


def test_expire_snapshots_deletes_orphan_files(spark, table):
    path, s1, s2 = table
    out = iceberg.expire_snapshots(path, keep_last=1)
    assert out["expired"] == [s1]
    # s1's files are shared with s2 (append) → nothing deleted
    assert out["deleted_files"] == 0
    assert iceberg.read(spark, path).count() == 250
    with pytest.raises(iceberg.CommitError):
        iceberg.read(spark, path, snapshot_id=s1)

    # overwrite then expire → old files actually deleted
    df = spark.range(0, 10).select(F.col("id"), F.lit(0).alias("bucket"))
    iceberg.overwrite(df, path)
    out2 = iceberg.expire_snapshots(path, keep_last=1)
    assert out2["deleted_files"] > 0
    assert iceberg.read(spark, path).count() == 10


def test_images_table_roundtrip(spark, tmp_path):
    """input_hint shape stored and read back through the table layer."""
    from ksj2gp_spark import fixtures

    path = str(tmp_path / "images_tbl")
    imgs = fixtures.images_df(spark, 200, with_bytes=True)
    iceberg.append(imgs, path)
    back = iceberg.read(spark, path)
    assert back.count() == 200
    assert dict(back.dtypes)["bytes"] == "binary"
    assert dict(back.dtypes)["phash"] == "bigint"


def test_compact_rewrites_small_files(spark, tmp_path):
    path = str(tmp_path / "many_files")
    for i in range(5):
        iceberg.append(spark.range(i * 100, (i + 1) * 100).repartition(4), path)
    files_before = len(iceberg._live_files(path))
    assert files_before == 20
    iceberg.compact(spark, path, target_rows_per_file=10_000)
    assert len(iceberg._live_files(path)) == 1
    assert iceberg.read(spark, path).count() == 500
    # expiring old snapshots reclaims the small files
    out = iceberg.expire_snapshots(path, keep_last=1)
    assert out["deleted_files"] == files_before
    assert iceberg.read(spark, path).count() == 500


def test_schema_evolution_add_column(spark, tmp_path):
    """Appending with an added column: old files read as null for the
    new column under merge_schema (Iceberg add-column semantics)."""
    path = str(tmp_path / "evolve")
    iceberg.append(spark.range(0, 50).select(F.col("id")), path)
    iceberg.append(
        spark.range(50, 80).select(F.col("id"), (F.col("id") * 2).alias("extra")),
        path,
    )
    df = iceberg.read(spark, path, merge_schema=True)
    assert set(df.columns) == {"id", "extra"}
    assert df.count() == 80
    assert df.filter(F.col("extra").isNull()).count() == 50
    # current metadata records the evolved schema
    meta = iceberg._load_metadata(path)
    names = {f["name"] for f in meta["schema"]["fields"]}
    assert names == {"id", "extra"}


def test_delete_where_cow_with_stats_pruning(spark, tmp_path):
    """COW delete: only files overlapping the predicate's bounds are
    rewritten; time travel still reads the pre-delete rows."""
    path = str(tmp_path / "del_tbl")
    # value-sorted across files → tight per-file id stats
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("bucket")
    ).repartitionByRange(5, "id").sortWithinPartitions("id")
    s1 = iceberg.append(df, path)
    n_files = len(iceberg._live_files(path))
    assert n_files >= 4

    out = iceberg.delete_where(
        spark, path, "id >= 100 AND id < 200", bounds={"id": (100, 199)}
    )
    assert out["rows_deleted"] == 100
    assert out["files_kept"] > 0  # stats pruning kept untouched files
    assert out["files_rewritten"] < n_files
    got = iceberg.read(spark, path)
    assert got.count() == 900
    assert got.filter("id >= 100 AND id < 200").count() == 0
    # time travel: the pre-delete snapshot still sees everything
    assert iceberg.read(spark, path, snapshot_id=s1).count() == 1000
    # a fully-disjoint delete is a metadata no-op
    out2 = iceberg.delete_where(
        spark, path, "id > 5000", bounds={"id": (5001, 10**9)}
    )
    assert out2["rows_deleted"] == 0 and out2["files_rewritten"] == 0


def test_delete_where_null_predicate_rows_kept(spark, tmp_path):
    """Rows where the predicate evaluates NULL survive the delete."""
    path = str(tmp_path / "del_null")
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "id int, v double"
    )
    iceberg.append(df, path)
    out = iceberg.delete_where(spark, path, "v > 20")
    assert out["rows_deleted"] == 1
    got = iceberg.read(spark, path).toPandas().sort_values("id")
    assert list(got["id"]) == [1, 2]  # NULL-v row kept


def test_merge_upsert_cow_with_auto_pruning(spark, tmp_path):
    """Keyed MERGE: same-key rows replaced, new keys appended; files
    outside the updates' key range are carried over untouched."""
    path = str(tmp_path / "merge_tbl")
    # even keys only → odd keys are insertable WITHIN the key range
    df = spark.range(0, 1000).select(
        (F.col("id") * 2).alias("id"), (F.col("id") * 10).alias("v")
    ).repartitionByRange(5, "id").sortWithinPartitions("id")
    iceberg.append(df, path)
    n_files = len(iceberg._live_files(path))

    updates = spark.createDataFrame(
        [(150, -1), (160, -2), (151, -3)], "id long, v long"
    )
    out = iceberg.merge_upsert(spark, path, updates, ["id"])
    assert out["rows_updated"] == 2
    assert out["rows_inserted"] == 1
    # updates span keys 150..160 → only the file covering that slice
    # is rewritten; the rest carry over by reference
    assert 0 < out["files_rewritten"] < n_files
    assert out["files_kept"] > 0
    got = iceberg.read(spark, path)
    assert got.count() == 1001
    vals = {r["id"]: r["v"] for r in got.filter("id in (150,160,151,170)").collect()}
    assert vals == {150: -1, 160: -2, 151: -3, 170: 850}


def test_vacuum_orphans_removes_unreferenced_only(spark, tmp_path):
    """Crash leftovers (orphan data dir, claimed-but-unpublished
    metadata) are GC'd; everything referenced survives; readers
    unaffected."""
    path = str(tmp_path / "vac_tbl")
    iceberg.append(spark.range(0, 100).select(F.col("id")), path)
    iceberg.append(spark.range(100, 150).select(F.col("id")), path)

    # crash debris: orphan snapshot data + losing-commit metadata
    spark.range(0, 5).write.parquet(os.path.join(path, "data", "snap-77"))
    with open(os.path.join(path, "metadata", "v99.metadata.json"), "w") as f:
        f.write("{}")
    with open(os.path.join(path, "metadata", "snap-77.json"), "w") as f:
        f.write("{}")

    # min_age guard: fresh debris survives a vacuum with a horizon
    out0 = iceberg.vacuum_orphans(path, min_age_sec=3600)
    assert out0 == {"deleted_files": 0, "deleted_meta": 0}

    out = iceberg.vacuum_orphans(path, min_age_sec=0)
    assert out["deleted_files"] > 0
    assert out["deleted_meta"] == 2
    assert not os.path.exists(os.path.join(path, "data", "snap-77"))
    assert iceberg.read(spark, path).count() == 150
    assert iceberg.read(spark, path, snapshot_id=1).count() == 100


def test_concurrent_appends_lose_cleanly_never_silently(spark, tmp_path):
    """Two threads race 4 appends each with retry-on-CommitError: every
    batch must land exactly once (no lost updates, no duplicates)."""
    import threading
    import time as _t

    path = str(tmp_path / "conc_tbl")
    iceberg.append(spark.range(0, 10).select(F.col("id")), path)
    errors = []

    def writer(wid: int):
        for i in range(4):
            lo = 1000 * (wid + 1) + i * 100
            df = spark.range(lo, lo + 50).select(F.col("id"))
            for _attempt in range(30):
                try:
                    iceberg.append(df, path)
                    break
                except iceberg.CommitError:
                    _t.sleep(0.03)
            else:
                errors.append((wid, i))

    ts = [threading.Thread(target=writer, args=(w,)) for w in (0, 1)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert errors == []
    got = iceberg.read(spark, path)
    assert got.count() == 10 + 2 * 4 * 50
    assert got.select("id").distinct().count() == got.count()
    # stale-lock takeover: a dead writer's lock doesn't wedge the table
    lock = os.path.join(path, "metadata", "commit.lock")
    with open(lock, "w") as f:
        f.write("999999")
    os.utime(lock, (1, 1))  # ancient
    iceberg.append(spark.range(0, 5).select((F.col("id") + 10**6).alias("id")), path)
    assert iceberg.read(spark, path).count() == 415


def test_live_holders_lock_is_never_stolen(spark, tmp_path):
    """A lock whose recorded pid is ALIVE must not be taken over, even
    with an ancient mtime — a >stale_sec data write is a slow commit,
    not a crashed one (the old mtime-only rule stole it and the
    usurper's overwrite corrupted the slow writer's snapshot dir)."""
    path = str(tmp_path / "tbl_live")
    iceberg.append(spark.range(0, 10).select(F.col("id")), path)
    lock = os.path.join(path, "metadata", "commit.lock")
    with open(lock, "w") as f:
        f.write(f"{os.getpid()}:0:0")  # alive pid (our own), fake token
    os.utime(lock, (1, 1))  # ancient mtime
    with pytest.raises(iceberg.CommitError, match="timeout"):
        iceberg._acquire_commit_lock(
            os.path.join(path, "metadata"), timeout=0.5
        )
    os.remove(lock)


def test_heartbeat_keeps_slow_commit_lock_fresh(tmp_path):
    """The lease heartbeat refreshes the lock mtime, so a commit whose
    data write outlives stale_sec no longer looks stale to waiters."""
    import time as _t

    meta_dir = str(tmp_path / "meta")
    os.makedirs(meta_dir)
    lease = iceberg._acquire_commit_lock(meta_dir, stale_sec=0.4)
    try:
        os.utime(lease.lock, (1, 1))  # simulate an old mtime
        # poll: under CPU contention the heartbeat thread can be
        # scheduled late — the invariant is that it fires, not that it
        # fires within one interval of wall time
        deadline = _t.time() + 10.0
        while _t.time() < deadline and os.path.getmtime(lease.lock) < 1000:
            _t.sleep(0.05)
        assert os.path.getmtime(lease.lock) > 1000  # heartbeat touched it
        lease.verify()  # still ours
    finally:
        lease.release()
    assert not os.path.exists(lease.lock)


def test_usurped_writer_aborts_at_commit_point(tmp_path):
    """If the lock is stolen mid-commit, verify() (called before the
    hint swap) raises instead of clobbering the usurper's commit."""
    meta_dir = str(tmp_path / "meta")
    os.makedirs(meta_dir)
    lease = iceberg._acquire_commit_lock(meta_dir)
    with open(lease.lock, "w") as f:
        f.write("some-other-writers-token")
    with pytest.raises(iceberg.CommitError, match="ownership lost"):
        lease.verify()
    # release must NOT delete a lock that is no longer ours
    lease.release()
    assert os.path.exists(lease.lock)
    os.remove(lease.lock)


def test_admin_ops_serialize_with_commits(spark, tmp_path):
    """rollback/expire_snapshots go through the same commit lock and
    O_EXCL version claim as data commits: racing writers can no longer
    overwrite each other's metadata version or lose a hint swap."""
    import threading

    path = str(tmp_path / "tbl_admin")
    iceberg.append(spark.range(0, 10).select(F.col("id")), path)
    iceberg.append(spark.range(10, 20).select(F.col("id")), path)

    # hold the commit lock in this thread; rollback must block until
    # released rather than publishing concurrently
    lease = iceberg._acquire_commit_lock(os.path.join(path, "metadata"))
    done = []

    def do_rollback():
        done.append(iceberg.rollback(path, 1))

    t = threading.Thread(target=do_rollback)
    t.start()
    t.join(0.4)
    assert not done, "rollback ran while the commit lock was held"
    lease.release()
    t.join(10)
    assert done and iceberg.read(spark, path).count() == 10
    # expire under the lock path produces a dense, claimed version
    res = iceberg.expire_snapshots(path, keep_last=2)
    assert isinstance(res, dict)


def test_rename_column_is_metadata_only_and_id_mapped(spark, tmp_path):
    """Iceberg rename semantics: old data files keep the old parquet
    column name; the field ID carries the values to the new name."""
    path = str(tmp_path / "ren")
    iceberg.append(
        spark.range(0, 40).select(F.col("id"), (F.col("id") * 3).alias("v")),
        path,
    )
    files_before = {f["path"] for f in iceberg._live_files(path)}
    iceberg.rename_column(path, "v", "value")
    # no data file was rewritten
    assert {f["path"] for f in iceberg._live_files(path)} == files_before
    df = iceberg.read(spark, path, merge_schema=True)
    assert set(df.columns) == {"id", "value"}
    assert df.filter(F.col("value") == F.col("id") * 3).count() == 40
    # appends after the rename write the new name; both eras reconcile
    iceberg.append(
        spark.range(40, 60).select(
            F.col("id"), (F.col("id") * 3).alias("value")
        ),
        path,
    )
    df2 = iceberg.read(spark, path, merge_schema=True)
    assert df2.count() == 60
    assert df2.filter(F.col("value") == F.col("id") * 3).count() == 60

    with pytest.raises(iceberg.CommitError):
        iceberg.rename_column(path, "nope", "x")
    with pytest.raises(iceberg.CommitError):
        iceberg.rename_column(path, "id", "value")


def test_drop_column_then_readd_does_not_resurrect(spark, tmp_path):
    """Dropping a column hides it from reads; re-adding the same NAME
    mints a new field id, so old values must NOT come back."""
    path = str(tmp_path / "drop")
    iceberg.append(
        spark.range(0, 30).select(F.col("id"), F.lit("old").alias("tag")),
        path,
    )
    iceberg.drop_column(path, "tag")
    df = iceberg.read(spark, path, merge_schema=True)
    assert set(df.columns) == {"id"}
    # re-add "tag" via a new append: fresh field id
    iceberg.append(
        spark.range(30, 40).select(F.col("id"), F.lit("new").alias("tag")),
        path,
    )
    df2 = iceberg.read(spark, path, merge_schema=True)
    assert set(df2.columns) == {"id", "tag"}
    tags = {r.tag for r in df2.collect()}
    assert tags == {None, "new"}  # "old" stays buried in the old files
    assert df2.filter(F.col("tag").isNull()).count() == 30


def test_rename_interleaves_with_time_travel(spark, tmp_path):
    path = str(tmp_path / "tt")
    s1 = iceberg.append(
        spark.range(0, 10).select(F.col("id"), F.col("id").alias("a")), path
    )
    iceberg.rename_column(path, "a", "b")
    s2 = iceberg.append(
        spark.range(10, 20).select(F.col("id"), F.col("id").alias("b")), path
    )
    # current read: everything under the current name
    cur = iceberg.read(spark, path, merge_schema=True)
    assert set(cur.columns) == {"id", "b"}
    assert cur.filter(F.col("b") == F.col("id")).count() == 20
    # time travel to s1 still reads (current schema names apply)
    old = iceberg.read(spark, path, snapshot_id=s1, merge_schema=True)
    assert old.count() == 10
    assert s2 > s1


class TestPartitionedTables:
    """Iceberg-style partition specs: identity + hidden truncate."""

    def _tiles(self, spark, n=40):
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "image_id": [f"img{i:05d}" for i in range(n)],
                    "admin_code": [f"{13 + i % 4:02d}{101 + i:03d}"
                                   for i in range(n)],
                    "v": np.arange(n, dtype=np.int64),
                }
            )
        )

    def test_identity_partition_roundtrip_and_pruning(self, spark, tmp_path):
        from ksj2gp_spark.sinks import iceberg as I

        t = str(tmp_path / "t1")
        df = self._tiles(spark).withColumn(
            "pref", F.substring("admin_code", 1, 2)
        )
        I.append(df, t, partition_by=["pref"])
        got = I.read(spark, t).toPandas().sort_values("image_id")
        want = df.toPandas().sort_values("image_id")
        assert sorted(got.columns) == sorted(want.columns)
        for c in want.columns:
            assert list(got[c]) == list(want[c]), c
        # manifest carries typed partition values; files live in hive dirs
        files = I._live_files(t)
        assert all("pref=" in f["path"] for f in files)
        assert all(f["partition"]["pref"] in {"13", "14", "15", "16"}
                   for f in files)
        # partition-value pruning: one prefecture reads < all files
        _, info = I.scan(spark, t, bounds={"pref": ("13", "13")})
        assert info["files_read"] < info["files_total"]
        sdf, _ = I.scan(spark, t, bounds={"pref": ("13", "13")})
        assert set(sdf.toPandas()["pref"]) == {"13"}

    def test_many_partition_read_path_matches_group_path(
        self, spark, tmp_path
    ):
        """>32 identity partitions flips _read_files to the single-scan
        input_file_name() path (O(1) plan size); values, types, and
        null partitions must match the constant-column group path."""
        import pandas as pd

        from ksj2gp_spark.sinks import iceberg as I

        t = str(tmp_path / "tmany")
        n = 120  # 40 distinct buckets > the 32-group threshold
        df = spark.createDataFrame(
            [
                (
                    f"img{i:05d}",
                    None if i % 40 == 7 else (i % 40),
                    i,
                )
                for i in range(n)
            ],
            "image_id string, bucket long, v long",
        )
        I.append(df, t, partition_by=["bucket"])
        assert len({
            tuple(f["partition"].items()) for f in I._live_files(t)
        }) == 40
        got = I.read(spark, t).toPandas().sort_values("image_id")
        want = df.toPandas().sort_values("image_id")
        assert sorted(got.columns) == sorted(want.columns)
        for c in want.columns:
            a, b = list(got[c]), list(want[c])
            assert len(a) == len(b)
            for x, y in zip(a, b):
                assert (pd.isna(x) and pd.isna(y)) or x == y, c
        assert got["bucket"].dtype == want["bucket"].dtype
        # merge-schema read takes the same many-partition path
        gm = I.read(spark, t, merge_schema=True).toPandas()
        gm = gm.sort_values("image_id")
        for c in want.columns:
            for x, y in zip(list(gm[c]), list(want[c])):
                assert (pd.isna(x) and pd.isna(y)) or x == y, c
        # narrow scan still takes the group path and prunes
        _, info = I.scan(spark, t, bounds={"bucket": (3, 3)})
        assert info["files_read"] < info["files_total"]

    def test_hidden_truncate_partition(self, spark, tmp_path):
        from ksj2gp_spark.sinks import iceberg as I

        t = str(tmp_path / "t2")
        df = self._tiles(spark)
        I.append(df, t, partition_by=[("admin_code", "truncate[2]")])
        got = I.read(spark, t)
        # hidden: the derived dir column never surfaces to readers
        assert sorted(got.columns) == sorted(df.columns)
        assert got.count() == 40
        files = I._live_files(t)
        assert all("admin_code_trunc2=" in f["path"] for f in files)
        # equality bounds on the SOURCE column prune via the prefix
        _, info = I.scan(
            spark, t, bounds={"admin_code": ("13101", "13101")}
        )
        assert info["files_read"] < info["files_total"]

    def test_spec_is_sticky_and_enforced(self, spark, tmp_path):
        import pytest as _pytest

        from ksj2gp_spark.sinks import iceberg as I

        t = str(tmp_path / "t3")
        df = self._tiles(spark).withColumn(
            "pref", F.substring("admin_code", 1, 2)
        )
        I.append(df, t, partition_by=["pref"])
        # plain append inherits the spec (files still partitioned)
        I.append(df, t)
        assert all("pref=" in f["path"] for f in I._live_files(t))
        assert I.read(spark, t).count() == 80
        with _pytest.raises(I.CommitError):
            I.append(df, t, partition_by=["admin_code"])

    def test_cow_delete_and_vacuum_on_partitioned_table(
        self, spark, tmp_path
    ):
        from ksj2gp_spark.sinks import iceberg as I

        t = str(tmp_path / "t4")
        df = self._tiles(spark).withColumn(
            "pref", F.substring("admin_code", 1, 2)
        )
        I.append(df, t, partition_by=["pref"])
        # predicate ON the partition column: pruning keeps other prefs,
        # survivors keep their partition values
        r = I.delete_where(
            spark, t, "pref = '13'", bounds={"pref": ("13", "13")}
        )
        assert r["files_kept"] > 0 and r["rows_deleted"] == 10
        got = I.read(spark, t).toPandas()
        assert len(got) == 30 and "13" not in set(got["pref"])
        # vacuum must NOT judge live partitioned snapshots empty
        I.expire_snapshots(t, keep_last=1)
        I.vacuum_orphans(t, min_age_sec=0.0)
        assert I.read(spark, t).count() == 30

    def test_merge_schema_read_on_partitioned_table(self, spark, tmp_path):
        from ksj2gp_spark.sinks import iceberg as I

        t = str(tmp_path / "t5")
        df = self._tiles(spark, 20).withColumn(
            "pref", F.substring("admin_code", 1, 2)
        )
        I.append(df, t, partition_by=["pref"])
        I.append(df.withColumn("extra", F.lit(7)), t)
        got = I.read(spark, t, merge_schema=True).toPandas()
        assert len(got) == 40
        assert set(got["pref"]) == {"13", "14", "15", "16"}
        assert got["extra"].isna().sum() == 20


def test_partition_spec_columns_cannot_be_renamed_or_dropped(
    spark, tmp_path
):
    """Spec evolution is unsupported — renaming/dropping a column the
    partition spec references would desync directory names from the
    schema; both must refuse."""
    import pandas as pd

    t = str(tmp_path / "guard_tbl")
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["aa", "ab"], "v": [1, 2]})
    )
    iceberg.append(df, t, partition_by=["k"])
    with pytest.raises(iceberg.CommitError, match="partition spec"):
        iceberg.rename_column(t, "k", "k2")
    with pytest.raises(iceberg.CommitError, match="partition spec"):
        iceberg.drop_column(t, "k")
    # non-spec columns still evolve
    iceberg.rename_column(t, "v", "v2")
    assert "v2" in iceberg.read(spark, t, merge_schema=True).columns


def test_pipeline_rejects_identity_partitioned_image_table(
    spark, tmp_path
):
    import pandas as pd

    from ksj2gp_spark import fixtures, pipeline as P

    t = str(tmp_path / "img_tbl")
    df = (
        fixtures.images_df(spark, 50, with_bytes=False)
        .drop("bytes")
        .withColumn("pref", F.substring("image_id", 1, 3))
    )
    iceberg.append(df, t, partition_by=["pref"])
    with pytest.raises(ValueError, match="identity-partitioned"):
        P.run_tile_pipeline(
            spark, t, fixtures.polygon_layer(), str(tmp_path / "out"),
            scheme="grid", res=10, n_chunks=2,
        )


def test_spec_adoption_on_nonempty_table_refused(spark, tmp_path):
    """Introducing a partition spec on a table that already holds
    unpartitioned files must fail: legacy files carry no partition
    values and would become unreadable (or silently NULL the column
    under merge_schema)."""
    import pandas as pd

    t = str(tmp_path / "adopt_tbl")
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["aa", "ab"], "v": [1, 2]})
    )
    iceberg.append(df, t)  # unpartitioned
    with pytest.raises(iceberg.CommitError, match="cannot introduce"):
        iceberg.append(df, t, partition_by=["k"])
    # after overwrite (fresh file set) adoption is still refused:
    # overwrite passes parent_files=[] so it CAN establish a spec
    iceberg.overwrite(df, t)
    assert iceberg.read(spark, t).count() == 2


def test_date_identity_partition_prunes_and_merges(spark, tmp_path):
    """Date-typed identity partitions: bounds from Spark aggregates
    are datetime.date; pruning must not TypeError against the ISO
    strings the JSON manifest stores, and values round-trip."""
    import datetime as dt

    import pandas as pd

    t = str(tmp_path / "date_tbl")
    rows = pd.DataFrame(
        {
            "d": [dt.date(2024, 1, 1)] * 3 + [dt.date(2024, 2, 1)] * 3,
            "v": list(range(6)),
        }
    )
    iceberg.append(spark.createDataFrame(rows), t, partition_by=["d"])
    got = iceberg.read(spark, t).toPandas()
    assert set(got["d"]) == {dt.date(2024, 1, 1), dt.date(2024, 2, 1)}
    _, info = iceberg.scan(
        spark, t, bounds={"d": (dt.date(2024, 2, 1), dt.date(2024, 2, 28))}
    )
    assert info["files_read"] < info["files_total"]
    out = iceberg.delete_where(
        spark, t, "d = DATE'2024-01-01'",
        bounds={"d": (dt.date(2024, 1, 1), dt.date(2024, 1, 1))},
    )
    assert out["rows_deleted"] == 3 and out["files_kept"] > 0
    assert iceberg.read(spark, t).count() == 3


def test_diff_snapshots_incremental_rows(spark, tmp_path):
    """diff_snapshots returns exactly the rows appended between two
    snapshots (only the added files are read), incl. identity
    partition values; empty diff gives an empty frame."""
    import pandas as pd

    t = str(tmp_path / "diff_tbl")
    df1 = spark.createDataFrame(
        pd.DataFrame({"k": ["aa"] * 3, "v": [1, 2, 3]})
    )
    s1 = iceberg.append(df1, t, partition_by=["k"])
    df2 = spark.createDataFrame(
        pd.DataFrame({"k": ["ab"] * 2, "v": [10, 11]})
    )
    s2 = iceberg.append(df2, t)
    got = iceberg.diff_snapshots(spark, t, s1, s2).toPandas()
    assert sorted(got["v"]) == [10, 11]
    assert set(got["k"]) == {"ab"}  # partition value re-attached
    # full scan when since is None
    assert iceberg.diff_snapshots(spark, t, None).count() == 5
    # empty diff
    assert iceberg.diff_snapshots(spark, t, s2, s2).count() == 0


# -- round-4 advisor findings: schema-evolution safety + exactly-once
# state surviving snapshot expiration ---------------------------------


def test_evolve_rejects_incompatible_type_change(spark, tmp_path):
    """A frame carrying a non-promotable type for a known column must
    fail the COMMIT, not silently rewrite the table schema (which
    would NULL older files' values on merge reads)."""
    t = str(tmp_path / "evolve_bad")
    iceberg.append(
        spark.range(0, 10).select(F.col("id"), F.col("id").alias("v")), t
    )
    with pytest.raises(iceberg.CommitError, match="incompatible type"):
        iceberg.append(
            spark.range(10, 20).select(
                F.col("id"), F.col("id").cast("string").alias("v")
            ),
            t,
        )
    # the failed commit left no snapshot and no schema change
    assert iceberg.read(spark, t).count() == 10
    assert dict(iceberg.read(spark, t).dtypes)["v"] == "bigint"


def test_evolve_promotes_int_to_long_and_keeps_wider_type(spark, tmp_path):
    """int→long is a safe promotion: the table widens, and BOTH read
    paths surface one consistent bigint column across mixed-era files.
    A later narrower (int) write keeps the table's wider type."""
    t = str(tmp_path / "evolve_ok")
    iceberg.append(
        spark.range(0, 5).select(
            F.col("id"), F.col("id").cast("int").alias("v")
        ),
        t,
    )
    iceberg.append(
        spark.range(5, 8).select(
            F.col("id"), F.col("id").cast("bigint").alias("v")
        ),
        t,
    )
    for merge in (False, True):
        df = iceberg.read(spark, t, merge_schema=merge)
        assert dict(df.dtypes)["v"] == "bigint", merge
        assert sorted(r.v for r in df.collect()) == list(range(8)), merge
    # narrower write after promotion: values land, type stays bigint
    iceberg.append(
        spark.range(8, 9).select(
            F.col("id"), F.col("id").cast("int").alias("v")
        ),
        t,
    )
    df = iceberg.read(spark, t)
    assert dict(df.dtypes)["v"] == "bigint"
    assert df.count() == 9


def test_plain_read_after_rename_raises_with_pointer(spark, tmp_path):
    """Non-merge reads over files written under an older id→name
    binding must raise a descriptive error (not surface mixed column
    sets); merge_schema=True is the documented escape hatch."""
    t = str(tmp_path / "ren_plain")
    iceberg.append(
        spark.range(0, 10).select(F.col("id"), F.col("id").alias("a")), t
    )
    iceberg.rename_column(t, "a", "b")
    with pytest.raises(iceberg.CommitError, match="merge_schema=True"):
        iceberg.read(spark, t).collect()
    assert iceberg.read(spark, t, merge_schema=True).count() == 10


def test_expire_carries_streaming_watermark_forward(spark, tmp_path):
    """expire_snapshots must not drop the (stream_id, epoch) watermark
    with the snapshot entries — a restarted stream would re-append its
    already-committed micro-batches."""
    t = str(tmp_path / "exp_stream")
    df = spark.range(0, 4).select(F.col("id"))
    iceberg.append(
        df, t,
        summary_extra={"streaming_query": "q1", "streaming_epoch": 7},
    )
    iceberg.append(df, t)  # later non-streaming snapshot
    assert iceberg.last_streaming_epoch(t, "q1") == 7
    out = iceberg.expire_snapshots(t, keep_last=1)
    assert out["expired"]  # the epoch-bearing snapshot is gone...
    assert iceberg.last_streaming_epoch(t, "q1") == 7  # ...watermark isn't
    # idempotent across further expirations and appends
    iceberg.append(df, t)
    iceberg.expire_snapshots(t, keep_last=1)
    assert iceberg.last_streaming_epoch(t, "q1") == 7


def test_expire_carries_pipeline_ledger_forward(spark, tmp_path):
    """The tile pipeline's source-file ledger lives in snapshot
    summaries; expiration folds it into table metadata so resume never
    reprocesses files whose snapshot was expired."""
    from ksj2gp_spark import pipeline as pmod

    t = str(tmp_path / "exp_pipe")
    df = spark.range(0, 4).select(F.col("id"))
    iceberg.append(
        df, t,
        summary_extra={
            "pipeline_chunk": "c0",
            "pipeline_files": ["data/f1.parquet", "data/f2.parquet"],
        },
    )
    iceberg.append(df, t)
    iceberg.expire_snapshots(t, keep_last=1)
    assert pmod.committed_pipeline_chunks(t) == {"c0"}
    assert pmod.committed_pipeline_files(t) == {
        "data/f1.parquet", "data/f2.parquet"
    }
