"""Bronze→silver→gold batch ETL tests."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from clickstreaming_end_to_end_data_engineering_project_spark.etl import run_events_etl
from clickstreaming_end_to_end_data_engineering_project_spark.sources.tables import load


def test_etl_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "lake")
    res = run_events_etl(spark, sf_dir, out)
    n = load(spark, sf_dir, "events").count()
    assert res.bronze_rows == n
    assert res.silver_rows == n  # testdata has no invalid rows or dupes
    assert res.quarantined_rows == 0
    assert res.gold_user_rows == load(spark, sf_dir, "events").select("user_id").distinct().count()

    # gold daily stats agree with a direct aggregation of the source
    daily = spark.read.parquet(f"{out}/gold/daily_stats")
    direct = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("event_date"), "event_type")
        .agg(F.count(F.lit(1)).alias("event_cnt"))
    )
    got = {(r["event_date"], r["event_type"]): r["event_cnt"] for r in daily.collect()}
    exp = {(r["event_date"], r["event_type"]): r["event_cnt"] for r in direct.collect()}
    assert got == exp

    # date-partitioned layers prune on date predicates
    one_day = daily.filter(F.col("event_date") == "2024-01-05")
    buf = io.StringIO()
    with redirect_stdout(buf):
        one_day.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()

    # idempotent: re-running produces identical layer contents
    res2 = run_events_etl(spark, sf_dir, out)
    assert res2 == res


def test_quarantine_survives_incremental_rerun(spark, tmp_path):
    """The quarantine is date-partitioned with dynamic overwrite: a
    rerun scoped to one date must rewrite only that date's quarantined
    rows, never wiping other dates' history (the pre-fix behavior of a
    plain overwrite)."""
    from clickstreaming_end_to_end_data_engineering_project_spark.etl import (
        read_quarantine,
        silver_refine,
    )

    out = str(tmp_path / "lake")
    rows = [
        # (event_id, user_id, event_type, ts, value, props) — one valid
        # and one invalid (negative value) row on each of two dates
        ("e1", 1, "view", "2024-01-01 10:00:00", 1.0, '{"k":"a"}'),
        ("e2", 2, "view", "2024-01-01 11:00:00", -5.0, '{"k":"b"}'),
        ("e3", 3, "view", "2024-01-02 10:00:00", 2.0, '{"k":"c"}'),
        ("e4", 4, "view", "2024-01-02 11:00:00", -7.0, '{"k":"d"}'),
    ]
    df = (
        spark.createDataFrame(
            rows, "event_id string, user_id bigint, event_type string, ts_s string, value double, props string"
        )
        .withColumn("ts", F.to_timestamp("ts_s"))
        .drop("ts_s")
        .withColumn("event_date", F.to_date("ts"))
    )
    # deliberately NO session-level partitionOverwriteMode: the
    # incremental path must work through the per-write option alone
    # (a session-level set would leak into every later partitioned
    # overwrite in the shared session — the round-3 advice finding)
    mode_before = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    df.write.mode("overwrite").partitionBy("event_date").parquet(f"{out}/bronze/events")

    silver_refine(spark, out)
    q1 = {r["event_id"] for r in read_quarantine(spark, out).collect()}
    assert q1 == {"e2", "e4"}

    # incremental rerun scoped to 2024-01-02: day 1's quarantine survives
    silver_refine(spark, out, event_date="2024-01-02")
    q2 = {r["event_id"] for r in read_quarantine(spark, out).collect()}
    assert q2 == {"e2", "e4"}
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == mode_before

    # and silver itself still holds both dates' valid rows
    silver = spark.read.parquet(f"{out}/silver/events")
    assert {r["event_id"] for r in silver.collect()} == {"e1", "e3"}


def test_compact_parquet_shrinks_file_count(spark, tmp_path):
    """Many tiny files → one (dataset ≪ target size); data identical
    byte-for-byte (same rows); partition layout preserved when asked."""
    import os

    from clickstreaming_end_to_end_data_engineering_project_spark.etl import compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("k", F.col("id") % 7)
    df.repartition(40).write.parquet(path)
    n_before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_before >= 30, "fixture must actually be fragmented"
    expected = sorted(r.id for r in spark.read.parquet(path).collect())

    n_after = compact_parquet(spark, path, target_file_mb=128)
    assert n_after == 1
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == expected
    assert not os.path.exists(path + ".compact_staging")
    assert not os.path.exists(path + ".compact_old")

    # partitioned layout: preserved through compaction, one file per
    # partition directory afterwards
    ppath = str(tmp_path / "part_frag")
    df.repartition(20).write.partitionBy("k").parquet(ppath)
    expected_k = sorted(
        (r.id, r.k) for r in spark.read.parquet(ppath).collect()
    )
    compact_parquet(spark, ppath, target_file_mb=128, partition_cols=("k",))
    got = spark.read.parquet(ppath)
    assert sorted((r.id, r.k) for r in got.collect()) == expected_k
    kdirs = [d for d in os.listdir(ppath) if d.startswith("k=")]
    assert len(kdirs) == 7, "partition directories must survive compaction"

    # crash recovery: a stale .compact_old must not wedge the next run
    os.makedirs(path + ".compact_old/leftover", exist_ok=True)
    assert compact_parquet(spark, path, target_file_mb=128) == 1

    # crash recovery, rename window: died between the two renames —
    # dataset stranded in .compact_old, path missing.  The rerun must
    # restore it BEFORE sizing/reading (r10 review: without the heal,
    # the walk sized 0 bytes and the read threw, data stranded)
    os.rename(path, path + ".compact_old")
    assert compact_parquet(spark, path, target_file_mb=128) == 1
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == expected
    assert not os.path.exists(path + ".compact_old")


def test_delete_user_data_removes_only_target_rows(spark, tmp_path):
    import os

    from clickstreaming_end_to_end_data_engineering_project_spark.etl import delete_user_data

    path = str(tmp_path / "ev")
    df = spark.createDataFrame(
        [(i, i % 5, f"e{i}") for i in range(100)], "event_id long, user_id long, t string"
    )
    df = df.union(
        spark.createDataFrame([(1000, None, "anon")], "event_id long, user_id long, t string")
    )
    df.write.parquet(path)
    removed = delete_user_data(spark, path, [1, 3])
    assert removed == 40
    left = spark.read.parquet(path)
    assert left.count() == 61
    assert left.filter(F.col("user_id").isNull()).count() == 1, (
        "NULL-user (anonymous) rows must be PRESERVED by erasure"
    )
    assert left.filter(F.col("user_id").isin(1, 3)).count() == 0
    assert left.filter(F.col("user_id") == 2).count() == 20, "other users untouched"
    assert not os.path.exists(path + ".erase_staging")
    assert not os.path.exists(path + ".erase_old")

    # crash recovery, rename window: an erasure that died between its
    # two renames strands the dataset in .erase_old; the next erasure
    # call must restore it first (r10 review)
    os.rename(path, path + ".erase_old")
    assert delete_user_data(spark, path, [2]) == 20
    assert spark.read.parquet(path).count() == 41

    # cross-job heal: a crashed COMPACTION must not block a subsequent
    # erasure on the same path (each job heals every known backup
    # suffix), and vice versa
    os.rename(path, path + ".compact_old")
    assert delete_user_data(spark, path, [4]) == 20
    assert spark.read.parquet(path).count() == 21
    from clickstreaming_end_to_end_data_engineering_project_spark.etl import (
        compact_parquet,
    )

    os.rename(path, path + ".erase_old")
    assert compact_parquet(spark, path, target_file_mb=128) == 1
    assert spark.read.parquet(path).count() == 21


def test_merge_upsert_semantics_unpartitioned(spark, tmp_path):
    """Insert/update/delete in one change set against an unpartitioned
    dataset; audit counts match; key-duplicate changes are rejected."""
    import pytest as _pytest

    from clickstreaming_end_to_end_data_engineering_project_spark.etl import merge_upsert

    path = str(tmp_path / "dim")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "name", "v"]
    ).write.parquet(path)
    changes = spark.createDataFrame(
        [(2, "B", 22, False), (4, "d", 40, False), (3, None, 0, True)],
        ["id", "name", "v", "is_delete"],
    )
    stats = merge_upsert(spark, path, changes, ["id"], delete_col="is_delete")
    assert stats == {"inserted": 1, "updated": 1, "deleted": 1}
    got = {r["id"]: (r["name"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10), 2: ("B", 22), 4: ("d", 40)}

    # delete of an absent key is a counted no-op; re-applying the same
    # upsert is idempotent in content
    stats2 = merge_upsert(spark, path, changes, ["id"], delete_col="is_delete")
    assert stats2 == {"inserted": 0, "updated": 2, "deleted": 0}
    got2 = {r["id"]: (r["name"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got2 == got

    dup = spark.createDataFrame([(5, "x", 1, False), (5, "y", 2, False)],
                                ["id", "name", "v", "is_delete"])
    with _pytest.raises(ValueError, match="key-unique"):
        merge_upsert(spark, path, dup, ["id"], delete_col="is_delete")


def test_merge_upsert_partition_scoped_rewrite(spark, tmp_path):
    """Partition-scoped merge rewrites ONLY the partitions named in
    the change set: untouched partition directories keep their exact
    files (path + mtime), the touched one is swapped, and a brand-new
    partition appears."""
    import os

    from clickstreaming_end_to_end_data_engineering_project_spark.etl import merge_upsert

    path = str(tmp_path / "facts")
    spark.createDataFrame(
        [("2024-01-01", 1, 10.0), ("2024-01-01", 2, 20.0), ("2024-01-02", 3, 30.0)],
        ["day", "id", "v"],
    ).write.partitionBy("day").parquet(path)

    def files_of(day):
        d = os.path.join(path, f"day={day}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if not f.startswith(".")
        }

    before_untouched = files_of("2024-01-02")
    changes = spark.createDataFrame(
        [
            ("2024-01-01", 2, 22.0, False),   # update in an existing partition
            ("2024-01-01", 9, 90.0, False),   # insert into it
            ("2024-01-03", 7, 70.0, False),   # brand-new partition
        ],
        ["day", "id", "v", "is_delete"],
    )
    stats = merge_upsert(
        spark, path, changes, ["day", "id"],
        delete_col="is_delete", partition_col="day",
    )
    assert stats == {"inserted": 2, "updated": 1, "deleted": 0}
    got = {
        (str(r["day"]), r["id"]): r["v"] for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("2024-01-01", 1): 10.0,
        ("2024-01-01", 2): 22.0,
        ("2024-01-01", 9): 90.0,
        ("2024-01-02", 3): 30.0,
        ("2024-01-03", 7): 70.0,
    }
    # the untouched partition's files were not rewritten
    assert files_of("2024-01-02") == before_untouched


def test_merge_upsert_heals_crash_debris_and_creates_target(spark, tmp_path):
    """A merge onto a dataset stranded mid-swap (live dir renamed to
    the staging suffix — the crash window) heals on entry; a merge
    onto a missing target creates it."""
    import os

    from clickstreaming_end_to_end_data_engineering_project_spark.etl import merge_upsert

    path = str(tmp_path / "dim2")
    spark.createDataFrame([(1, 10)], ["id", "v"]).write.parquet(path)
    os.rename(path, path + ".compact_old")  # simulate crash between renames
    changes = spark.createDataFrame([(1, 11)], ["id", "v"])
    stats = merge_upsert(spark, path, changes, ["id"])
    assert stats == {"inserted": 0, "updated": 1, "deleted": 0}
    assert {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()} == {(1, 11)}

    fresh = str(tmp_path / "brandnew")
    stats = merge_upsert(spark, fresh, changes, ["id"])
    assert stats == {"inserted": 1, "updated": 0, "deleted": 0}

def test_merge_upsert_partition_col_must_be_a_key(spark, tmp_path):
    """partition_col outside key_cols would let a key move between
    partitions while its old row survives (duplicate keys, r12
    advisory) — the partition-scoped path refuses it up front."""
    import pytest

    from clickstreaming_end_to_end_data_engineering_project_spark.etl import merge_upsert

    path = str(tmp_path / "facts_badkey")
    spark.createDataFrame(
        [("2024-01-01", 1, 10.0)], ["day", "id", "v"]
    ).write.partitionBy("day").parquet(path)
    changes = spark.createDataFrame([("2024-01-02", 1, 11.0)], ["day", "id", "v"])
    with pytest.raises(ValueError, match="partition_col must be one of key_cols"):
        merge_upsert(spark, path, changes, ["id"], partition_col="day")


def test_merge_upsert_escapes_partition_path_values(spark, tmp_path):
    """Partition values containing Hive-reserved characters (':', '/')
    are escaped exactly as Spark's partitionBy writer escapes them, so
    the hand-built rewrite path addresses the directory Spark wrote —
    not a second directory for the same logical partition (r12
    advisory).  NULL partition values raise."""
    import os

    import pytest

    from clickstreaming_end_to_end_data_engineering_project_spark.etl import merge_upsert

    path = str(tmp_path / "facts_escaped")
    spark.createDataFrame(
        [("12:30", 1, 10.0), ("a/b", 2, 20.0)], ["slot", "id", "v"]
    ).write.partitionBy("slot").parquet(path)
    spark_dirs = {d for d in os.listdir(path) if d.startswith("slot=")}
    assert spark_dirs == {"slot=12%3A30", "slot=a%2Fb"}  # what Spark wrote

    changes = spark.createDataFrame(
        [("12:30", 1, 11.0), ("12:30", 3, 30.0)], ["slot", "id", "v"]
    )
    stats = merge_upsert(spark, path, changes, ["slot", "id"], partition_col="slot")
    assert stats == {"inserted": 1, "updated": 1, "deleted": 0}
    # no new directory appeared — the rewrite hit Spark's escaped dir
    assert {d for d in os.listdir(path) if d.startswith("slot=")} == spark_dirs
    got = {(r["slot"], r["id"]): r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {("12:30", 1): 11.0, ("12:30", 3): 30.0, ("a/b", 2): 20.0}

    null_changes = spark.createDataFrame(
        [(None, 9, 90.0)], "slot string, id long, v double"
    )
    with pytest.raises(ValueError, match="NULL partition values"):
        merge_upsert(spark, path, null_changes, ["slot", "id"], partition_col="slot")
