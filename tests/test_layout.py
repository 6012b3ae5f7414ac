"""Partitioned-layout tests: a date predicate over the silver table
must prune partitions (PartitionFilters in the scan), and the data
round-trips intact."""

from __future__ import annotations

from pyspark.sql import functions as F

from metrics_service_spark.sources.eventlog import eventlog_view
from metrics_service_spark.sources.layout import (
    read_events,
    scan_has_partition_pruning,
    write_events_partitioned,
)
from metrics_service_spark.sources.tables import load_table


def test_partitioned_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    ev = eventlog_view(load_table(spark, sf_dir, "events"))
    out = str(tmp_path / "silver")
    write_events_partitioned(ev, out)

    silver = read_events(spark, out)
    assert silver.count() == ev.count()

    one_day = silver.filter(F.col("event_date") == "2024-01-05")
    assert scan_has_partition_pruning(one_day)
    # unpartitioned-column filter alone must NOT claim partition pruning
    assert not scan_has_partition_pruning(
        silver.filter(F.col("sessionId") == 3)
    )
    # pruned read returns the same rows as a timestamp-range filter on
    # the source
    want = ev.filter(F.to_date("dateLogged") == "2024-01-05").count()
    assert one_day.count() == want


def test_expunge_rows_partition_surgical(spark, tmp_path):
    """Deleting one user rewrites ONLY the partitions they appear in;
    other partitions keep their physical files untouched."""
    import os

    from metrics_service_spark.sources.layout import expunge_rows

    rows = [
        (i, f"2024-01-{(i % 3) + 1:02d}", i % 5) for i in range(60)
    ]  # 3 partitions, users 0-4
    df = spark.createDataFrame(rows, "event_id long, event_date string, user_id long")
    path = str(tmp_path / "silver")
    df.write.partitionBy("event_date").parquet(path)

    # user 3 appears in all partitions; expunge and verify
    from pyspark.sql import functions as F

    n = expunge_rows(spark, path, F.col("user_id") == 3)
    assert n == 3
    back = spark.read.parquet(path)
    assert back.filter(F.col("user_id") == 3).count() == 0
    assert back.count() == 48  # 60 - 12 rows of user 3

    # now an expunge hitting one partition only: it must not rewrite others
    mtimes_before = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path)
        if d.startswith("event_date=")
    }
    n = expunge_rows(
        spark,
        path,
        (F.col("user_id") == 1) & (F.col("event_date") == "2024-01-02"),
    )
    assert n == 1
    mtimes_after = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path)
        if d.startswith("event_date=")
    }
    untouched = [d for d in mtimes_before if d != "event_date=2024-01-02"]
    for d in untouched:
        assert mtimes_before[d] == mtimes_after[d]
    assert expunge_rows(spark, path, F.col("user_id") == 999) == 0  # no-op


def test_compact_partitions(spark, tmp_path):
    from metrics_service_spark.sources.layout import compact_partitions

    path = str(tmp_path / "silver2")
    # simulate many small append files
    for batch in range(5):
        df = spark.createDataFrame(
            [(batch * 10 + i, "2024-02-01", i) for i in range(10)],
            "event_id long, event_date string, user_id long",
        ).repartition(4)
        df.write.mode("append").partitionBy("event_date").parquet(path)
    import glob

    files_before = glob.glob(f"{path}/event_date=2024-02-01/*.parquet")
    assert len(files_before) > 5
    n = compact_partitions(spark, path, target_files_per_partition=1)
    assert n == 1
    files_after = glob.glob(f"{path}/event_date=2024-02-01/*.parquet")
    assert len(files_after) < len(files_before)
    assert spark.read.parquet(path).count() == 50  # nothing lost


def test_expunge_whole_partition_removes_directory(spark, tmp_path):
    """A predicate matching EVERY row of a partition must not leave
    stale files behind (dynamic overwrite writes nothing for an empty
    partition — the directory is removed explicitly)."""
    import os

    from pyspark.sql import functions as F

    from metrics_service_spark.sources.layout import expunge_rows

    rows = [(i, f"2024-03-{(i % 2) + 1:02d}", i % 3) for i in range(20)]
    df = spark.createDataFrame(rows, "event_id long, event_date string, user_id long")
    path = str(tmp_path / "silver3")
    df.write.partitionBy("event_date").parquet(path)

    n = expunge_rows(spark, path, F.col("event_date") == "2024-03-01")
    assert n == 1
    assert not os.path.exists(os.path.join(path, "event_date=2024-03-01"))
    back = spark.read.parquet(path)
    assert back.count() == 10
    assert back.filter(F.col("event_date") == "2024-03-01").count() == 0


def test_expunge_keeps_null_predicate_rows(spark, tmp_path):
    """Rows where the delete predicate evaluates to NULL do NOT match
    it and must survive (three-valued logic regression)."""
    from pyspark.sql import functions as F

    from metrics_service_spark.sources.layout import expunge_rows

    df = spark.createDataFrame(
        [(1, "2024-04-01", "alice"), (2, "2024-04-01", None), (3, "2024-04-01", "bob")],
        "event_id long, event_date string, user string",
    )
    path = str(tmp_path / "silver4")
    df.write.partitionBy("event_date").parquet(path)
    expunge_rows(spark, path, F.col("user") == "alice")
    left = sorted(r.event_id for r in spark.read.parquet(path).collect())
    assert left == [2, 3]  # the NULL-user row survives


def test_compact_partitions_multi_file_target(spark, tmp_path):
    """target_files_per_partition > 1 actually yields multiple files
    (content-hash salt spreads one partition's rows over N shuffle
    keys; plain repartition(partition_col) always collapsed to 1)."""
    from metrics_service_spark.sources.layout import compact_partitions

    path = str(tmp_path / "silver3")
    for batch in range(6):
        df = spark.createDataFrame(
            [(batch * 20 + i, "2024-03-01", i) for i in range(20)],
            "event_id long, event_date string, user_id long",
        ).repartition(4)
        df.write.mode("append").partitionBy("event_date").parquet(path)
    import glob

    n = compact_partitions(spark, path, target_files_per_partition=3)
    assert n == 1
    files_after = glob.glob(f"{path}/event_date=2024-03-01/*.parquet")
    assert 2 <= len(files_after) <= 3
    assert spark.read.parquet(path).count() == 120
