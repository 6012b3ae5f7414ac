"""Silver-table layout: date-partitioned (and optionally bucketed)
event storage.

This is the layout every reference aggregation assumes implicitly: ES
keeps period indices (`eventlog-*`, es_eventlog_sync.py:576) and every
query carries a dateLogged range filter
(metricselasticsearch.py:1115-1122).  Here the same effect is the
standard lakehouse layout:

- `partitionBy(event_date)` -> date-range predicates prune whole
  directories before any IO (verified by `PartitionFilters` in the
  scan node — see tests/test_layout.py).
- optional `bucketBy(pid)` -> co-located joins/aggregations on pid skip
  the shuffle (requires a table catalog; plain parquet path writes
  skip it).

At 100 TB: one partition per day ≈ 100-300 GB -> split by
`maxPartitionBytes` into ~1000 tasks/day; two years of history prunes
to the requested month in O(metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_events_partitioned(
    events: DataFrame,
    path: str,
    *,
    ts_col: str = "dateLogged",
    mode: str = "overwrite",
) -> None:
    """Write the event table partitioned by event_date (derived)."""
    (
        events.withColumn("event_date", F.to_date(F.col(ts_col)))
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned silver table; date filters applied by the
    caller prune partitions automatically."""
    return spark.read.parquet(path)


def scan_has_partition_pruning(df: DataFrame) -> bool:
    """True when the plan's parquet scan carries a partition filter —
    the assertion that a date predicate reached the directory level."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "PartitionFilters: [" in plan and not (
        "PartitionFilters: []" in plan
    )


def expunge_rows(
    spark: SparkSession,
    path: str,
    predicate,
    *,
    partition_col: str = "event_date",
) -> int:
    """Partition-surgical deletion (the batch analog of the reference's
    portal EXPUNGE flow, es_eventlog_sync.py delta handling; also the
    GDPR/right-to-be-forgotten job): remove every row matching
    `predicate` by rewriting ONLY the partitions that contain matches —
    a dynamic-partition OVERWRITE of the kept rows, never a full-table
    rewrite.

    1. One pruned scan finds the distinct affected partition values
       (tiny; collected).
    2. The affected partitions are re-read, filtered to the KEPT rows,
       and written back with partitionOverwriteMode=dynamic — untouched
       partitions are not listed, read, or rewritten.

    Returns the number of partitions rewritten.  At 100 TB deleting one
    user touches only the days they were active.  (On Delta/Iceberg
    this is `DELETE WHERE`; this is the plain-parquet equivalent with
    the same IO shape.)

    Crash semantics: fully-emptied partition directories are removed in
    a separate step AFTER the dynamic-overwrite commit (dynamic
    overwrite only replaces partitions present in the written data).  A
    crash in that window leaves those rows on disk — the operation is
    idempotent, so a failed expunge MUST be re-run until it returns
    success; each emptied directory's removal is verified with an
    existence check before success is reported.
    """
    df = spark.read.parquet(path)
    hit_parts = [
        r[0]
        for r in df.filter(predicate).select(partition_col).distinct().collect()
    ]
    if not hit_parts:
        return 0
    affected = df.filter(F.col(partition_col).isin(hit_parts))
    # three-valued logic guard: a row whose predicate evaluates to NULL
    # matches neither filter(predicate) nor filter(~predicate) — it
    # must be KEPT (it does not match the delete predicate), so the
    # negation treats NULL as False
    kept = affected.filter(~F.coalesce(predicate, F.lit(False)))
    # resolve kept partitions BEFORE the overwrite: kept's lineage reads
    # the files the write below replaces — evaluated after, it would
    # fail on (or silently miss) the rewritten inputs
    kept_parts = {
        r[0] for r in kept.select(partition_col).distinct().collect()
    }
    emptied = [p for p in hit_parts if p not in kept_parts]
    (
        kept.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    # dynamic overwrite only replaces partitions PRESENT in the written
    # data: a partition whose every row matched the predicate gets
    # nothing written and its stale files would survive — remove those
    # directories explicitly
    if emptied:
        jvm = spark._jvm
        fs = jvm.org.apache.hadoop.fs.FileSystem.get(
            spark._jsc.hadoopConfiguration()
        )
        for p in emptied:
            hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/{partition_col}={p}")
            fs.delete(hpath, True)
            # verification read: never report success while expunged
            # rows are still on disk (GDPR flow)
            if fs.exists(hpath):
                raise IOError(
                    f"expunge_rows: failed to remove emptied partition "
                    f"directory {path}/{partition_col}={p}; re-run the expunge"
                )
    return len(hit_parts)


def compact_partitions(
    spark: SparkSession,
    path: str,
    *,
    partition_col: str = "event_date",
    target_files_per_partition: int = 1,
    partitions: list | None = None,
) -> int:
    """Small-file compaction for the silver layout: streaming ingest
    appends a file per micro-batch, so partitions accumulate many small
    files (the classic lakehouse problem — listing and task-scheduling
    overhead grows per file).  Rewrite each (or the given) partition
    coalesced to `target_files_per_partition` files via
    dynamic-partition overwrite.  Returns partitions compacted.

    Scale: compaction is per-partition-parallel and incremental — run
    it over yesterday's partitions on a schedule; the rewrite IO equals
    the data once, and readers see either the old or the new complete
    partition (dynamic overwrite replaces atomically per partition
    directory)."""
    df = spark.read.parquet(path)
    if partitions is None:
        partitions = [r[0] for r in df.select(partition_col).distinct().collect()]
    if not partitions:
        return 0
    # repartition by the partition value alone sends ALL rows of one
    # partition to one task -> always exactly one file; when the caller
    # wants N files per partition, add a content-hash salt in [0, N) so
    # each partition's rows spread over N shuffle keys
    if target_files_per_partition > 1:
        salt = F.pmod(
            F.hash(*[F.col(c) for c in df.columns]),
            F.lit(target_files_per_partition),
        )
        subset = df.filter(F.col(partition_col).isin(partitions)).repartition(
            max(1, len(partitions) * target_files_per_partition),
            F.col(partition_col),
            salt,
        )
    else:
        subset = df.filter(F.col(partition_col).isin(partitions)).repartition(
            max(1, len(partitions)), partition_col
        )
    (
        subset.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return len(partitions)
