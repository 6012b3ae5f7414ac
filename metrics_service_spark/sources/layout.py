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
