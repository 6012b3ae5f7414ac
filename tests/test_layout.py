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
