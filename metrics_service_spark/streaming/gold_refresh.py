"""Incremental gold refresh: silver event changes -> metrics star
partitions recomputed, exactly-once (SURVEY.md M9, ST5/ST6).

Reference: `es_eventlog_sync` re-scans portals on a 10-minute lookback
(BATCH_TDELTA_PERIOD, es_eventlog_sync.py:53,166-169) and skips
unchanged keys by hash; Postgres mat-views are refreshed wholesale.

Spark-first: a file-source stream over the silver directory sees ONLY
new files (checkpointed offsets = the lookback bookkeeping, for free).
Each micro-batch derives the affected (year, month) partitions, rebuilds
just those slices of the star from silver, and overwrites them with
dynamic partition overwrite — idempotent under replay, so restarts and
re-delivered files converge to the batch-recomputed truth.

Scale: the recompute unit is a month partition (~1/24 of two years of
data); a day's new events touch 1-2 partitions regardless of history
size.  With Delta/Iceberg the overwrite becomes a MERGE and the
changed-keys hash check (ST6, streaming/sessions.changed_keys_upsert)
can skip unchanged families entirely.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metrics_service_spark.plans.gold import metrics_star


def incremental_star_refresh(
    spark: SparkSession,
    silver_dir: str,
    star_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    table_format: str = "parquet",
):
    """Stream silver -> star.  Silver rows are eventlog-shaped (the
    adapter schema); the star is written partitioned by (year, month)
    and only the partitions containing new events are rewritten.

    table_format="parquet" (default): dynamic-partition overwrite —
    idempotent but a reader racing the rewrite can see a partition
    mid-replace.  table_format="manifest": each refresh is an atomic
    manifest commit (sources/merge_table) — concurrent readers keep
    the snapshot they resolved until they re-resolve, the Delta/
    Iceberg MERGE semantics SURVEY §1 maps ST6 to."""
    if table_format not in ("parquet", "manifest"):
        raise ValueError(f"unknown table_format {table_format!r}")
    schema = spark.read.parquet(silver_dir).schema
    stream = spark.readStream.schema(schema).parquet(silver_dir)

    def refresh(batch: DataFrame, batch_id: int) -> None:
        months = [
            (r["y"], r["m"])
            for r in batch.select(
                F.year("dateLogged").alias("y"), F.month("dateLogged").alias("m")
            )
            .distinct()
            .collect()
        ]
        if not months:
            return
        silver = spark.read.parquet(silver_dir)
        cond = reduce(
            lambda a, b: a | b,
            [
                (F.year("dateLogged") == y) & (F.month("dateLogged") == m)
                for y, m in months
            ],
        )
        star = metrics_star(silver.filter(cond))
        if table_format == "manifest":
            from metrics_service_spark.sources.merge_table import merge_table

            # the recompute unit is a whole (year, month) partition, so
            # keying the merge on the partition itself replaces exactly
            # the recomputed slices atomically
            merge_table(
                spark,
                star_dir,
                star,
                key_cols=["year", "month"],
                partition_cols=["year", "month"],
                # key == partition: an updated key can only live in its
                # own partition, so skip the carried-file key probe
                partition_from_key=True,
            )
            return
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            star.write.mode("overwrite").partitionBy("year", "month").parquet(
                star_dir
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    writer = (
        stream.writeStream.foreachBatch(refresh)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
