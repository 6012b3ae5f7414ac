"""Streaming search-event pipeline: raw apache log lines -> parsed,
session-fingerprinted search events.

The reference runs this flow as a logstash process fed by filebeat
(/root/reference/src/d1_search_metrics/conf/search.conf): grok the CLF
line, drop non-CN requests (:63-71), urldecode + kv-split the query
string (:73-88), drop auto-queries with rows != 25 (:90-100), and
fingerprint the session as MD5(ip + ' ' + ua) | YYYYMMDDHH (:336-352).

Spark-first replacement: ONE Structured Streaming query over a `text`
file source — the batch parse pipeline (catalog/search.py) applied
verbatim to a stream.  Every step is a stateless per-row codegen
expression, so this streams at scan speed: no state store, no
watermark, no shuffle; sink-side partitioning by event hour gives the
downstream dashboards their pruning column.  Checkpointing replaces
filebeat's registry (restart-safe, ST7), and the sink is idempotent
under replay via batch_id dynamic-partition overwrite like
streaming/ingest.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metrics_service_spark.functions.scalars import query_params
from metrics_service_spark.operators.sessionize import hash_session_id


def parse_search_lines(lines: DataFrame) -> DataFrame:
    """CLF line -> parsed search event (the logstash filter graph as
    column expressions).  Works identically on a batch or streaming
    DataFrame with a `value` string column.  Rows failing the parse
    yield empty extracts and are dropped by the path filter, mirroring
    logstash's drop{} on non-matching grok."""
    parsed = lines.select(
        F.col("value").alias("raw"),
        F.regexp_extract("value", r"^(\S+) ", 1).alias("remote_ip"),
        F.regexp_extract("value", r"\[([^\]]+)\]", 1).alias("ts_str"),
        F.regexp_extract("value", r'"GET (\S+) HTTP', 1).alias("request"),
        F.regexp_extract("value", r'"([^"]*)"$', 1).alias("user_agent"),
    ).withColumn("req_path", F.regexp_extract("request", r"^([^?]+)", 1))
    with_kv = parsed.withColumn(
        "kv", query_params(F.concat(F.lit("http://cn.example.org"), F.col("request")))
    )
    kept = with_kv.filter(
        F.col("req_path").rlike("^/cn/v") & (F.col("kv")["rows"] == "25")
    )
    ts = F.to_timestamp("ts_str", "yyyy-MM-dd HH:mm:ss")
    return kept.select(
        hash_session_id(F.col("remote_ip"), F.col("user_agent"), ts).alias(
            "session_id"
        ),
        F.col("kv")["q"].alias("solr_q"),
        F.col("kv")["start"].cast("long").alias("solr_start"),
        ts.alias("event_ts"),
        F.date_format(ts, "yyyy-MM-dd-HH").alias("event_hour"),
    )


def run_search_ingest(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    trigger_interval: str | None = None,
):
    """Streaming query: landing dir of raw log files -> parsed parquet
    partitioned by event hour.  Idempotent under checkpoint replay
    (dynamic-partition overwrite keyed by the stable micro-batch id)."""
    lines = spark.readStream.format("text").load(landing_dir)
    events = parse_search_lines(lines)

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        (
            batch.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("event_hour", "batch_id")
            .parquet(out_dir)
        )

    writer = (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_interval is not None:
        writer = writer.trigger(processingTime=trigger_interval)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
