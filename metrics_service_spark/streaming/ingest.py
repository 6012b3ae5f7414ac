"""Streaming ingest pipeline: raw NDJSON events -> enriched silver table.

Reference pipeline (SURVEY.md §3.2, ST1): Solr harvest -> rotating NDJSON
log files (eventprocessor.py:217-240) -> filebeat -> logstash filter
graph (JSON parse, drops, geoip/CIDR/UA enrichment, search.conf:31-373)
-> Elasticsearch.  Four processes, per-record round-trips, manual
restart/overlap bookkeeping (eventprocessor.py:244-367).

Spark-first replacement: ONE Structured Streaming query.
- File source on the landing directory = filebeat (checkpointing replaces
  the reference's "re-read last 100 lines and dedupe by id" restart
  logic, ST7 — exactly-once from the source offset log).
- `from_json` PERMISSIVE mode with a corrupt-record column = logstash's
  `_jsonparsefailure` tagging (metricselasticsearch.py:964-978, ST8);
  corrupt rows are routed to a quarantine sink instead of being given
  sessionId=-1 in-band.
- CIDR/robot-UA enrichment = stream-static broadcast joins (the static
  side is the dim table; no state, no shuffle of the stream, F16/F17).
- Sink: Parquet partitioned by `event_date` — the partition column every
  reference aggregation prunes on (range filter on dateLogged,
  metricselasticsearch.py:1115-1122).

Scale: the same query runs on a 1000-executor cluster against an object
store; throughput is bounded by source listing + parquet write, both
embarrassingly parallel.  `maxFilesPerTrigger` is the backpressure knob
(the analog of the reference's BATCH_SIZE=1000 constants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from metrics_service_spark.operators.iprange import ip_to_long, range_join

#: Raw NDJSON event fields (FIXTURES.md §1 subset; elastic_notes.rst:218-248).
RAW_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("eventId", T.StringType()),
        T.StructField("nodeId", T.StringType()),
        T.StructField("pid", T.StringType()),
        T.StructField("formatType", T.StringType()),
        T.StructField("event", T.StringType()),
        T.StructField("dateLogged", T.TimestampType()),
        T.StructField("ipAddress", T.StringType()),
        T.StructField("userAgent", T.StringType()),
        T.StructField("subject", T.StringType()),
        T.StructField("request", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("isPublic", T.BooleanType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

#: Robot user-agent alternation (default stand-in; production loads the
#: full COUNTER dictionaries via `load_ua_dictionary` +
#: `compile_ua_pattern` below, SURVEY.md F7).
ROBOT_UA_PATTERN = r"(?i)(bot|crawler|spider|curl|wget|scrapy|httpclient)"


def load_ua_dictionary(path: str) -> dict[str, str]:
    """Parse a logstash translate dictionary (counter_ua.yml /
    machine_ua.yml shape: one `"regex": tag` mapping per line,
    search.conf:306-327).  Returns {regex: tag}.  A plain line parser,
    not a YAML library — the files are flat string:string maps and the
    regex keys contain characters YAML loaders mangle."""
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#") or ":" not in line:
                continue
            key, _, val = line.rpartition(":")
            key = key.strip().strip('"')
            val = val.strip().strip('"')
            if key:
                # yml escaping doubles backslashes; undo for Java regex
                out[key.replace("\\\\", "\\")] = val
    return out


def compile_ua_pattern(patterns: list[str]) -> str:
    """OR the dictionary's regex keys into ONE case-insensitive
    alternation evaluated JVM-side by a single rlike — the scale answer
    to logstash checking 1000+ patterns per event (each pattern keeps
    its own group so anchors bind correctly)."""
    return "(?i)(" + "|".join(f"(?:{p})" for p in patterns) + ")"


def read_event_stream(
    spark: SparkSession, landing_dir: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over NDJSON landing files (ST1/ST7).

    PERMISSIVE json: malformed lines surface in `_corrupt_record`
    instead of failing the query (ST8).
    """
    reader = (
        spark.readStream.schema(RAW_EVENT_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(landing_dir)


def cidr_ranges_df(spark: SparkSession, cidrs: list[tuple[str, str]]) -> DataFrame:
    """CIDR list -> [lo, hi) long ranges dim (tag per range).

    `cidrs` is [(cidr, tag)], e.g. [("10.1.0.0/16", "dataone_ip")] —
    the dataone_ips.txt / robot_ips.txt lists (search.conf:287-303).
    """
    rows = []
    for cidr, tag in cidrs:
        base, _, bits = cidr.partition("/")
        a, b, c, d = (int(x) for x in base.split("."))
        lo = a * 16777216 + b * 65536 + c * 256 + d
        span = 1 << (32 - int(bits or "32"))
        rows.append((lo, lo + span, tag))
    return spark.createDataFrame(rows, "lo long, hi long, ip_tag string")


def enrich_events(events: DataFrame, ip_ranges: DataFrame | None) -> DataFrame:
    """Logstash filter graph as declarative columns (search.conf:244-352).

    - robot UA tag (F7), CIDR tag via stream-static broadcast range join
      (F17), combined into the `tags` array the COUNTER exclusion reads
      (P4).
    - `searchevent` flag: request path prefix test
      (metricselasticsearch.py:1008-1010, P8).
    - `event_date` partition column for sink-side pruning.
    """
    out = events.withColumn(
        "ua_tag",
        F.when(F.col("userAgent").rlike(ROBOT_UA_PATTERN), "robot_ua"),
    )
    if ip_ranges is not None:
        out = range_join(
            out.withColumn("__ip", ip_to_long(F.col("ipAddress"))),
            ip_ranges,
            "__ip",
            how="left",
        ).drop("__ip", "lo", "hi")
    else:
        out = out.withColumn("ip_tag", F.lit(None).cast("string"))
    return (
        out.withColumn(
            "tags",
            F.filter(
                F.array("ua_tag", "ip_tag"), lambda t: t.isNotNull()
            ),
        )
        .withColumn(
            "searchevent",
            F.coalesce(
                F.col("request").startswith("/cn/v2/query/solr/"), F.lit(False)
            ),
        )
        .withColumn("event_date", F.to_date("dateLogged"))
        .drop("ua_tag", "ip_tag")
    )


def run_ingest(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    ip_ranges: DataFrame | None = None,
    quarantine_dir: str | None = None,
    available_now: bool = True,
    trigger_interval: str | None = None,
):
    """The end-to-end ingest query (ST1+ST8): landing NDJSON ->
    quarantine split -> enrichment -> date-partitioned parquet.

    foreachBatch splits valid/corrupt into two sinks — the streaming
    analog of the reference routing parse failures to sessionId=-1
    (metricselasticsearch.py:964-978).  Both sinks are IDEMPOTENT
    under checkpoint replay: every write is a dynamic-partition
    OVERWRITE keyed by batch_id (micro-batch ids are stable across
    restarts), so a failure between the two writes followed by replay
    rewrites exactly the partitions of that batch instead of appending
    duplicates — effectively-once, the standard foreachBatch recipe
    for non-transactional sinks.
    With `available_now` the query drains the backlog and stops
    (Trigger.AvailableNow — the incremental-job mode, ST5); pass
    `trigger_interval="10 minutes"` instead for the reference's
    continuous portal-sync cadence (BATCH_TDELTA_PERIOD,
    es_eventlog_sync.py:53).
    """
    raw = read_event_stream(spark, landing_dir)

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            corrupt = batch.filter(F.col("_corrupt_record").isNotNull())
            if quarantine_dir is not None:
                (
                    corrupt.select(F.col("_corrupt_record").alias("raw_line"))
                    .withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .json(quarantine_dir)
                )
            valid = batch.filter(
                F.col("_corrupt_record").isNull() & F.col("eventId").isNotNull()
            ).drop("_corrupt_record")
            enriched = enrich_events(valid, ip_ranges).withColumn(
                "batch_id", F.lit(batch_id)
            )
            (
                enriched.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("event_date", "batch_id")
                .parquet(out_dir)
            )
        finally:
            batch.unpersist()

    writer = (
        raw.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_interval is not None:
        writer = writer.trigger(processingTime=trigger_interval)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_event_stream(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """ST7 for AT-LEAST-ONCE upstreams: drop repeated eventIds within
    the watermark horizon.  The file-source checkpoint already gives
    exactly-once over files; this guards against the upstream WRITER
    repeating events across files (the reference's restart behavior —
    re-emit the tail and dedupe by id, eventprocessor.py:244-367).
    dropDuplicatesWithinWatermark keeps state only until the watermark
    passes an id's event time, so state is bounded by (event rate x
    horizon), not history."""
    return events.withWatermark("dateLogged", watermark).dropDuplicatesWithinWatermark(
        ["eventId"]
    )
