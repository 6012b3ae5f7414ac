"""Search-event pipeline, end-to-end oracle-checked: raw apache log
line -> parse -> URL-decode/kv-split -> drop filters -> fingerprint
session id, mirroring the reference's logstash search flow
(/root/reference/src/d1_search_metrics/conf/search.conf):

- grok/dissect of the CLF line into remoteIP / timestamp / request /
  userAgent  (search.conf "parse the apache log entry" stage)
- dropNonCN: requests not matching ^/cn/v are dropped
  (search.conf:63-71)
- urldecode + kv split of the query string into queryParts
  (search.conf:73-88)
- dropAutoQuery: queryParts[rows] != "25" dropped (search.conf:90-100)
- sessionId = MD5(remoteIP + " " + userAgent) + "|" + YYYYMMDDHH
  (search.conf:336-352, the logstash fingerprint + hour bucket)

The driver tables carry no raw log file, so the CLF line is first
BUILT deterministically from `events` columns (same adapter idea as
sources/eventlog.py) and then the pipeline parses ONLY the raw string
— proving the parse path; the DuckDB oracle builds the identical
string and replays every regex/hash step.

Scale: pure per-row expressions (regexp + md5 in codegen) — no
shuffle, no UDF; a 100 TB log scan streams straight through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metrics_service_spark.catalog import QuerySpec
from metrics_service_spark.functions.scalars import query_params
from metrics_service_spark.operators.sessionize import hash_session_id
from metrics_service_spark.sources.tables import load_table


def _raw_lines(events: DataFrame) -> DataFrame:
    """Deterministic CLF-ish line per event.  event_id % 7 == 0 gets a
    non-CN path (exercises dropNonCN); event_id % 5 == 0 gets
    rows=100 (exercises dropAutoQuery)."""
    ip = F.concat(F.lit("10.0."), (F.col("user_id") % 256).cast("string"), F.lit(".7"))
    ua = F.concat(
        F.lit("Mozilla/5.0 (ua-"), (F.col("user_id") % 7).cast("string"), F.lit(")")
    )
    path = F.when(F.col("event_id") % 7 == 0, F.lit("/mn/v2/object")).otherwise(
        F.lit("/cn/v2/query/solr/")
    )
    rows_p = F.when(F.col("event_id") % 5 == 0, F.lit("100")).otherwise(F.lit("25"))
    raw = F.concat(
        ip,
        F.lit(" - - ["),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        F.lit('] "GET '),
        path,
        F.lit("?q="),
        F.col("event_type"),
        F.lit("&rows="),
        rows_p,
        F.lit("&start="),
        (F.col("event_id") % 100).cast("string"),
        F.lit(' HTTP/1.1" 200 512 "-" "'),
        ua,
        F.lit('"'),
    )
    return events.select(F.col("event_id"), raw.alias("raw"))


def q_search_log_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metrics_service_spark.operators.similarity import _spread

    # r17 (guide §2.3 raw-rows-first): the fixture parquet is one row
    # group, so the per-row regex/kv/md5 chain would run in a single
    # scan task — spread the raw lines so the parse runs on all cores
    # (a partitioned 100 TB log scan passes through _spread untouched)
    lines = _spread(_raw_lines(load_table(spark, sf_dir, "events")))
    # parse ONLY from the raw line (grok/dissect equivalent)
    parsed = lines.select(
        "event_id",
        F.regexp_extract("raw", r"^(\S+) ", 1).alias("remote_ip"),
        F.regexp_extract("raw", r"\[([^\]]+)\]", 1).alias("ts_str"),
        F.regexp_extract("raw", r'"GET (\S+) HTTP', 1).alias("request"),
        F.regexp_extract("raw", r'"([^"]*)"$', 1).alias("user_agent"),
    ).withColumn("req_path", F.regexp_extract("request", r"^([^?]+)", 1))
    # urldecode + kv split (F14 query_params; parse_url needs a base)
    with_kv = parsed.withColumn(
        "kv", query_params(F.concat(F.lit("http://cn.example.org"), F.col("request")))
    )
    kept = with_kv.filter(
        F.col("req_path").rlike("^/cn/v") & (F.col("kv")["rows"] == "25")
    )
    ts = F.to_timestamp("ts_str", "yyyy-MM-dd HH:mm:ss")
    return kept.select(
        "event_id",
        hash_session_id(F.col("remote_ip"), F.col("user_agent"), ts).alias(
            "session_id"
        ),
        F.col("kv")["q"].alias("solr_q"),
        F.col("kv")["start"].cast("long").alias("solr_start"),
    )


ORACLE_SEARCH_PIPELINE = r"""
WITH raw AS (
  SELECT event_id,
         '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.7' || ' - - [' ||
         strftime(ts, '%Y-%m-%d %H:%M:%S') || '] "GET ' ||
         CASE WHEN event_id % 7 = 0 THEN '/mn/v2/object'
              ELSE '/cn/v2/query/solr/' END ||
         '?q=' || event_type ||
         '&rows=' || CASE WHEN event_id % 5 = 0 THEN '100' ELSE '25' END ||
         '&start=' || CAST(event_id % 100 AS VARCHAR) ||
         ' HTTP/1.1" 200 512 "-" "Mozilla/5.0 (ua-' ||
         CAST(user_id % 7 AS VARCHAR) || ')"' AS raw
  FROM events
), parsed AS (
  SELECT event_id,
         regexp_extract(raw, '^(\S+) ', 1) AS remote_ip,
         regexp_extract(raw, '\[([^\]]+)\]', 1) AS ts_str,
         regexp_extract(raw, '"GET (\S+) HTTP', 1) AS request,
         regexp_extract(raw, '"([^"]*)"$', 1) AS user_agent
  FROM raw
), split AS (
  SELECT event_id, remote_ip, ts_str, user_agent,
         regexp_extract(request, '^([^?]+)', 1) AS req_path,
         regexp_extract(request, 'q=([^&]*)', 1) AS solr_q,
         regexp_extract(request, 'rows=([^&]*)', 1) AS rows_p,
         regexp_extract(request, 'start=([^&]*)', 1) AS start_p
  FROM parsed
)
SELECT event_id,
       md5(remote_ip || ' ' || user_agent) || '|' ||
           strftime(CAST(ts_str AS TIMESTAMP), '%Y%m%d%H') AS session_id,
       solr_q,
       CAST(start_p AS BIGINT) AS solr_start
FROM split
WHERE regexp_matches(req_path, '^/cn/v') AND rows_p = '25'
"""


def q_search_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searches per fingerprint session — the rollup the reference's
    search dashboard reads off the ES index the pipeline feeds."""
    return (
        q_search_log_pipeline(spark, sf_dir)
        .groupBy("session_id")
        .agg(
            F.count(F.lit(1)).alias("n_searches"),
            F.countDistinct("solr_q").alias("n_distinct_terms"),
        )
    )


ORACLE_SEARCH_SESSIONS = f"""
WITH pipeline AS ({ORACLE_SEARCH_PIPELINE})
SELECT session_id, count(*) AS n_searches,
       count(DISTINCT solr_q) AS n_distinct_terms
FROM pipeline GROUP BY 1
"""


def q_search_stream_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the STREAMING ingest path (VERDICT r15 #7): runs
    `streaming/search.py::parse_search_lines` — the exact function the
    readStream query applies per micro-batch — on the same
    deterministic CLF lines as a batch frame.  Every step in that
    pipeline is a stateless per-row expression, so Structured
    Streaming semantics equal batch semantics row-for-row; a green row
    here hash-verifies the streaming query's transform graph (the
    pytest streaming tests cover trigger/checkpoint mechanics, this
    covers the values).  `event_ts` is carried as the formatted
    `event_hour` string (the sink's partition column), keeping the
    comparator inside the string domain."""
    from metrics_service_spark.operators.similarity import _spread
    from metrics_service_spark.streaming.search import parse_search_lines

    # r17: same raw-rows-first spread as q_search_log_pipeline — the
    # spread sits at the BATCH entry seam only; the streaming query
    # applies parse_search_lines to micro-batches untouched
    lines = _spread(
        _raw_lines(load_table(spark, sf_dir, "events")).select(
            F.col("raw").alias("value")
        )
    )
    return parse_search_lines(lines).select(
        "session_id", "solr_q", "solr_start", "event_hour"
    )


ORACLE_SEARCH_STREAM_TWIN = r"""
WITH raw AS (
  SELECT event_id,
         '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.7' || ' - - [' ||
         strftime(ts, '%Y-%m-%d %H:%M:%S') || '] "GET ' ||
         CASE WHEN event_id % 7 = 0 THEN '/mn/v2/object'
              ELSE '/cn/v2/query/solr/' END ||
         '?q=' || event_type ||
         '&rows=' || CASE WHEN event_id % 5 = 0 THEN '100' ELSE '25' END ||
         '&start=' || CAST(event_id % 100 AS VARCHAR) ||
         ' HTTP/1.1" 200 512 "-" "Mozilla/5.0 (ua-' ||
         CAST(user_id % 7 AS VARCHAR) || ')"' AS raw
  FROM events
), parsed AS (
  SELECT regexp_extract(raw, '^(\S+) ', 1) AS remote_ip,
         regexp_extract(raw, '\[([^\]]+)\]', 1) AS ts_str,
         regexp_extract(raw, '"GET (\S+) HTTP', 1) AS request,
         regexp_extract(raw, '"([^"]*)"$', 1) AS user_agent
  FROM raw
), split AS (
  SELECT remote_ip, ts_str, user_agent,
         regexp_extract(request, '^([^?]+)', 1) AS req_path,
         regexp_extract(request, 'q=([^&]*)', 1) AS solr_q,
         regexp_extract(request, 'rows=([^&]*)', 1) AS rows_p,
         regexp_extract(request, 'start=([^&]*)', 1) AS start_p
  FROM parsed
)
SELECT md5(remote_ip || ' ' || user_agent) || '|' ||
           strftime(CAST(ts_str AS TIMESTAMP), '%Y%m%d%H') AS session_id,
       solr_q,
       CAST(start_p AS BIGINT) AS solr_start,
       strftime(CAST(ts_str AS TIMESTAMP), '%Y-%m-%d-%H') AS event_hour
FROM split
WHERE regexp_matches(req_path, '^/cn/v') AND rows_p = '25'
"""


QUERIES: dict[str, QuerySpec] = {
    "search_log_pipeline": QuerySpec(
        q_search_log_pipeline,
        ORACLE_SEARCH_PIPELINE,
        "apache log -> kv -> drops -> fingerprint session (search.conf)",
        ("search",),
    ),
    "search_sessions": QuerySpec(
        q_search_sessions,
        ORACLE_SEARCH_SESSIONS,
        "searches per fingerprint session",
        ("search",),
    ),
    "search_stream_batch_twin": QuerySpec(
        q_search_stream_batch_twin,
        ORACLE_SEARCH_STREAM_TWIN,
        "the streaming ingest's parse_search_lines run as a batch "
        "frame: hash-verifies the readStream transform graph",
        ("search", "streaming"),
    ),
}
