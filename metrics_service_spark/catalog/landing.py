"""Flagship query: landing-page metrics (SURVEY.md §7.1).

Replicates the reference's most-exercised path
(metricsreader.py:164-304): COUNTER-filtered read events split into
downloads (DATA) / views (METADATA), total + unique (distinct session)
counts per day, zero-filled over the requested date spine.

One lazy DataFrame program replaces the reference's four process hops
(HTTP -> Solr PID expansion -> ES composite agg -> Postgres citations
-> client-side pivot/zero-fill).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metrics_service_spark.catalog import QuerySpec
from metrics_service_spark.operators.spine import date_spine, zero_fill
from metrics_service_spark.sources.eventlog import (
    COUNTER_FILTER_SQL,
    EVENTLOG_SQL,
    counter_filter,
    eventlog_view,
)
from metrics_service_spark.sources.tables import load_table

REQUEST_START = "2024-01-01"
REQUEST_END = "2024-02-10"


def q_landing_page_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = eventlog_view(load_table(spark, sf_dir, "events"))
    filtered = counter_filter(ev).filter(
        (F.col("dateLogged") >= F.lit(f"{REQUEST_START} 00:00:00").cast("timestamp"))
        & (F.col("dateLogged") < F.lit(f"{REQUEST_END} 00:00:00").cast("timestamp"))
    )
    is_data = F.col("formatType") == "DATA"
    is_meta = F.col("formatType") == "METADATA"
    agg = filtered.groupBy(F.to_date("dateLogged").alias("d")).agg(
        F.count(F.when(is_data, 1)).alias("downloads"),
        F.count(F.when(is_meta, 1)).alias("views"),
        F.countDistinct(F.when(is_data, F.col("sessionId"))).alias("unique_downloads"),
        F.countDistinct(F.when(is_meta, F.col("sessionId"))).alias("unique_views"),
    )
    spine = date_spine(spark, REQUEST_START, "2024-02-09")
    filled = zero_fill(
        spine,
        agg,
        ["d"],
        {"downloads": 0, "views": 0, "unique_downloads": 0, "unique_views": 0},
    )
    return filled.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("downloads").cast("long").alias("downloads"),
        F.col("views").cast("long").alias("views"),
        F.col("unique_downloads").cast("long").alias("unique_downloads"),
        F.col("unique_views").cast("long").alias("unique_views"),
    )


ORACLE_LANDING = f"""
WITH eventlog AS ({EVENTLOG_SQL}),
filtered AS (
  SELECT * FROM eventlog
  WHERE {COUNTER_FILTER_SQL}
    AND dateLogged >= TIMESTAMP '{REQUEST_START} 00:00:00'
    AND dateLogged <  TIMESTAMP '{REQUEST_END} 00:00:00'
),
agg AS (
  SELECT CAST(dateLogged AS DATE) AS d,
         count(*) FILTER (formatType = 'DATA') AS downloads,
         count(*) FILTER (formatType = 'METADATA') AS views,
         count(DISTINCT sessionId) FILTER (formatType = 'DATA') AS unique_downloads,
         count(DISTINCT sessionId) FILTER (formatType = 'METADATA') AS unique_views
  FROM filtered GROUP BY 1
),
spine AS (
  SELECT CAST(gs AS DATE) AS d
  FROM generate_series(DATE '{REQUEST_START}', DATE '2024-02-09', INTERVAL 1 DAY) t(gs)
)
SELECT strftime(spine.d, '%Y-%m-%d') AS day,
       CAST(coalesce(downloads, 0) AS BIGINT) AS downloads,
       CAST(coalesce(views, 0) AS BIGINT) AS views,
       CAST(coalesce(unique_downloads, 0) AS BIGINT) AS unique_downloads,
       CAST(coalesce(unique_views, 0) AS BIGINT) AS unique_views
FROM spine LEFT JOIN agg USING (d)
"""


QUERIES: dict[str, QuerySpec] = {
    "landing_page_daily": QuerySpec(
        q_landing_page_daily,
        ORACLE_LANDING,
        "flagship landing-page metrics (SURVEY §7.1)",
        ("flagship",),
    ),
}


# --- resultDetails: per-PID package counts with obsolescence rollup ------
def q_package_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parsePackageCounts analog (metricsreader.py:633-670): per visible
    pid, unique view/download counts accumulated over its obsolescence
    ancestry.  The synthetic obsoletes graph links pidN -> pid(N-1)
    within each block of 10 (chains of length 10, like version chains)."""
    from metrics_service_spark.plans.metrics_request import package_counts

    ev = counter_filter(eventlog_view(load_table(spark, sf_dir, "events")))
    suffix = F.substring("pid", 4, 10).cast("int")
    # the obsoletes dim spans the full version universe, not just pids
    # with surviving events — the reference's chain walk passes through
    # versions that have no (post-filter) events, contributing 0
    max_suffix = ev.agg(F.max(suffix)).first()[0] or 0
    obsoletes = spark.range(0, max_suffix + 1).select(
        F.concat(F.lit("pid"), F.col("id").cast("string")).alias("pid"),
        F.when(
            F.col("id") % 10 != 0,
            F.concat(F.lit("pid"), (F.col("id") - 1).cast("string")),
        ).alias("obsoletes"),
    )
    return package_counts(ev, obsoletes)


ORACLE_PACKAGE_COUNTS = f"""
WITH RECURSIVE eventlog AS ({EVENTLOG_SQL}),
ev AS (SELECT * FROM eventlog WHERE {COUNTER_FILTER_SQL}),
counts AS (
  SELECT pid,
         count(DISTINCT CASE WHEN formatType = 'METADATA' THEN eventId END) AS views,
         count(DISTINCT CASE WHEN formatType = 'DATA' THEN eventId END) AS downloads
  FROM ev GROUP BY pid
),
pids AS (SELECT DISTINCT pid FROM ev),
anc AS (
  SELECT pid AS seed, pid AS member FROM pids
  UNION
  SELECT a.seed,
         'pid' || CAST(CAST(substring(a.member, 4) AS INT) - 1 AS VARCHAR)
  FROM anc a
  WHERE CAST(substring(a.member, 4) AS INT) % 10 <> 0
)
SELECT seed AS pid,
       CAST(sum(coalesce(views, 0)) AS BIGINT) AS view_count,
       CAST(sum(coalesce(downloads, 0)) AS BIGINT) AS download_count
FROM anc LEFT JOIN counts ON anc.member = counts.pid
GROUP BY 1
"""

QUERIES["package_counts"] = QuerySpec(
    q_package_counts,
    ORACLE_PACKAGE_COUNTS,
    "per-PID counts with obsolescence-chain rollup",
    ("landing",),
)
