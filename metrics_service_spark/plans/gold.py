"""Gold layer: the reference's Postgres metrics star table and its 7
ROLLUP materialized views, plus view routing (SURVEY.md A9, M6).

Reference:
- star fact `metrics(dataset_id, user_id, repository, award_number,
  day, month, year, country_code, geohash4, metrics_name,
  metrics_value)` — src/sql/00-metrics-tables.sql:17-32.
- 7 materialized views, each `GROUP BY <dims>, ROLLUP(year, month)` or
  a plain GROUP BY — src/sql/02-metrics-materialized-views.sql:1-21.
- Summary queries are routed to the smallest covering view instead of
  the fact (the reference does this by hand-picking the view per REST
  endpoint; here `route_view` is the dispatch).

Spark mapping: the star is a groupBy over the COUNTER-filtered event
log; each mat-view is one GROUPING SETS aggregation persisted as a gold
parquet table.  `GROUPING()` indicator columns disambiguate NULL-as-
subtotal from NULL-as-data — both engines emit them identically, which
makes the rollup oracle-comparable.

Scale: the star aggregation is a partial-aggregable shuffle on the
grain keys; the mat-views re-aggregate the (much smaller) star, not the
raw events — the same two-tier cascade the reference gets from Postgres
reading the `metrics` table.  Persist gold tables partitioned by `year`
so chart queries prune to the requested range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Mat-view registry: name -> (plain dims, rollup dims).  Rollup dims
#: empty = plain GROUP BY (src/sql/02-metrics-materialized-views.sql).
MATVIEWS: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    "landingpage": (("dataset_id", "metrics_name"), ("year", "month")),
    "userprofilemetrics": (("user_id", "dataset_id", "metrics_name"), ()),
    "userprofilecharts": (
        ("user_id", "dataset_id", "metrics_name"),
        ("year", "month"),
    ),
    "repometrics": (("repository", "dataset_id", "metrics_name"), ()),
    "repocharts": (("repository", "metrics_name"), ("year", "month")),
    "awardmetrics": (("award_number", "dataset_id", "metrics_name"), ()),
    "awardcharts": (("award_number", "metrics_name"), ("year", "month")),
}


def metrics_star(eventlog: DataFrame) -> DataFrame:
    """COUNTER-filtered events -> the metrics star fact.

    Grain: (dataset, user, repository, award, day/month/year, country,
    metric name); metrics_value = event count at that grain.  The
    repository/award/user dims are derived deterministically from the
    adapter columns (the driver tables carry no member-node registry);
    the derivation is mirrored in METRICS_STAR_SQL for the oracle.
    """
    from metrics_service_spark.sources.eventlog import counter_filter

    ev = counter_filter(eventlog)
    return (
        ev.select(
            F.col("pid").alias("dataset_id"),
            F.concat(F.lit("user_"), (F.col("sessionId") % 50).cast("string")).alias(
                "user_id"
            ),
            F.concat(F.lit("repo_"), (F.col("sessionId") % 3).cast("string")).alias(
                "repository"
            ),
            F.concat(F.lit("award_"), (F.col("sessionId") % 7).cast("string")).alias(
                "award_number"
            ),
            F.dayofmonth("dateLogged").alias("day"),
            F.month("dateLogged").alias("month"),
            F.year("dateLogged").alias("year"),
            F.col("country").alias("country_code"),
            F.when(F.col("formatType") == "DATA", "total_downloads")
            .otherwise("total_views")
            .alias("metrics_name"),
        )
        .groupBy(
            "dataset_id",
            "user_id",
            "repository",
            "award_number",
            "day",
            "month",
            "year",
            "country_code",
            "metrics_name",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("metrics_value"))
    )


#: DuckDB fragment mirroring metrics_star over the adapted eventlog —
#: compose as: WITH eventlog AS ({EVENTLOG_SQL}), metrics AS ({this}).
METRICS_STAR_SQL = """
SELECT
  pid AS dataset_id,
  'user_'  || CAST(sessionId % 50 AS VARCHAR) AS user_id,
  'repo_'  || CAST(sessionId % 3  AS VARCHAR) AS repository,
  'award_' || CAST(sessionId % 7  AS VARCHAR) AS award_number,
  CAST(day(dateLogged)   AS INT) AS day,
  CAST(month(dateLogged) AS INT) AS month,
  CAST(year(dateLogged)  AS INT) AS year,
  country AS country_code,
  CASE WHEN formatType = 'DATA' THEN 'total_downloads'
       ELSE 'total_views' END AS metrics_name,
  CAST(count(*) AS BIGINT) AS metrics_value
FROM eventlog
WHERE {counter_filter}
GROUP BY ALL
"""


def build_matview(spark: SparkSession, metrics: DataFrame, name: str) -> DataFrame:
    """One reference mat-view as a Spark aggregation.  Mixed
    `GROUP BY dims, ROLLUP(year, month)` is expressed in Spark SQL
    (metricsviews are the only place the engine needs partial-rollup
    semantics); GROUPING() indicators are surfaced for rollup views."""
    dims, rollup = MATVIEWS[name]
    view = f"__metrics_star_{name}"
    metrics.createOrReplaceTempView(view)
    dim_list = ", ".join(dims)
    if rollup:
        roll_list = ", ".join(rollup)
        ind = ", ".join(
            f"CAST(grouping({c}) AS INT) AS g_{c}" for c in rollup
        )
        sql = f"""
            SELECT {dim_list}, {roll_list}, {ind},
                   CAST(sum(metrics_value) AS BIGINT) AS metrics_sum
            FROM {view}
            GROUP BY {dim_list}, ROLLUP({roll_list})
        """
    else:
        sql = f"""
            SELECT {dim_list},
                   CAST(sum(metrics_value) AS BIGINT) AS metrics_sum
            FROM {view}
            GROUP BY {dim_list}
        """
    return spark.sql(sql)


def matview_oracle_sql(name: str, eventlog_sql: str, counter_filter_sql: str) -> str:
    """The DuckDB-equivalent SQL for build_matview(name)."""
    dims, rollup = MATVIEWS[name]
    star = METRICS_STAR_SQL.format(counter_filter=counter_filter_sql)
    dim_list = ", ".join(dims)
    if rollup:
        roll_list = ", ".join(rollup)
        ind = ", ".join(f"CAST(grouping({c}) AS INT) AS g_{c}" for c in rollup)
        body = f"""
            SELECT {dim_list}, {roll_list}, {ind},
                   CAST(sum(metrics_value) AS BIGINT) AS metrics_sum
            FROM metrics
            GROUP BY {dim_list}, ROLLUP({roll_list})
        """
    else:
        body = f"""
            SELECT {dim_list},
                   CAST(sum(metrics_value) AS BIGINT) AS metrics_sum
            FROM metrics
            GROUP BY {dim_list}
        """
    return f"WITH eventlog AS ({eventlog_sql}), metrics AS ({star}) {body}"


def route_view(group_dims: set[str], *, want_time: bool) -> str:
    """View routing: smallest mat-view covering the requested dims
    (the reference hand-routes each REST endpoint to one view; this is
    the same dispatch as data).  Raises KeyError when only the fact
    can answer."""
    candidates = [
        name
        for name, (dims, rollup) in MATVIEWS.items()
        if group_dims <= set(dims) and (not want_time or rollup)
    ]
    if not candidates:
        raise KeyError(f"no mat-view covers dims={group_dims} time={want_time}")
    # fewest dim columns = most pre-aggregated = cheapest to read
    return min(candidates, key=lambda n: len(MATVIEWS[n][0]))
