"""Gold-layer catalog queries: the metrics star fact and the reference's
ROLLUP materialized views (src/sql/02-metrics-materialized-views.sql),
oracle-checked end-to-end including GROUPING() indicators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from metrics_service_spark.catalog import QuerySpec
from metrics_service_spark.plans.gold import (
    build_matview,
    matview_oracle_sql,
    metrics_star,
    METRICS_STAR_SQL,
)
from metrics_service_spark.sources.eventlog import (
    COUNTER_FILTER_SQL,
    EVENTLOG_SQL,
    eventlog_view,
)
from metrics_service_spark.sources.tables import load_table


def _star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return metrics_star(eventlog_view(load_table(spark, sf_dir, "events")))


def q_metrics_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _star(spark, sf_dir)


ORACLE_METRICS_STAR = (
    f"WITH eventlog AS ({EVENTLOG_SQL}) "
    + METRICS_STAR_SQL.format(counter_filter=COUNTER_FILTER_SQL)
)


def _mk_matview_query(name: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return build_matview(spark, _star(spark, sf_dir), name)

    q.__name__ = f"q_matview_{name}"
    return q


def q_matview_routed_repo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 routing end-to-end: 'totals per (repository, metrics_name)'
    is answered from the ROUTED smallest covering mat-view — reading
    only its fully-rolled-up subtotal rows (grouping indicators = 1) —
    while the oracle computes the same answer straight from raw
    events: routing + rollup pre-aggregation must be lossless."""
    from pyspark.sql import functions as F

    from metrics_service_spark.plans.gold import MATVIEWS, route_view

    name = route_view({"repository", "metrics_name"}, want_time=False)
    mv = build_matview(spark, _star(spark, sf_dir), name)
    _, rollup = MATVIEWS[name]
    for c in rollup:
        mv = mv.filter(F.col(f"g_{c}") == 1)
    return mv.groupBy("repository", "metrics_name").agg(
        F.sum("metrics_sum").cast("long").alias("metrics_sum")
    )


ORACLE_MATVIEW_ROUTED = (
    f"WITH eventlog AS ({EVENTLOG_SQL}), "
    f"metrics AS ({METRICS_STAR_SQL.format(counter_filter=COUNTER_FILTER_SQL)}) "
    "SELECT repository, metrics_name, "
    "CAST(sum(metrics_value) AS BIGINT) AS metrics_sum "
    "FROM metrics GROUP BY 1, 2"
)


QUERIES = {
    "metrics_star": QuerySpec(
        q_metrics_star,
        ORACLE_METRICS_STAR,
        "COUNTER-filtered star fact aggregation",
        ("gold",),
    ),
    "matview_routed_repo": QuerySpec(
        q_matview_routed_repo,
        ORACLE_MATVIEW_ROUTED,
        "A9 view routing: summary answered from the routed rollup view",
        ("gold",),
    ),
}
# every reference mat-view (02-metrics-materialized-views.sql:1-21) is
# registered and oracle-checked — the reference serves all 7.
from metrics_service_spark.plans.gold import MATVIEWS  # noqa: E402

for _name in MATVIEWS:
    QUERIES[f"matview_{_name}"] = QuerySpec(
        _mk_matview_query(_name),
        matview_oracle_sql(_name, EVENTLOG_SQL, COUNTER_FILTER_SQL),
        f"mat-view {_name} (02-metrics-materialized-views.sql)",
        ("gold",),
    )
