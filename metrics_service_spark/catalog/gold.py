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


def _star_priority_agg(o: DataFrame, li: DataFrame) -> DataFrame:
    """The fact⋈fact star-rollup both layout arms share: orders⋈lineitem
    on the order key (SortMergeJoin pinned via the merge hint so both
    arms run the strategy the bucketed layout exists for), rolled up to
    (priority, returnflag).  Decimal sums follow the tpch_q1 exact-
    compare conventions."""
    from pyspark.sql import functions as F

    def _dec(c: str):
        return F.col(c).cast("decimal(18,2)")

    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    return (
        o.hint("merge")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(_dec("l_quantity")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.round(F.sum(revenue), 2).cast("double").alias("revenue"),
        )
    )


def q_gold_star_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketed co-located fact⋈fact star join on the catalog
    surface: orders and lineitem persisted ONCE as hash-bucketed
    managed tables (sources/bucketed.py — fingerprint-keyed, so a
    regenerated fixture always rebuilds), then joined with ZERO
    exchange on either side — the whole query's only shuffle is the
    final two-key rollup.  The reference's mat-view rebuild loop
    (src/sql/02-metrics-materialized-views.sql:1-21) is a repeated
    full-table rollup refresh over the same fact — single-table, no
    join; the fact⋈fact case here is the TPC-H-shaped generalization
    of that repeated-refresh pattern.  At 100 TB the per-refresh fact
    shuffle is the dominant stage class, and bucketing converts it
    into a zipped per-bucket merge paid once at write time.
    The oracle computes the identical aggregate from the raw parquet —
    layout must be result-invisible.  Plan-gated (SortMergeJoin, no
    Exchange below the join) in tests/test_bucketed_join.py."""
    from metrics_service_spark.sources.bucketed import ensure_bucketed_pair

    o, li = ensure_bucketed_pair(spark, sf_dir)
    return _star_priority_agg(o, li)


def q_metrics_star_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCT query on the bucketed layout: the reference's
    mat-view refresh re-aggregates the metrics star from the event
    stream on every rebuild
    (src/sql/02-metrics-materialized-views.sql:1-21) — in Spark the
    star groupBy hash-partitions the full eventlog on the grain keys,
    a full-fabric fact shuffle per refresh at 100 TB.  Here the
    adapted eventlog is persisted ONCE bucketed by pid
    (sources/bucketed.py — HashPartitioning(pid) satisfies the
    9-key grain's clustering requirement because pid is a subset of
    it, and alias propagation carries pid→dataset_id through the
    star's projection), so the whole refresh plans as scan → filter →
    project → partial+final HashAggregate with ZERO exchanges
    (plan-gated in tests/test_bucketed_join.py).  The oracle computes
    the identical star from the raw parquet — the layout must be
    result-invisible.  NEW r13 surface; bench twin:
    metrics_star_pathbased."""
    from metrics_service_spark.sources.bucketed import ensure_bucketed_eventlog

    return metrics_star(ensure_bucketed_eventlog(spark, sf_dir))


def q_gold_star_pathbased(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same star rollup over the plain path-based parquet scans —
    the bench twin that prices the exchange the bucketed layout
    elides (bench.py runs both; not a catalog entry of its own)."""
    return _star_priority_agg(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


ORACLE_GOLD_STAR_BUCKETED = """
SELECT o_orderpriority, l_returnflag,
  count(*) AS n_lines,
  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2)
       AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1, 2
"""


QUERIES = {
    "gold_star_bucketed": QuerySpec(
        q_gold_star_bucketed,
        ORACLE_GOLD_STAR_BUCKETED,
        "co-located bucketed fact join: zero-exchange star rollup",
        ("gold", "layout"),
    ),
    "metrics_star": QuerySpec(
        q_metrics_star,
        ORACLE_METRICS_STAR,
        "COUNTER-filtered star fact aggregation",
        ("gold",),
    ),
    "metrics_star_bucketed": QuerySpec(
        q_metrics_star_bucketed,
        ORACLE_METRICS_STAR,
        "the metrics star over the pid-bucketed eventlog: the "
        "reference's refresh aggregation with zero exchanges",
        ("gold", "layout"),
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
