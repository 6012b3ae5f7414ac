"""COUNTER-style two-level unique/total aggregation.

Reference semantics (SURVEY.md A10, metricsreporter.py:141-308
`generate_instances`): events are first grouped by
(session, country, formatType); "unique" counts = number of groups
(distinct sessions per output cell), "total" counts = sum of group
sizes.  METADATA events feed investigations; DATA events feed both
requests AND investigations.

Spark-first: two chained groupBys.  The first groupBy's partial
aggregation (map-side combine) collapses the fact table before the
second, so the expensive shuffle moves pre-aggregated rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def counter_unique_total(
    events: DataFrame,
    session_col: str,
    dims: list[str],
) -> DataFrame:
    """Per-dims: unique = distinct sessions, total = event count.

    Equivalent to groupBy(dims).agg(countDistinct(session), count(*))
    but expressed as the reference's two-level shape; Catalyst plans the
    distinct as a two-stage aggregate either way.
    """
    g1 = events.groupBy(session_col, *dims).agg(F.count(F.lit(1)).alias("__n"))
    return g1.groupBy(*dims).agg(
        F.count(F.lit(1)).alias("unique"),
        F.sum("__n").alias("total"),
    )


def counter_report(
    events: DataFrame,
    session_col: str,
    dims: list[str],
    format_col: str = "formatType",
) -> DataFrame:
    """Full COUNTER split: total/unique investigations and requests per
    dims.  investigations = METADATA+DATA events; requests = DATA only
    (metricsreporter.py:208-308).

    One scan, two shuffles: the per-session rollup carries a DATA
    sub-count, so the final aggregation derives all four metrics
    without a second scan or the investigations⟗requests outer join
    (requests-only cells can't exist — DATA is a subset of the
    investigations filter — so the join was pure overhead)."""
    g1 = (
        events.filter(F.col(format_col).isin("METADATA", "DATA"))
        .groupBy(session_col, *dims)
        .agg(
            F.count(F.lit(1)).alias("__n_all"),
            F.count(F.when(F.col(format_col) == "DATA", 1)).alias("__n_data"),
        )
    )
    return g1.groupBy(*dims).agg(
        F.sum("__n_all").cast("long").alias("total_investigations"),
        F.count(F.lit(1)).cast("long").alias("unique_investigations"),
        F.sum("__n_data").cast("long").alias("total_requests"),
        F.count(F.when(F.col("__n_data") > 0, 1))
        .cast("long")
        .alias("unique_requests"),
    )
