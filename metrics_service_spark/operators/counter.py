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
    (metricsreporter.py:208-308)."""
    inv = counter_unique_total(
        events.filter(F.col(format_col).isin("METADATA", "DATA")), session_col, dims
    ).select(
        *dims,
        F.col("total").alias("total_investigations"),
        F.col("unique").alias("unique_investigations"),
    )
    req = counter_unique_total(
        events.filter(F.col(format_col) == "DATA"), session_col, dims
    ).select(
        *dims,
        F.col("total").alias("total_requests"),
        F.col("unique").alias("unique_requests"),
    )
    out = inv.join(req, on=dims, how="full_outer")
    for c in (
        "total_investigations",
        "unique_investigations",
        "total_requests",
        "unique_requests",
    ):
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out
