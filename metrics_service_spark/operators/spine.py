"""Date-spine generation and zero-fill merge.

Reference semantics (SURVEY.md A12/J6): the client-side formatters build
a month list by iterating days in Python, scatter bucket values into
zero-initialized parallel arrays, and append citation-only months
(metricsreader.py:1023-1068, 1741-1783).  Spark-first: generate the
spine declaratively with `sequence()` + `explode`, then LEFT/FULL OUTER
join + `coalesce(0)` — no driver-side loops, and the spine join is a
broadcast (the spine is tiny by construction).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def date_spine(
    spark: SparkSession,
    start: str | _dt.date,
    end: str | _dt.date,
    *,
    step: str = "1 day",
    col: str = "d",
) -> DataFrame:
    """Inclusive date spine [start, end] with the given interval step."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(str(start)).cast("date"),
                F.lit(str(end)).cast("date"),
                F.expr(f"INTERVAL {step}"),
            )
        ).alias(col)
    )


def zero_fill(
    spine: DataFrame,
    agg: DataFrame,
    on: list[str],
    fill: dict[str, object],
) -> DataFrame:
    """Left-join agg onto the (possibly cross-joined) spine and coalesce
    missing measure columns to their fill values."""
    out = spine.join(F.broadcast(agg), on=on, how="left")
    for c, v in fill.items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out
