"""As-of join: attach to each left row the latest right row at or
before its timestamp, per key (SCD2 dimension lookup, point-in-time
portfolio state, config-at-event-time).

Spark has no native ASOF JOIN; the naive theta join
(l.key = r.key AND r.ts <= l.ts, then max) explodes quadratically per
key.  The scale shape is the UNION-WINDOW as-of: tag both sides, sort
each key's timeline once, carry the right side's values forward with
last(ignorenulls) — ONE shuffle on the key, linear in rows, the same
plan a native ASOF would want.

At equal timestamps the right row sorts BEFORE the left row (inclusive
`ts >= right_ts` semantics, matching DuckDB's ASOF JOIN which serves
as the oracle).  The right side must be unique per (key, ts) — enforce
upstream (ambiguous as-of is undefined in every engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """LEFT as-of join: every left row survives; `value_cols` from the
    latest right row with right_ts <= left_ts and matching key, NULL
    when no such row exists.

    The right row is carried forward as ONE struct (not per column):
    per-column last(ignorenulls) would mix values across versions when
    a newer right row explicitly nulls a field — the struct is non-null
    exactly when a right row exists, and its fields keep their own
    NULLs.  Right rows with a NULL timestamp are dropped (they can
    never be 'at or before' anything; DuckDB's ASOF predicate agrees).

    `value_cols` must be disjoint from the left frame's columns — the
    attached columns keep their right-side names, so a collision would
    produce duplicate column names and ambiguous downstream selects.
    """
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join value_cols collide with left columns: {sorted(clash)}; "
            "rename (e.g. right.withColumnRenamed) before joining"
        )
    r = (
        right.filter(F.col(right_ts).isNotNull())
        .select(
            F.col(right_key).alias("__k"),
            F.col(right_ts).alias("__t"),
            F.struct(*[F.col(c) for c in value_cols]).alias("__rv"),
        )
        .withColumn("__is_left", F.lit(0))
    )
    l = left.withColumn("__k", F.col(left_key)).withColumn(
        "__t", F.col(left_ts)
    ).withColumn("__is_left", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.withColumn("__rvf", F.last(F.col("__rv"), ignorenulls=True).over(w))
    return (
        filled.filter(F.col("__is_left") == 1)
        .select(
            "*", *[F.col(f"__rvf.{c}").alias(c) for c in value_cols]
        )
        .drop("__k", "__t", "__is_left", "__rv", "__rvf")
    )
