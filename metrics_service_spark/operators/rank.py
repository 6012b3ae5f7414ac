"""Distributed global row numbering.

`row_number() OVER (ORDER BY ...)` with no partition is a
single-partition sort — the classic scale trap.  `global_row_number`
produces the IDENTICAL numbering with a two-phase rank: count rows per
coarse bucket (the leading order expression), prefix-sum the bucket
offsets over the tiny per-bucket frame, then rank WITHIN buckets and
add the broadcast offset.  Correct whenever the bucket is a prefix of
the total order (ordering by bucket then the order columns equals
ordering by the order columns).

Used by `sessionize_global` (reference-fidelity monotone session ids);
generic enough for any "assign stable dense ids" need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    *,
    bucket: Column,
    order: list[Column],
    out_col: str = "rn",
) -> DataFrame:
    """Add `out_col` = 1-based global row number under the total order
    (bucket, *order).  `bucket` must be a coarsening prefix of the
    intended order (e.g. to_date(ts) when ordering by ts) and should
    take few enough distinct values that the offset frame broadcasts —
    days/hours over years of data are fine."""
    b = df.withColumn("__bkt", bucket)
    counts = b.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__c"))
    woff = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        F.col("__bkt").alias("__bkt_o"),
        F.coalesce(F.sum("__c").over(woff), F.lit(0)).alias("__off"),
    )
    wrank = Window.partitionBy("__bkt").orderBy(*order)
    # null-safe join: a NULL bucket (groupBy keeps it as its own group,
    # sorted first like the window's asc-nulls-first) must not drop its
    # rows through a plain equality join
    return (
        b.join(F.broadcast(offs), F.col("__bkt").eqNullSafe(F.col("__bkt_o")))
        .withColumn(out_col, F.col("__off") + F.row_number().over(wrank))
        .drop("__bkt", "__bkt_o", "__off")
    )


def global_cumsum(
    df: DataFrame,
    value: Column,
    *,
    bucket: Column,
    order: list[Column],
    out_col: str = "cumsum",
) -> DataFrame:
    """Add `out_col` = inclusive running sum of `value` under the total
    order (bucket, *order) — the distributed prefix sum: per-bucket
    value sums, a prefix-sum of bucket offsets over the tiny per-bucket
    frame, then an in-bucket running sum + the broadcast offset.  Same
    bucket contract as `global_row_number`."""
    b = df.withColumn("__bkt", bucket).withColumn("__val", value)
    counts = b.groupBy("__bkt").agg(F.sum("__val").alias("__s"))
    woff = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        F.col("__bkt").alias("__bkt_o"),
        F.coalesce(F.sum("__s").over(woff), F.lit(0)).alias("__off"),
    )
    wrun = (
        Window.partitionBy("__bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        b.join(F.broadcast(offs), F.col("__bkt").eqNullSafe(F.col("__bkt_o")))
        .withColumn(out_col, F.col("__off") + F.sum("__val").over(wrun))
        .drop("__bkt", "__bkt_o", "__off", "__val")
    )
