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


def exact_group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    percents: list[int],
) -> DataFrame:
    """Exact per-group discrete quantiles WITHOUT a per-row sort: the
    p-th percentile of each group is the smallest value whose
    cumulative count reaches ceil(n * p / 100) — computed over the
    (group, value) HISTOGRAM, not the rows.  One combiner-friendly
    groupBy builds the histogram (the only full-data shuffle), the
    cumulative count is a window over the histogram partitioned by
    group (per-partition mass = the group's DISTINCT value count, not
    its row count — a 60%-of-corpus hot group costs its value
    cardinality, which for bounded-domain measures like lengths is
    thousands, not billions), and the target ranks use pure integer
    arithmetic ((n*p + 99) div 100, never float·n, so a
    mathematically-integral p·n can't ceil past itself).

    Contrast with ``percentile_approx``: this is exact and
    engine-portable (an ANSI-SQL oracle replays it bit-for-bit), at
    the cost of one histogram shuffle — the right trade whenever the
    value domain is bounded (lengths, counts, scores).

    Output: one row per group, one LONG column ``p{p}`` per requested
    percent (value type preserved via min)."""
    gcols = [F.col(c) for c in group_cols]
    hist = df.groupBy(*gcols, F.col(value_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    wcum = Window.partitionBy(*group_cols).orderBy("__v")
    cum = hist.withColumn("__cum", F.sum("__cnt").over(wcum))
    totals = hist.groupBy(*group_cols).agg(F.sum("__cnt").alias("__n"))
    targets = totals.select(
        *group_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("__p"),
                        F.floor(
                            (F.col("__n") * p + F.lit(99)) / F.lit(100.0)
                        ).cast("long").alias("__tgt"),
                    )
                    for p in percents
                ]
            )
        ).alias("__t"),
    ).select(*group_cols, "__t.__p", "__t.__tgt")
    q = (
        cum.join(targets, group_cols)
        .filter(F.col("__cum") >= F.col("__tgt"))
        .groupBy(*group_cols, "__p")
        .agg(F.min("__v").alias("__q"))
    )
    return q.groupBy(*group_cols).agg(
        *[
            F.max(F.when(F.col("__p") == p, F.col("__q"))).alias(f"p{p}")
            for p in percents
        ]
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
