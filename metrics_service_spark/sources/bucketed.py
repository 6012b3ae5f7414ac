"""Bucketed managed tables: the co-located-join storage layout.

SCALE.md's shuffle budget relies on one storage-side lever the
path-based parquet sources can't express: HASH-BUCKETED tables.  Two
fact tables bucketed by the same key into the same bucket count join
WITHOUT an exchange on either side — at 100 TB that converts the
repeated fact⋈fact shuffle (the single most expensive stage class in
the gold pipeline) into a zipped per-bucket merge, paid ONCE at write
time instead of per query.  Spark only supports bucketing through the
session catalog (`bucketBy` requires `saveAsTable`; there is no
path-based variant), so this module is the thin catalog-table seam:
write once bucketed+sorted, read back by name, and let the planner
prove the exchange away (tests/test_bucketed_join.py gates exactly
that — `SortMergeJoin` with zero `Exchange` below it).

At cluster scale the same layout also serves bucket-pruned point
lookups (`spark.sql.sources.bucketing.enabled` scans only the probe
key's bucket) and one-side-bucketed joins (the other side shuffles to
match, halving exchange volume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Persist ``df`` as a managed parquet table hash-bucketed on
    ``bucket_col`` (optionally sorted within buckets, which upgrades
    the co-located join's per-bucket sort to a pure merge).  The
    bucket count must MATCH across tables meant to co-join — Spark
    only elides the exchange when both sides agree on (key, count)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def cojoin_ready(spark: SparkSession, left: str, right: str) -> tuple[DataFrame, DataFrame]:
    """Read two bucketed tables back by catalog name (reading by path
    would DROP the bucket metadata and reintroduce the shuffle)."""
    return spark.table(left), spark.table(right)
