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


def _fixture_fingerprint(paths: list[str]) -> str:
    """Content fingerprint of the source parquet fixtures (path, mtime,
    size).  The bucketed copy is keyed by it so a REGENERATED fixture
    can never be served from a stale bucketed table — the failure mode
    that would silently diverge the co-located join from an oracle
    reading the fresh parquet."""
    import hashlib
    import os

    parts = []
    for p in paths:
        st = os.stat(p)
        parts.append(f"{p}:{st.st_mtime_ns}:{st.st_size}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def ensure_bucketed_pair(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_buckets: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """Idempotently materialize the bucketed orders/lineitem pair for
    ``sf_dir`` and hand both back catalog-read (bucket metadata
    intact).  Build-once semantics: the database name embeds the
    fixture fingerprint, so within a warehouse the pair is written
    exactly once per distinct fixture state and every later call is a
    pure catalog read — the storage layout's whole point is paying the
    layout shuffle at WRITE time, once, instead of per query.

    ``n_buckets`` fixes the co-location contract (both sides must
    agree); 16 suits the test SFs — at cluster scale pick
    ``total_size / target_bucket_size`` (e.g. ~128 MB buckets) and keep
    it stable across the tables meant to co-join."""
    import os

    from metrics_service_spark.sources.tables import load_table

    paths = [os.path.join(sf_dir, f"{t}.parquet") for t in ("orders", "lineitem")]
    db = f"bkt_{_fixture_fingerprint(paths)}"
    left, right = f"{db}.orders_b", f"{db}.lineitem_b"
    if not (spark.catalog.tableExists(left) and spark.catalog.tableExists(right)):
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        # a FRESH session's in-memory catalog doesn't know tables whose
        # data a previous session left in the warehouse; saveAsTable
        # refuses to reuse the orphaned location, so clear it (bucket
        # metadata lives in the catalog, not the files — re-registering
        # the old files can't be trusted, rewriting can)
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        for t in ("orders_b", "lineitem_b"):
            loc = os.path.join(wh, f"{db}.db", t)
            if os.path.exists(loc) and not spark.catalog.tableExists(
                f"{db}.{t}"
            ):
                shutil.rmtree(loc, ignore_errors=True)
        write_bucketed(
            load_table(spark, sf_dir, "orders"),
            left,
            bucket_col="o_orderkey",
            n_buckets=n_buckets,
            sort_cols=("o_orderkey",),
        )
        write_bucketed(
            load_table(spark, sf_dir, "lineitem"),
            right,
            bucket_col="l_orderkey",
            n_buckets=n_buckets,
            sort_cols=("l_orderkey",),
        )
    return cojoin_ready(spark, left, right)
