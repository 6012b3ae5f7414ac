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

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str | tuple[str, ...],
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Persist ``df`` as a managed parquet table hash-bucketed on
    ``bucket_col`` — a single column or a composite key tuple
    (optionally sorted within buckets, which upgrades the co-located
    join's per-bucket sort to a pure merge).  The bucket count must
    MATCH across tables meant to co-join — Spark only elides the
    exchange when both sides agree on (key, count); a composite key
    is only recognized when the join/aggregate clusters on ALL of its
    columns."""
    cols = (bucket_col,) if isinstance(bucket_col, str) else tuple(bucket_col)
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, cols[0], *cols[1:]
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def cojoin_ready(spark: SparkSession, left: str, right: str) -> tuple[DataFrame, DataFrame]:
    """Read two bucketed tables back by catalog name (reading by path
    would DROP the bucket metadata and reintroduce the shuffle)."""
    return spark.table(left), spark.table(right)


def _fixture_fingerprint(paths: list[str]) -> str:
    """Content fingerprint of the source parquet fixtures: (path,
    mtime, size) PLUS an md5 of the file tail (the parquet footer —
    row-group offsets/stats — lives there, so regenerated content
    shows up even when mtime and size are preserved, e.g. a cache
    restore or `cp -p` of a same-sized rewrite).  The bucketed copy is
    keyed by it so a REGENERATED fixture can never be served from a
    stale bucketed table — the failure mode that would silently
    diverge the co-located join from an oracle reading the fresh
    parquet."""
    import hashlib
    import os

    def one(p: str) -> str:
        st = os.stat(p)
        with open(p, "rb") as f:
            f.seek(max(0, st.st_size - 65536))
            tail_md5 = hashlib.md5(f.read()).hexdigest()
        return f"{p}:{st.st_mtime_ns}:{st.st_size}:{tail_md5}"

    parts = []
    for p in paths:
        if os.path.isdir(p):
            # Spark-written datasets are DIRECTORIES of part files
            # (the scale-probe scratch tables); fingerprint every data
            # file so a partial rewrite can't alias the old layout
            for root, _dirs, files in sorted(os.walk(p)):
                parts.extend(
                    one(os.path.join(root, fn))
                    for fn in sorted(files)
                    if not fn.startswith((".", "_"))
                )
        else:
            parts.append(one(p))
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def _local_warehouse_dir(spark: SparkSession) -> str | None:
    """The warehouse dir as a local filesystem path, or None when the
    warehouse lives behind a non-local scheme (hdfs://, s3a://, ...) —
    os.path/shutil operations would silently no-op or mis-resolve
    there, so callers skip local-only maintenance for those."""
    wh = spark.conf.get("spark.sql.warehouse.dir")
    if wh.startswith("file:"):
        from urllib.parse import urlparse

        return urlparse(wh).path or None
    if "://" in wh:
        return None
    return wh


def _group_orders_lineitem(sf_dir: str) -> list[str]:
    import os

    return [os.path.join(sf_dir, f"{t}.parquet") for t in ("orders", "lineitem")]


def _group_events(sf_dir: str) -> list[str]:
    import os

    return [os.path.join(sf_dir, "events.parquet")]


def _group_documents(sf_dir: str) -> list[str]:
    import os

    return [os.path.join(sf_dir, "documents.parquet")]


#: Registry of the fixture groups backing build-once layouts, keyed by
#: group name -> (sf_dir -> source paths).  Every ensure_bucketed_*
#: caller resolves its source paths through here, and
#: prune_stale_bucketed derives its LIVE fingerprint set from the same
#: entries — so registering a new layout's group once both feeds the
#: ensure_* fingerprint and protects the layout from GC.  (Previously
#: prune duplicated the groups; a caller missing there would have its
#: layout collected on every bench/probe run, silently re-paying the
#: build-once write.)
SOURCE_GROUPS: dict[str, Callable[[str], list[str]]] = {
    "orders_lineitem": _group_orders_lineitem,
    "events": _group_events,
    "documents": _group_documents,
}


def ensure_bucketed(
    spark: SparkSession,
    source_paths: list[str],
    tables: list[tuple[str, Callable[[], DataFrame], str, int, tuple[str, ...]]],
) -> list[DataFrame]:
    """Idempotently materialize a set of bucketed tables derived from
    ``source_paths`` and hand them back catalog-read (bucket metadata
    intact).  ``tables`` rows are (name, build, bucket_col, n_buckets,
    sort_cols) — ``build`` is called only on a miss.  Build-once
    semantics: the database name embeds the fixture fingerprint, so
    within a warehouse each layout is written exactly once per
    distinct fixture state and every later call is a pure catalog
    read — the storage layout's whole point is paying the layout
    shuffle at WRITE time, once, instead of per query."""
    import os

    db = f"bkt_{_fixture_fingerprint(source_paths)}"
    names = [f"{db}.{name}" for name, *_ in tables]
    if not all(spark.catalog.tableExists(n) for n in names):
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        # a FRESH session's in-memory catalog doesn't know tables whose
        # data a previous session left in the warehouse; saveAsTable
        # refuses to reuse the orphaned location, so clear it (bucket
        # metadata lives in the catalog, not the files — re-registering
        # the old files can't be trusted, rewriting can).  Local
        # warehouses only: behind hdfs://s3a:// the stale location
        # can't be cleared from here, and saveAsTable's refusal is a
        # loud error rather than silent staleness.
        import shutil

        wh = _local_warehouse_dir(spark)
        if wh is not None:
            for name, *_ in tables:
                loc = os.path.join(wh, f"{db}.db", name)
                if os.path.exists(loc) and not spark.catalog.tableExists(
                    f"{db}.{name}"
                ):
                    shutil.rmtree(loc, ignore_errors=True)
        for (name, build, bucket_col, n_buckets, sort_cols), full in zip(
            tables, names
        ):
            write_bucketed(
                build(),
                full,
                bucket_col=bucket_col,
                n_buckets=n_buckets,
                sort_cols=sort_cols,
            )
    return [spark.table(n) for n in names]


def ensure_bucketed_eventlog(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_buckets: int = 16,
) -> DataFrame:
    """The bucketed ADAPTED eventlog — the silver table under the
    metrics-service gold refresh (plans/gold.py).  The reference
    rebuilds its mat-views by re-aggregating the metrics star from the
    raw event stream on every refresh
    (src/sql/02-metrics-materialized-views.sql:1-21); in Spark that
    star aggregation's shuffle hash-partitions the FULL event log on
    the grain keys — at 100 TB a full-fabric fact shuffle per refresh.
    Storing the adapter output bucketed by ``pid`` (the grain's
    leading key: HashPartitioning on a subset of the groupBy keys
    satisfies the aggregation's clustering requirement, and Spark's
    alias-aware propagation carries pid→dataset_id through the star's
    projection) makes every refresh aggregate scan-local: zero
    exchanges until the (tiny) post-star mat-view rollups.  Paid once
    at write time, amortized over every refresh — the same trade as
    `ensure_bucketed_pair`, applied to the product query."""
    from metrics_service_spark.sources.eventlog import eventlog_view
    from metrics_service_spark.sources.tables import load_table

    (tbl,) = ensure_bucketed(
        spark,
        SOURCE_GROUPS["events"](sf_dir),
        [
            (
                "eventlog_b",
                lambda: eventlog_view(load_table(spark, sf_dir, "events")),
                "pid",
                n_buckets,
                ("pid",),
            )
        ],
    )
    return tbl


def ensure_bucketed_documents(
    spark: SparkSession,
    sf_dir: str,
    *,
    prefix_chars: int = 80,
    block_chars: int = 4,
    n_buckets: int = 32,
) -> DataFrame:
    """The bucketed LINKAGE-SILVER documents table — the third
    application of the build-once co-located layout, this time under
    the record-linkage/dedup family.  `fuzzy_prefix_pairs`' candidate
    generation is a self-join on the block key (block_cols, first
    ``block_chars`` prefix chars) plus one cell-count aggregate on the
    same key; from path-based parquet both hash-partition the full
    corpus per query — at 100 TB, two full-fabric document shuffles
    per linkage pass.  Storing (lang, doc_id, pfx, bk) hash-bucketed
    on the composite (lang, bk) makes both scan-local: the cell count
    clusters on exactly the bucket key and the self-join's equi-keys
    are the bucket key, so Spark proves the exchanges away on both
    sides (gated in tests/test_bucketed_join.py).  The prefix
    derivation (substring) is pre-paid at write time like the
    eventlog adapter.  Parameters are baked into the layout, so they
    participate in the table name; the db name carries the fixture
    fingerprint as always."""
    from metrics_service_spark.sources.tables import load_table

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        pfx = F.substring(F.col("text"), 1, prefix_chars)
        return docs.select(
            "lang",
            "doc_id",
            pfx.alias("pfx"),
            F.substring(pfx, 1, block_chars).alias("bk"),
        )

    (tbl,) = ensure_bucketed(
        spark,
        SOURCE_GROUPS["documents"](sf_dir),
        [
            (
                f"documents_linkage_b_p{prefix_chars}_k{block_chars}",
                build,
                ("lang", "bk"),
                n_buckets,
                ("lang", "bk", "pfx", "doc_id"),
            )
        ],
    )
    return tbl


def materialize_silver_eventlog(
    spark: SparkSession, sf_dir: str, target_dir: str
) -> DataFrame:
    """Write the adapted eventlog as a plain (UNBUCKETED) parquet copy
    under ``target_dir`` and hand back the path-read frame — the
    decomposition arm the bench and the scale probe share: it pre-pays
    the adapter expressions like the bucketed silver table but still
    pays the grain exchange, so (silver − bucketed) isolates the
    layout's elided shuffle and (path − silver) the adapter cost.
    Defined ONCE here so both harnesses measure the identical arm."""
    from metrics_service_spark.sources.eventlog import eventlog_view
    from metrics_service_spark.sources.tables import load_table

    path = f"{target_dir}/eventlog"
    eventlog_view(load_table(spark, sf_dir, "events")).write.mode(
        "overwrite"
    ).parquet(path)
    return spark.read.parquet(path)


def prune_stale_bucketed(spark: SparkSession, keep_sf_dirs: list[str]) -> int:
    """Drop every ``bkt_*`` database whose fingerprint no longer
    matches any CURRENT fixture state under ``keep_sf_dirs`` — the
    build-once layout's garbage collector.  Fingerprint-keyed dbs are
    immutable by design (a regenerated fixture gets a NEW db, never a
    rewrite), so staleness is purely additive: each driver round's
    fixture regeneration and each scale-probe scratch rewrite strands
    the previous layout's files in the warehouse.  Recomputing the
    live fingerprints from the kept dirs and dropping the rest is
    exact — a db this keeps is byte-identical to what the next
    `ensure_bucketed` call for that dir would serve.  Returns the
    number of stale layouts removed: catalog databases dropped plus
    orphaned ``bkt_*.db`` warehouse directories swept (prior sessions'
    dbs have files but no catalog entry).

    The live set is derived from ``SOURCE_GROUPS`` — the same registry
    the ensure_* callers fingerprint through — so it cannot drift from
    the layouts actually being built.  Single-process assumption: this
    rmtree/DROPs warehouse state, so do not run it while another
    session is serving the same warehouse (the bench and scale probe,
    its two callers, each own their session)."""
    import os

    live: set[str] = set()
    for d in keep_sf_dirs:
        for group_paths in SOURCE_GROUPS.values():
            try:
                live.add(f"bkt_{_fixture_fingerprint(group_paths(d))}")
            except OSError:
                continue
    dropped = 0
    for row in spark.sql("SHOW DATABASES").collect():
        db = row[0]
        if db.startswith("bkt_") and db not in live:
            spark.sql(f"DROP DATABASE {db} CASCADE")
            dropped += 1
    # a fresh session's in-memory catalog doesn't list databases
    # previous sessions created, but their FILES still occupy the
    # warehouse (the driver regenerates fixtures every round, so each
    # round strands the last round's layouts) — sweep those directly.
    # Local warehouses only, same contract as ensure_bucketed's
    # orphan-location cleanup.
    wh = _local_warehouse_dir(spark)
    if wh is not None and os.path.isdir(wh):
        import shutil

        registered = {
            row[0] for row in spark.sql("SHOW DATABASES").collect()
        }
        for entry in os.listdir(wh):
            if not (entry.startswith("bkt_") and entry.endswith(".db")):
                continue
            db = entry[: -len(".db")]
            if db in live or db in registered:
                continue
            shutil.rmtree(os.path.join(wh, entry), ignore_errors=True)
            dropped += 1
    return dropped


def ensure_bucketed_pair(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_buckets: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """The bucketed orders/lineitem co-join pair for ``sf_dir``.

    ``n_buckets`` fixes the co-location contract (both sides must
    agree); 16 suits the test SFs — at cluster scale pick
    ``total_size / target_bucket_size`` (e.g. ~128 MB buckets) and keep
    it stable across the tables meant to co-join."""
    from metrics_service_spark.sources.tables import load_table

    left, right = ensure_bucketed(
        spark,
        SOURCE_GROUPS["orders_lineitem"](sf_dir),
        [
            (
                "orders_b",
                lambda: load_table(spark, sf_dir, "orders"),
                "o_orderkey",
                n_buckets,
                ("o_orderkey",),
            ),
            (
                "lineitem_b",
                lambda: load_table(spark, sf_dir, "lineitem"),
                "l_orderkey",
                n_buckets,
                ("l_orderkey",),
            ),
        ],
    )
    return left, right
