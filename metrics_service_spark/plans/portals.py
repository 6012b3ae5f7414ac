"""Portal tag synchronization (SURVEY.md ST6/J9/U5, es_eventlog_sync).

Reference flow per portal seriesId (es_eventlog_sync.py:152-547):
1. resolve the portal's current dataset identifier family from Solr,
2. MD5-hash the sorted family and skip the portal when unchanged
   (:469-547),
3. tag events of member pids with the seriesId via painless
   array-add bulk updates (:608-694),
4. expunge: events currently tagged whose pid LEFT the family lose the
   tag (:318-359), computed by scanning tagged pids and list-diffing,
5. mirror the seriesId into citation_metadata.portal_id arrays with an
   array-distinct-append guarded by containment (:402-429).

Spark-first: all five steps become set algebra over DataFrames — the
per-pid bulk updates and list diffs are joins; the painless array
scripts are builtin array functions (F18/U5).  Output is a DELTA (adds
and removals per pid), the input to a Delta/Iceberg MERGE or an
overwrite of affected partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metrics_service_spark.functions.scalars import family_hash


def changed_portals(
    families: DataFrame, portal_state: DataFrame | None
) -> DataFrame:
    """ST6 gate: families is (series_id, members array); returns only
    portals whose sorted-family MD5 differs from the stored hash
    (portal_metadata table, 00-metrics-tables.sql:73-79) — plus the
    fresh hash to upsert."""
    hashed = families.select(
        "series_id",
        F.col("members"),
        family_hash(F.col("members")).alias("hash"),
    )
    if portal_state is None:
        return hashed
    return hashed.join(
        portal_state.select("series_id", "hash"), ["series_id", "hash"], "left_anti"
    )


def portal_tag_deltas(
    events: DataFrame,
    families: DataFrame,
    *,
    pid_col: str = "pid",
    portal_col: str = "portalIdentifier",
) -> DataFrame:
    """Tag/expunge deltas per (pid, series_id):
    - action='add'    : pid is in the family but its events lack the tag
      (updateIndex add path, es_eventlog_sync.py:608-630),
    - action='remove' : pid has the tag but left the family
      (updatePortalEpungePIDs, :318-359 — the J9 anti-join).

    One pass over events' current tag state (distinct (pid, tag) +
    distinct (pid) universe), two anti-joins against the exploded
    families."""
    member_pairs = families.select(
        F.col("series_id"), F.explode("members").alias(pid_col)
    ).distinct()
    current_tags = (
        events.select(
            F.col(pid_col), F.explode_outer(portal_col).alias("series_id")
        )
        .filter(F.col("series_id").isNotNull())
        .distinct()
    )
    event_pids = events.select(pid_col).distinct()
    adds = (
        member_pairs.join(event_pids, pid_col, "left_semi")
        .join(current_tags, [pid_col, "series_id"], "left_anti")
        .withColumn("action", F.lit("add"))
    )
    removes = current_tags.join(
        member_pairs, [pid_col, "series_id"], "left_anti"
    ).withColumn("action", F.lit("remove"))
    return adds.unionByName(removes)


def apply_tag_deltas(
    events: DataFrame,
    deltas: DataFrame,
    *,
    pid_col: str = "pid",
    portal_col: str = "portalIdentifier",
) -> DataFrame:
    """Apply the deltas to the event table's tag arrays with builtin
    array functions (the painless array add/remove scripts, F18):
    array_union for adds, array_except for removes, arrays kept sorted
    for deterministic comparison."""
    grouped = deltas.groupBy(pid_col).agg(
        F.collect_set(F.when(F.col("action") == "add", F.col("series_id"))).alias(
            "__adds"
        ),
        F.collect_set(
            F.when(F.col("action") == "remove", F.col("series_id"))
        ).alias("__removes"),
    )
    out = events.join(grouped, pid_col, "left")
    new_tags = F.array_sort(
        F.array_except(
            F.array_union(
                F.coalesce(F.col(portal_col), F.array().cast("array<string>")),
                F.coalesce(F.col("__adds"), F.array().cast("array<string>")),
            ),
            F.coalesce(F.col("__removes"), F.array().cast("array<string>")),
        )
    )
    return out.withColumn(portal_col, new_tags).drop("__adds", "__removes")


def portal_citation_updates(
    citations: DataFrame,
    families: DataFrame,
    *,
    target_col: str = "target_id",
) -> DataFrame:
    """updateCitationsDatabase (es_eventlog_sync.py:402-429, J10/U5):
    citation targets contained in a portal family pid (substring
    containment, kept faithful) gain that seriesId; returns
    (target_id, series_id) pairs for the array-distinct-append upsert."""
    members = families.select(
        F.col("series_id"), F.explode("members").alias("__pid")
    )
    return (
        citations.select(F.col(target_col))
        .distinct()
        .join(
            F.broadcast(members),
            F.instr(F.col("__pid"), F.col(target_col)) > 0,
            "inner",
        )
        .select(target_col, "series_id")
        .distinct()
    )
