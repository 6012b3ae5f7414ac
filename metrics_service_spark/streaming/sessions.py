"""Streaming sessionization and incremental-state operators (ST2-ST6, ST9).

Reference semantics:
- ST2: a micro-batch loop pulls 1000 events at a time, keeps a
  live-sessions dict per IP with a 60-minute TTL, and writes sessionIds
  back one ES `update` per record (metricselasticsearch.py:31-32,
  942-1011, 1015-1072).
- ST3: an event arriving older than the max processed time for its IP
  triggers `removeStaleSessionIds` + reprocess
  (metricselasticsearch.py:887-931,982-987).
- ST4: logstash hash-session = MD5(ip+ua) per clock hour
  (search.conf:336-352).
- ST6: portal family MD5-hash change detection skips unchanged keys
  (es_eventlog_sync.py:469-547).
- ST9: live sessions = newest event per IP in [mark-60m, mark)
  (metricselasticsearch.py:681-787).

Spark-first replacement: `session_window` holds the per-key session
state inside the streaming aggregation — the dict, TTL bookkeeping, and
stale-repair loop all disappear.  `withWatermark` is the declarative
out-of-order contract: events later than the watermark are dropped,
everything inside it merges into (possibly re-emitted) sessions, which
subsumes the reference's strip-and-reprocess repair.

Scale: state is partitioned by the grouping key across executors
(RocksDB state store on a real cluster); watermark bounds state size —
the reference's unbounded live-session dict on one Python process
becomes bounded distributed state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metrics_service_spark.operators.sessionize import hash_session_id


def session_aggregate(
    events: DataFrame,
    *,
    key: str = "ipAddress",
    ts: str = "dateLogged",
    gap: str = "60 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """ST2/ST3: gap-based session aggregation over a stream.

    Emits one row per closed session: (key, session_start, session_end,
    n_events) — the same shape as the batch `session_bounds` (A6), so
    downstream consumers are batch/stream agnostic.
    """
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col("n_events"),
        )
    )


def tumbling_hourly(
    events: DataFrame,
    *,
    ts: str = "dateLogged",
    watermark: str = "2 hours",
) -> DataFrame:
    """ST4: 1-hour tumbling-window event counts per hash-session.

    The logstash hash-session (W4) IS a tumbling hourly window keyed by
    MD5(ip+ua); expressed natively the window is first-class and the
    hash is just the key.
    """
    sid = hash_session_id(
        F.col("ipAddress"), F.col("userAgent"), F.col(ts)
    ).alias("hashSessionId")
    return (
        events.withWatermark(ts, watermark)
        .select(sid, F.col(ts))
        .groupBy("hashSessionId", F.window(F.col(ts), "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "hashSessionId",
            F.col("w.start").alias("hour_start"),
            F.col("n_events"),
        )
    )


def changed_keys_upsert(
    new_state: DataFrame,
    prior_state: DataFrame | None,
    *,
    key: str,
    members_col: str,
) -> DataFrame:
    """ST6: family-hash change detection.

    `new_state` carries (key, members array); the state hash is
    MD5(concat(sorted members)) exactly as the reference computes it
    (es_eventlog_sync.py:469-482, O5).  Returns only the rows whose hash
    differs from `prior_state` (or all rows when no prior state) — the
    set a Delta/iceberg MERGE would upsert, skipping unchanged keys.
    Anti-join on (key, hash): one broadcast-able shuffle, no full
    rewrite of the state table.
    """
    hashed = new_state.withColumn(
        "state_hash", F.md5(F.concat_ws(",", F.array_sort(F.col(members_col))))
    )
    if prior_state is None:
        return hashed
    prior = prior_state.withColumn(
        "state_hash", F.md5(F.concat_ws(",", F.array_sort(F.col(members_col))))
    ).select(key, "state_hash")
    return hashed.join(prior, [key, "state_hash"], "left_anti")


def upsert_state_table(
    spark,
    table_dir: str,
    new_state: DataFrame,
    *,
    key: str,
    members_col: str,
    partition_cols: list[str] | None = None,
    partition_from_key: bool = False,
) -> int:
    """ST6 end-to-end against the transactional state table: hash-diff
    the incoming family state against the CURRENT table snapshot
    (changed_keys_upsert — unchanged keys never rewrite), then MERGE
    only the changed rows as one atomic manifest commit
    (sources/merge_table).  This is the reference's versioned ES bulk
    upsert (es_eventlog_sync.py:485-547) as a Spark-side table: the
    hash check skips unchanged families, the merge rewrites only
    touched partitions, and a reader mid-refresh keeps its snapshot.

    Returns the committed version.  Idempotent: replaying the same
    batch finds every hash unchanged and commits nothing (returns the
    current version).  A commit conflict (another writer landed a
    version first) triggers a bounded recompute-and-retry against the
    fresh snapshot — the reference's `retry_on_conflict: 3`
    (es_eventlog_sync.py:640-661) at table granularity.
    """
    from metrics_service_spark.sources.merge_table import (
        ConflictError,
        current_version,
        merge_table,
        read_table,
    )

    last: ConflictError | None = None
    for _ in range(3):
        observed = current_version(table_dir)
        prior = read_table(spark, table_dir, version=observed) if observed >= 0 else None
        changed = changed_keys_upsert(
            new_state, prior, key=key, members_col=members_col
        )
        if prior is not None and changed.isEmpty():
            return observed
        try:
            # expected_base pins the commit to the snapshot the diff was
            # computed against: a racer landing between read_table and
            # the commit raises ConflictError (never a silent lost
            # update where a stale hash-match keeps the racer's value)
            return merge_table(
                spark,
                table_dir,
                changed,
                key_cols=[key],
                partition_cols=partition_cols,
                partition_from_key=partition_from_key,
                expected_base=observed,
            )
        except ConflictError as ex:
            last = ex  # recompute the diff against the new version
    raise last


def live_sessions_at(
    events: DataFrame,
    mark,
    *,
    key: str = "ipAddress",
    ts: str = "dateLogged",
    ttl_minutes: int = 60,
) -> DataFrame:
    """ST9/W1: snapshot of live sessions at `mark` — newest event per key
    within [mark - ttl, mark) (metricselasticsearch.py:681-787).

    Batch helper used when re-seeding streaming state; the max-per-key
    is a partial-aggregable groupBy, not a window sort.
    """
    lo = F.lit(mark) - F.expr(f"INTERVAL {int(ttl_minutes)} MINUTES")
    return (
        events.filter((F.col(ts) >= lo) & (F.col(ts) < F.lit(mark)))
        .groupBy(key)
        .agg(F.max(ts).alias("last_seen"))
    )
