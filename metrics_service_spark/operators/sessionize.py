"""Sessionization operators.

Reference semantics (SURVEY.md §2.5):
- W2 gap sessionization: the reference loops over ES batches of 1000
  events, keeping a live-session dict per IP with a 60-minute TTL and a
  globally monotone session id (metricselasticsearch.py:1015-1072,
  942-1011, TTL at :32).  Spark-first design: one window-function pass —
  no batching, no per-record update round-trips; the whole history is
  sessionized in a single shuffle by (key) + per-partition sort.
- W1 last-event-per-key: ES `terms(ip) > top_hits(size=1)`
  (metricselasticsearch.py:681-751) becomes `row_number() == 1`.
- W4 hash-bucket session: logstash `MD5(ip+ua)+"|"+YYYYMMDDHH`
  (search.conf:336-352) becomes pure column expressions.

Scale: the only shuffle is `partitionBy(key)`; skewed keys (one IP with
millions of events) are bounded because a window sort within one key is
O(n log n) single-task — for pathological keys enable AQE skew handling
or pre-split by (key, date-bucket) since sessions never span the gap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    *,
    gap_minutes: int = 60,
    order_tiebreak: list[str] | None = None,
    out_col: str = "session_seq",
) -> DataFrame:
    """Assign per-key session sequence numbers (1-based) with gap semantics.

    A new session starts when the event's timestamp is more than
    `gap_minutes` after the previous event of the same key (strict >,
    matching SESSION_TTL_MINUTES in the reference).  Unlike the
    reference's global monotone ids, session identity is the composite
    (key, session_seq) — order-independent, hence deterministic and
    parallelizable; a global id is recoverable with a later
    zipWithIndex-style pass if ever needed.
    """
    order_cols = [F.col(ts)] + [F.col(c) for c in (order_tiebreak or [])]
    w = Window.partitionBy(key).orderBy(*order_cols)
    prev_ts = F.lag(F.col(ts)).over(w)
    is_new = prev_ts.isNull() | (
        F.col(ts) > prev_ts + F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    )
    running = Window.partitionBy(key).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(is_new.cast("long")).over(running))


def sessionize_global(
    df: DataFrame,
    key: str,
    ts: str,
    *,
    gap_minutes: int = 60,
    order_tiebreak: list[str] | None = None,
    out_col: str = "global_session_id",
) -> DataFrame:
    """Exact-fidelity variant of `sessionize`: additionally assigns the
    reference's GLOBALLY MONOTONE session id
    (metricselasticsearch.py:598-627 increments one counter as events
    stream in time order, so sessions are numbered by first-event
    time).  Total order: (session start ts, key, session_seq) — fully
    deterministic.

    Scale shape: the global rank is computed over SESSIONS (not
    events) with a two-phase distributed rank — per-day bucket counts,
    a prefix-sum of bucket offsets over the tiny per-day frame, then a
    row_number window PARTITIONED by day — never a single-partition
    sort of the full data.  (A session lives in exactly one bucket:
    the day its start falls on.)"""
    from metrics_service_spark.operators.rank import global_row_number

    s = sessionize(
        df, key, ts, gap_minutes=gap_minutes, order_tiebreak=order_tiebreak
    )
    bounds = s.groupBy(key, "session_seq").agg(F.min(ts).alias("__start"))
    ranked = global_row_number(
        bounds,
        bucket=F.to_date("__start"),
        order=[F.col("__start"), F.col(key), F.col("session_seq")],
        out_col=out_col,
    ).select(key, "session_seq", out_col)
    return s.join(ranked, [key, "session_seq"])


def session_bounds(
    sessions: DataFrame,
    key: str,
    ts: str,
    session_col: str = "session_seq",
    *,
    min_events: int = 1,
) -> DataFrame:
    """Per-session aggregate: start/end/count (reference `getSessions`,
    metricselasticsearch.py:492-551 — terms(sessionId) + min/max sub-aggs
    with a min_doc_count HAVING)."""
    out = sessions.groupBy(key, session_col).agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    if min_events > 1:
        out = out.filter(F.col("n_events") >= min_events)
    return out


def last_event_per_key(df: DataFrame, key: str, ts: str, *, tiebreak: list[str] | None = None) -> DataFrame:
    """W1: newest event per key (top_hits size=1 analog)."""
    order = [F.col(ts).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k_per_key(
    df: DataFrame, key: str, order_by: list[Column], k: int, rank_col: str = "rank"
) -> DataFrame:
    """O3: top-k rows per key with a deterministic tiebreak supplied by
    the caller (row_number, not rank, to guarantee exactly k)."""
    w = Window.partitionBy(key).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def hash_session_id(ip: Column, user_agent: Column, ts: Column) -> Column:
    """W4: logstash fingerprint session — MD5(ip+ua) + "|" + YYYYMMDDHH
    (search.conf:336-352). Pure expression, no shuffle."""
    return F.concat(
        F.md5(F.concat_ws(" ", ip, user_agent)),
        F.lit("|"),
        F.date_format(ts, "yyyyMMddHH"),
    )


def sessionize_bucketed(
    df: DataFrame,
    key: str,
    ts: str,
    *,
    gap_minutes: int = 60,
    bucket_days: int = 7,
    order_tiebreak: list[str] | None = None,
    out_col: str = "session_seq",
) -> DataFrame:
    """Skew-safe sessionization: identical output to `sessionize`, but
    the per-key window sort runs within (key, time-bucket) partitions so
    one pathological key (a NAT gateway with 10^8 events) splits across
    tasks instead of sorting in a single one.

    Mechanics: sessionize within each bucket, then stitch the bucket
    boundaries — the first session of bucket b merges with the last
    session of bucket b-1 when the boundary gap is within the TTL, and
    global sequence numbers are rebuilt from cumulative per-bucket
    session counts minus cumulative merges.  Correctness requires
    bucket length >= gap (an empty intermediate bucket then implies a
    gap larger than the TTL, so no merge can skip a bucket); enforced.

    The only per-key-global operation left is a window over the BUCKET
    SUMMARY rows (a handful per key), not the events.
    """
    if bucket_days * 24 * 60 < gap_minutes:
        raise ValueError("bucket must be at least as long as the session gap")
    bucket = F.window(F.col(ts), f"{bucket_days} days").start.alias("__bucket")
    ev = df.withColumn("__bucket", bucket)

    order_cols = [F.col(ts)] + [F.col(c) for c in (order_tiebreak or [])]
    w = Window.partitionBy(key, "__bucket").orderBy(*order_cols)
    prev_ts = F.lag(F.col(ts)).over(w)
    is_new = prev_ts.isNull() | (
        F.col(ts) > prev_ts + F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    )
    running = Window.partitionBy(key, "__bucket").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = ev.withColumn("__local_seq", F.sum(is_new.cast("long")).over(running))

    # bucket summaries: tiny (one row per key x active bucket)
    summary = local.groupBy(key, "__bucket").agg(
        F.max("__local_seq").alias("__n_sessions"),
        F.min(ts).alias("__first_ts"),
        F.max(ts).alias("__last_ts"),
    )
    wb = Window.partitionBy(key).orderBy("__bucket")
    prev_last = F.lag("__last_ts").over(wb)
    merged = summary.withColumn(
        "__merge",
        (
            prev_last.isNotNull()
            & (
                F.col("__first_ts")
                <= prev_last + F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
            )
        ).cast("long"),
    )
    stitched = merged.select(
        key,
        "__bucket",
        (
            F.coalesce(
                F.sum("__n_sessions").over(
                    Window.partitionBy(key)
                    .orderBy("__bucket")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            - F.sum("__merge").over(
                Window.partitionBy(key)
                .orderBy("__bucket")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
        ).alias("__offset"),
    )
    return (
        local.join(stitched, [key, "__bucket"])
        .withColumn(out_col, F.col("__offset") + F.col("__local_seq"))
        .drop("__bucket", "__local_seq", "__offset")
    )
