"""Sessionization property tests (SURVEY.md §5.4): on random event
streams, (a) no within-session gap exceeds the TTL and sessions are
split at every gap > TTL, (b) session seq ids are monotone per key in
time order, (c) input order invariance — a shuffled stream produces
identical sessions to the sorted stream (the declarative answer to the
reference's out-of-order repair loop, W3/ST3)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from metrics_service_spark.operators.sessionize import sessionize

GAP_MIN = 60
BASE = datetime(2024, 1, 1)


def _random_stream(seed: int, n_keys: int = 5, n_events: int = 120):
    rng = random.Random(seed)
    rows = []
    eid = 0
    for k in range(n_keys):
        t = BASE + timedelta(minutes=rng.randint(0, 600))
        for _ in range(rng.randint(1, n_events // n_keys)):
            # mix sub-gap and super-gap increments, incl. exactly-60m
            t = t + timedelta(minutes=rng.choice([1, 5, 59, 60, 61, 200]))
            rows.append((eid, f"ip{k}", t))
            eid += 1
    return rows


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_gap_and_monotonicity(spark, seed):
    rows = _random_stream(seed)
    df = spark.createDataFrame(rows, "event_id long, ip string, ts timestamp")
    out = (
        sessionize(df, "ip", "ts", gap_minutes=GAP_MIN, order_tiebreak=["event_id"])
        .orderBy("ip", "ts", "event_id")
        .collect()
    )
    by_key: dict[str, list] = {}
    for r in out:
        by_key.setdefault(r.ip, []).append(r)
    for evs in by_key.values():
        assert evs[0].session_seq == 1
        for prev, cur in zip(evs, evs[1:]):
            gap = (cur.ts - prev.ts).total_seconds() / 60
            if gap > GAP_MIN:  # strict >, TTL boundary stays in-session
                assert cur.session_seq == prev.session_seq + 1
            else:
                assert cur.session_seq == prev.session_seq


@pytest.mark.parametrize("seed", [3, 99])
def test_shuffle_invariance(spark, seed):
    rows = _random_stream(seed)
    shuffled = rows[:]
    random.Random(seed + 1).shuffle(shuffled)
    df1 = spark.createDataFrame(rows, "event_id long, ip string, ts timestamp")
    df2 = spark.createDataFrame(shuffled, "event_id long, ip string, ts timestamp")
    key = lambda r: (r.ip, r.event_id)  # noqa: E731
    s1 = {
        key(r): r.session_seq
        for r in sessionize(
            df1, "ip", "ts", gap_minutes=GAP_MIN, order_tiebreak=["event_id"]
        ).collect()
    }
    s2 = {
        key(r): r.session_seq
        for r in sessionize(
            df2, "ip", "ts", gap_minutes=GAP_MIN, order_tiebreak=["event_id"]
        ).collect()
    }
    assert s1 == s2


@pytest.mark.parametrize("seed", [2, 11, 31])
def test_bucketed_equals_plain(spark, seed):
    """sessionize_bucketed must produce exactly the same (key, event) ->
    session assignment as the single-partition-per-key sessionize,
    including sessions that straddle bucket boundaries."""
    from metrics_service_spark.operators.sessionize import (
        sessionize,
        sessionize_bucketed,
    )

    rng = random.Random(seed)
    rows = []
    eid = 0
    for k in range(4):
        t = BASE
        for _ in range(200):
            # long strides force many bucket crossings incl. boundary
            # gaps both under and over the TTL
            t = t + timedelta(minutes=rng.choice([1, 30, 59, 61, 60 * 24, 60 * 24 * 6]))
            rows.append((eid, f"ip{k}", t))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ip string, ts timestamp")
    plain = {
        (r.ip, r.event_id): r.session_seq
        for r in sessionize(
            df, "ip", "ts", gap_minutes=60, order_tiebreak=["event_id"]
        ).collect()
    }
    bucketed = {
        (r.ip, r.event_id): r.session_seq
        for r in sessionize_bucketed(
            df, "ip", "ts", gap_minutes=60, bucket_days=7,
            order_tiebreak=["event_id"],
        ).collect()
    }
    assert bucketed == plain


def test_bucketed_rejects_short_buckets(spark):
    from metrics_service_spark.operators.sessionize import sessionize_bucketed

    df = spark.createDataFrame([(1, "a", BASE)], "event_id long, ip string, ts timestamp")
    with pytest.raises(ValueError):
        sessionize_bucketed(df, "ip", "ts", gap_minutes=60 * 24 * 40, bucket_days=1)


@pytest.mark.parametrize("seed", [3, 11])
def test_global_ids_monotone_and_dense(spark, seed):
    """sessionize_global: ids are 1..N dense, and ordering by id equals
    ordering by (session start, key, session_seq) — the reference's
    time-of-first-event monotone numbering — regardless of input
    partitioning."""
    from metrics_service_spark.operators.sessionize import sessionize_global

    rows = _random_stream(seed)
    df = spark.createDataFrame(
        rows, "event_id long, ip string, ts timestamp"
    ).repartition(13)
    out = sessionize_global(
        df, "ip", "ts", gap_minutes=GAP_MIN, order_tiebreak=["event_id"]
    )
    sess = (
        out.groupBy("ip", "session_seq", "global_session_id")
        .agg(F.min("ts").alias("st"))
        .collect()
    )
    ids = sorted(r.global_session_id for r in sess)
    assert ids == list(range(1, len(sess) + 1))  # dense, 1-based
    by_id = sorted(sess, key=lambda r: r.global_session_id)
    by_time = sorted(sess, key=lambda r: (r.st, r.ip, r.session_seq))
    assert [r.global_session_id for r in by_time] == [
        r.global_session_id for r in by_id
    ]
