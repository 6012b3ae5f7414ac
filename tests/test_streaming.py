"""Structured Streaming tests (SURVEY.md §5.5): ingest pipeline with
corrupt-record quarantine, stream sessionization vs batch parity, late
data beyond the watermark dropped."""

from __future__ import annotations

import json
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from metrics_service_spark.operators.sessionize import session_bounds, sessionize
from metrics_service_spark.streaming.ingest import cidr_ranges_df, run_ingest
from metrics_service_spark.streaming.sessions import (

    changed_keys_upsert,
    live_sessions_at,
    session_aggregate,
    tumbling_hourly,
)

# multi-minute suite: excluded from the fast default run (pytest.ini)
pytestmark = pytest.mark.slow

T0 = datetime(2024, 3, 1, 10, 0, 0)


def _event(i: int, *, ip: str, minutes: float, ua: str = "Mozilla/5.0", **kw):
    rec = {
        "eventId": f"e{i}",
        "nodeId": "urn:node:A",
        "pid": f"pid{i % 3}",
        "formatType": "DATA",
        "event": "read",
        "dateLogged": (T0 + timedelta(minutes=minutes)).strftime(
            "%Y-%m-%dT%H:%M:%S.000Z"
        ),
        "ipAddress": ip,
        "userAgent": ua,
        "subject": "cn=u",
        "request": "/cn/v2/object",
        "size": 100,
        "isPublic": True,
    }
    rec.update(kw)
    return json.dumps(rec)


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    landing = root / "landing"
    landing.mkdir()
    lines = [
        _event(0, ip="10.1.0.5", minutes=0),
        _event(1, ip="10.1.0.5", minutes=5),
        _event(2, ip="20.2.0.9", minutes=1, ua="GoogleBot/2.1"),
        _event(3, ip="30.3.0.1", minutes=2, request="/cn/v2/query/solr/?q=x"),
        "{not valid json at all",
    ]
    (landing / "part-0.json").write_text("\n".join(lines) + "\n")
    ranges = cidr_ranges_df(spark, [("10.1.0.0/16", "dataone_ip")])
    q = run_ingest(
        spark,
        str(landing),
        str(root / "silver"),
        str(root / "ckpt"),
        ip_ranges=ranges,
        quarantine_dir=str(root / "quarantine"),
    )
    q.awaitTermination(120)
    return root


def test_ingest_enriches_and_partitions(spark, ingested):
    silver = spark.read.parquet(str(ingested / "silver"))
    rows = {r["eventId"]: r for r in silver.collect()}
    assert set(rows) == {"e0", "e1", "e2", "e3"}
    assert rows["e0"]["tags"] == ["dataone_ip"]          # CIDR range join
    assert rows["e2"]["tags"] == ["robot_ua"]            # UA pattern
    assert rows["e3"]["tags"] == []
    assert rows["e3"]["searchevent"] is True             # P8 prefix test
    assert rows["e0"]["searchevent"] is False
    # sink is hive-partitioned by event_date (partition pruning at scale)
    assert (ingested / "silver" / "event_date=2024-03-01").exists()


def test_ingest_quarantines_corrupt(spark, ingested):
    bad = spark.read.json(str(ingested / "quarantine")).collect()
    assert len(bad) == 1
    assert "not valid json" in bad[0]["raw_line"]


def test_ingest_checkpoint_no_reprocess(spark, ingested):
    """ST7: restarting over the same landing dir must not duplicate
    (checkpoint replaces the reference's overlap-dedup-by-id)."""
    q = run_ingest(
        spark,
        str(ingested / "landing"),
        str(ingested / "silver"),
        str(ingested / "ckpt"),
        quarantine_dir=str(ingested / "quarantine"),
    )
    q.awaitTermination(120)
    assert spark.read.parquet(str(ingested / "silver")).count() == 4


def _stream_session_rows(spark, tmp_path, events_df, fn, name):
    src = tmp_path / f"{name}-src"
    events_df.coalesce(1).write.json(str(src))
    stream = spark.readStream.schema(events_df.schema).json(str(src))
    out = fn(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / f"{name}-ckpt"))
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}").collect()


def test_session_window_matches_batch(spark, tmp_path):
    """ST2: streaming session_window == batch sessionize + bounds for
    sessions closed by the watermark."""
    rows = [
        ("a", T0 + timedelta(minutes=m)) for m in (0, 10, 30, 120, 130)
    ] + [("b", T0 + timedelta(minutes=m)) for m in (5, 400)]
    # sentinel far in the future advances the watermark past everything
    rows.append(("zz", T0 + timedelta(days=30)))
    df = spark.createDataFrame(rows, "ipAddress string, dateLogged timestamp")

    got = {
        (r["ipAddress"], r["session_start"], r["n_events"])
        for r in _stream_session_rows(
            spark, tmp_path, df, session_aggregate, "sess_stream"
        )
        if r["ipAddress"] != "zz"
    }

    batch = session_bounds(
        sessionize(df.filter(F.col("ipAddress") != "zz"), "ipAddress", "dateLogged"),
        "ipAddress",
        "dateLogged",
    )
    want = {
        (r["ipAddress"], r["session_start"], r["n_events"]) for r in batch.collect()
    }
    assert got == want
    assert ("a", T0, 3) in got  # 0,10,30 one session; 120 starts a new one


def test_watermark_drops_late_event(spark, tmp_path):
    """ST3: an event arriving behind the watermark is dropped — the
    declarative replacement for removeStaleSessionIds repair."""
    src = tmp_path / "late-src"
    src.mkdir()
    schema = "ipAddress string, dateLogged timestamp"
    batch1 = spark.createDataFrame(
        [("a", T0), ("adv", T0 + timedelta(days=10))], schema
    )
    batch1.coalesce(1).write.mode("append").json(str(src))

    out_dir = tmp_path / "late-out"

    def run_once():
        stream = spark.readStream.schema(batch1.schema).json(str(src))
        q = (
            session_aggregate(stream, watermark="1 hour")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(tmp_path / "late-ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # now a VERY late event for "a" (watermark is already at T0+10d-1h)
    spark.createDataFrame([("a", T0 + timedelta(minutes=1))], schema).coalesce(
        1
    ).write.mode("append").json(str(src))
    run_once()

    got = [
        (r["ipAddress"], r["n_events"])
        for r in spark.read.parquet(str(out_dir)).collect()
        if r["ipAddress"] == "a"
    ]
    assert got == [("a", 1)]  # late event did not create/extend a session


def test_tumbling_hourly(spark, tmp_path):
    rows = [
        ("1.1.1.1", "ua1", T0 + timedelta(minutes=m)) for m in (0, 20, 70)
    ] + [("zz", "zz", T0 + timedelta(days=30))]
    df = spark.createDataFrame(
        rows, "ipAddress string, userAgent string, dateLogged timestamp"
    )
    got = {
        (r["hour_start"], r["n_events"])
        for r in _stream_session_rows(spark, tmp_path, df, tumbling_hourly, "tumb")
        if r["hour_start"] < T0 + timedelta(days=1)
    }
    assert got == {(T0, 2), (T0 + timedelta(hours=1), 1)}


def test_changed_keys_upsert(spark):
    new = spark.createDataFrame(
        [("p1", ["a", "b"]), ("p2", ["c"]), ("p3", ["d"])],
        "sid string, members array<string>",
    )
    prior = spark.createDataFrame(
        [("p1", ["b", "a"]), ("p2", ["zzz"])],
        "sid string, members array<string>",
    )
    changed = changed_keys_upsert(new, prior, key="sid", members_col="members")
    # p1 unchanged (order-insensitive hash), p2 changed, p3 new
    assert {r["sid"] for r in changed.collect()} == {"p2", "p3"}


def test_live_sessions_at(spark):
    df = spark.createDataFrame(
        [
            ("a", T0 - timedelta(minutes=90)),   # expired
            ("b", T0 - timedelta(minutes=30)),
            ("b", T0 - timedelta(minutes=10)),   # newest for b
            ("c", T0),                            # at mark: excluded
        ],
        "ipAddress string, dateLogged timestamp",
    )
    live = {
        (r["ipAddress"], r["last_seen"])
        for r in live_sessions_at(df, T0).collect()
    }
    assert live == {("b", T0 - timedelta(minutes=10))}


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """ST2 exact shape: per-event session assignment from
    applyInPandasWithState equals the batch window-function result."""
    from metrics_service_spark.streaming.stateful import stateful_sessionize

    rows = (
        [("a", T0 + timedelta(minutes=m)) for m in (0, 10, 61, 200)]
        + [("b", T0 + timedelta(minutes=m)) for m in (5, 66, 126)]
        + [("zz", T0 + timedelta(days=30))]  # watermark advancer
    )
    df = spark.createDataFrame(rows, "ipAddress string, dateLogged timestamp")
    got = {
        (r["key"], r["dateLogged"], r["session_seq"])
        for r in _stream_session_rows(
            spark, tmp_path, df, stateful_sessionize, "stateful_sess"
        )
        if r["key"] != "zz"
    }
    batch = sessionize(
        df.filter(F.col("ipAddress") != "zz"), "ipAddress", "dateLogged"
    )
    want = {
        (r["ipAddress"], r["dateLogged"], r["session_seq"])
        for r in batch.collect()
    }
    assert got == want
    # gap semantics: a @ (0,10,61,200) -> 61-10=51m stays, 200-61=139m splits
    a_seqs = sorted(s for k, _, s in got if k == "a")
    assert a_seqs == [1, 1, 1, 2]
    # b @ (5,66,126) -> 61m gap splits (strict >60), 60m gap stays
    b_seqs = sorted(s for k, _, s in got if k == "b")
    assert b_seqs == [1, 2, 2]


def test_stateful_sessionize_out_of_order_batch(spark, tmp_path):
    """An out-of-time-order micro-batch must still attach session numbers
    to the RIGHT events: [13:20, 10:00] in arrival order is sessions
    {10:00 -> 1, 13:20 -> 2}, not the swapped assignment a pandas index
    misalignment would produce."""
    from metrics_service_spark.streaming.stateful import stateful_sessionize

    late, early = T0 + timedelta(hours=3, minutes=20), T0
    rows = [("a", late), ("a", early), ("zz", T0 + timedelta(days=30))]
    df = spark.createDataFrame(rows, "ipAddress string, dateLogged timestamp")
    got = {
        (r["dateLogged"], r["session_seq"])
        for r in _stream_session_rows(
            spark, tmp_path, df, stateful_sessionize, "stateful_ooo"
        )
        if r["key"] == "a"
    }
    assert got == {(early, 1), (late, 2)}


def test_stateful_sessionize_state_survives_restart(spark, tmp_path):
    """State continuity: a session open at the end of run 1 extends in
    run 2 from the checkpointed (last_ts, seq) state — the property the
    reference's live-session dict loses on process restart."""
    from metrics_service_spark.streaming.stateful import stateful_sessionize

    src = tmp_path / "restart-src"
    src.mkdir()
    out = tmp_path / "restart-out"
    schema = "ipAddress string, dateLogged timestamp"

    def run_once():
        stream = spark.readStream.schema(
            "ipAddress string, dateLogged timestamp"
        ).json(str(src))
        q = (
            stateful_sessionize(stream, watermark="365 days")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "restart-ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1: two events 10 minutes apart -> one open session
    spark.createDataFrame(
        [("a", T0), ("a", T0 + timedelta(minutes=10))], schema
    ).coalesce(1).write.mode("append").json(str(src))
    run_once()
    # run 2 (fresh query, same checkpoint): +30 min extends session 1;
    # +500 min starts session 2
    spark.createDataFrame(
        [
            ("a", T0 + timedelta(minutes=40)),
            ("a", T0 + timedelta(minutes=540)),
        ],
        schema,
    ).coalesce(1).write.mode("append").json(str(src))
    run_once()

    rows = sorted(
        (r["dateLogged"], r["session_seq"])
        for r in spark.read.parquet(str(out)).collect()
    )
    assert [s for _, s in rows] == [1, 1, 1, 2]


def test_ua_dictionary_loader(spark, tmp_path):
    """F7: the logstash translate dictionaries compile to one rlike
    alternation; anchors and escapes survive the round trip."""
    from pyspark.sql import functions as F

    from metrics_service_spark.streaming.ingest import (
        compile_ua_pattern,
        load_ua_dictionary,
    )

    yml = tmp_path / "ua.yml"
    yml.write_text(
        '"bot": counterUA\n'
        '"^ruby$": counterUA\n'
        '"^voyager\\\\/": counterUA\n'
        '"[^a]fish": counterUA\n'
    )
    d = load_ua_dictionary(str(yml))
    assert d == {
        "bot": "counterUA",
        "^ruby$": "counterUA",
        "^voyager\\/": "counterUA",
        "[^a]fish": "counterUA",
    }
    pat = compile_ua_pattern(list(d))
    df = spark.createDataFrame(
        [
            ("GoogleBot/2.1", True),       # substring 'bot' (case-insensitive)
            ("ruby", True),                # anchored exact
            ("ruby/1.9", False),           # anchor must NOT match prefix
            ("voyager/2", True),
            ("catfish", False),            # [^a]fish: 'tfish' matches? t != a -> True
            ("Mozilla/5.0", False),
        ],
        "ua string, _ignore boolean",
    )
    got = {
        r.ua: r.hit
        for r in df.select("ua", F.col("ua").rlike(pat).alias("hit")).collect()
    }
    assert got["GoogleBot/2.1"] is True
    assert got["ruby"] is True
    assert got["ruby/1.9"] is False
    assert got["voyager/2"] is True
    assert got["catfish"] is True  # 'tfish' satisfies [^a]fish
    assert got["Mozilla/5.0"] is False


def test_dedup_event_stream_drops_repeated_ids(spark, tmp_path):
    """An upstream that re-emits events (at-least-once writer) is
    deduped by eventId within the watermark horizon."""
    import json

    from metrics_service_spark.streaming.ingest import (
        dedup_event_stream,
        read_event_stream,
    )

    landing = tmp_path / "dup-landing"
    landing.mkdir()
    base = {
        "nodeId": "urn:node:A", "pid": "p1", "formatType": "METADATA",
        "event": "read", "ipAddress": "10.0.0.1", "userAgent": "ua",
        "subject": "s", "request": "/cn/v2/object", "size": 1, "isPublic": True,
    }
    lines1 = [
        json.dumps({**base, "eventId": "e1", "dateLogged": "2024-03-01T10:00:00"}),
        json.dumps({**base, "eventId": "e2", "dateLogged": "2024-03-01T10:01:00"}),
    ]
    # writer restarts and re-emits e2 alongside a new e3
    lines2 = [
        json.dumps({**base, "eventId": "e2", "dateLogged": "2024-03-01T10:01:00"}),
        json.dumps({**base, "eventId": "e3", "dateLogged": "2024-03-01T10:02:00"}),
    ]
    (landing / "a.json").write_text("\n".join(lines1) + "\n")
    (landing / "b.json").write_text("\n".join(lines2) + "\n")

    out = tmp_path / "dup-out"
    stream = dedup_event_stream(read_event_stream(spark, str(landing)))
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "dup-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = sorted(r.eventId for r in spark.read.parquet(str(out)).collect())
    assert ids == ["e1", "e2", "e3"]


def test_dedup_gate_admits_first_drops_repeats(spark, tmp_path):
    """Streaming content-hash gate: first doc with a hash is admitted,
    repeats (same text, different ids, later batches) are tagged
    duplicates with a running count."""
    import datetime as dt

    from metrics_service_spark.streaming.dedup_gate import dedup_gate_stream

    landing = tmp_path / "gate-landing"
    landing.mkdir()
    t0 = dt.datetime(2024, 5, 1, 10, 0, 0)

    def _rows(batch):
        return "\n".join(
            f'{{"doc_id": "{d}", "text": "{t}", "event_ts": "{(t0 + dt.timedelta(minutes=m)).isoformat()}"}}'
            for d, t, m in batch
        )

    (landing / "b1.json").write_text(
        _rows([("d1", "hello world", 0), ("d2", "hello world", 1), ("d3", "other text", 2)]) + "\n"
    )
    (landing / "b2.json").write_text(_rows([("d4", "hello world", 3)]) + "\n")

    schema = "doc_id string, text string, event_ts timestamp"
    stream = spark.readStream.schema(schema).json(str(landing))
    out = tmp_path / "gate-out"
    q = (
        dedup_gate_stream(stream, ttl_minutes=60, watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "gate-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.doc_id: r for r in spark.read.parquet(str(out)).collect()}
    assert rows["d1"].is_first and rows["d3"].is_first
    assert not rows["d2"].is_first and not rows["d4"].is_first
    # running duplicate count per hash: d2 first repeat, d4 second
    assert rows["d2"].n_dropped_so_far == 1
    assert rows["d4"].n_dropped_so_far == 2
    admitted = sorted(d for d, r in rows.items() if r.is_first)
    assert admitted == ["d1", "d3"]


def test_dedup_gate_state_survives_across_micro_batches(spark, tmp_path):
    """Regression: the first micro-batch runs at watermark 0; a timeout
    anchored on the watermark would evict all state next batch and
    re-admit later duplicates as first.  maxFilesPerTrigger=1 forces
    each landing file into its own micro-batch."""
    import datetime as dt

    from metrics_service_spark.streaming.dedup_gate import dedup_gate_stream

    landing = tmp_path / "gate2-landing"
    landing.mkdir()
    t0 = dt.datetime(2024, 5, 1, 10, 0, 0)

    def _row(d, t, m):
        ts = (t0 + dt.timedelta(minutes=m)).isoformat()
        return f'{{"doc_id": "{d}", "text": "{t}", "event_ts": "{ts}"}}'

    (landing / "a.json").write_text(_row("d1", "same text", 0) + "\n")
    (landing / "b.json").write_text(_row("d2", "unrelated", 1) + "\n")
    (landing / "c.json").write_text(_row("d3", "same text", 2) + "\n")

    schema = "doc_id string, text string, event_ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(landing))
    )
    out = tmp_path / "gate2-out"
    q = (
        dedup_gate_stream(stream, ttl_minutes=60, watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "gate2-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {r.doc_id: r for r in spark.read.parquet(str(out)).collect()}
    # d3 arrives 2+ micro-batches after d1 with identical content: the
    # state must still be there to flag it as a duplicate
    assert rows["d1"].is_first and rows["d2"].is_first
    assert not rows["d3"].is_first and rows["d3"].n_dropped_so_far == 1


def test_text_filter_ops_stream_compatible(spark, tmp_path):
    """The LLM text-filter projections (pii_scrub, repetition_stats)
    are stateless column expressions, so they run unchanged inside a
    micro-batch stream — streamed results must equal the batch run.
    (paragraph_dedup_stats aggregates corpus-wide, so its streaming
    form is the foreachBatch/merge-table path, not a projection.)"""
    from metrics_service_spark.operators.text import (
        pii_scrub,
        repetition_stats,
    )

    src = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.createDataFrame(
        [
            (1, "write to a@b.io now now now now"),
            (2, "plain text with 10.1.2.3 inside"),
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    scrubbed = pii_scrub(stream, "doc_id", "text")
    rep = repetition_stats(stream, "doc_id", "text", n=2)
    q = (
        scrubbed.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["doc_id"]: (r["n_emails"], r["n_ips"], r["redacted_hash"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        r["doc_id"]: (r["n_emails"], r["n_ips"], r["redacted_hash"])
        for r in pii_scrub(docs, "doc_id", "text").collect()
    }
    assert streamed == batch and len(streamed) == 2
    # repetition_stats plans on a stream without error (projection-only)
    assert rep.isStreaming
