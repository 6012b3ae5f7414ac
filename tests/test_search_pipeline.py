"""Search-event pipeline: the two logstash drop stages must drop
exactly the non-CN and non-rows=25 lines (search.conf:63-100)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metrics_service_spark.catalog.search import q_search_log_pipeline
from metrics_service_spark.sources.tables import load_table


def test_drops_match_line_population(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    expected = ev.filter(
        (F.col("event_id") % 7 != 0) & (F.col("event_id") % 5 != 0)
    ).count()
    out = q_search_log_pipeline(spark, sf_dir)
    assert out.count() == expected
    # every surviving line parsed a well-formed session id: md5|YYYYMMDDHH
    bad = out.filter(~F.col("session_id").rlike(r"^[0-9a-f]{32}\|\d{10}$")).count()
    assert bad == 0


def test_kv_values_roundtrip(spark, sf_dir):
    out = q_search_log_pipeline(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id"), F.col("event_type"), (F.col("event_id") % 100).alias("st")
    )
    joined = out.join(ev, "event_id")
    mism = joined.filter(
        (F.col("solr_q") != F.col("event_type"))
        | (F.col("solr_start") != F.col("st"))
    ).count()
    assert mism == 0


def test_streaming_matches_batch(spark, tmp_path):
    """ST-surface for search.conf: the streaming query over raw log
    files produces exactly the batch parse of the same lines, and a
    restart over the same landing dir does not duplicate (checkpoint +
    idempotent batch_id overwrite)."""
    from metrics_service_spark.catalog.search import _raw_lines
    from metrics_service_spark.streaming.search import (
        parse_search_lines,
        run_search_ingest,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events").limit(300)
    lines = _raw_lines(events).select(F.col("raw").alias("value"))
    landing = tmp_path / "landing"
    landing.mkdir()
    with open(landing / "access.log", "w") as fh:
        for r in lines.collect():
            fh.write(r.value + "\n")

    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = run_search_ingest(spark, str(landing), str(out), str(ckpt))
    q.awaitTermination(120)
    got = sorted(
        (r.session_id, r.solr_q, r.solr_start)
        for r in spark.read.parquet(str(out)).collect()
    )
    want = sorted(
        (r.session_id, r.solr_q, r.solr_start)
        for r in parse_search_lines(lines).collect()
    )
    assert got == want and len(got) > 0

    # restart: no new batches, no duplicates
    q2 = run_search_ingest(spark, str(landing), str(out), str(ckpt))
    q2.awaitTermination(120)
    assert spark.read.parquet(str(out)).count() == len(want)
