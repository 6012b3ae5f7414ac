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
