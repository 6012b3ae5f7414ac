"""Incremental gold refresh test (M9): streaming star refresh over a
growing silver directory converges to the full batch recomputation,
and a second batch only touches the affected month partitions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metrics_service_spark.plans.gold import metrics_star
from metrics_service_spark.sources.eventlog import eventlog_view
from metrics_service_spark.sources.tables import load_table
from metrics_service_spark.streaming.gold_refresh import incremental_star_refresh

STAR_KEY = [
    "dataset_id",
    "user_id",
    "repository",
    "award_number",
    "day",
    "month",
    "year",
    "country_code",
    "metrics_name",
]


def _rows(df):
    return sorted(
        tuple(r[c] for c in STAR_KEY + ["metrics_value"]) for r in df.collect()
    )


def test_incremental_refresh_converges(spark, sf_dir, tmp_path):
    ev = eventlog_view(load_table(spark, sf_dir, "events")).cache()
    # the regenerated fixtures span a single month; split by day so
    # the second batch is non-empty and re-touches the month partition
    jan = ev.filter(F.dayofmonth("dateLogged") <= 15)
    rest = ev.filter(F.dayofmonth("dateLogged") > 15)
    silver = str(tmp_path / "silver")
    star = str(tmp_path / "star")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: January only
    jan.write.mode("append").parquet(silver)
    q = incremental_star_refresh(spark, silver, star, ckpt)
    q.awaitTermination(120)
    got1 = _rows(spark.read.parquet(star))
    want1 = _rows(metrics_star(jan))
    assert got1 == want1 and len(got1) > 0

    # batch 2: the remaining months arrive; refresh only touches them
    rest.write.mode("append").parquet(silver)
    q = incremental_star_refresh(spark, silver, star, ckpt)
    q.awaitTermination(120)
    got2 = _rows(spark.read.parquet(star))
    want2 = _rows(metrics_star(ev))
    assert got2 == want2

    # re-running with nothing new is a no-op (checkpoint saw all files)
    q = incremental_star_refresh(spark, silver, star, ckpt)
    q.awaitTermination(120)
    assert _rows(spark.read.parquet(star)) == want2
