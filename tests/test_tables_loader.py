"""Fixture-drift guard for sources/tables.load_table: the round driver
regenerates the parquet fixtures and has switched timestamp physical
types between rounds (TIMESTAMP(NANOS) in r1-r3, un-adjusted
TIMESTAMP(MICROS)/NTZ in r4 — the latter crashed BENCH_r04 before the
loader normalized it).  These tests pin the loader's contract: every
loaded column is session-tz TIMESTAMP, never TIMESTAMP_NTZ, whichever
way the fixture was written."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from metrics_service_spark.sources.tables import TABLES, load_table


@pytest.mark.parametrize("name", TABLES)
def test_no_ntz_columns_survive_load(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    assert not ntz, f"{name}: NTZ columns leaked through load_table: {ntz}"


def test_timestamp_functions_work_on_loaded_events(spark, sf_dir):
    # unix_micros rejects TIMESTAMP_NTZ — this is exactly the call
    # shape that crashed BENCH_r04 before normalization
    df = load_table(spark, sf_dir, "events")
    n = df.select(F.unix_micros("ts").alias("us")).filter(
        F.col("us").isNotNull()
    )
    assert n.count() == df.count()


def test_ntz_fixture_normalized(spark, tmp_path):
    # synthesize an NTZ-typed parquet the way the r4 fixtures were
    # written and check the cast preserves wall-clock values under the
    # pinned UTC session
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    path = str(tmp_path / "events.parquet")
    ts = [datetime(2024, 1, 1, 12, 0, 0), datetime(2024, 1, 2, 3, 4, 5)]
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),  # no tz => NTZ
        }
    )
    pq.write_table(table, path)
    df = load_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r["ts"] for r in df.collect())
    assert got == ts
