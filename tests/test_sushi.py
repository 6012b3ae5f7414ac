"""SUSHI report assembly tests (plans/sushi.py): nested block structure,
header exceptions, gzip threshold, end-to-end file write."""

from __future__ import annotations

import gzip
import json

import pytest
from pyspark.sql import functions as F

from metrics_service_spark.plans.sushi import (
    report_header,
    sushi_dataset_blocks,
    sushi_instances,
    write_report,
)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # pid, country, formatType, sessionId
        ("pidA", "US", "METADATA", 1),
        ("pidA", "US", "METADATA", 1),  # same session: total+1, unique same
        ("pidA", "US", "DATA", 1),  # DATA in same session: inv bucket +1
        ("pidA", "DE", "DATA", 2),
        ("pidB", None, "METADATA", 3),  # null country -> 'n/a'
    ]
    return spark.createDataFrame(
        rows, "pid string, country string, formatType string, sessionId long"
    )


def test_instance_counts(events):
    out = {
        (r.pid, r.country): r for r in sushi_instances(events).collect()
    }
    a_us = out[("pidA", "us")]
    # totals: 2 METADATA + 1 DATA; unique buckets: (s1,METADATA),(s1,DATA)
    assert a_us.total_investigations == 3
    assert a_us.unique_investigations == 2
    assert a_us.total_requests == 1 and a_us.unique_requests == 1
    a_de = out[("pidA", "de")]
    assert a_de.total_investigations == 1  # DATA counts into investigations
    assert a_de.total_requests == 1
    assert out[("pidB", "n/a")].total_investigations == 1
    assert out[("pidB", "n/a")].total_requests == 0


def test_dataset_block_structure(events):
    blocks = sushi_dataset_blocks(
        events, begin_date="2024-01-01", end_date="2024-01-31"
    ).collect()
    assert [r.pid for r in blocks] == ["pidA", "pidB"]
    block = json.loads(blocks[0].block_json)
    assert block["dataset-id"] == [{"type": "doi", "value": "pidA"}]
    perf = block["performance"][0]
    assert perf["period"] == {"begin-date": "2024-01-01", "end-date": "2024-01-31"}
    inst = {i["metric-type"]: i for i in perf["performance-instances"]}
    assert inst["total-dataset-investigations"]["count"] == 4
    assert inst["total-dataset-investigations"]["country-counts"] == {
        "de": 1,
        "us": 3,
    }
    assert inst["unique-dataset-requests"]["country-counts"] == {"de": 1, "us": 1}


def test_header_gzip_exception():
    small = report_header(
        begin_date="2024-01-01", end_date="2024-01-31", node="urn:node:X",
        n_datasets=10, created="2024-02-01",
    )
    assert small["exceptions"] == []
    big = report_header(
        begin_date="2024-01-01", end_date="2024-01-31", node="urn:node:X",
        n_datasets=2001, created="2024-02-01",
    )
    assert big["exceptions"][0]["code"] == 69


def test_write_report_roundtrip(events, tmp_path):
    blocks = sushi_dataset_blocks(
        events, begin_date="2024-01-01", end_date="2024-01-31"
    )
    path = write_report(
        blocks, str(tmp_path), begin_date="2024-01-01", end_date="2024-01-31",
        node="urn:node:TEST", created="2024-02-01",
    )
    doc = json.loads(path.read_text())
    assert doc["report-header"]["report-id"] == "dsr"
    assert doc["report-header"]["created-by"] == "urn:node:TEST"
    assert len(doc["report-datasets"]) == 2


def test_write_report_gzips_large(events, tmp_path, monkeypatch):
    import metrics_service_spark.plans.sushi as sushi_mod

    monkeypatch.setattr(sushi_mod, "LARGE_REPORT_THRESHOLD", 1)
    blocks = sushi_dataset_blocks(
        events, begin_date="2024-01-01", end_date="2024-01-31"
    )
    path = write_report(
        blocks, str(tmp_path), begin_date="2024-01-01", end_date="2024-01-31",
        node="urn:node:TEST", created="2024-02-01",
    )
    assert path.suffix == ".gz"
    doc = json.loads(gzip.decompress(path.read_bytes()))
    assert len(doc["report-datasets"]) == 2
    assert doc["report-header"]["exceptions"][0]["code"] == 69
