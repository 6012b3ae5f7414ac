"""Golden tests for the MetricsRequest translator against engineered
fixtures (expected values computed by hand from the fixture design)."""

from __future__ import annotations

import pytest

from metrics_service_spark.plans.metrics_request import MetricsRequestPlanner
from metrics_service_spark.testing.fixtures import make_tables


@pytest.fixture(scope="module")
def planner(spark):
    return MetricsRequestPlanner(spark, make_tables(spark))


def _rows(df):
    return [tuple(r) for r in df.collect()]


def request(filter_type, values, *, start="01/01/2018", end="03/01/2018", group_by=None):
    return {
        "metricsPage": {"total": 0, "start": 0, "count": 0},
        "metrics": ["citations", "downloads", "views"],
        "filterBy": [
            {"filterType": filter_type, "values": values, "interpretAs": "list"},
            {"filterType": "month", "values": [start, end], "interpretAs": "range"},
        ],
        "groupBy": group_by or ["month"],
    }


def test_dataset_landing_page(planner):
    df = planner.plan(request("dataset", ["doi:10.5063/A1"]))
    # (bucket, downloads, views, unique_downloads, unique_views, citations)
    assert _rows(df) == [
        ("2017-12", 0, 0, 0, 0, 1),  # citation-only month, outer-merged
        ("2018-01", 2, 3, 2, 2, 0),  # robots excluded; dup eventId -> uniq 2
        ("2018-02", 2, 0, 2, 0, 1),  # family member A2 counted; B1 not
        ("2018-03", 0, 0, 0, 0, 0),  # spine zero-fill (end day inclusive)
    ]


def test_dataset_response_shape(planner):
    resp = planner.response(request("dataset", ["doi:10.5063/A1"]))
    assert resp["results"]["months"] == ["2017-12", "2018-01", "2018-02", "2018-03"]
    assert resp["results"]["downloads"] == [0, 2, 2, 0]
    assert resp["results"]["views"] == [0, 3, 0, 0]
    assert resp["results"]["citations"] == [1, 0, 1, 0]
    assert resp["resultDetails"] == {
        "totalDownloads": 4,
        "totalViews": 3,
        "totalCitations": 2,
    }


def test_dataset_by_sid(planner):
    # filtering by the series id resolves the same family
    df = planner.plan(request("dataset", ["urn:sid:A"]))
    assert _rows(df)[1] == ("2018-01", 2, 3, 2, 2, 0)


def test_repository_filter(planner):
    df = planner.plan(request("repository", ["urn:node:ARCTIC"]))
    by_bucket = {r[0]: tuple(r) for r in df.collect()}
    # only the two B1 events, one DATA one METADATA, both in Feb
    assert by_bucket["2018-02"][1:3] == (1, 1)
    assert by_bucket["2018-01"][1:3] == (0, 0)


def test_portal_filter(planner):
    df = planner.plan(request("portal", ["urn:sid:portalX"]))
    by_bucket = {r[0]: tuple(r) for r in df.collect()}
    assert by_bucket["2018-01"][1] == 1  # e02 only (e03/e04 are robots)
    assert by_bucket["2018-02"][1] == 1  # e12


def test_user_path_public_only(planner):
    # alice owns public family A
    df = planner.plan(request("user", ["uid=alice"]))
    assert {r[0]: r[1] for r in df.collect()}["2018-01"] == 2
    # bob's family is non-public -> nothing
    df_bob = planner.plan(request("user", ["uid=bob"]))
    assert all(r[1] == 0 and r[2] == 0 for r in df_bob.collect())


def test_day_aggregation(planner):
    df = planner.plan(
        request("dataset", ["doi:10.5063/A1"], start="01/02/2018", end="01/06/2018", group_by=["day"])
    )
    rows = _rows(df)
    # spine is the 5 request days; e01(DATA,2nd) e02(DATA,3rd); e05
    # (METADATA, 12:00 on the 6th) is excluded because the range end is
    # midnight of the end day (reference parses MM/dd/yyyy to 00:00 and
    # filters lte).  Citation-only buckets outside the range are
    # appended (J6 unseen-citation-month semantics).
    assert [r[0] for r in rows] == [
        "2017-12-01",
        "2018-01-02", "2018-01-03", "2018-01-04", "2018-01-05", "2018-01-06",
        "2018-02-15",
    ]
    assert [r[1] for r in rows] == [0, 1, 1, 0, 0, 0, 0]
    assert [r[2] for r in rows] == [0, 0, 0, 0, 0, 0, 0]
    assert [r[5] for r in rows] == [1, 0, 0, 0, 0, 0, 1]


def test_country_grouping(planner):
    df = planner.plan(request("dataset", ["doi:10.5063/A1"], group_by=["month", "country"]))
    rows = {(r["bucket"], r["country"]): r["downloads"] for r in df.collect()}
    assert rows[("2018-02", "DE")] == 1
    assert rows[("2018-02", "US")] == 1
