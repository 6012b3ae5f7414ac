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
    # NOTE no "2018-03" row: the reference spine iterates
    # range((end-start).days) — END-DAY EXCLUSIVE — so a range ending
    # 03/01 contributes no March bucket (metricsreader.py:1030).
    assert _rows(df) == [
        ("2017-12", 0, 0, 0, 0, 1),  # citation-only month, outer-merged
        ("2018-01", 2, 3, 2, 2, 0),  # robots excluded; dup eventId -> uniq 2
        ("2018-02", 2, 0, 2, 0, 1),  # family member A2 counted; B1 not
    ]


def test_dataset_response_shape(planner):
    resp = planner.response(request("dataset", ["doi:10.5063/A1"]))
    assert resp["results"]["months"] == ["2017-12", "2018-01", "2018-02"]
    assert resp["results"]["downloads"] == [0, 2, 2]
    assert resp["results"]["views"] == [0, 3, 0]
    assert resp["results"]["citations"] == [1, 0, 1]
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
    # spine is the request days [start, end) — the 6th is excluded by
    # the end-exclusive spine AND its event e05 (METADATA, 12:00 on the
    # 6th) is excluded by the lte-midnight end bound (reference parses
    # MM/dd/yyyy to 00:00).  Citation-only buckets outside the range
    # are appended (J6 unseen-citation-month semantics).
    assert [r[0] for r in rows] == [
        "2017-12-01",
        "2018-01-02", "2018-01-03", "2018-01-04", "2018-01-05",
        "2018-02-15",
    ]
    assert [r[1] for r in rows] == [0, 1, 1, 0, 0, 0]
    assert [r[2] for r in rows] == [0, 0, 0, 0, 0, 0]
    assert [r[5] for r in rows] == [1, 0, 0, 0, 0, 1]


def test_start_bound_is_strict(spark, planner):
    """The reference filters dateLogged with strict gt on the start
    instant (metricselasticsearch.py:261): an event logged exactly at
    start-day midnight is NOT counted."""
    from metrics_service_spark.testing.fixtures import make_tables
    import datetime as dt

    tables = make_tables(spark)
    midnight = tables.events.limit(1).collect()[0].asDict()
    midnight.update(
        eventId="e_mid",
        dateLogged=dt.datetime(2018, 1, 2, 0, 0, 0),
        formatType="DATA",
    )
    ev2 = tables.events.union(
        spark.createDataFrame([tuple(midnight.values())], tables.events.schema)
    )
    p = MetricsRequestPlanner(
        spark, type(tables)(ev2, tables.identifiers, tables.citations)
    )
    df = p.plan(
        request("dataset", ["doi:10.5063/A1"], start="01/02/2018", end="01/06/2018", group_by=["day"])
    )
    by_day = {r[0]: r[1] for r in df.collect()}
    assert by_day["2018-01-02"] == 1  # e01 at 12:00 only; e_mid excluded


def test_full_text_scope_yields_empty(planner):
    """interpretAs values other than 'list' on a scope filter fall
    through every reference dispatcher branch (metricsreader.py:126-156)
    and return empty results; mirrored as a scope matching nothing."""
    req = request("dataset", ["doi:10.5063/A1"])
    req["filterBy"][0]["interpretAs"] = "full_text"
    df = planner.plan(req)
    assert all(
        r["downloads"] == 0 and r["views"] == 0 for r in df.collect()
    )


def test_month_filter_with_list_interpret_is_ignored(planner):
    """A date filter not flagged interpretAs=range is ignored by the
    reference (metricsreader.py:282): no range filter, no spine."""
    req = request("dataset", ["doi:10.5063/A1"])
    req["filterBy"][1]["interpretAs"] = "list"
    df = planner.plan(req)
    months = [r["bucket"] for r in df.collect()]
    assert months == ["2017-12", "2018-01", "2018-02"]  # data-driven, no spine


def test_country_grouping(planner):
    df = planner.plan(request("dataset", ["doi:10.5063/A1"], group_by=["month", "country"]))
    rows = {(r["bucket"], r["country"]): r["downloads"] for r in df.collect()}
    assert rows[("2018-02", "DE")] == 1
    assert rows[("2018-02", "US")] == 1
