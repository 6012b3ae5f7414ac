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


# --- golden: the documented catalog-page request/response pair -------------
# /root/reference notes.rst documents one verbatim request from the search
# UI browse page (25 catalog PIDs + month range, groupBy month) and its
# response.  The fixture below realizes exactly the documented per-dataset
# unique counts; the response must reproduce the documented structure and
# the documented pid -> count mapping (the reference's array order came
# from a pre-3.7 dict; ours is request order, so compare as mappings).

NOTES_RST_REQUEST_VALUES = [
    "p1161.ds2423_20181010_0300", "p1151.ds2412_20181010_0300",
    "urn:uuid:2e9143a6-2623-46be-9cc5-788c238f27ea", "PPBioMA.50.4",
    "https://pasta.lternet.edu/package/metadata/eml/knb-lter-nwt/93/1",
    "https://pasta.lternet.edu/package/metadata/eml/knb-lter-nwt/45/1",
    "doi:10.6067:XCV8446794_meta$v=1538938553701",
    "doi:10.6067:XCV8446793_meta$v=1538934411225",
    "p10.ds237_20181007_0300", "p17.ds2553_20181006_0302",
    "p1284.ds2551_20181006_0302", "p1284.ds2550_20181006_0302",
    "p17.ds2547_20181006_0302", "p17.ds2546_20181006_0301",
    "p17.ds2545_20181006_0301", "p1229.ds2543_20181006_0301",
    "p1279.ds2539_20181006_0301", "p1279.ds2538_20181006_0301",
    "p1278.ds2537_20181006_0301", "p1278.ds2536_20181006_0301",
    "p1278.ds2535_20181006_0301", "p1278.ds2534_20181006_0301",
    "p1278.ds2533_20181006_0301", "p1278.ds2532_20181006_0301",
    "p43.ds2520_20181006_0301",
]

NOTES_RST_DATASETS = [
    "p1278.ds2534_20181006_0301", "p17.ds2546_20181006_0301",
    "p1278.ds2537_20181006_0301", "p10.ds237_20181007_0300",
    "urn:uuid:2e9143a6-2623-46be-9cc5-788c238f27ea",
    "doi:10.6067:XCV8446794_meta$v=1538938553701",
    "p1279.ds2538_20181006_0301",
    "https://pasta.lternet.edu/package/metadata/eml/knb-lter-nwt/93/1",
    "p1278.ds2535_20181006_0301", "p17.ds2545_20181006_0301",
    "p1151.ds2412_20181010_0300", "p1278.ds2533_20181006_0301",
    "p17.ds2553_20181006_0302", "p1284.ds2551_20181006_0302",
    "p43.ds2520_20181006_0301", "p1284.ds2550_20181006_0302",
    "p1279.ds2539_20181006_0301", "p1229.ds2543_20181006_0301",
    "https://pasta.lternet.edu/package/metadata/eml/knb-lter-nwt/45/1",
    "doi:10.6067:XCV8446793_meta$v=1538934411225", "PPBioMA.50.4",
    "p1161.ds2423_20181010_0300", "p1278.ds2536_20181006_0301",
    "p1278.ds2532_20181006_0301", "p17.ds2547_20181006_0302",
]
NOTES_RST_VIEWS = [3, 3, 3, 5, 13, 0, 3, 3, 3, 3, 2, 3, 5, 3, 3, 3, 3, 3, 3, 0, 3, 4, 3, 3, 3]
NOTES_RST_DOWNLOADS = [0, 0, 0, 0, 15, 0, 0, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 4, 0, 0, 0, 0, 0, 0]

NOTES_RST_REQUEST = {
    "metricsPage": {"total": 0, "start": 0, "count": 0},
    "metrics": ["citations", "downloads", "views"],
    "filterBy": [
        {
            "filterType": "catalog",
            "values": NOTES_RST_REQUEST_VALUES,
            "interpretAs": "list",
        },
        {
            "filterType": "month",
            "values": ["01/01/2000", "10/16/2018"],
            "interpretAs": "range",
        },
    ],
    "groupBy": ["month"],
}


@pytest.fixture(scope="module")
def notes_rst_planner(spark):
    from metrics_service_spark.schemas import (
        CITATION_SCHEMA,
        EVENT_SCHEMA,
        IDENTIFIER_SCHEMA,
    )
    from metrics_service_spark.plans.metrics_request import MetricsTables
    from metrics_service_spark.testing.fixtures import _ev

    doc_views = dict(zip(NOTES_RST_DATASETS, NOTES_RST_VIEWS))
    doc_downloads = dict(zip(NOTES_RST_DATASETS, NOTES_RST_DOWNLOADS))
    events, identifiers = [], []
    for i, pid in enumerate(NOTES_RST_REQUEST_VALUES):
        identifiers.append((pid, None, [pid], True, "METADATA", ["uid=u"], [pid]))
        for j in range(doc_views[pid]):
            events.append(_ev(f"v{i}_{j}", pid, (j % 27) + 1, fmt="METADATA"))
        for j in range(doc_downloads[pid]):
            events.append(_ev(f"d{i}_{j}", pid, (j % 27) + 1, fmt="DATA"))
    tables = MetricsTables(
        events=spark.createDataFrame(events, EVENT_SCHEMA),
        identifiers=spark.createDataFrame(identifiers, IDENTIFIER_SCHEMA),
        citations=spark.createDataFrame([], CITATION_SCHEMA),
    )
    return MetricsRequestPlanner(spark, tables)


def test_notes_rst_catalog_golden_pair(notes_rst_planner):
    resp = notes_rst_planner.response(NOTES_RST_REQUEST)
    # top-level and results structure exactly as documented
    assert set(resp) == {"results", "metricsRequest", "resultDetails"}
    assert resp["metricsRequest"] == NOTES_RST_REQUEST
    assert resp["resultDetails"] == {}
    results = resp["results"]
    assert set(results) == {
        "views", "country", "citations", "datasets", "downloads", "months",
    }
    assert results["country"] == [] and results["months"] == []
    # parallel arrays: one entry per requested dataset, request order
    assert results["datasets"] == NOTES_RST_REQUEST_VALUES
    for key in ("views", "downloads", "citations"):
        assert len(results[key]) == len(NOTES_RST_REQUEST_VALUES)
    # per-dataset values match the documented pairing
    got_views = dict(zip(results["datasets"], results["views"]))
    got_downloads = dict(zip(results["datasets"], results["downloads"]))
    assert got_views == dict(zip(NOTES_RST_DATASETS, NOTES_RST_VIEWS))
    assert got_downloads == dict(zip(NOTES_RST_DATASETS, NOTES_RST_DOWNLOADS))
    assert results["citations"] == [0] * 25


def test_oracle_mx_guard_fires_loudly():
    # ADVICE r14: if the synthetic pid suffix domain ever exceeds the
    # over-generated series bound, the oracle must ERROR, not silently
    # under-cover.  Force the measured bound past the guard and prove
    # the DuckDB error() actually fires (and short-circuits when not).
    import re

    import duckdb
    import pytest

    from metrics_service_spark.catalog.request import ORACLE_USER_REQUEST

    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_id INT, ts TIMESTAMP, user_id INT, event_type VARCHAR, value INT, props VARCHAR)")
    con.execute("INSERT INTO events VALUES (1, TIMESTAMP '2024-01-05 00:00:00', 3, 'view', 5, '{\"k\": \"7\"}')")
    # sanity: with mx <= 9999 the query runs (guard short-circuits)
    con.execute(ORACLE_USER_REQUEST).fetchall()
    breached = re.sub(
        r"bound AS \(\n.*?\n\)", "bound AS (SELECT 10000 AS mx)",
        ORACLE_USER_REQUEST, count=1, flags=re.S,
    )
    assert "SELECT 10000 AS mx" in breached
    with pytest.raises(Exception, match="series guard"):
        con.execute(breached).fetchall()
