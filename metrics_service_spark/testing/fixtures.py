"""Deterministic domain fixtures in the FIXTURES.md schemas.

Engineered (not random) so golden tests can assert exact values:
- identifier family A spans three pids incl. a '?ver=1' Dryad-style
  suffix member; family B is non-public (user-path exclusion test)
- events cover: robot-tagged exclusions (P4), null/-1 sessionId
  exclusions, non-read noise, a duplicated eventId (unique != total),
  portal tagging, two repositories, three months
- citations cover: lowercase substring match, case-differing match
  against the '?'-suffixed pid, a no-match target, a NULL publication
  date, and a month outside the event range (outer-merge path J6)
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from metrics_service_spark.plans.metrics_request import MetricsTables
from metrics_service_spark.schemas import (
    CITATION_SCHEMA,
    EVENT_SCHEMA,
    IDENTIFIER_SCHEMA,
)

KNB = "urn:node:KNB"
ARCTIC = "urn:node:ARCTIC"
PORTAL = "urn:sid:portalX"

A1, A2, AMAP = "doi:10.5063/A1", "doi:10.5063/A2?ver=1", "resourceMap_A"
B1 = "doi:10.5063/B1"


def _ev(
    eid,
    pid,
    day,
    *,
    fmt="DATA",
    event="read",
    node=KNB,
    sess=7,
    tags=None,
    country="US",
    portal=None,
    month=1,
):
    return (
        eid,
        None,
        node,
        pid,
        fmt,
        "eml://2.1.1",
        event,
        dt.datetime(2018, month, day, 12, 0, 0),
        dt.datetime(2018, month, day, 13, 0, 0),
        "10.0.0.1",
        "Mozilla/5.0",
        "cn=anon",
        1024,
        True,
        sess,
        tags,
        ("US" if country is None else country, "city", 1.0, 2.0),
        portal,
        False,
    )


def make_tables(spark: SparkSession) -> MetricsTables:
    events = [
        # Jan DATA on A1: 4 reads, 2 robot-tagged (excluded)
        _ev("e01", A1, 2),
        _ev("e02", A1, 3, portal=[PORTAL]),
        _ev("e03", A1, 4, tags=["robot_ua"]),
        _ev("e04", A1, 5, tags=["machine_ua", "robot_ip"]),
        # Jan METADATA on A1: 3 reads, two sharing an eventId (unique=2)
        _ev("e05", A1, 6, fmt="METADATA"),
        _ev("e06", A1, 7, fmt="METADATA"),
        _ev("e06", A1, 8, fmt="METADATA"),
        # excluded: unsessionized, quarantined, non-read, RESOURCE
        _ev("e07", A1, 9, sess=None),
        _ev("e08", A1, 10, sess=-1),
        _ev("e09", A1, 11, event="synchronization_failed"),
        _ev("e10", A1, 12, fmt="RESOURCE"),
        # Feb DATA: one on A2 (family member), one on A1, other country
        _ev("e11", A2, 14, month=2, country="DE"),
        _ev("e12", A1, 15, month=2, portal=[PORTAL]),
        # Feb DATA on B1 (different family, ARCTIC node)
        _ev("e13", B1, 16, month=2, node=ARCTIC),
        _ev("e14", B1, 17, month=2, node=ARCTIC, fmt="METADATA"),
    ]
    identifiers = [
        (A1, "urn:sid:A", ["doi:10.5063/A1"], True, "METADATA", ["uid=alice"], [A1, A2, AMAP]),
        (B1, None, ["doi:10.5063/B1"], False, "METADATA", ["uid=bob"], [B1]),
    ]
    citations = [
        # lowercase substring of A1
        ("10.5063/a1", "doi:10.1000/src1", None, "2018-02-15", None, "t1", None, None, 2018, "cites"),
        # case-diff match against the '?'-suffixed A2 (suffix stripped first)
        ("10.5063/A2", "doi:10.1000/src2", None, "2017-12-01", None, "t2", None, None, 2017, "cites"),
        # no match
        ("10.9999/NOPE", "doi:10.1000/src3", None, "2018-01-20", None, "t3", None, None, 2018, "cites"),
        # NULL publication date (counted nowhere)
        ("10.5063/a1", "doi:10.1000/src4", None, None, None, "t4", None, None, None, "cites"),
    ]
    return MetricsTables(
        events=spark.createDataFrame(events, EVENT_SCHEMA),
        identifiers=spark.createDataFrame(identifiers, IDENTIFIER_SCHEMA),
        citations=spark.createDataFrame(citations, CITATION_SCHEMA),
    )
