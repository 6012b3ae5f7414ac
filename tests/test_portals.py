"""Portal tag-sync tests (plans/portals.py): change-detection gate,
add/expunge deltas, array application, citation mirroring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metrics_service_spark.plans.portals import (
    apply_tag_deltas,
    changed_portals,
    portal_citation_updates,
    portal_tag_deltas,
)


@pytest.fixture()
def families(spark):
    return spark.createDataFrame(
        [("sidA", ["p1", "p2"]), ("sidB", ["p3"])],
        "series_id string, members array<string>",
    )


@pytest.fixture()
def events(spark):
    rows = [
        ("e1", "p1", ["sidA"]),          # correctly tagged
        ("e2", "p2", []),                # member, missing tag -> add
        ("e3", "p3", ["sidA", "sidB"]),  # sidA stale -> remove
        ("e4", "p9", ["sidA"]),          # left the family -> remove
        ("e5", "p9", None),              # null tag array
    ]
    return spark.createDataFrame(
        rows, "eventId string, pid string, portalIdentifier array<string>"
    )


def test_changed_portals_gate(spark, families):
    state = spark.createDataFrame(
        [("sidA", "stale-hash")], "series_id string, hash string"
    )
    out = changed_portals(families, state)
    assert {r.series_id for r in out.collect()} == {"sidA", "sidB"}
    # storing the fresh hashes makes both unchanged next round
    fresh = out.select("series_id", "hash")
    assert changed_portals(families, fresh).count() == 0
    assert changed_portals(families, None).count() == 2


def test_portal_tag_deltas(events, families):
    got = {
        (r.pid, r.series_id, r.action)
        for r in portal_tag_deltas(events, families).collect()
    }
    assert got == {
        ("p2", "sidA", "add"),
        ("p3", "sidA", "remove"),
        ("p9", "sidA", "remove"),
    }


def test_apply_tag_deltas_roundtrip(events, families):
    deltas = portal_tag_deltas(events, families)
    applied = apply_tag_deltas(events, deltas)
    tags = {r.eventId: r.portalIdentifier for r in applied.collect()}
    assert tags["e1"] == ["sidA"]
    assert tags["e2"] == ["sidA"]
    assert tags["e3"] == ["sidB"]
    assert tags["e4"] == []
    assert tags["e5"] == []
    # applying deltas leaves the table at fixpoint
    assert portal_tag_deltas(applied, families).count() == 0


def test_portal_citation_updates(spark, families):
    cites = spark.createDataFrame(
        [("p1",), ("p3",), ("zzz",)], "target_id string"
    )
    got = {
        (r.target_id, r.series_id)
        for r in portal_citation_updates(cites, families).collect()
    }
    assert got == {("p1", "sidA"), ("p3", "sidB")}
