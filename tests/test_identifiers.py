"""Identifiers-dimension builder tests (plans/identifiers.py): family
closure over sysmeta edges, DOI family normalization, singleton
fallback."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metrics_service_spark.plans.identifiers import build_identifiers

KNB = "urn:node:KNB"


@pytest.fixture(scope="module")
def sysmeta(spark):
    rows = [
        # A-family: metadata doc A1 documents data D1; both aggregated by
        # resource map RM_A; A1 has series id S_A; A2 obsoletes... A2 is
        # a newer version linked via obsoletes
        ("doi:10.5063/A1", "urn:sid:S_A", None, ["doi:10.5063/D1"], ["RM_A"],
         True, "METADATA", ["uid=alice"], KNB),
        ("doi:10.5063/D1", None, None, [], ["RM_A"],
         True, "DATA", ["uid=alice"], KNB),
        ("doi:10.5063/A2", None, "doi:10.5063/A1", [], [],
         True, "METADATA", ["uid=alice"], KNB),
        # B: isolated non-public object with a non-DOI pid
        ("urn:uuid:B1", None, None, [], [],
         False, "METADATA", ["uid=bob"], KNB),
    ]
    return spark.createDataFrame(
        rows,
        "pid string, seriesId string, obsoletes string, "
        "documents array<string>, resourceMap array<string>, "
        "isPublic boolean, formatType string, userID array<string>, "
        "authoritativeMN string",
    )


def test_family_closure(sysmeta):
    out = {r.PID: r for r in build_identifiers(sysmeta).collect()}
    a_family = set(out["doi:10.5063/A1"].datasetIdentifierFamily)
    # closure reaches the data object, the map, the series id, and the
    # obsoleting version (undirected edges)
    assert a_family == {
        "doi:10.5063/A1",
        "doi:10.5063/A2",
        "doi:10.5063/D1",
        "RM_A",
        "urn:sid:S_A",
    }
    # every member of the A cluster resolves the same family
    assert set(out["doi:10.5063/D1"].datasetIdentifierFamily) == a_family
    assert set(out["doi:10.5063/A2"].datasetIdentifierFamily) == a_family


def test_doi_family_filters_non_dois(sysmeta):
    out = {r.PID: r for r in build_identifiers(sysmeta).collect()}
    assert out["doi:10.5063/A1"].datasetDOIFamily == [
        "doi:10.5063/A1",
        "doi:10.5063/A2",
        "doi:10.5063/D1",
    ]  # RM_A and urn:sid:S_A are not DOIs


def test_isolated_pid_singleton_family(sysmeta):
    out = {r.PID: r for r in build_identifiers(sysmeta).collect()}
    b = out["urn:uuid:B1"]
    assert b.datasetIdentifierFamily == ["urn:uuid:B1"]
    assert b.datasetDOIFamily == []
    assert b.isPublic is False and b.SID is None
