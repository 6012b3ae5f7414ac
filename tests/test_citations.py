"""Citations subsystem tests (plans/citations.py): relation-type
canonicalization, identifier normalization, dedup anti-join, rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metrics_service_spark.plans.citations import (
    RELATION_TYPE_MAP,
    citations_by_relation,
    dedup_new_citations,
    normalize_citations,
    normalize_relation,
)


def test_relation_map_matches_reference_size():
    # 17 entries in citationsmanager.py:36-54
    assert len(RELATION_TYPE_MAP) == 17
    assert RELATION_TYPE_MAP["isidenticalto"] == "*"


def test_normalize_relation(spark):
    df = spark.createDataFrame(
        [("IsCitedBy",), ("isobsoletedby",), ("Cites",), ("weirdtype",)],
        "r string",
    )
    got = [r.n for r in df.select(normalize_relation(F.col("r")).alias("n")).collect()]
    assert got == ["cites", "obsoletes", "cites", "weirdtype"]


@pytest.fixture()
def cites(spark):
    rows = [
        ("doi:10.5063/A1?ver=2", "doi:10.1000/SRC1", "IsCitedBy", "2018-02-10"),
        ("doi:10.5063/B9", "doi:10.1000/src2", "isreferencedby", "2018-02-20"),
        ("urn:uuid:nope", "doi:10.1000/src3", "IsCitedBy", None),
    ]
    return spark.createDataFrame(
        rows,
        "target_id string, source_id string, relation_type string, "
        "link_publication_date string",
    )


def test_normalize_citations(cites):
    rows = {r.target_id: r for r in normalize_citations(cites).collect()}
    a = rows["doi:10.5063/A1?ver=2"]
    assert a.target_key == "doi:10.5063/a1"  # lowered + version stripped
    assert a.target_doi == "10.5063/a1"
    assert a.relation_norm == "cites"
    assert rows["urn:uuid:nope"].target_doi == ""  # no DOI present
    assert rows["doi:10.5063/B9"].relation_norm == "references"


def test_dedup_new_citations(spark, cites):
    existing = spark.createDataFrame(
        [("doi:10.5063/A1?ver=2", "doi:10.1000/SRC1")],
        "target_id string, source_id string",
    )
    kept = dedup_new_citations(cites, existing)
    assert kept.count() == 2
    assert "doi:10.5063/A1?ver=2" not in {r.target_id for r in kept.collect()}


def test_citations_by_relation(cites):
    got = {
        (r.relation_type, r.month): r.citations
        for r in citations_by_relation(cites).collect()
    }
    # null publication date row dropped
    assert got == {("cites", "2018-02"): 1, ("references", "2018-02"): 1}
