"""Citations subsystem (SURVEY.md M8): relation-type normalization,
identifier normalization, dedup-against-existing, and the per-month /
per-relation rollups the REST layer serves.

Reference: citations are harvested from Crossref/DataCite
(metricsdatabase.py:277-394), validated against the existing
(target_id, source_id) set one dict lookup at a time
(metricsdatabase.py:1264-1319), and relation types are canonicalized
with the VALID_DATACITE_CITATION_TYPE hashmap
(citationsmanager.py:36-54) — DataCite expresses relations from the
source's perspective; the map flips them to the target-dataset
perspective ("iscitedby" -> "cites", "isobsoletedby" -> "obsoletes",
"isidenticalto" -> "*" meaning any).

Spark-first: the per-row dict lookups become one broadcast map
expression; the uniqueness validation becomes a single anti-join.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metrics_service_spark.functions.scalars import (
    extract_doi,
    strip_version_suffix,
)

#: citationsmanager.py:36-54 VALID_DATACITE_CITATION_TYPE, verbatim.
RELATION_TYPE_MAP = {
    "iscitedby": "cites",
    "issupplementto": "issupplementedby",
    "iscontinuedby": "continues",
    "isdescribedby": "describes",
    "hasmetadata": "ismetadatafor",
    "hasversion": "isversionof",
    "isnewversionof": "isversionof",
    "ispartof": "haspart",
    "isreferencedby": "references",
    "isdocumentedby": "documents",
    "iscompiledby": "compiles",
    "isvariantformof": "isoriginalformof",
    "isidenticalto": "*",
    "isreviewedby": "reviews",
    "isderivedfrom": "issourceof",
    "requires": "isrequiredby",
    "isobsoletedby": "obsoletes",
}


def normalize_relation(relation: Column) -> Column:
    """Canonical target-perspective relation type; unknown types pass
    through lowercased (the reference accepts them as-is when not in
    the hashmap)."""
    mapping = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(RELATION_TYPE_MAP.items())]
    )
    low = F.lower(relation)
    return F.coalesce(mapping.getItem(low), low)


def normalize_citations(citations: DataFrame) -> DataFrame:
    """Identifier + relation normalization: lowercase ids, Dryad
    version-suffix strip, DOI extraction (empty when absent), canonical
    relation type — the normalize-first design that turns the
    reference's substring theta-join (J4) into an equi-joinable key."""
    return citations.withColumns(
        {
            "target_key": F.lower(strip_version_suffix(F.col("target_id"))),
            "source_key": F.lower(strip_version_suffix(F.col("source_id"))),
            "target_doi": extract_doi(
                F.lower(strip_version_suffix(F.col("target_id")))
            ),
            "relation_norm": normalize_relation(F.col("relation_type")),
        }
    )


def dedup_new_citations(new: DataFrame, existing: DataFrame) -> DataFrame:
    """validateUniqueCitation (metricsdatabase.py:1264-1319, J12): keep
    only (target_id, source_id) pairs not already stored — one anti-join
    instead of a driver-side dict of every stored row."""
    return new.join(
        existing.select("target_id", "source_id").distinct(),
        ["target_id", "source_id"],
        "left_anti",
    )


def citations_by_relation(citations: DataFrame) -> DataFrame:
    """Rollup: citations per canonical relation type per publication
    month (A11 shape with the M8 relation dimension)."""
    n = normalize_citations(citations)
    return (
        n.filter(F.col("link_publication_date").isNotNull())
        .groupBy(
            F.col("relation_norm").alias("relation_type"),
            F.substring("link_publication_date", 1, 7).alias("month"),
        )
        .agg(F.count(F.lit(1)).alias("citations"))
    )
