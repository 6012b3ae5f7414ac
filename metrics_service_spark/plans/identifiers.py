"""Identifiers dimension builder: sysmeta records -> the `identifiers`
gold table that every MetricsRequest family expansion joins against.

Reference (es_sysmeta_sync.py): one record per PID with
`datasetIdentifierFamily` resolved by walking Solr
documents/resourceMap/obsoletes/seriesId edges per PID with async
request fan-out (:159-286), DOIs normalized per member node
(parseDOI, :403-429), records bulk-posted to the `identifiers-2` ES
index (record spec :7-47).

Spark-first: the per-PID graph walk becomes ONE bounded BFS closure
over an edge DataFrame (operators/closure.expand_family) for ALL pids
at once — the reference's 30k-pid batches and 20-deep walk caps
(pid_resolution.py:22-23,207) exist only to protect Solr; here depth
is the only cap.

Scale: edges ≈ a few per object -> 10^8-10^9 edge rows at 100 TB; the
closure is iterations of shuffle joins on the frontier, and family
arrays are collect_set per seed (bounded by real family sizes, tens of
ids).  For full-corpus family discovery without seeds, switch to
connectedComponents as noted in closure.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metrics_service_spark.functions.scalars import parse_doi_node
from metrics_service_spark.operators.closure import expand_family


def sysmeta_edges(sysmeta: DataFrame) -> DataFrame:
    """Undirected edge set from sysmeta association columns:
    pid <-> seriesId, pid <-> each documents member, pid <-> each
    aggregating resource map, pid <-> obsoletes target — the four
    association kinds the reference walks (es_sysmeta_sync.py:159-286,
    pid_resolution.py:285-416)."""
    pid = F.col("pid")
    singles = [
        sysmeta.select(pid.alias("src"), F.col(c).alias("dst")).filter(
            F.col(c).isNotNull()
        )
        for c in ("seriesId", "obsoletes")
        if c in sysmeta.columns
    ]
    multis = [
        sysmeta.select(pid.alias("src"), F.explode(c).alias("dst"))
        for c in ("documents", "resourceMap")
        if c in sysmeta.columns
    ]
    edges = singles[0] if singles else multis[0]
    for e in (singles + multis)[1:]:
        edges = edges.unionByName(e)
    # undirected: membership works both ways in the reference's loop
    return edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def build_identifiers(sysmeta: DataFrame, *, max_iters: int = 20) -> DataFrame:
    """One gold row per sysmeta PID (record spec es_sysmeta_sync.py:7-47):
    (PID, SID, isPublic, formatType, userID, datasetIdentifierFamily,
    datasetDOIFamily)."""
    edges = sysmeta_edges(sysmeta)
    seeds = sysmeta.select(F.col("pid")).distinct()
    # sysmeta_edges emits symmetric edges -> two-layer dedup applies
    fam = expand_family(seeds, edges, seed_col="pid", max_iters=max_iters, undirected=True)
    families = fam.groupBy(F.col("seed").alias("__pid")).agg(
        F.array_sort(F.collect_set("member")).alias("datasetIdentifierFamily")
    )
    out = sysmeta.join(families, sysmeta.pid == families.__pid, "left").drop("__pid")
    doi_family = F.array_sort(
        F.filter(
            F.transform(
                F.col("datasetIdentifierFamily"),
                lambda m: parse_doi_node(m, F.col("authoritativeMN")),
            ),
            lambda d: d.isNotNull(),
        )
    )
    return out.select(
        F.col("pid").alias("PID"),
        F.col("seriesId").alias("SID"),
        F.col("isPublic"),
        F.col("formatType"),
        F.col("userID"),
        F.coalesce(
            F.col("datasetIdentifierFamily"),
            F.array(F.col("pid")),
        ).alias("datasetIdentifierFamily"),
        doi_family.alias("datasetDOIFamily"),
    )
