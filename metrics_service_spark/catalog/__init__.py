"""Query catalog: every implemented operator exposed as a named query.

Each entry pairs a Spark implementation (spark, sf_dir) -> DataFrame
with an equivalent DuckDB oracle SQL (None for genuinely
non-SQL-expressible ops, which get a weaker rows-only check by the
driver).  Column names/aliases are kept identical on both sides — the
driver's comparator sorts columns by name before hashing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    #: For rows-only entries (oracle=None): the catalog name of the
    #: oracle-checked exact twin that hard-verifies the same pipeline
    #: (e.g. the md5/int-quantized variant).  Every rows-only entry
    #: must name one — enforced by tests/test_catalog_schemas.py.
    exact_twin: str | None = None


# The external correctness driver checks the FIRST 50 entries of
# all_queries() iteration order each round.  Rounds 1-6 jointly covered
# all catalog entries (union of CORRECTNESS_r0{1..6}.json).  Rotation
# policy (per README): order by IMPLEMENTATION-CHANGED-SINCE-LAST-CHECK
# first — a query whose code was rewritten after its last driver row
# outranks one whose check is merely old — then by
# least-recently-checked.  See README "Driver-sample contract".
_DRIVER_FRONT: tuple[str, ...] = (
    # -- r13 impl-changed/new first (rotation policy): the five NEW
    #    entries (hot-block-safe sorted neighborhood, multi-pass
    #    linkage union, linkage recall calibration, linkage keep-list
    #    clusters, bucketed metrics star), the rewritten
    #    sorted-neighborhood operator's window
    #    form, and the two entries whose seams changed this round
    #    (ensure_bucketed* fingerprint/content-sample, CMS width
    #    divisor guard) --------------------------------------------
    "doc_sorted_neighborhood_global",
    "doc_linkage_multipass",
    "doc_linkage_recall",
    "doc_linkage_clusters",
    "metrics_star_bucketed",
    "doc_sorted_neighborhood",
    "gold_star_bucketed",
    "doc_cms_ngram_error",
    # -- the whole r9-stale generation (30 entries, VERDICT r12 #2) --
    "doc_quality_filter_exact",
    "doc_repetition",
    "doc_shuffle_shard",
    "doc_tfidf_topk",
    "doc_unigram_freq",
    "emb_centroids",
    "emb_contamination",
    "emb_cosine_neardup",
    "emb_ivfpq_topk_int",
    "emb_kmeans_step",
    "emb_kmeans_train",
    "emb_proto_prune",
    "emb_prototypicality",
    "emb_semdedup",
    "emb_semdedup_incr",
    "emb_semdedup_int",
    "ev_dau_stickiness",
    "ev_dau_stickiness_kmv",
    "mm_image_features_exact",
    "tpch_q1",
    "tpch_q12",
    "tpch_q14",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q8",
    # -- fill to the 50 line with the oldest (r10) generation: the
    #    three r12 bench movers under attribution this round, the
    #    gold/matview family (catalog/gold.py gained entries in r13),
    #    and the corpus datasheet --------------------------------
    "doc_span_scrub",
    "mm_phash_neardup",
    "emb_knn_hubness",
    "matview_landingpage",
    "matview_routed_repo",
    "matview_awardcharts",
    "matview_awardmetrics",
    "matview_repocharts",
    "matview_repometrics",
    "matview_userprofilecharts",
    "matview_userprofilemetrics",
    "landing_page_daily",
    # -- buffer past the 50-entry sample line (rest of r10; all
    #    differentially pytest-checked every session) ----------------
    "doc_corpus_datasheet",
    "doc_domain_filter",
    "doc_fingerprint",
    "doc_length_histogram",
    "doc_mixture",
    "doc_pii_scrub",
    "doc_simhash",
    "doc_simhash_md5",
    "doc_simhash_neardup",
    "doc_simhash_neardup_md5",
    "emb_ann_ivf",
    "emb_ann_lsh",
    "emb_cluster_sample",
    "emb_curation_pipeline",
    "emb_hard_negatives",
    "emb_knn_graph",
    "emb_pq_rerank",
    "emb_semdedup_hier",
    "emb_topk_bruteforce",
    "ev_dau_stickiness_approx_hll",
    "ev_monthly_stats_approx",
    "mm_audio_meta",
    "mm_frame_sample",
    "mm_image_features",
    "mm_image_meta",
    "mm_image_meta_real",
    "mm_phash",
    "tpch_q11",
    "tpch_q13",
    "tpch_q15",
    "tpch_q16",
    "tpch_q2",
    "tpch_q20",
    "tpch_q7",
    "tpch_q9",
)


def all_queries() -> dict[str, QuerySpec]:
    from metrics_service_spark.catalog import (
        core,
        functions_suite,
        gold,
        joins,
        landing,
        llm,
        multimodal,
        search,
        tpch,
    )

    merged: dict[str, QuerySpec] = {}
    for mod in (
        core,
        joins,
        tpch,
        llm,
        landing,
        multimodal,
        gold,
        functions_suite,
        search,
    ):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)

    missing = [name for name in _DRIVER_FRONT if name not in merged]
    if missing:
        raise ValueError(f"_DRIVER_FRONT names not in catalog: {missing}")
    ordered = {name: merged.pop(name) for name in _DRIVER_FRONT}
    ordered.update(merged)
    return ordered
