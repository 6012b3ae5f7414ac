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
    # -- r14 impl-changed/new first (rotation policy): the NEW
    #    end-to-end MetricsRequest dispatcher entries (VERDICT r13
    #    #7), the bucketed-linkage entry, then every entry consuming
    #    the refactored fuzzy_prefix_pairs seam (now routed through
    #    fuzzy_prefix_pairs_blocked) and the star-CC convergence
    #    guard ---------------------------------------------------
    "metrics_request_landing",
    "metrics_request_daily_country",
    "metrics_request_user",
    "metrics_request_repository",
    "doc_bpe_train",
    "doc_bpe_apply",
    "doc_lm_fclass",
    "emb_knn_pagerank",
    "doc_classifier_auc",
    "doc_priority_sample",
    "doc_fuzzy_prefix_bucketed",
    "doc_cluster_best",
    "doc_source_overlap",
    "doc_length_quantiles",
    "mm_scene_cuts",
    "ev_session_quantiles",
    "doc_linkage_incremental",
    "doc_fuzzy_prefix_pairs",
    "doc_linkage_clusters",
    "doc_linkage_multipass",
    "doc_linkage_recall",
    # -- the whole r10-stale generation (35 catalog entries,
    #    VERDICT r13 "What's missing" #2; the 36th, doc_dup_spans_v2,
    #    was superseded by the r11 bisect arms) -------------------
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
    # -- slots 51+: past the driver's 50-entry line.  tpch_q15/q16/q2/
    #    q20/q7/q9 are the six r10-stale entries the 17 never-checked
    #    r14 entries displaced (FULLCHECK covers them bitwise; they
    #    lead the r15 rotation), then the rows-only perplexity form
    #    whose exact twin doc_lm_fclass IS in-window, then the
    #    r11-generation fill ---------------------------------------
    "tpch_q15",
    "tpch_q16",
    "tpch_q2",
    "tpch_q20",
    "tpch_q7",
    "tpch_q9",
    "doc_lm_perplexity",
    "order_chains",
    "order_components",
    "metrics_star",
    "func_scalar_suite",
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
        request,
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
        request,
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
