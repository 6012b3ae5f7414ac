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
    # -- r12 impl-changed/new first (rotation policy): the CAST-fixed
    #    dup-spans v1 (VERDICT r11 #1 — the last red in the catalog),
    #    the two NEW entries (bucketed co-located star join,
    #    UniMax epoch-capped mixing), and the three entries whose CC
    #    call gained require_converged this round ------------------
    "doc_dup_spans",
    "gold_star_bucketed",
    "doc_epoch_cap_mix",
    "doc_cms_ngram_error",
    "doc_chunk_overlap",
    "doc_classifier_eval",
    "doc_fuzzy_prefix_pairs",
    "doc_winnow_pairs",
    "doc_canonical_dedup",
    "doc_sorted_neighborhood",
    "doc_dedup_tiers",
    "doc_dedup_clusters",
    "mm_dedup_clusters",
    # -- the whole r8-stale generation (28 entries, VERDICT r11 #4) --
    "emb_pq_topk_int",
    "emb_sq8_topk_int",
    "ev_asof_orders",
    "ev_day_spine",
    "ev_filter_project",
    "ev_funnel",
    "ev_hash_sessions",
    "ev_interevent_gap",
    "ev_last_per_user",
    "ev_monthly_stats",
    "ev_pivot_daily",
    "ev_rolling_7d",
    "ev_session_having",
    "ev_sessionize",
    "ev_sessionize_bucketed",
    "ev_sessionize_global",
    "ev_tag_membership",
    "ev_top3_per_type",
    "ev_value_tiers",
    "except_non_purchasers",
    "full_outer_daily",
    "pid_family_closure",
    "semi_join_purchasers",
    "sushi_instances",
    "theta_contains",
    "tpch_q10",
    "union_distinct_ids",
    "user_event_family",
    # -- fill to the 50 line with the oldest (r9) generation ---------
    "doc_bigram_coherence",
    "doc_ccnet_bucket",
    "doc_curation_pipeline",
    "doc_dsir_vote",
    "doc_gopher_rules",
    "doc_hash_classifier",
    "doc_paragraph_dedup",
    "doc_quality",
    "doc_quality_filter",
    # -- buffer past the 50-entry sample line (rest of r9; all
    #    differentially pytest-checked every session) ----------------
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
