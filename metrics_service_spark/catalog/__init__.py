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
    # -- r11 column bisect of the three-round driver-red entry
    #    (VERDICT r10 #1): counts arm (all-BIGINT-cast oracle), frac
    #    arm (plain-BIGINT rounding, no DECIMAL38/HUGEINT), then the
    #    unchanged v1 as the in-window control.  The r10 v2
    #    caching-discriminator twin concluded (both red) and was
    #    retired from the catalog.
    "doc_dup_spans_counts",
    "doc_dup_spans_frac",
    "doc_dup_spans",
    # -- NEW r11 surface: ANN recall self-eval, temperature mixing,
    #    duplicate-run statistics ----------------------------------------
    "emb_ann_recall",
    "emb_ann_recall_lsh",
    "emb_ann_recall_pq",
    "emb_ann_recall_sq8",
    "emb_ann_recall_ivfpq",
    "doc_temperature_mix",
    "doc_dup_span_runs",
    "doc_minhash_estimate",
    "doc_dedup_tiers",
    # -- the whole r7-stale generation (latest driver row 4 rounds
    #    old; VERDICT r10 #3 drain) -------------------------------------
    "func_scalar_suite",
    "ev_props_kv",
    "ev_retention",
    "metrics_star",
    "order_chains",
    "order_components",
    "package_counts",
    "search_log_pipeline",
    "search_sessions",
    "tpch_q21",
    "tpch_q22",
    "mm_image_meta_real_mixed",
    "doc_minhash_dedup",
    "doc_minhash_dedup_md5",
    "doc_jaccard_pairs",
    "doc_contamination",
    "doc_incremental_dedup",
    "doc_multi_signal_pairs",
    "doc_ngram_topk",
    "doc_pack",
    "doc_sample_stratified",
    "doc_split",
    "emb_ann_ivf_int",
    "emb_ann_lsh_int",
    "emb_cosine_neardup_allpairs",
    "emb_random_projection",
    # -- fill to the 50 line from the next-oldest (r8) generation;
    #    doc_token_stats leads as a round_frac user (stable.py's
    #    guards were touched this round — output-neutral, but
    #    impl-changed outranks merely-stale per the rotation policy) --
    "doc_token_stats",
    "ev_value_median",
    "orders_rollup",
    "anti_join_no_orders",
    "bloom_semi_lineitem",
    "counter_report",
    "doc_bpe_tokens",
    "doc_dedup_clusters",
    "doc_exact_dedup",
    "doc_lang_id",
    "doc_source_quota",
    "doc_split_leakage_safe",
    # -- buffer past the 50-entry sample line (rest of the r8 block,
    #    then r9; all differentially pytest-checked every session) ------
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
