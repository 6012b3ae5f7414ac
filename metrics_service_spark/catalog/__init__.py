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


# The external correctness driver checks the FIRST 50 entries of
# all_queries() iteration order each round.  Rounds 1-4 jointly covered
# all 111 entries (union of CORRECTNESS_r0{1..4}.json); each round the
# least-recently-checked entries are rotated to the front so driver
# coverage stays fresh.  See README "Driver-sample contract".
_DRIVER_FRONT: tuple[str, ...] = (
    # round-5 additions (never driver-checked) lead
    "ev_interevent_gap",
    "doc_length_histogram",
    # round-5 rotation: every entry below was last driver-checked in
    # r1/r2 — re-front them so the post-fixture-regeneration (NTZ
    # timestamps) behavior gets a fresh driver row.  Timestamp-heavy
    # ev_* queries lead; the no-oracle HLL entry parks last.
    "ev_props_kv",
    "ev_tag_membership",
    "sushi_instances",
    "ev_filter_project",
    "ev_monthly_stats",
    "ev_sessionize",
    "ev_rolling_7d",
    "ev_value_median",
    "ev_asof_orders",
    "ev_retention",
    "ev_dau_stickiness",
    "ev_funnel",
    "ev_session_having",
    "ev_sessionize_global",
    "ev_sessionize_bucketed",
    "ev_last_per_user",
    "ev_top3_per_type",
    "orders_rollup",
    "ev_day_spine",
    "ev_pivot_daily",
    "counter_report",
    "ev_value_tiers",
    "ev_hash_sessions",
    "semi_join_purchasers",
    "anti_join_no_orders",
    "theta_contains",
    "order_chains",
    "full_outer_daily",
    "union_distinct_ids",
    "except_non_purchasers",
    "pid_family_closure",
    "order_components",
    "user_event_family",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q12",
    "tpch_q14",
    "tpch_q4",
    "tpch_q18",
    "tpch_q10",
    "tpch_q19",
    "doc_exact_dedup",
    "doc_bpe_tokens",
    "doc_token_stats",
    "doc_quality",
    "doc_lang_id",
    "doc_fingerprint",
    "doc_jaccard_pairs",
    "doc_minhash_dedup",
    "doc_simhash",
    "doc_simhash_neardup",
    "doc_quality_filter",
    "emb_topk_bruteforce",
    "emb_cosine_neardup",
    "emb_ann_ivf",
    "emb_ann_lsh",
    "emb_kmeans_step",
    "emb_centroids",
    "ev_monthly_stats_approx",
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
