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
    # -- implementation changed this round (r7) --------------------------
    "doc_split_leakage_safe",    # NEW: cluster-keyed leakage-safe split
    "emb_contamination",         # NEW: semantic decontamination scan
    "mm_image_meta_real_mixed",  # NEW: PNG+JPEG+GIF real roundtrip
    "emb_semdedup_int",          # literal-matrix argmax rewrite
    "emb_semdedup_incr",         # fused index+batch assignment
    "emb_semdedup",              # normalized pair filter + lazy ckpt
    "emb_kmeans_train",          # shared lloyd_centroids + large-k path
    "bloom_semi_lineitem",       # KM h2 fix + dim-sized m
    "pid_family_closure",        # closure lazy-checkpoint fusion
    "order_chains",              # closure lazy-checkpoint fusion
    "order_components",          # self-loop single-ref propagation
    "doc_dedup_clusters",        # connected_components changed; last row r4
    "package_counts",            # resolve_chains changed; last row r4
    # -- implementation also changed in r7 (dedup/gate/core/similarity
    #    lazy checkpoints, jaccard conjunct rewrite, signature ckpt) ------
    "emb_cosine_neardup",
    "doc_jaccard_pairs",
    "doc_multi_signal_pairs",
    "doc_minhash_dedup",
    "doc_minhash_dedup_md5",
    "doc_incremental_dedup",
    "doc_paragraph_dedup",
    "doc_quality_filter",
    "ev_dau_stickiness",
    "ev_retention",
    # -- VERDICT r6 #7 named twins (last row r4) -------------------------
    "emb_ann_lsh_int",
    "emb_ann_ivf_int",
    # -- least-recently-checked (last row r4) ----------------------------
    "tpch_q21",
    "tpch_q22",
    "doc_split",
    "doc_pack",
    "doc_contamination",
    "doc_sample_stratified",
    "doc_unigram_freq",
    "doc_ngram_topk",
    "emb_random_projection",
    "doc_quality_filter_exact",
    "emb_cosine_neardup_allpairs",
    "landing_page_daily",
    "metrics_star",
    "matview_routed_repo",
    "matview_landingpage",
    "matview_userprofilemetrics",
    "matview_userprofilecharts",
    "matview_repometrics",
    "matview_repocharts",
    "matview_awardmetrics",
    "matview_awardcharts",
    "func_scalar_suite",
    "search_log_pipeline",
    "search_sessions",
    # -- last row r5 (buffer past the 50-entry sample line) --------------
    "ev_props_kv",
    "ev_tag_membership",
    "sushi_instances",
    "ev_filter_project",
    "ev_monthly_stats",
    "ev_sessionize",
    "ev_rolling_7d",
    "ev_interevent_gap",
    "ev_value_median",
    "ev_asof_orders",
    "ev_funnel",
    "ev_session_having",
    "ev_sessionize_global",
    "ev_sessionize_bucketed",
    "ev_last_per_user",
    "ev_top3_per_type",
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
