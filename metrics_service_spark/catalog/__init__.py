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
    # -- r15 impl-changed/new first (rotation policy): the NEW
    #    production BPE paths (stored-table apply + driver-local-finish
    #    trainer, VERDICT r14 #1), the NEW portal/group/package
    #    dispatcher routes (VERDICT r14 #2), then every r14 request
    #    entry whose oracle gained the sessionId<>-1 predicate + mx
    #    guard (ADVICE r14) and whose adapter gained portalIdentifier /
    #    the group subject, and doc_bpe_apply (refactored through the
    #    shared _count_with_units tail) --------------------------------
    "doc_bpe_train_local",
    "doc_bpe_apply_stored",
    "metrics_request_portal",
    "metrics_request_group",
    "metrics_request_package",
    "metrics_request_catalog_summary",
    "emb_knn_pagerank_conserving",
    "doc_bpe_fertility",
    "doc_bpe_apply",
    "metrics_request_landing",
    "metrics_request_daily_country",
    "metrics_request_user",
    "metrics_request_repository",
    # -- the last six r10-stale rows (VERDICT r14 "What's missing" #3:
    #    routine rotation debt; bitwise-green in FULLCHECK both r14
    #    sessions) ------------------------------------------------------
    "tpch_q15",
    "tpch_q16",
    "tpch_q2",
    "tpch_q20",
    "tpch_q7",
    "tpch_q9",
    # -- r11-stale generation, oldest-checked fill (31 of 47; the
    #    remaining 16 — the ann-recall family, the guarded all-pairs
    #    baseline, md5/column-bisect twins whose heads are included
    #    below, and the span-runs reporting layer whose doc_dup_spans
    #    head is benched every round — lead the r16 rotation) -----------
    "anti_join_no_orders",
    "bloom_semi_lineitem",
    "counter_report",
    "doc_bpe_tokens",
    "doc_contamination",
    "doc_exact_dedup",
    "doc_incremental_dedup",
    "doc_jaccard_pairs",
    "doc_lang_id",
    "doc_minhash_dedup",
    "doc_ngram_topk",
    "doc_pack",
    "doc_sample_stratified",
    "doc_source_quota",
    "doc_split",
    "doc_temperature_mix",
    "doc_token_stats",
    "ev_props_kv",
    "ev_retention",
    "ev_value_median",
    "func_scalar_suite",
    "metrics_star",
    "mm_image_meta_real_mixed",
    "order_chains",
    "order_components",
    "orders_rollup",
    "package_counts",
    "search_log_pipeline",
    "search_sessions",
    "tpch_q21",
    "tpch_q22",
    # -- slots 51+: past the driver's 50-entry line; the rest of the
    #    r11 generation queues here for r16 -----------------------------
    "emb_ann_recall",
    "emb_ann_recall_ivfpq",
    "emb_ann_recall_lsh",
    "emb_ann_recall_pq",
    "emb_ann_recall_sq8",
    "emb_cosine_neardup_allpairs",
    "doc_dup_spans_counts",
    "doc_dup_spans_frac",
    "doc_minhash_dedup_md5",
    "doc_split_leakage_safe",
    "doc_multi_signal_pairs",
    "emb_ann_ivf_int",
    "emb_ann_lsh_int",
    "emb_random_projection",
    "doc_dup_span_runs",
    "doc_minhash_estimate",
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
