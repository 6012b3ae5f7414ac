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
    # -- r16 new/impl-changed first (rotation policy): the two new
    #    entries (deep-replay stored apply crossing the checkpoint
    #    boundary, VERDICT r15 #4; the fertility report's vocab-budget
    #    consumer, VERDICT r15 #5) and the three entries whose code
    #    paths changed this round (bpe_train_local_finish gained the
    #    bounded vocab transfer + ASCII tie-break guard; bpe_apply /
    #    bpe_apply_stats now validate the persisted merge table —
    #    ADVICE r15) ----------------------------------------------------
    "doc_bpe_apply_m48",
    "doc_vocab_budget",
    "search_stream_batch_twin",
    "doc_bpe_train_grouped",
    "doc_bpe_train_grouped_local",
    "doc_bpe_budget_retrain",
    "doc_classifier_calibration",
    "doc_bpe_apply_grouped",
    "doc_bpe_apply_stored",
    "doc_bpe_train_local",
    "doc_bpe_fertility",
    # -- the 16 remaining r11-stale rows (VERDICT r15 #2): drained in
    #    full this window; after this round minimum staleness is r12.
    #    TWIN RULE (VERDICT r15 #3): when a float-head / bitwise-twin
    #    pair straddles the 50-entry line, the hash-verdict TWIN goes
    #    in-window (doc_minhash_dedup_md5 here) and the no_oracle head
    #    (doc_minhash_dedup) queues behind it — a window slot must buy
    #    a hash verdict, not a rows-only check, unless the head's twin
    #    is in-window too ------------------------------------------------
    "doc_dup_span_runs",
    "doc_dup_spans_counts",
    "doc_dup_spans_frac",
    "doc_minhash_dedup_md5",
    "doc_minhash_estimate",
    "doc_multi_signal_pairs",
    "doc_split_leakage_safe",
    "emb_ann_ivf_int",
    "emb_ann_lsh_int",
    "emb_ann_recall",
    "emb_ann_recall_ivfpq",
    "emb_ann_recall_lsh",
    "emb_ann_recall_pq",
    "emb_ann_recall_sq8",
    "emb_cosine_neardup_allpairs",
    "emb_random_projection",
    # -- r12 generation, oldest-checked fill (23 of 46, name order;
    #    none are no_oracle entries).  Includes the four degraded-hour
    #    bench watch items (doc_chunk_overlap, doc_classifier_eval,
    #    doc_winnow_pairs + doc_fuzzy_prefix_pairs' exact family) so
    #    their r16 driver rows land alongside the bench re-read --------
    "doc_bigram_coherence",
    "doc_canonical_dedup",
    "doc_ccnet_bucket",
    "doc_chunk_overlap",
    "doc_classifier_eval",
    "doc_curation_pipeline",
    "doc_dedup_clusters",
    "doc_dedup_tiers",
    "doc_dsir_vote",
    "doc_dup_spans",
    "doc_epoch_cap_mix",
    "doc_gopher_rules",
    "doc_hash_classifier",
    "doc_paragraph_dedup",
    "doc_quality",
    "doc_quality_filter",
    "doc_winnow_pairs",
    "emb_pq_topk_int",
    "emb_sq8_topk_int",
    "ev_asof_orders",
    "ev_day_spine",
    "ev_filter_project",
    "ev_funnel",
    # -- slots 51+: past the driver's 50-entry line; the remaining 23
    #    r12-generation rows queue here for r17 ------------------------
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
    "mm_dedup_clusters",
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
