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
    # -- r8-changed but never driver-sampled since (VERDICT r8 #3: the
    #    changed-first breach to repair FIRST — commit 2d3c48c's inline
    #    assert + _spread changes had no in-window proxy) ----------------
    "emb_cosine_neardup",
    # -- implementation/oracle changed this round (r9) --------------------
    # the r8 driver-red row, now comparison-stable (exact-integer
    # rounding on both sides — functions/stable.py)
    "doc_dup_spans",
    # rounded-ratio sweep: every entry whose Spark fn or oracle swapped
    # round(double) for round_frac/sql_round_frac
    "doc_paragraph_dedup",
    "doc_repetition",
    "doc_quality",
    "doc_quality_filter",
    "doc_quality_filter_exact",
    "doc_unigram_freq",
    "doc_tfidf_topk",
    "doc_bigram_coherence",
    "doc_ccnet_bucket",
    "doc_curation_pipeline",
    "ev_dau_stickiness",
    "ev_dau_stickiness_kmv",
    "mm_image_features_exact",
    "tpch_q1",
    "tpch_q8",
    "tpch_q14",
    "tpch_q17",
    "emb_kmeans_step",
    "emb_centroids",
    # footer-derived cell geometry (VERDICT r8 #4): n_cells now scales
    # with the corpus row count in every cell-blocked entry
    "emb_kmeans_train",
    "emb_ivfpq_topk_int",
    "emb_semdedup_int",
    "emb_semdedup",
    "emb_semdedup_incr",
    "emb_contamination",
    "emb_cluster_sample",
    "emb_knn_graph",
    # -- NEW r9 entries (two-stage PQ refine, prototypicality pruning
    #    signal, Gopher rule battery, shuffle+shard manifest) -------------
    "emb_pq_rerank",
    "emb_semdedup_hier",
    "emb_prototypicality",
    "doc_gopher_rules",
    "doc_shuffle_shard",
    "emb_hard_negatives",
    "doc_hash_classifier",
    "mm_phash",
    "mm_phash_neardup",
    "mm_dedup_clusters",
    "doc_dsir_vote",
    "emb_curation_pipeline",
    "emb_proto_prune",
    "emb_knn_hubness",
    # -- least-recently-checked: the r5-stale tpch block the r8 buffer
    #    comment promised would lead this rotation ------------------------
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q12",
    "tpch_q18",
    "tpch_q19",
    # -- r6-stale fill to the 50-entry sample line ------------------------
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
    # -- buffer past the 50-entry sample line (next-most-stale r6 block;
    #    all differentially pytest-checked every session; the four NEW
    #    r9 entries displaced the tail of the r6-stale fill) --------------
    "emb_ann_lsh",
    "emb_topk_bruteforce",
    "ev_dau_stickiness_approx_hll",
    "ev_monthly_stats_approx",
    "mm_audio_meta",
    "mm_frame_sample",
    "mm_image_features",
    "mm_image_meta",
    "mm_image_meta_real",
    "tpch_q2",
    "tpch_q7",
    "tpch_q9",
    "tpch_q11",
    "tpch_q13",
    "tpch_q15",
    "tpch_q16",
    "tpch_q20",
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
