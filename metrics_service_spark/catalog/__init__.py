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
    # -- never driver-sampled (landed after the packed r9 window) --------
    "doc_corpus_datasheet",
    # -- implementation/oracle changed this round (r10) -------------------
    # the two-round driver-red row: oracle rewritten without the
    # list-comprehension slice, hash surface now all-integer
    # (dup_frac_scaled BIGINT), plus the renamed byte-identical twin
    # that discriminates driver-side caching (VERDICT r9 #1)
    "doc_dup_spans",
    "doc_dup_spans_v2",
    # NEW r10: the span-removal deliverable the stats entry measures
    "doc_span_scrub",
    # phash Arrow batch vectorized (np.argpartition + packed bits —
    # VERDICT r9 #6); same hashes, re-sample to prove it
    "mm_phash",
    "mm_phash_neardup",
    "mm_dedup_clusters",
    # ADVICE r9: hier coarse-count now derived from the same formula as
    # _derived_cells on both sides (tiny-corpus consistency) ...
    "emb_semdedup_hier",
    "emb_cluster_sample",
    "emb_curation_pipeline",
    # ... and pq_rerank's shortlist collect gained the empty/size guard
    "emb_pq_rerank",
    # corpus-graph family swapped from flat to hier assignment (the
    # flat rows x cells argmax was the quadratic term at derived
    # geometry — 50x probes 25.3x/35.3x -> 13.1x/16.1x); oracles now
    # replay the shared two-level CTE chain
    "emb_knn_graph",
    "emb_knn_hubness",
    "emb_hard_negatives",
    # -- the whole r6-stale block (latest driver row 3 rounds old; the
    #    r10 window is spent on DRAIN, not new surface — VERDICT r9 #2) --
    "doc_simhash",
    "doc_simhash_md5",
    "doc_simhash_neardup",
    "doc_simhash_neardup_md5",
    "emb_ann_ivf",
    "emb_ann_lsh",
    "emb_topk_bruteforce",
    "mm_audio_meta",
    "mm_frame_sample",
    "mm_image_features",
    "mm_image_meta",
    "mm_image_meta_real",
    "doc_domain_filter",
    "doc_fingerprint",
    "doc_length_histogram",
    "doc_mixture",
    "doc_pii_scrub",
    "ev_dau_stickiness_approx_hll",
    "ev_monthly_stats_approx",
    "tpch_q2",
    "tpch_q7",
    "tpch_q9",
    "tpch_q11",
    "tpch_q13",
    "tpch_q15",
    "tpch_q16",
    "tpch_q20",
    # -- oldest r7 block, least-recently-checked fill to the 50 line ------
    "landing_page_daily",
    "matview_awardcharts",
    "matview_awardmetrics",
    "matview_landingpage",
    "matview_repocharts",
    "matview_repometrics",
    "matview_routed_repo",
    "matview_userprofilecharts",
    "matview_userprofilemetrics",
    "func_scalar_suite",
    "ev_props_kv",
    "order_chains",
    "package_counts",
    # -- buffer past the 50-entry sample line (rest of the r7 block;
    #    all differentially pytest-checked every session) -----------------
    "search_log_pipeline",
    "search_sessions",
    "metrics_star",
    "ev_retention",
    "tpch_q21",
    "tpch_q22",
    "order_components",
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
