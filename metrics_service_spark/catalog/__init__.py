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
# all_queries() iteration order each round.  Rounds 1-5 jointly covered
# all catalog entries (union of CORRECTNESS_r0{1..5}.json).  Rotation
# policy (round 6, per VERDICT r5): order by IMPLEMENTATION-CHANGED-
# SINCE-LAST-CHECK first — a query whose code was rewritten after its
# last driver row outranks one whose check is merely old — then by
# least-recently-checked.  See README "Driver-sample contract".
_DRIVER_FRONT: tuple[str, ...] = (
    # -- implementation changed since last driver row --------------------
    "bloom_semi_lineitem",       # new this round (Bloom-pruned semi-join)
    "emb_kmeans_train",          # new this round (iterative Lloyd, full oracle)
    "emb_semdedup_incr",         # new this round (incremental SemDeDup)
    "emb_semdedup_int",          # new this round (SemDeDup, integer-exact)
    "emb_semdedup",              # new this round (SemDeDup, production float)
    "doc_mixture",               # new this round (domain-mixture reweighting)
    "doc_tfidf_topk",            # new this round (TF-IDF top terms)
    "doc_domain_filter",         # new this round (URL blocklist anti-join)
    "doc_paragraph_dedup",       # new this round (paragraph dedup stats)
    "doc_repetition",            # new this round (Gopher repetition filter)
    "doc_pii_scrub",             # new this round (PII detect+redact)
    "mm_image_meta_real",        # new this round (real PNG roundtrip)
    "doc_length_histogram",      # r5 red: oracle BIGINT cast fixed
    "emb_cosine_neardup",        # last row r1; default now banded LSH
    "doc_jaccard_pairs",         # last row r1; lossless length-bucket blocking
    "doc_minhash_dedup",         # last row r1; shuffle-free signature rewrite
    "doc_minhash_dedup_md5",     # last row r4; b=8 r=2 geometry (9a9e113)
    "doc_simhash_md5",           # last row r4; md5 family alignment
    "doc_simhash_neardup_md5",   # last row r4; md5 family alignment
    "doc_incremental_dedup",     # last row r4; geometry + signature rewrite
    "mm_image_meta",             # last row r4; multimodal changed (73ecb92)
    "mm_frame_sample",
    "mm_audio_meta",
    "mm_image_features",
    "mm_image_features_exact",
    "pid_family_closure",        # closure.py lazy-BFS change this round
    "order_chains",
    "order_components",
    # -- stale checks (last row r1/r2, implementation unchanged) ---------
    "doc_simhash",
    "doc_simhash_neardup",
    "doc_quality_filter",
    "emb_topk_bruteforce",
    "emb_ann_ivf",
    "emb_ann_lsh",
    "emb_kmeans_step",
    "emb_centroids",
    "doc_fingerprint",
    "ev_monthly_stats_approx",
    # -- last row r4 -----------------------------------------------------
    "ev_dau_stickiness_kmv",
    "ev_dau_stickiness_approx_hll",
    "tpch_q2",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q13",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "doc_dedup_clusters",
    "doc_split",
    "doc_pack",
    "doc_contamination",
    "doc_sample_stratified",
    "doc_unigram_freq",
    "doc_ngram_topk",
    "doc_multi_signal_pairs",
    "emb_random_projection",
    "doc_quality_filter_exact",
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
