"""Scale probe: replicate the sf0.1 events table K times (offset keys,
shifted users) into a scratch dir and measure how the event-side
headline queries scale.  Evidence for SCALE.md's linearity claims —
the plan shapes are partition-parallel, so wall-clock should grow
sub-linearly on 32 cores until the table outgrows memory bandwidth.

    python tools/scale_probe.py [K] [scratch_dir]

Writes nothing outside scratch_dir (default /tmp/msspark_scale).
The replicated data is derived from the driver tables for MEASUREMENT
only — correctness stays pinned to the unmodified driver data.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "ev_monthly_stats",
    "ev_sessionize",
    "counter_report",
    "ev_value_median",
    "doc_exact_dedup",
    "doc_minhash_dedup",
    "doc_split",
    # r6 additions: the paragraph hash-join pipeline and the two pure
    # scan projections (expected ~1x — regression canaries)
    "doc_paragraph_dedup",
    "doc_repetition",
    "doc_pii_scrub",
    # r6 embedding operators: SemDeDup (cells grow k-fold under the
    # rotation replication, within-cell pair structure per copy is
    # EXACTLY the base's — rotation is an isometry) and the iterative
    # Lloyd loop (two corpus scans + k*dim-row collects)
    "emb_semdedup_int",
    "emb_kmeans_train",
    # bloom semi-join: since r7 the catalog entry SIZES m from the dim
    # count (sized_m_bits, ~10 bits/key), so this row IS the sizing
    # rule applied — the fixed-m EXTRA below shows the saturation the
    # rule avoids
    "bloom_semi_lineitem",
    # r7: fused incremental SemDeDup and the rewritten label
    # propagation (self-loop single-reference rounds)
    "emb_semdedup_incr",
    "order_components",
    # r7 additions: semantic decontamination (benchmark-cell join) and
    # the cluster-keyed leakage-safe split (jaccard pairs + CC + hash)
    "emb_contamination",
    "doc_split_leakage_safe",
    # r8 additions: product-quantization ANN and the IVF-PQ combo —
    # train/encode are corpus-linear fused passes, search is a
    # broadcast LUT join; expected linear-at-worst
    "emb_pq_topk_int",
    "emb_ivfpq_topk_int",
    # r8 additions: SQ8 (range stats + byte-code projection), the
    # overlapping duplicate-span pipeline (token-disjoint copies keep
    # per-copy duplicate structure identical to the base; span mass
    # grows linearly), bigram vocabulary join, and the no-global-sort
    # percentile bucketing (the histogram is value-bounded: its size
    # stays FLAT under replication)
    "emb_sq8_topk_int",
    "doc_dup_spans",
    "doc_bigram_coherence",
    "doc_ccnet_bucket",
    # r8: corpus k-NN graph — n_cells derives from the footer row
    # count (KNN_CELL_TARGET), so within-cell pair mass is constant
    # per cell and total candidates grow linearly
    "emb_knn_graph",
    # r9: every remaining cell-blocked entry now shares the same
    # footer-derived geometry (catalog/llm.py _derived_cells); the
    # SemDeDup/kmeans/ivfpq rows above plus this one are the evidence
    # r9: switched to the two-level hier assignment after this probe
    # measured the flat front at 33.6x (the rows x cells quadratic)
    "emb_cluster_sample",
    # r9 new entries: the PQ refine stage (shortlist-bounded exact
    # re-rank — expected near-flat), the prototypicality window
    # (cell-geometry-bounded), the pure-codegen Gopher battery
    # (expected ~linear scan fill), and the shuffle+shard manifest
    # (window mass held at SHARD_TARGET by the derived shard count)
    "emb_pq_rerank",
    # hier vs flat assignment at scale: the two-level front should
    # hold the ratio DOWN where the flat cell family's rows x cells
    # term grows (cluster_sample hit 54.8x at 50x)
    "emb_semdedup_hier",
    "emb_prototypicality",
    "doc_gopher_rules",
    "doc_shuffle_shard",
    # corpus x corpus cell join with an in-join label prune; expected
    # to track the knn-graph row (pair-dot fill, linear by geometry)
    "emb_hard_negatives",
    # explode + hash-agg: expected ~linear scan/shuffle fill
    "doc_hash_classifier",
    # Arrow signature pass + (band, slice) equi-join: copies are
    # token-disjoint so cross-copy buckets decorrelate; expected to
    # track the simhash-neardup family (~linear signature fill)
    "mm_phash_neardup",
    # phash pairs -> CC: pair mass as above, then log-round label
    # propagation over the near-dup edge set (tiny vs corpus)
    "mm_dedup_clusters",
    # two bounded-by-construction bucket aggs + broadcast-join scoring:
    # expected to track doc_hash_classifier (~linear shuffle fill)
    "doc_dsir_vote",
    # composed hier-assign -> verdict -> quota: expected to track
    # emb_semdedup_hier (shared assignment + pair mass, plus a
    # cell-keyed quota window)
    "emb_curation_pipeline",
    # prototypicality rank + shared-partition count window: proto cost
    # plus one projection
    "emb_proto_prune",
    # knn-graph cost + a degree agg + broadcast-able attach
    "emb_knn_hubness",
    # r10: span REMOVAL — dup_spans' span mass plus a token-keyed
    # anti-join and per-doc reassembly; expected to track the
    # doc_dup_spans row (string/token mass, per-node-linear)
    "doc_span_scrub",
    # r11: duplicate-run islands — dup_spans' span mass plus a
    # doc-keyed window over ONLY the flagged subset and a distinct
    # over exploded coverage keys; expected to track doc_span_scrub
    "doc_dup_span_runs",
    # r11: count agg (rows ~ n_sources) + broadcast quota + ONE
    # source-keyed window rank; expected ~linear scan/shuffle fill
    "doc_temperature_mix",
    # r11: recall eval — the exact arm is |queries| x corpus with the
    # query sample FIXED (8), so the probe should be ~linear in the
    # corpus despite the brute-force label
    "emb_ann_recall",
    # r11: estimator calibration — minhash_dedup_md5's banded skeleton
    # plus two signature/shingle re-joins on the k-bounded candidate
    # set; expected to track the doc_minhash_dedup row
    "doc_minhash_estimate",
    # r11: tiered keep-list — one exact hash-groupBy, then the audited
    # jaccard+CC shape over SURVIVORS only; expected to track
    # doc_split_leakage_safe (same near tier) plus the cheap tier-1
    "doc_dedup_tiers",
    # r12: bucketed co-located star join — the warm-up rep builds the
    # bucketed pair (fingerprint-keyed, once), the timed rep is the
    # standing-table query; expected ~linear (per-bucket merge fill)
    "gold_star_bucketed",
    # r12: epoch-cap waterfill — count agg to m rows + tiny windows +
    # ONE source-keyed rank window; budget fixed, so the rank window
    # dominates: expected ~linear scan/shuffle fill
    "doc_epoch_cap_mix",
    # r12: CMS calibration — ONE corpus-mass count agg, then the
    # weighted sketch + top-25 run over distinct-ngram mass (the
    # occurrence-stream form measured 30.8x here; the weighted form
    # removes its depth-amplified shuffle); sketch size-invariant
    "doc_cms_ngram_error",
    # r12: overlapping chunker — pure per-row codegen explode;
    # expected ~linear scan fill (the doc_gopher_rules class)
    "doc_chunk_overlap",
    # r12: rules+classifier join + 4-cell agg; expected to track
    # doc_hash_classifier (same explode/agg) plus the rules scan
    "doc_classifier_eval",
    # r12: blocked levenshtein — NOTE the replication suffixes token
    # ENDS, so first-4-char block keys collide ACROSS copies (cells
    # x50): this row measures the max_cell guard firing (deterministic
    # wholesale drop, oracle-mirrored), i.e. the boilerplate-prefix
    # skew case where the operator defers to the minhash family
    "doc_fuzzy_prefix_pairs",
    # r12: winnowing — per-row array transforms (positional grams,
    # md5-hex8, windowed mins) + hot-fp guard + fp equi-join; copies
    # are token-disjoint so cross-copy fingerprints decorrelate;
    # expected to track the shingle-mass family
    "doc_winnow_pairs",
    # r12: canonical-form hash groupBy — the doc_exact_dedup class
    # with translate on the map side; expected ~linear
    "doc_canonical_dedup",
    # r12: sorted-neighborhood — block-keyed rank window + offset
    # explode (candidates exactly N*(w-1)) + codegen levenshtein;
    # expected ~linear, window skew bounded by block cardinality
    "doc_sorted_neighborhood",
    # r13: the hot-block-safe rank twin — same candidate mass, but the
    # rank is the bucketed global numbering: per-bucket sorts + one
    # broadcast offset frame instead of one task per block; expected
    # to track doc_sorted_neighborhood with the block-sort skew gone
    "doc_sorted_neighborhood_global",
    # r13: multi-pass union — the sum of its two (linear) passes plus
    # one distinct shuffle over the unioned pair set
    "doc_linkage_multipass",
    # r13: linkage keep-list — the multipass edge set (global-rank SN
    # arm) feeding log-round CC; edge mass ~linear by blocking, CC
    # rounds log in the largest cluster; expected to track
    # doc_linkage_multipass plus the closure family's job-launch floor
    "doc_linkage_clusters",
    # r13: the product refresh on the bucketed layout — warm-up rep
    # builds the pid-bucketed eventlog once, timed rep is the
    # zero-exchange star agg; expected ~linear (scan + local agg fill)
    "metrics_star_bucketed",
    # r13: the path-based twin, probed at the same K so the
    # layout-vs-shuffle ratio has a measured GROWTH curve (at sf0.1
    # the pair is 1.64×; the elided exchange is corpus-mass, so the
    # ratio should widen as the eventlog grows)
    "metrics_star",
    # r14: the linkage family on the bucketed documents layout — the
    # warm-up rep builds the (lang, bk)-bucketed silver table once
    # (fingerprint-keyed), the timed rep plans the cell count + block
    # self-join scan-local; compare against the doc_fuzzy_prefix_pairs
    # row above at the same K for the layout-vs-shuffle growth curve.
    # NOTE both rows run under replication's cross-copy block-key
    # collisions (the max_cell guard fires wholesale, as documented on
    # the path row), so the pair compares identical work
    "doc_fuzzy_prefix_bucketed",
    # r14: quality-aware canonical — the dedup_clusters pipeline
    # (jaccard pairs + CC, the doc_split_leakage_safe class) plus one
    # quality scan and a cluster-keyed argmax window (cluster sizes
    # bounded by the cell caps); expected to track that row
    "doc_cluster_best",
    # r14: exact per-lang length percentiles — ONE (lang, n_chars)
    # histogram groupBy (combiner-friendly, output rows bounded by the
    # value domain, FLAT under replication) + windows over the
    # histogram only; expected ~linear scan fill, near-flat tail
    "doc_length_quantiles",
    # r14: source-pair 5-gram overlap — explode + (source, gram)
    # distinct, then a join whose per-gram fan-out is bounded by
    # source cardinality; expected to track the shingle-mass family
    "doc_source_overlap",
    # r14: scene cuts — Arrow-seam signature pass (frame rows ~ media
    # count) + per-media lag window over frames; expected ~linear
    "mm_scene_cuts",
    # r14: per-day session-duration percentiles — sessionize cost plus
    # a (day, seconds) histogram whose per-day window mass is distinct
    # durations; expected to track the ev_sessionize row
    "ev_session_quantiles",
    # r14: incremental linkage admission — batch-vs-corpus block join;
    # under suffix replication block keys collide so the corpus cap
    # fires (the guard regime, like the fuzzy self-join rows)
    "doc_linkage_incremental",
    # r14: end-to-end MetricsRequest dispatcher — family semi-join +
    # COUNTER filter + bucketed agg over the k-fold eventlog; buckets
    # are calendar/country-bounded so output is FLAT, expected ~linear
    # scan/agg fill (the landing_page_daily class)
    "metrics_request_landing",
    "metrics_request_daily_country",
    # same class: user family via seeds join (constant dims), and the
    # repository/year form whose scope is a pure scan predicate
    "metrics_request_user",
    "metrics_request_repository",
    # r14: BPE training — the corpus-mass term is the ONE word-freq
    # explode+groupBy; under token-suffix replication the suffixed
    # copies fail the ^[a-z]+$ training filter, so the vocab (and with
    # it every per-round term) stays the BASE corpus's: expected
    # ~linear front (tokenize scan) + flat rounds — exactly the
    # vocab-bounded-rounds contract the docstring claims
    "doc_bpe_train",
    # r14: apply — tokenize + vocab join + per-doc agg, all corpus
    # mass; expected ~linear (suffixed tokens take the 1-unit fallback
    # branch, same join probe mass)
    "doc_bpe_apply",
    # r14: bigram LM — suffixed tokens make copies bigram-DISJOINT, so
    # the count table grows x k with per-copy counts identical to the
    # base (no fabricated cross-copy mass): the train/probe join and
    # both shuffles are corpus-linear; expected to track the
    # doc_bigram_coherence row
    "doc_lm_fclass",
    "doc_lm_perplexity",
    # r14: PageRank — knn-graph cost (footer-derived cells, linear by
    # geometry) + 3 fixed rounds of src-keyed join + dst-keyed agg
    # over the k-fold edge set; expected to track emb_knn_graph plus a
    # rounds-proportional term
    "emb_knn_pagerank",
    # r14: exact AUC — rules + classifier scans collapse to a score
    # HISTOGRAM (value-domain-bounded, near-flat under replication)
    # + the broadcast-offset prefix sum; expected ~linear scan fill,
    # the doc_length_quantiles class
    "doc_classifier_auc",
    # r14: priority sampling — pure projection + one group-keyed
    # WindowGroupLimit top-k; the doc_source_quota class
    "doc_priority_sample",
    # r15: driver-local-finish BPE training — same FLAT expectation as
    # doc_bpe_train (suffixed copies fail the training filter so the
    # collected vocab stays base-sized); the corpus-mass term is the
    # same one word-freq shuffle
    "doc_bpe_train_local",
    # r15: stored-table apply — tokenize + distinct-word vocab replay
    # + unit join, all corpus mass; expected to track doc_bpe_apply
    # (the vocab replay side is base-sized under suffix replication)
    "doc_bpe_apply_stored",
    # r15: conserving PageRank — the plain twin's row plus a per-round
    # one-row dangling aggregate; expected to track emb_knn_pagerank
    "emb_knn_pagerank_conserving",
    # r15: dispatcher portal/group/package routes — the
    # metrics_request_landing class (scope predicate or constant-dim
    # family join + calendar-bounded agg); expected ~linear scan fill
    "metrics_request_portal",
    "metrics_request_group",
    "metrics_request_package",
    # r15: browse-page catalog summary — per-seed family join +
    # seed-keyed unique-count agg over the 50x eventlog; constant
    # dims, seed-bounded output; the metrics_request class
    "metrics_request_catalog_summary",
    # r15: fertility report — bpe_apply_stored's skeleton + one
    # lang-keyed agg (output |langs| rows); expected to track the
    # apply row (corpus-linear tokenize + base-sized vocab replay)
    "doc_bpe_fertility",
    # r16: deep-replay stored apply (48 merges, checkpoint boundary
    # crossed) — expected to track doc_bpe_apply_stored with a fixed
    # replay-depth constant on top (vocab-sized, corpus-independent)
    "doc_bpe_apply_m48",
    # r16: vocab-budget apportionment — the fertility skeleton + two
    # windows over a |langs|-row frame; expected to track
    # doc_bpe_fertility exactly (the apportionment adds no corpus term)
    "doc_vocab_budget",
    # r16: grouped per-language training — the doc_bpe_train contract
    # per language: one grouped word-freq shuffle (corpus-linear
    # front), vocab-bounded rounds (suffixed copies fail the training
    # filter, so pair-count/argmax/merge terms stay base-sized);
    # expected ~linear front + flat rounds, and the local twin flat
    # like doc_bpe_train_local
    "doc_bpe_train_grouped",
    "doc_bpe_train_grouped_local",
    # r16: the full fertility->budget->retrain loop — sum of its
    # audited parts (local train + stats pass + tiny apportionment +
    # grouped retrain); expected ~linear in corpus mass
    "doc_bpe_budget_retrain",
    # r16: per-language apply — tokenize + (lang, word)-vocab replay +
    # unit join, corpus mass like doc_bpe_apply_stored; the rank-level
    # broadcast joins are vocab-sized
    "doc_bpe_apply_grouped",
    # r16: classifier reliability table — the doc_classifier_auc
    # class: scans collapse to the value-domain-bounded score
    # histogram, range + bin rollup on histogram rows; expected
    # ~linear scan fill
    "doc_classifier_calibration",
    # r16: streaming batch twin — pure per-row codegen (CLF build +
    # regex parse) with zero exchanges; unlike the scan-dominated
    # doc_pii_scrub canary the per-row regex mass dominates the base,
    # so expected ~linear row fill (measured 23.5x at 50x — sub-50x
    # core fill, perfectly partition-parallel)
    "search_stream_batch_twin",
    # r17: grouped apply at checkpoint-crossing depth (en=40) — the
    # doc_bpe_apply_m48 contract per language: the replay-depth
    # constant (40 chained scans + the rank-32 checkpoint) is
    # vocab-sized and corpus-independent, so it amortizes as data
    # grows; corpus term is the grouped apply's tokenize + unit join
    "doc_bpe_apply_grouped_m40",
    # r17: the tokenizer loop on its O(1)-jobs local-finish arm —
    # expected to track doc_bpe_budget_retrain's corpus term (two
    # tokenize passes) minus the sequential grouped-round floor
    "doc_bpe_budget_retrain_local",
    # r17: the streaming paragraph-index fold unit as a batch frame —
    # chunk explode + md5 + one map-side-combined groupBy; paragraph
    # mass is corpus-linear (suffixed copies hash to disjoint
    # paragraphs, so the count table grows x50 with no cross-copy
    # collisions — real agg mass, like doc_paragraph_dedup's front)
    "paragraph_index_batch_twin",
    # r17: vocabulary export — expected to track doc_bpe_train_local
    # (one tokenize scan; the char/merge union and id window are
    # vocab-bounded); the grouped twin adds the per-language filter
    # semi-join, still vocab-bounded
    "doc_bpe_vocab_export",
    "doc_bpe_vocab_export_grouped",
    # r17: repetition stats after the sorted-scan fix — pure
    # zero-exchange projection, expected ~linear row fill
    "doc_repetition",
    # r17: encode-to-ids — corpus token mass joins base-sized per-word
    # id arrays, then one doc-keyed reassembly shuffle of int ids;
    # expected the doc_bpe_apply class with the reassembly on top (the
    # grouped twin adds the per-language id join, same class)
    "doc_bpe_encode_digest",
    "doc_bpe_encode_grouped",
    # r17: multi-n repetition battery — three sorted scans in one
    # zero-exchange projection; expected the doc_repetition class
    "doc_repetition_multi",
]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/msspark_scale"
    base = "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from metrics_service_spark.catalog import all_queries
    from metrics_service_spark.session import get_spark
    from metrics_service_spark.sources.tables import load_table

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(scratch, ignore_errors=True)
    ev = load_table(spark, base, "events")
    n0 = ev.count()
    copies = ev.crossJoin(
        F.broadcast(spark.range(k).withColumnRenamed("id", "__copy"))
    ).select(
        (F.col("event_id") + F.col("__copy") * 10_000_000).alias("event_id"),
        F.col("ts"),
        (F.col("user_id") + F.col("__copy") * 1_000_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    copies.write.mode("overwrite").parquet(f"{scratch}/events.parquet")
    print(f"replicated events: {n0} x {k} -> {n0 * k} rows", file=sys.stderr)

    docs = load_table(spark, base, "documents")
    nd = docs.count()
    doc_copies = docs.crossJoin(
        F.broadcast(spark.range(k).withColumnRenamed("id", "__copy"))
    ).select(
        (F.col("doc_id") + F.col("__copy") * 10_000_000).alias("doc_id"),
        # make copies token-wise DISJOINT (suffix every token with the
        # copy id): replication must not fabricate cross-copy near-dup
        # clusters, which would quadratically inflate the candidate set
        # and measure the replication scheme, not the operator
        F.when(F.col("__copy") == 0, F.col("text"))
        .otherwise(
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(t, F.lit("_"), F.col("__copy").cast("string")),
                ),
                " ",
            )
        )
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    doc_copies.write.mode("overwrite").parquet(f"{scratch}/documents.parquet")
    print(f"replicated documents: {nd} x {k} -> {nd * k} rows", file=sys.stderr)

    emb = load_table(spark, base, "embeddings")
    ne = emb.count()
    # rotate each copy's vectors by `copy` positions: an isometry, so
    # every copy reproduces the base corpus's within-copy cosine/pair
    # structure EXACTLY, while cross-copy pairs decorrelate (no
    # fabricated quadratic near-dup clusters)
    rot = F.pmod(F.col("__copy"), F.lit(64)).cast("int")
    emb_copies = emb.crossJoin(
        F.broadcast(spark.range(k).withColumnRenamed("id", "__copy"))
    ).select(
        (F.col("vec_id") + F.col("__copy") * 10_000_000).alias("vec_id"),
        "label",
        F.concat(
            F.slice(F.col("embedding"), rot + 1, F.lit(64) - rot),
            F.slice(F.col("embedding"), F.lit(1), rot),
        ).alias("embedding"),
    )
    emb_copies.write.mode("overwrite").parquet(f"{scratch}/embeddings.parquet")
    print(f"replicated embeddings: {ne} x {k} -> {ne * k} rows", file=sys.stderr)

    li = load_table(spark, base, "lineitem")
    nl = li.count()
    li_copies = li.crossJoin(
        F.broadcast(spark.range(k).withColumnRenamed("id", "__copy"))
    ).select(
        (F.col("l_orderkey") + F.col("__copy") * 10_000_000).alias("l_orderkey"),
        *[c for c in li.columns if c != "l_orderkey"],
    )
    li_copies.write.mode("overwrite").parquet(f"{scratch}/lineitem.parquet")
    orders = load_table(spark, base, "orders")
    no = orders.count()
    ord_copies = orders.crossJoin(
        F.broadcast(spark.range(k).withColumnRenamed("id", "__copy"))
    ).select(
        (F.col("o_orderkey") + F.col("__copy") * 10_000_000).alias("o_orderkey"),
        *[c for c in orders.columns if c != "o_orderkey"],
    )
    ord_copies.write.mode("overwrite").parquet(f"{scratch}/orders.parquet")
    print(
        f"replicated lineitem/orders: {nl}/{no} x {k}", file=sys.stderr
    )

    def bloom_semi_fixed(spark, sf_dir):
        # the anti-pattern for contrast: m pinned at 2^16 while build
        # keys grow k-fold -> FP rate rises, the prune saturates and
        # the trailing exact join carries the load (the r6 catalog
        # entry behaved like this; r7 switched it to sized_m_bits)
        from metrics_service_spark.operators.bloom import bloom_semi_join

        orders = load_table(spark, sf_dir, "orders").filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        )
        li = load_table(spark, sf_dir, "lineitem")
        return bloom_semi_join(
            li, orders, "l_orderkey", "o_orderkey", m_bits=1 << 16, k=5
        ).groupBy("l_returnflag").count()

    def linkage_recall_scaled(spark, sf_dir):
        # r13: the catalog entry's fixed sample_mod would trip its own
        # max_sample guard at k-fold corpus mass (BY DESIGN — the truth
        # is all-pairs and must stay calibration-sized), so the probe
        # applies the operator docstring's production rule instead:
        # sample_mod scales with N, holding the sample ~constant.  The
        # claim under test: recall calibration cost is the SAMPLE's,
        # not the corpus's — expected ~flat beyond the sampling scan.
        from metrics_service_spark.catalog.llm import (
            FUZZY_BLOCK_CHARS,
            FUZZY_MAX_CELL,
            FUZZY_MAX_DIST,
            FUZZY_PREFIX_CHARS,
            SN_NEIGHBORHOOD,
        )
        from metrics_service_spark.operators.dedup import (
            linkage_recall_matrix,
        )

        mod = 4 * (k if sf_dir != base else 1)
        return linkage_recall_matrix(
            load_table(spark, sf_dir, "documents"),
            "doc_id", "text",
            sample_mod=mod,
            prefix_chars=FUZZY_PREFIX_CHARS,
            max_dist=FUZZY_MAX_DIST,
            block_chars=FUZZY_BLOCK_CHARS,
            max_cell=FUZZY_MAX_CELL,
            neighborhood=SN_NEIGHBORHOOD,
            block_cols=["lang"],
        )

    _silver_cache: dict[str, str] = {}

    def metrics_star_silver(spark, sf_dir):
        # r13 decomposition arm: adapter pre-paid (the SHARED
        # materialize_silver_eventlog helper, written ONCE per sf_dir
        # so the timed rep never pays it), grain shuffle still paid —
        # (silver − bucketed) isolates the exchange the layout elides,
        # (path − silver) isolates the adapter expressions.  The cache
        # dirs are removed at probe exit alongside the scratch.
        import tempfile

        from metrics_service_spark.plans.gold import metrics_star
        from metrics_service_spark.sources.bucketed import (
            materialize_silver_eventlog,
        )

        if sf_dir not in _silver_cache:
            tdir = tempfile.mkdtemp(prefix="probe_silver_")
            materialize_silver_eventlog(spark, sf_dir, tdir)
            _silver_cache[sf_dir] = tdir
        return metrics_star(
            spark.read.parquet(f"{_silver_cache[sf_dir]}/eventlog")
        )

    _prefixed_cache: dict[str, str] = {}

    def _prefixed_docs_dir(spark, sf_dir) -> str:
        # r14: the token-SUFFIX replication scheme makes first-4-char
        # block keys collide across copies, so the fuzzy-prefix rows
        # above measure the max_cell guard regime (cells x50, wholesale
        # drops — tiny join mass).  To measure the exchange the
        # bucketed layout elides, this scratch salts each copy's LANG
        # (a block_cols component) with its copy id: text untouched, so
        # (lang_cN, first-4-chars) blocks are copy-disjoint and every
        # copy reproduces the base's cell populations and candidate
        # mass exactly — lang cardinality x k, the "more languages"
        # regime real corpora are in.  (A first attempt PREFIXED the
        # text instead; the 4-char copy marker then WAS the block key,
        # one overfull cell per copy, guard dropped everything.)
        if sf_dir == base:
            return base
        if sf_dir not in _prefixed_cache:
            d = f"{scratch}_prefixed"
            docs = load_table(spark, base, "documents")
            pref = docs.crossJoin(
                F.broadcast(spark.range(k).withColumnRenamed("id", "__copy"))
            ).select(
                (F.col("doc_id") + F.col("__copy") * 10_000_000).alias(
                    "doc_id"
                ),
                "text",
                F.concat(
                    F.col("lang"), F.lit("_c"), F.col("__copy").cast("string")
                ).alias("lang"),
                "source",
                "n_chars",
            )
            pref.write.mode("overwrite").parquet(f"{d}/documents.parquet")
            _prefixed_cache[sf_dir] = d
        return _prefixed_cache[sf_dir]

    def fuzzy_prefix_pathbased_disjoint(spark, sf_dir):
        from metrics_service_spark.catalog.llm import (
            q_doc_fuzzy_prefix_pairs,
        )

        return q_doc_fuzzy_prefix_pairs(spark, _prefixed_docs_dir(spark, sf_dir))

    def fuzzy_prefix_bucketed_disjoint(spark, sf_dir):
        from metrics_service_spark.catalog.llm import (
            q_doc_fuzzy_prefix_bucketed,
        )

        return q_doc_fuzzy_prefix_bucketed(
            spark, _prefixed_docs_dir(spark, sf_dir)
        )

    def classifier_calibration_widedomain(spark, sf_dir):
        # r17 (VERDICT r16 optional): the catalog entry's score domain
        # is value-bounded by construction (per-token weights in
        # [-8, 8] at w_mod=17), so its 1.9x probe row never stressed
        # the histogram itself.  This arm re-runs the SAME calibration
        # pipeline with w_mod=1009 — per-token weights in [-504, 504],
        # a ~60x wider score domain at IDENTICAL corpus mass — so the
        # ratio prices "histogram ~60x denser AND corpus x50" against
        # the claim that the collapse keeps the histogram negligible
        # next to the corpus scan.
        from metrics_service_spark.catalog.llm import CALIBRATION_BINS
        from metrics_service_spark.operators.similarity import _spread
        from metrics_service_spark.operators.text import (
            gopher_rules,
            hash_classifier,
        )

        docs = _spread(load_table(spark, sf_dir, "documents"))
        rules = gopher_rules(docs, "doc_id", "text").select(
            "doc_id", F.col("keep").alias("label")
        )
        clf = hash_classifier(
            docs, "doc_id", "text", w_mod=1009, w_bias=504
        ).select("doc_id", "score")
        hist = (
            rules.join(clf, "doc_id")
            .groupBy("score")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("label"), 1).otherwise(0))
                .cast("long")
                .alias("n_pos"),
            )
        )
        rng = hist.agg(
            F.min("score").alias("__smin"), F.max("score").alias("__smax")
        )
        binned = hist.crossJoin(F.broadcast(rng)).select(
            F.expr(
                f"CAST(((score - __smin) * {CALIBRATION_BINS}) div "
                f"(__smax - __smin + 1) AS INT)"
            ).alias("bin_id"),
            "n",
            "n_pos",
            "score",
        )
        return binned.groupBy("bin_id").agg(
            F.min("score").alias("score_lo"),
            F.max("score").alias("score_hi"),
            F.sum("n").cast("long").alias("n_docs"),
            F.sum("n_pos").cast("long").alias("n_pos"),
        )

    EXTRA = {
        "bloom_semi_fixed_m16": bloom_semi_fixed,
        "doc_linkage_recall_scaledmod": linkage_recall_scaled,
        "metrics_star_silver": metrics_star_silver,
        "fuzzy_prefix_pathbased_disjoint": fuzzy_prefix_pathbased_disjoint,
        "fuzzy_prefix_bucketed_disjoint": fuzzy_prefix_bucketed_disjoint,
        "classifier_calibration_widedomain": classifier_calibration_widedomain,
    }

    def micro_semantic_admit(spark, sf_dir):
        """Streaming gate at k-fold INDEX mass: bootstrap the whole
        replicated corpus (minus a fixed copy-0 batch) into the
        persistent cell index with the geometry SCALED to the corpus
        (the operator's target_cell_size contract), then time
        re-admitting the constant-size batch.  The claim under test:
        IN-list cell pruning + scaled geometry keep admit cost a
        function of the BATCH (touched-cell mass ~ batch size x
        constant cell size), not of the corpus."""
        import tempfile

        from metrics_service_spark.streaming.semantic_gate import admit_batch

        tdir = tempfile.mkdtemp(prefix="probe_semgate_")
        emb = load_table(spark, sf_dir, "embeddings")
        corpus = emb.filter(
            ~((F.col("vec_id") < 10_000_000) & (F.col("vec_id") % 100 == 0))
        )
        n = corpus.count()
        # geometry scaled to the corpus (constant ~30-vector cells) and
        # a batch SMALLER than the cell count: touched-cell mass is
        # then ~|batch| x 30 at every scale — the flatness under test
        n_cells = max(16, -(-n // 30))
        admit_batch(spark, tdir, corpus, n_cells=n_cells)
        batch = emb.filter(
            (F.col("vec_id") < 10_000_000) & (F.col("vec_id") % 100 == 0)
        )

        def run():
            admit_batch(spark, tdir, batch, n_cells=n_cells).count()

        return run, lambda: shutil.rmtree(tdir, ignore_errors=True)

    def micro_paragraph_fold(spark, sf_dir):
        """Paragraph-index fold at k-fold BATCH (and corpus) mass:
        bootstrap the index from the replicated corpus, then time
        folding a re-derived k-fold batch in + scoring it — expected
        linear in the batch, independent of index size beyond the
        touched hash partitions."""
        import tempfile

        from metrics_service_spark.streaming.paragraph_index import (
            duplicate_paragraph_fraction,
            update_paragraph_index,
        )

        tdir = tempfile.mkdtemp(prefix="probe_pindex_")
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        update_paragraph_index(spark, tdir, docs)
        batch = docs.limit(500 * max(1, k if sf_dir != base else 1))

        def run():
            update_paragraph_index(spark, tdir, batch)
            duplicate_paragraph_fraction(spark, tdir, batch).count()

        return run, lambda: shutil.rmtree(tdir, ignore_errors=True)

    def micro_linkage_gate(spark, sf_dir):
        """Streaming linkage gate at k-fold INDEX mass: bootstrap the
        whole replicated corpus (minus a fixed copy-0 batch) into the
        persistent block index, then time re-admitting the constant
        batch.  The claim under test: IN-list bucket pruning keeps
        admit cost a function of the BATCH's touched blocks — index
        rows outside them are never read.  (Suffix replication makes
        copies block-disjoint on the text side, so touched-cell
        populations stay base-sized as the index grows.)"""
        import tempfile

        from metrics_service_spark.streaming.linkage_gate import (
            admit_batch_linkage,
        )

        tdir = tempfile.mkdtemp(prefix="probe_linkgate_")
        docs = load_table(spark, sf_dir, "documents")
        corpus = docs.filter(
            ~((F.col("doc_id") < 10_000_000) & (F.col("doc_id") % 10 == 0))
        )
        admit_batch_linkage(spark, tdir, corpus, block_cols=["lang"])
        batch = docs.filter(
            (F.col("doc_id") < 10_000_000) & (F.col("doc_id") % 10 == 0)
        )

        def run():
            admit_batch_linkage(
                spark, tdir, batch, block_cols=["lang"]
            ).count()

        return run, lambda: shutil.rmtree(tdir, ignore_errors=True)

    def micro_linkage_pairs_bucketed_disjoint(spark, sf_dir):
        """VERDICT r14 #6: the bench micro's semantics (layout write
        strictly OUTSIDE the timed region) under the DISJOINT-block
        replication — the join-mass regime, not the guard regime the
        suffix scheme produces.  Timed region = the pairs query off
        the standing (lang, bk)-bucketed linkage silver only."""
        from metrics_service_spark.catalog.llm import (
            q_doc_fuzzy_prefix_bucketed,
        )
        from metrics_service_spark.sources.bucketed import (
            ensure_bucketed_documents,
        )

        d = _prefixed_docs_dir(spark, sf_dir)
        ensure_bucketed_documents(spark, d)  # layout build, untimed

        def run():
            q_doc_fuzzy_prefix_bucketed(spark, d).count()

        return run, lambda: None

    def micro_linkage_pairs_pathbased_disjoint(spark, sf_dir):
        """Path-based twin of the row above: re-derives (lang, pfx,
        bk) from the parquet and pays the block shuffle per run —
        (path − bucketed) at each scale is the exchange + derivation
        the layout elides."""
        from metrics_service_spark.catalog.llm import (
            q_doc_fuzzy_prefix_pairs,
        )

        d = _prefixed_docs_dir(spark, sf_dir)

        def run():
            q_doc_fuzzy_prefix_pairs(spark, d).count()

        return run, lambda: None

    MICRO = {
        "semantic_gate_admit": micro_semantic_admit,
        "paragraph_index_fold": micro_paragraph_fold,
        "linkage_gate_admit": micro_linkage_gate,
        "linkage_pairs_bucketed_disjoint": micro_linkage_pairs_bucketed_disjoint,
        "linkage_pairs_pathbased_disjoint": micro_linkage_pairs_pathbased_disjoint,
    }

    only = None
    for a in sys.argv[3:]:
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))

    cat = all_queries()
    out = {"k": k, "rows_base": n0, "queries": {}}
    for name in QUERIES + list(EXTRA):
        if only is not None and name not in only:
            continue
        fn = EXTRA[name] if name in EXTRA else cat[name].fn
        times = {}
        for label, sf_dir in (("base", base), (f"x{k}", scratch)):
            fn(spark, sf_dir).count()  # warm-up: codegen + broadcasts
            t0 = time.time()
            fn(spark, sf_dir).count()  # steady-state, the reported time
            times[label] = round(time.time() - t0, 2)
        times["ratio"] = round(times[f"x{k}"] / max(times["base"], 1e-9), 1)
        out["queries"][name] = times
        print(f"{name}: {times}", file=sys.stderr)
    for name, factory in MICRO.items():
        if only is not None and name not in only:
            continue
        times = {}
        for label, sf_dir in (("base", base), (f"x{k}", scratch)):
            run, cleanup = factory(spark, sf_dir)
            try:
                run()  # warm-up rep (replay-idempotent)
                t0 = time.time()
                run()
                times[label] = round(time.time() - t0, 2)
            finally:
                cleanup()
        times["ratio"] = round(times[f"x{k}"] / max(times["base"], 1e-9), 1)
        out["queries"][name] = times
        print(f"{name}: {times}", file=sys.stderr)
    print(json.dumps(out))
    shutil.rmtree(scratch, ignore_errors=True)
    # GC the bucketed layouts the replicated scratch just stranded
    # (fingerprint-keyed dbs are immutable; the scratch is gone, so
    # its layouts can never be served again) — keep the real fixtures'
    from metrics_service_spark.sources.bucketed import prune_stale_bucketed

    n = prune_stale_bucketed(
        spark, [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]
    )
    print(f"pruned {n} stale bucketed layout(s)", file=sys.stderr)
    for d in _silver_cache.values():
        shutil.rmtree(d, ignore_errors=True)
    for d in _prefixed_cache.values():
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
