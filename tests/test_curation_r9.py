"""Round-9 curation operators: two-stage PQ refine, prototypicality,
Gopher rule battery, shuffle+shard manifest.  The catalog oracle test
already differential-checks each against DuckDB; these pin the
operator-level CONTRACTS the oracle can't express (recall dominance,
permutation structure, flag conjunction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metrics_service_spark.sources.tables import load_table


def _recall(approx_rows, exact_rows):
    a = {(r.query_id, r.neighbor_id) for r in approx_rows}
    e = {(r.query_id, r.neighbor_id) for r in exact_rows}
    return len(a & e) / len(e)


def test_pq_rerank_recall_dominates_pq(spark, sf_dir):
    """Re-ranking an exact-scored shortlist can only keep or improve
    recall vs ranking by the ADC approximation directly — and the
    refined scores must BE the exact integer dots (subset of the
    brute-force frame)."""
    from metrics_service_spark.operators.similarity import (
        brute_force_topk,
        pq_rerank_topk_int,
        pq_topk_int,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = brute_force_topk(emb, queries, k=5).collect()
    plain = pq_topk_int(emb, queries, m=8, k_codes=16, iters=2, k=5).collect()
    refined = pq_rerank_topk_int(
        emb, queries, m=8, k_codes=16, iters=2, k_short=25, k=5
    ).collect()
    assert _recall(refined, exact) >= _recall(plain, exact)
    # every refined score is the true integer dot for that pair
    exact_dots = {
        (r.query_id, r.neighbor_id): r.dot_q
        for r in brute_force_topk(emb, queries, k=2000).collect()
    }
    for r in refined:
        assert exact_dots[(r.query_id, r.neighbor_id)] == r.score_x


def test_prototypicality_structure(spark, sf_dir):
    """Every vector appears exactly once; cell_rank is a 1..n_cell
    permutation within each cell; the rank order matches proto_q desc
    (ties by id asc)."""
    from metrics_service_spark.operators.similarity import prototypicality_int

    emb = load_table(spark, sf_dir, "embeddings")
    out = prototypicality_int(emb, n_cells=16)
    n = emb.count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
    bad = (
        out.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("cell_rank").alias("mx"),
            F.count_distinct("cell_rank").alias("dr"),
        )
        .filter((F.col("mx") != F.col("cnt")) | (F.col("dr") != F.col("cnt")))
        .count()
    )
    assert bad == 0
    rows = out.filter(F.col("cell") == 0).orderBy("cell_rank").collect()
    scores = [(r.proto_q, r.vec_id) for r in rows]
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))


def test_gopher_rules_keep_is_conjunction(spark, sf_dir):
    from metrics_service_spark.operators.text import gopher_rules

    docs = load_table(spark, sf_dir, "documents")
    out = gopher_rules(docs, "doc_id", "text")
    assert out.count() == docs.count()
    mism = out.filter(
        F.col("keep")
        != (
            F.col("flag_words")
            & F.col("flag_word_len")
            & F.col("flag_symbol")
            & F.col("flag_alpha")
            & F.col("flag_stop")
        )
    ).count()
    assert mism == 0
    # the battery must discriminate on this corpus (not all-pass/fail)
    kept = out.filter("keep").count()
    assert 0 < kept < out.count()


def test_shuffle_shard_is_permutation(spark, sf_dir):
    """Shards partition the corpus; pos is 1..|shard| within each
    shard; assignment is deterministic across invocations."""
    from metrics_service_spark.operators.sampling import shuffle_shard

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = shuffle_shard(docs, "doc_id", n_shards=16)
    n = docs.count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    assert out.filter((F.col("shard") < 0) | (F.col("shard") >= 16)).count() == 0
    bad = (
        out.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("pos").alias("mx"),
            F.count_distinct("pos").alias("dp"),
        )
        .filter((F.col("mx") != F.col("cnt")) | (F.col("dp") != F.col("cnt")))
        .count()
    )
    assert bad == 0
    again = shuffle_shard(docs, "doc_id", n_shards=16)
    assert out.exceptAll(again).count() == 0
    # a different salt re-rolls the assignment wholesale
    resalted = shuffle_shard(docs, "doc_id", n_shards=16, salt="shard2")
    assert out.exceptAll(resalted).count() > 0


def test_semdedup_hier_limit_anchor_and_structure(spark, sf_dir):
    """n_coarse=1 collapses the two-level assignment to the flat
    argmax (one group holding every cell), so the full hier output
    must be bit-identical to semantic_dedup_int — the lossless-limit
    anchor the IVF-PQ entry uses.  At the derived coarse count the
    output must still cover the corpus exactly once (no row silently
    dropped by group routing) and replay deterministically."""
    from metrics_service_spark.operators.similarity import (
        semantic_dedup_hier_int,
        semantic_dedup_int,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    flat = semantic_dedup_int(emb, n_cells=16, tau_num=3, tau_den=10)
    hier1 = semantic_dedup_hier_int(
        emb, n_cells=16, n_coarse=1, tau_num=3, tau_den=10
    )
    assert flat.exceptAll(hier1).count() == 0
    assert hier1.exceptAll(flat).count() == 0

    out = semantic_dedup_hier_int(emb, n_cells=16, tau_num=3, tau_den=10)
    n = emb.count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
    again = semantic_dedup_hier_int(emb, n_cells=16, tau_num=3, tau_den=10)
    assert out.exceptAll(again).count() == 0


def test_hard_negatives_labels_differ_and_rank_contiguous(spark, sf_dir):
    """Every mined pair crosses labels; per-src rank is a contiguous
    1..m prefix (m <= k); replay is deterministic."""
    from metrics_service_spark.operators.similarity import hard_negatives_int

    emb = load_table(spark, sf_dir, "embeddings")
    out = hard_negatives_int(emb, n_cells=16, k=3)
    assert out.filter(F.col("src_label") == F.col("neg_label")).count() == 0
    bad = (
        out.groupBy("src_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("rank").alias("mx"),
            F.count_distinct("rank").alias("dr"),
        )
        .filter(
            (F.col("mx") != F.col("cnt"))
            | (F.col("dr") != F.col("cnt"))
            | (F.col("cnt") > 3)
        )
        .count()
    )
    assert bad == 0
    again = hard_negatives_int(emb, n_cells=16, k=3)
    assert out.exceptAll(again).count() == 0


def test_hash_classifier_order_invariant_and_additive(spark, sf_dir):
    """Bag-of-words contract: the score ignores token order (reversed
    text scores identically) and kept is exactly score > 0."""
    from metrics_service_spark.operators.text import hash_classifier

    docs = load_table(spark, sf_dir, "documents")
    out = hash_classifier(docs, "doc_id", "text")
    assert out.filter(F.col("kept") != (F.col("score") > 0)).count() == 0
    rev = docs.select(
        "doc_id",
        F.concat_ws(" ", F.reverse(F.split(F.col("text"), " "))).alias(
            "text"
        ),
    )
    rout = hash_classifier(rev, "doc_id", "text")
    assert out.exceptAll(rout).count() == 0
    assert rout.exceptAll(out).count() == 0


def test_phash_banding_equals_allpairs_definition(spark, sf_dir):
    """The pigeonhole banding is recall-complete at max_hamming=3 <
    4 bands: the operator's pairs must EQUAL the brute-force all-pairs
    hamming <= 3 set (the definition), not approximate it."""
    from metrics_service_spark.operators.multimodal import (
        attach_payload,
        image_phash,
        phash_near_duplicates,
    )

    media = attach_payload(
        load_table(spark, sf_dir, "documents"),
        id_col="doc_id",
        text_col="text",
    )
    out = phash_near_duplicates(media, max_hamming=3, bands=4)
    out8 = phash_near_duplicates(media, max_hamming=7, bands=8)
    sigs = image_phash(media).localCheckpoint(eager=False)
    a = sigs.select(
        F.col("media_id").alias("id_a"),
        *[F.col(f"slice{i}").alias(f"a{i}") for i in range(4)],
    )
    b = sigs.select(
        F.col("media_id").alias("id_b"),
        *[F.col(f"slice{i}").alias(f"b{i}") for i in range(4)],
    )
    ham = sum(
        (
            F.bit_count(
                F.col(f"a{i}").bitwiseXOR(F.col(f"b{i}")).cast("long")
            )
            for i in range(4)
        ),
        F.lit(0),
    )
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= 7)
    )
    # set-compare (exceptAll over these two plans trips a Catalyst
    # binding bug — INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND)
    o = {(r.id_a, r.id_b, r.hamming) for r in out.collect()}
    bf = {
        (r.id_a, r.id_b, r.hamming)
        for r in brute.filter("hamming <= 3").collect()
    }
    assert o == bf
    o8 = {(r.id_a, r.id_b, r.hamming) for r in out8.collect()}
    bf8 = {
        (r.id_a, r.id_b, r.hamming)
        for r in brute.filter("hamming <= 7").collect()
    }
    assert o8 == bf8
    assert len(o8) > 0  # the corpus does contain near-dup payloads


def test_mm_dedup_clusters_structure(spark, sf_dir):
    """Every media item appears exactly once; both endpoints of every
    near-dup pair share a cluster; the canonical flag marks exactly
    the cluster minimum."""
    from metrics_service_spark.catalog import all_queries

    out = all_queries()["mm_dedup_clusters"].fn(spark, sf_dir)
    rows = {r.media_id: (r.cluster, r.is_canonical) for r in out.collect()}
    docs = load_table(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    from metrics_service_spark.operators.multimodal import (
        attach_payload,
        phash_near_duplicates,
    )

    media = attach_payload(docs, id_col="doc_id", text_col="text")
    for p in phash_near_duplicates(media, max_hamming=7).collect():
        assert rows[p.id_a][0] == rows[p.id_b][0]
    by_cluster = {}
    for mid, (cl, _) in rows.items():
        by_cluster.setdefault(cl, []).append(mid)
    for cl, members in by_cluster.items():
        assert cl == min(members)
        for mid in members:
            assert rows[mid][1] == (mid == cl)


def test_dsir_vote_null_target_and_discrimination(spark, sf_dir):
    """When the target IS the corpus every cross-multiplication ties,
    so all votes and scores are exactly 0 (the null anchor); with a
    real target slice the mean score of target-language docs must
    exceed the rest (the statistic discriminates)."""
    from metrics_service_spark.operators.text import dsir_vote

    docs = load_table(spark, sf_dir, "documents")
    null = dsir_vote(docs, "doc_id", "text", F.lit(True))
    assert null.filter(F.col("score") != 0).count() == 0
    assert null.filter(F.col("selected")).count() == 0

    out = dsir_vote(docs, "doc_id", "text", F.col("lang") == "en")
    j = out.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r.grp: r.m
        for r in j.groupBy((F.col("lang") == "en").alias("grp"))
        .agg(F.avg("score").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_emb_curation_pipeline_equals_stage_composition(spark, sf_dir):
    """The fused plan must equal running the stages separately:
    hier SemDeDup keep-list, then the per-cell md5 quota over
    survivors."""
    from metrics_service_spark.operators.similarity import (
        embedding_curation_pipeline,
        semantic_dedup_hier_int,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    fused = embedding_curation_pipeline(
        emb, n_cells=16, tau_num=3, tau_den=10, per_cell=5
    )
    verdict = semantic_dedup_hier_int(emb, n_cells=16, tau_num=3, tau_den=10)
    kept = verdict.filter(F.col("kept")).select("vec_id", "cell")
    w = (
        F.row_number()
        .over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.partitionBy("cell")
            .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        )
        .alias("rk")
    )
    manual = (
        kept.select("vec_id", "cell", w)
        .filter(F.col("rk") <= 5)
        .select("vec_id", "cell", F.col("rk").cast("int").alias("rk"))
    )
    a = {tuple(r) for r in fused.collect()}
    b = {tuple(r) for r in manual.collect()}
    assert a == b and len(a) > 0


def test_hier_assign_matches_python_replay_under_ties(spark, sf_dir):
    """Differential check of the two-level rule against a pure-Python
    replay on an adversarially tie-heavy corpus (coordinates from a
    tiny integer set, so coarse AND fine argmax ties are frequent):
    every tie must resolve to the lowest group/cell index on both
    sides."""
    import hashlib
    import math

    from metrics_service_spark.operators.similarity import hier_assign_int

    n, dim, n_cells = 60, 8, 12
    vals = [-0.002, -0.001, 0.0, 0.001, 0.002]
    vecs = {
        i: [vals[(i * 7 + d * 3) % 5] for d in range(dim)] for i in range(n)
    }
    df = spark.createDataFrame(
        [(i, vecs[i]) for i in range(n)], "vec_id long, embedding array<float>"
    )
    out = {
        r["__vid"]: r["cell"]
        for r in hier_assign_int(df, n_cells=n_cells)
        .select("__vid", "cell")
        .collect()
    }

    q = {i: [round(x * 1000) for x in vecs[i]] for i in range(n)}
    order = sorted(range(n), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cvecs = [q[i] for i in order[:n_cells]]
    g = math.ceil(math.sqrt(len(cvecs)))
    coarse = cvecs[:g]

    def argmax_first(dots):
        best = max(dots)
        return dots.index(best)

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    cell_grp = [argmax_first([dot(cv, gv) for gv in coarse]) for cv in cvecs]
    active = sorted(set(cell_grp))
    expect = {}
    for i in range(n):
        gp = active[argmax_first([dot(q[i], coarse[a]) for a in active])]
        members = [j for j in range(len(cvecs)) if cell_grp[j] == gp]
        expect[i] = members[argmax_first([dot(q[i], cvecs[j]) for j in members])]
    assert out == expect


def test_proto_prune_drops_exactly_floor_tenth(spark, sf_dir):
    """Per cell, the dropped set is exactly the floor(n/10)
    most-prototypical ranks — no off-by-one on the integer rule."""
    from metrics_service_spark.catalog import all_queries

    out = all_queries()["emb_proto_prune"].fn(spark, sf_dir)
    rows = out.collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    for cell, members in by_cell.items():
        n = len(members)
        dropped = {r.cell_rank for r in members if not r.kept}
        assert dropped == set(range(1, n // 10 + 1)), (cell, n)


def test_knn_hubness_degree_conservation(spark, sf_dir):
    """Sum of in-degrees equals the edge count of the graph; every
    corpus vector appears exactly once; the hub flag matches the
    2k threshold."""
    from metrics_service_spark.catalog import all_queries

    cat = all_queries()
    out = cat["emb_knn_hubness"].fn(spark, sf_dir).collect()
    g_edges = cat["emb_knn_graph"].fn(spark, sf_dir).count()
    emb_n = load_table(spark, sf_dir, "embeddings").count()
    assert len(out) == emb_n
    assert sum(r.in_degree for r in out) == g_edges
    for r in out:
        assert r.is_hub == (r.in_degree >= 6)
