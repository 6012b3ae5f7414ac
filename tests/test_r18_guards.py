"""r18 optimization guards: star-forest convergence detection and the
degree-carried PageRank round shape keep their contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metrics_service_spark.operators.closure import (
    connected_components_star,
    pagerank_int,
    pagerank_int_conserving,
)


def test_star_cc_detects_converged_input_without_a_round(spark):
    # a min-centered star forest is the star operators' fixpoint: the
    # r18 star-forest check must recognize it at round 0, so even
    # max_iters=0 yields the labeling instead of raising (the r17
    # shape needed one full confirming round to see the fixpoint)
    edges = [(0, 5), (0, 7), (0, 9), (20, 21), (20, 23)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.component
        for r in connected_components_star(df, max_iters=0).collect()
    }
    assert got == {0: 0, 5: 0, 7: 0, 9: 0, 20: 20, 21: 20, 23: 20}


def test_star_cc_detection_is_not_premature_on_paths(spark):
    # a path is NOT a star forest mid-contraction: the detection must
    # not fire early, so an exhausted round budget still raises
    edges = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="still\\s+moving"):
        connected_components_star(df, max_iters=1).collect()


def test_pagerank_true_dangling_node_conserving_vs_plain(spark):
    # node 9 has NO out-edges (true dangling): the plain twin leaks
    # its mass, the conserving twin redistributes D div N each round —
    # the r18 degree-carried round shape must preserve both contracts
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 9), (2, 9)], "src_id long, dst_id long"
    )
    plain = {r["node"]: r["pr_q"] for r in pagerank_int(edges, iters=3).collect()}
    cons = {
        r["node"]: r["pr_q"]
        for r in pagerank_int_conserving(edges, iters=3).collect()
    }
    assert set(plain) == set(cons) == {1, 2, 9}
    # conserving mass total stays closer to scale than the leaking twin
    assert sum(cons.values()) > sum(plain.values())
    # replay round 1 by hand for the conserving form:
    # p0 = scale div 3; D = p0(9); contribs: 1 gets p0(2) div 2 + D-share,
    # base = 3*scale div (20*3)
    scale = 10**12
    p0 = scale // 3
    base = (3 * scale) // (20 * 3)
    d_share = p0 // 3
    p1_node9 = base + (17 * (p0 // 2 + p0 // 2 + d_share)) // 20
    # after 3 rounds values differ, but round-1 node 9 value is
    # recomputable through the same arithmetic on intermediate masses;
    # assert the 1-round output directly instead
    one = {
        r["node"]: r["pr_q"]
        for r in pagerank_int_conserving(edges, iters=1).collect()
    }
    assert one[9] == p1_node9
    assert one[1] == base + (17 * (p0 // 2 + d_share)) // 20
    assert one[2] == base + (17 * (p0 // 2 + d_share)) // 20


def test_minhash_md5_rejects_n_with_pretokenized_shingles(spark):
    # ADVICE r17: n is ignored on the pre-tokenized path — passing a
    # non-default n with `shingles` must fail loud, not silently
    # produce signatures tokenized at a different n
    from metrics_service_spark.operators.dedup import (
        minhash_signatures_md5,
        shingle_frame,
    )

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "b c d e")], "doc_id long, text string"
    )
    sh = shingle_frame(df, "doc_id", "text", n=3)
    with pytest.raises(ValueError, match="ignored when `shingles`"):
        minhash_signatures_md5(df, "doc_id", "text", n=4, shingles=sh)
