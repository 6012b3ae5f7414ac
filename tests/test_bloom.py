"""Bloom-filter semi-join: structural guarantees (no false negatives,
bounded false-positive rate at design load) and end-to-end equality
with the plain semi-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from metrics_service_spark.operators.bloom import (
    bloom_contains,
    bloom_semi_join,
    build_bloom,
)
from metrics_service_spark.sources.tables import load_table

M = 1 << 16
K = 5


def test_no_false_negatives_and_fp_bounded(spark):
    # build over 1000 keys, probe 10x disjoint keys: every member must
    # pass; at kn/m ~= 0.076 the analytic FP is ~2e-6, so even 100
    # false positives out of 10k would signal a broken hash family
    dim = spark.range(1000).select(F.col("id").alias("k"))
    words = build_bloom(dim, "k", m_bits=M, k=K)
    assert len(words) == M // 64
    members = dim.filter(~bloom_contains(F.col("k"), words, m_bits=M, k=K)).count()
    assert members == 0
    outside = (
        spark.range(1_000_000, 1_010_000)
        .select(F.col("id").alias("k"))
        .filter(bloom_contains(F.col("k"), words, m_bits=M, k=K))
        .count()
    )
    assert outside <= 100, outside


def test_semi_join_equals_plain_semi_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    got = sorted(
        (r.l_orderkey, r.l_linenumber)
        for r in bloom_semi_join(
            li, orders, "l_orderkey", "o_orderkey", m_bits=M, k=K
        )
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    want = sorted(
        (r.l_orderkey, r.l_linenumber)
        for r in li.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
            "l_orderkey",
            "left_semi",
        )
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    assert got == want and len(got) > 0


def test_prune_happens_before_join(spark, sf_dir):
    # the physical plan must show the bloom probe (variable-amount
    # shiftleft over the inlined word array) as a Filter in the fact
    # scan stage — i.e. fact rows are eliminated before the exchange
    from metrics_service_spark.catalog import all_queries

    spark.catalog.clearCache()
    df = all_queries()["bloom_semi_lineitem"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "shiftleft" in plan
    assert "CartesianProduct" not in plan
    # the probe filter must sit below (be planned as part of) the scan
    # side, not after the join: find the first Join operator line and
    # assert a shiftleft Filter appears later in the tree dump (child
    # operators print after their parents)
    first_join = min(
        i for i, ln in enumerate(plan.splitlines()) if "Join" in ln
    )
    assert any(
        "shiftleft" in ln for ln in plan.splitlines()[first_join:]
    ), "bloom probe filter not under the join"
