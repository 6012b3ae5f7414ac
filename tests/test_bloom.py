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


def _walk(jnode):
    """Yield every SparkPlan node of a JVM plan tree (pre-order),
    descending through the AQE wrapper's current physical plan."""
    yield jnode
    if jnode.nodeName() == "AdaptiveSparkPlan":
        yield from _walk(jnode.executedPlan())
        return
    ch = jnode.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def test_prune_happens_before_join(spark, sf_dir):
    # the physical plan must show the bloom probe (variable-amount
    # shiftleft over the inlined word array) as a Filter INSIDE the
    # fact-scan subtree BELOW the semi-join — i.e. fact rows are
    # eliminated before the exchange.  Checked structurally on the JVM
    # plan tree (a line-order scan of the string dump also matches a
    # probe applied ABOVE the join, which is exactly the regression
    # this test exists to catch).
    from metrics_service_spark.catalog import all_queries

    spark.catalog.clearCache()
    df = all_queries()["bloom_semi_lineitem"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan()
    assert "CartesianProduct" not in plan.toString()
    joins = [
        n
        for n in _walk(plan)
        if "Join" in n.nodeName() and "semi" in n.simpleString(10_000).lower()
    ]
    assert joins, "no semi-join in the physical plan"

    def is_probe(n):
        return n.nodeName() == "Filter" and "shiftleft" in n.simpleString(10_000)

    under_ids = {
        n.id()
        for j in joins
        for n in _walk(j)
        if n.id() != j.id() and is_probe(n)
    }
    assert under_ids, "bloom probe Filter not in the semi-join's subtree"
    # and the probe must NOT also appear above the join (redundant
    # re-evaluation after the shuffle would be a planning regression)
    above = [
        n for n in _walk(plan) if is_probe(n) and n.id() not in under_ids
    ]
    assert not above, "bloom probe re-applied above the join"


def test_joined_probe_equals_literal_probe(spark, sf_dir):
    """Above INLINE_LIMIT_BITS the probe switches from the inlined
    literal filter to k broadcast word-table joins (the jobless
    statistics-bound sizing can legitimately oversize m) — both shapes
    must admit the identical survivor set, and the joined path must be
    genuine broadcast hash joins with no giant array literal."""
    from metrics_service_spark.operators.bloom import (
        INLINE_LIMIT_BITS,
        _bloom_prune_join,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    big_m = INLINE_LIMIT_BITS << 2
    joined = _bloom_prune_join(li, orders, "l_orderkey", "o_orderkey", big_m, 3)
    words = build_bloom(orders, "o_orderkey", m_bits=big_m, k=3)
    literal = li.filter(
        bloom_contains(F.col("l_orderkey"), words, m_bits=big_m, k=3)
    )
    got = sorted(r.l_orderkey for r in joined.select("l_orderkey").collect())
    want = sorted(r.l_orderkey for r in literal.select("l_orderkey").collect())
    assert got == want and len(got) > 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # end-to-end: the big-m semi join still equals the plain semi join
    a = bloom_semi_join(
        li, orders, "l_orderkey", "o_orderkey", m_bits=big_m, k=3
    )
    b = li.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
        "l_orderkey",
        "left_semi",
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
