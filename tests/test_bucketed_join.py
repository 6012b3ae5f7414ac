"""Bucketed co-located join: the storage-side shuffle lever, gated.

Writes orders and lineitem bucketed by the order key into a /tmp
database (managed-table LOCATION — bucketBy has no path-based form),
then proves the fact⋈fact join plans with ZERO exchanges and matches
the plain path-based join's result exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metrics_service_spark.sources.bucketed import cojoin_ready, write_bucketed
from metrics_service_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_db(spark, sf_dir, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketed_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{loc}'")
    write_bucketed(
        load_table(spark, sf_dir, "orders"),
        "bktest.orders_b",
        bucket_col="o_orderkey",
        n_buckets=8,
        sort_cols=("o_orderkey",),
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"),
        "bktest.lineitem_b",
        bucket_col="l_orderkey",
        n_buckets=8,
        sort_cols=("l_orderkey",),
    )
    yield "bktest"
    spark.sql("DROP DATABASE bktest CASCADE")


def _joined(spark, bucketed_db):
    o, li = cojoin_ready(spark, "bktest.orders_b", "bktest.lineitem_b")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("string")
            .alias("qty"),
        )
    )


def test_cojoined_plan_has_no_exchange(spark, sf_dir, bucketed_db):
    # the join itself must be exchange-free on BOTH sides; the only
    # shuffle in the whole query is the final 1-key groupBy
    o, li = cojoin_ready(spark, "bktest.orders_b", "bktest.lineitem_b")
    # at the test SF the planner would broadcast orders (also
    # exchange-free, but not the layout being gated); the merge hint
    # pins the sort-merge strategy the bucketed layout exists for
    join_plan = (
        o.hint("merge")
        .join(li, o.o_orderkey == li.l_orderkey)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in join_plan
    assert "Exchange" not in join_plan, join_plan
    # bucketed scans expose the bucket count
    assert "8 out of 8" in join_plan or "SelectedBucketsCount" in join_plan, (
        join_plan
    )


def test_cojoined_result_matches_pathbased_join(spark, sf_dir, bucketed_db):
    got = {tuple(r) for r in _joined(spark, bucketed_db).collect()}
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    expect = {
        tuple(r)
        for r in (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("string")
                .alias("qty"),
            )
        ).collect()
    }
    assert got == expect


def test_catalog_entry_plan_and_build_once(spark, sf_dir):
    # the catalog entry (r12): the join subtree must be exchange-free —
    # the whole query's ONLY shuffle is the final two-key rollup — and
    # the fingerprint-keyed build must be idempotent (the second call
    # is a pure catalog read: no new tables, identical results)
    import os

    from metrics_service_spark.catalog.gold import q_gold_star_bucketed
    from metrics_service_spark.sources.bucketed import (
        _fixture_fingerprint,
        ensure_bucketed_pair,
    )

    df = q_gold_star_bucketed(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange") == 1, plan

    paths = [
        os.path.join(sf_dir, f"{t}.parquet") for t in ("orders", "lineitem")
    ]
    db = f"bkt_{_fixture_fingerprint(paths)}"
    assert spark.catalog.tableExists(f"{db}.orders_b")
    assert spark.catalog.tableExists(f"{db}.lineitem_b")
    before = os.path.getmtime(
        os.path.join(spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), f"{db}.db")
    )
    o2, li2 = ensure_bucketed_pair(spark, sf_dir)
    after = os.path.getmtime(
        os.path.join(spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), f"{db}.db")
    )
    assert before == after  # no rewrite on the second call
    assert o2.count() > 0 and li2.count() > 0


def test_bucket_pruned_point_lookup(spark, sf_dir):
    # the layout's second dividend: an equality filter on the bucket
    # key scans ONLY that key's bucket (SelectedBucketsCount 1 out of
    # N), not the whole table — at cluster scale this is the
    # point-lookup path that needs no secondary index
    from pyspark.sql import functions as F

    from metrics_service_spark.sources.bucketed import ensure_bucketed_pair

    o, _ = ensure_bucketed_pair(spark, sf_dir)
    key = o.select(F.min("o_orderkey")).first()[0]
    # autoBucketedScan (default on) downgrades to a plain scan when no
    # operator needs the bucket distribution — which also forfeits
    # bucket PRUNING; a point-lookup path pins it off (the cluster
    # knob this test documents)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        plan = (
            o.filter(F.col("o_orderkey") == key)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    assert "SelectedBucketsCount: 1 out of" in plan, plan


def test_metrics_star_bucketed_plan_is_exchange_free(spark, sf_dir):
    # r13: the PRODUCT refresh on the layout — the 9-key grain groupBy
    # over the pid-bucketed eventlog must plan with ZERO exchanges
    # (HashPartitioning(pid) is a subset of the grain keys and alias
    # propagation carries pid→dataset_id through the projection);
    # result must equal the path-based star bit-for-bit
    from metrics_service_spark.catalog.gold import (
        q_metrics_star,
        q_metrics_star_bucketed,
    )

    df = q_metrics_star_bucketed(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan

    got = {tuple(r) for r in df.collect()}
    expect = {tuple(r) for r in q_metrics_star(spark, sf_dir).collect()}
    assert got == expect


def test_fuzzy_prefix_bucketed_plan_and_result(spark, sf_dir):
    # r14: the LINKAGE family on the layout — fuzzy_prefix_pairs' two
    # wide ops (cell count + block self-join, both keyed (lang, bk))
    # must plan scan-local from the composite-bucketed silver table.
    # At test SF the planner would broadcast the self-join (hiding the
    # layout), so pin the 100 TB shape: with auto-broadcast off, the
    # self-join must be a SortMergeJoin with NO shuffle exchange
    # anywhere — the only Exchanges are the operator's own EXPLICIT
    # broadcast of the (tiny, post-aggregate) kept-cells frame
    from metrics_service_spark.catalog.llm import (
        q_doc_fuzzy_prefix_bucketed,
        q_doc_fuzzy_prefix_pairs,
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q_doc_fuzzy_prefix_bucketed(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SelectedBucketsCount: 32 out of 32" in plan, plan

    got = {tuple(r) for r in q_doc_fuzzy_prefix_bucketed(spark, sf_dir).collect()}
    expect = {tuple(r) for r in q_doc_fuzzy_prefix_pairs(spark, sf_dir).collect()}
    assert got == expect


def test_prune_stale_bucketed_drops_only_dead_layouts(spark, sf_dir):
    # GC contract: a db whose fingerprint matches a CURRENT fixture
    # survives; a stranded bkt_* db (orphaned by fixture regeneration
    # or a deleted probe scratch) is dropped with its files
    from metrics_service_spark.sources.bucketed import (
        ensure_bucketed_pair,
        prune_stale_bucketed,
    )

    ensure_bucketed_pair(spark, sf_dir)
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt_deadbeef0000")
    keep = [sf_dir] + [
        f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
    ]
    dropped = prune_stale_bucketed(spark, keep)
    assert dropped >= 1
    names = {r[0] for r in spark.sql("SHOW DATABASES").collect()}
    assert "bkt_deadbeef0000" not in names
    # the live pair still serves without a rebuild
    o, li = ensure_bucketed_pair(spark, sf_dir)
    assert o.count() > 0 and li.count() > 0
