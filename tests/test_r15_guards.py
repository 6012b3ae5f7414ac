"""r15 plan-quality guards: the production BPE apply path must stay
training-free, and the driver-local-finish trainer's Spark-job count
must stay independent of n_merges (the test_r10..r14_guards pattern)."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bpe_apply_launches_no_training_jobs(spark):
    """Applying a stored merge list is plan construction ONLY: zero
    Spark jobs (no per-round argmax collect, no checkpoint below the
    checkpoint_every boundary) — the contract that makes apply-many
    affordable at production merge counts."""
    from metrics_service_spark.operators.bpe import bpe_apply

    docs = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "banana")], "doc_id int, text string"
    )
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    out = bpe_apply(docs, merges=[("a", "b"), ("ab", "c")])
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before)
    # and the built plan is join+agg over the replayed vocab: no pair
    # counting, no argmax anywhere
    plan = _executed(out)
    assert "pair_count" not in plan
    assert "TakeOrdered" not in plan


def test_bpe_apply_plan_is_vocab_join_plus_agg(spark):
    """The corpus side of apply touches tokens exactly once: one join
    against the vocab-sized unit table, one per-doc aggregate — never
    a per-merge corpus scan.  Gate: the number of Exchanges must not
    grow with the merge count (merges are chained pure projections)."""
    from metrics_service_spark.operators.bpe import bpe_apply

    docs = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "banana")], "doc_id int, text string"
    )
    plan2 = _executed(bpe_apply(docs, merges=[("a", "b"), ("a", "n")]))
    plan5 = _executed(
        bpe_apply(
            docs,
            merges=[("a", "b"), ("a", "n"), ("an", "an"), ("b", "anan"), ("ab", "c")],
        )
    )
    assert plan2.count("Exchange") == plan5.count("Exchange")


def test_bpe_local_finish_job_count_independent_of_merges(spark):
    """The driver-local finish runs the ONE corpus-sized aggregation
    and collects the vocab — total Spark jobs must be the same at 2
    and at 6 merges (vs _train's per-merge argmax + checkpoint jobs)."""
    from metrics_service_spark.operators.bpe import bpe_train_local_finish

    docs = spark.createDataFrame(
        [("ab ab ab abc",), ("banana bandana cabbage",), ("ba abab dada",)],
        "text string",
    )
    tracker = spark.sparkContext.statusTracker()

    def jobs_for(n: int) -> int:
        before = len(tracker.getJobIdsForGroup(None))
        bpe_train_local_finish(docs, "text", n_merges=n)
        return len(tracker.getJobIdsForGroup(None)) - before

    assert jobs_for(2) == jobs_for(6)


def test_bpe_apply_pushes_column_pruning_to_scan(spark, sf_dir):
    """Off the parquet documents table, BOTH scans of the apply plan
    (vocab build + token stream) must read only the columns they use —
    text for the vocab, doc_id+text for the counts; never the full
    documents row."""
    from metrics_service_spark.operators.bpe import bpe_apply
    from metrics_service_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = _formatted(bpe_apply(docs, merges=[("a", "b")]))
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "lang" not in line and "source" not in line, line


def test_pagerank_conserving_no_driver_collect_in_plan_build(spark):
    """Like the plain twin (test_r14_guards): the only build-time jobs
    are the lazy-checkpoint materializations, which are built ONCE —
    tripling `iters` must add zero build-time jobs (a per-round
    collect/probe would scale with iters); the dangling mass enters as
    a broadcast one-row aggregate, never a collected scalar."""
    from metrics_service_spark.operators.closure import (
        pagerank_int_conserving,
    )

    tracker = spark.sparkContext.statusTracker()
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3)], "src_id long, dst_id long"
    )

    def new_jobs_past(mark):
        return sum(1 for j in tracker.getJobIdsForGroup(None) if j > mark)

    def mark():
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else -1

    m0 = mark()
    ranks = pagerank_int_conserving(edges, iters=1)
    n1 = new_jobs_past(m0)
    m1 = mark()
    ranks = pagerank_int_conserving(edges, iters=3)
    n3 = new_jobs_past(m1)
    assert n3 == n1
    assert "CollectLimit" not in _executed(ranks)
