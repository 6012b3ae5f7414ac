"""Streaming linkage admission gate (streaming/linkage_gate.py):
replay idempotence, batch-equivalence against the oracle-checked
fuzzy_prefix_admit operator, bootstrap/pruning behavior, and the
within-batch drop rule."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from metrics_service_spark.operators.dedup import fuzzy_prefix_admit
from metrics_service_spark.sources.merge_table import read_table
from metrics_service_spark.streaming.linkage_gate import admit_batch_linkage

BASE = "the quick brown fox jumps over the lazy dog again and again ok"
NEAR = "the quick brown fox jumps over the lazy dog again and again !!"
FAR = "zzzz completely different content that shares no prefix at all"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="linkgate_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _admit(spark, tdir, batch, **kw):
    kw.setdefault("block_cols", ["lang"])
    kw.setdefault("max_dist", 6)
    return admit_batch_linkage(spark, tdir, batch, **kw)


def test_bootstrap_and_cross_batch_rejection(spark, tdir):
    b1 = _docs(spark, [(1, "en", BASE), (2, "en", FAR)])
    v1 = {r["doc_id"]: r["kept"] for r in _admit(spark, tdir, b1).collect()}
    assert v1 == {1: True, 2: True}  # empty index admits everything
    b2 = _docs(spark, [(3, "en", NEAR), (4, "en", "unrelated fresh text here x")])
    v2 = {r["doc_id"]: r["kept"] for r in _admit(spark, tdir, b2).collect()}
    assert v2 == {3: False, 4: True}  # 3 near-matches stored doc 1
    stored = {r["doc_id"] for r in read_table(spark, tdir).collect()}
    assert stored == {1, 2, 4}


def test_within_batch_drop_larger_id(spark, tdir):
    batch = _docs(spark, [(7, "en", BASE), (9, "en", NEAR), (8, "en", FAR)])
    v = {r["doc_id"]: r["kept"] for r in _admit(spark, tdir, batch).collect()}
    # 9 is within max_dist of the earlier-surviving 7; 8 is unrelated
    assert v == {7: True, 9: False, 8: True}


def test_replay_idempotent(spark, tdir):
    b1 = _docs(spark, [(1, "en", BASE), (2, "en", FAR)])
    _admit(spark, tdir, b1)
    b2 = _docs(spark, [(3, "en", NEAR), (4, "de", BASE)])
    v_first = {r["doc_id"]: r["kept"] for r in _admit(spark, tdir, b2).collect()}
    stored_first = sorted(
        (r["doc_id"], r["pb"]) for r in read_table(spark, tdir).collect()
    )
    # replay the SAME delivered batch: verdicts identical, state
    # unchanged (admitted ids merge onto their own keys, a stored doc
    # never self-rejects, no duplicate keys appear)
    for _ in range(2):
        v_replay = {
            r["doc_id"]: r["kept"] for r in _admit(spark, tdir, b2).collect()
        }
        assert v_replay == v_first
        stored = sorted(
            (r["doc_id"], r["pb"]) for r in read_table(spark, tdir).collect()
        )
        assert stored == stored_first
    ids = [r["doc_id"] for r in read_table(spark, tdir).collect()]
    assert len(ids) == len(set(ids))


def test_blocks_respect_block_cols(spark, tdir):
    _admit(spark, tdir, _docs(spark, [(1, "en", BASE)]))
    # same text, different lang -> different block -> admitted
    v = {
        r["doc_id"]: r["kept"]
        for r in _admit(spark, tdir, _docs(spark, [(2, "de", BASE)])).collect()
    }
    assert v == {2: True}


def test_batch_equivalence_with_fuzzy_prefix_admit(spark, sf_dir, tdir):
    """Gate verdicts == the oracle-checked batch operator's verdicts:
    bootstrap the gate with the corpus split doc_linkage_incremental
    uses, admit the batch, and compare against fuzzy_prefix_admit run
    on the same (batch, corpus) frames — same blocking, scoring, and
    index-cell cap.  The batch side must first drop its own
    within-batch near-dups (the operator scores batch-vs-corpus only)."""
    from metrics_service_spark.sources.merge_table import current_version
    from metrics_service_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    admit_batch_linkage(
        spark, tdir, corpus, block_cols=["lang"], max_dist=48, max_cell=64
    )
    v_boot = current_version(tdir)
    gate = {
        r["doc_id"]: r["kept"]
        for r in admit_batch_linkage(
            spark, tdir, batch, block_cols=["lang"], max_dist=48, max_cell=64
        ).collect()
    }
    # the operator's cross-matches on the corpus that actually got
    # STORED at bootstrap (version-pinned: the gate's own batch commit
    # must not leak into the reference index, or every admitted doc
    # would dist-0 match itself) — the gate deduped the bootstrap
    # within-batch, exactly as fuzzy_prefix_pairs' drop-larger-id
    # clusters do
    stored = read_table(spark, tdir, version=v_boot).select(
        F.col("doc_id"), F.col("lang"), F.col("pfx").alias("text")
    )
    cross = {
        r["new_id"]
        for r in fuzzy_prefix_admit(
            batch,
            stored,
            "doc_id",
            "text",
            max_dist=48,
            block_cols=["lang"],
            max_cell=64,
        ).collect()
    }
    # within-batch rejections (smaller-id survivor within max_dist)
    from metrics_service_spark.operators.dedup import fuzzy_prefix_pairs

    surv = batch.join(
        spark.createDataFrame(
            [(i,) for i in cross], "doc_id long"
        ),
        "doc_id",
        "left_anti",
    )
    within = {
        max(r["id_a"], r["id_b"])
        for r in fuzzy_prefix_pairs(
            surv, "doc_id", "text", max_dist=48, block_cols=["lang"], max_cell=64
        ).collect()
    }
    expected_rejected = cross | within
    actual_rejected = {d for d, k in gate.items() if not k}
    assert actual_rejected == expected_rejected
