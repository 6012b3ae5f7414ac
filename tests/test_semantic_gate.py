"""Streaming semantic admission gate: bootstrap, vs-index rejection,
within-batch rejection, replay idempotence, manifest-pruned reads, and
the exactly-once streaming fold."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from metrics_service_spark.sources.merge_table import current_version, read_table
from metrics_service_spark.streaming.semantic_gate import (
    _CENTROID_FILE,
    admit_batch,
    incremental_semantic_gate_refresh,
)

SCHEMA = "vec_id long, embedding array<float>"

V1 = [1.0, 0.0, 0.0, 0.0]
V2 = [0.0, 1.0, 0.0, 0.0]
V3 = [0.99, 0.01, 0.0, 0.0]  # near-dup of V1 (cos ~ 0.9999)
V4 = [0.0, 0.0, 1.0, 0.0]


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _kept(df):
    return {r.vec_id: r.kept for r in df.collect()}


def test_bootstrap_then_reject_near_dup(spark, tmp_path):
    tdir = str(tmp_path / "semidx")
    got = _kept(admit_batch(spark, tdir, _batch(spark, [(1, V1), (2, V2)]), n_cells=2))
    assert got == {1: True, 2: True}
    assert os.path.exists(os.path.join(tdir, _CENTROID_FILE))
    v_after_1 = current_version(tdir)
    assert v_after_1 >= 0

    got2 = _kept(
        admit_batch(spark, tdir, _batch(spark, [(3, V3), (4, V4)]), n_cells=2)
    )
    assert got2 == {3: False, 4: True}
    stored = {r.vec_id for r in read_table(spark, tdir).collect()}
    assert stored == {1, 2, 4}


def test_within_batch_drop_rule(spark, tmp_path):
    tdir = str(tmp_path / "semidx")
    got = _kept(
        admit_batch(spark, tdir, _batch(spark, [(10, V1), (11, V1), (12, V2)]), n_cells=2)
    )
    # 11 duplicates 10 within the batch -> smaller id survives
    assert got == {10: True, 11: False, 12: True}


def test_replay_converges(spark, tmp_path):
    tdir = str(tmp_path / "semidx")
    admit_batch(spark, tdir, _batch(spark, [(1, V1), (2, V2)]), n_cells=2)
    b2 = [(3, V3), (4, V4)]
    first = _kept(admit_batch(spark, tdir, _batch(spark, b2), n_cells=2))
    replay = _kept(admit_batch(spark, tdir, _batch(spark, b2), n_cells=2))
    # same verdicts on redelivery: 4 merges onto its own key (self-id
    # excluded from the index match), 3 stays rejected
    assert first == replay == {3: False, 4: True}
    rows = read_table(spark, tdir).collect()
    assert sorted(r.vec_id for r in rows) == [1, 2, 4]  # no duplicate keys


def test_centroids_pinned_across_batches(spark, tmp_path):
    tdir = str(tmp_path / "semidx")
    admit_batch(spark, tdir, _batch(spark, [(1, V1), (2, V2)]), n_cells=2)
    with open(os.path.join(tdir, _CENTROID_FILE)) as f:
        before = json.load(f)
    admit_batch(spark, tdir, _batch(spark, [(7, V4)]), n_cells=2)
    with open(os.path.join(tdir, _CENTROID_FILE)) as f:
        after = json.load(f)
    assert before == after


def test_streaming_fold_matches_sequential(spark, tmp_path):
    src = str(tmp_path / "emb_stream")
    _batch(spark, [(1, V1), (2, V2)]).coalesce(1).write.mode("append").parquet(src)
    _batch(spark, [(3, V3), (4, V4)]).coalesce(1).write.mode("append").parquet(src)

    tdir = str(tmp_path / "semidx_stream")
    ckpt = str(tmp_path / "ckpt")
    q = incremental_semantic_gate_refresh(spark, src, tdir, ckpt, n_cells=2)
    q.awaitTermination(120)
    stored = {r.vec_id for r in read_table(spark, tdir).collect()}
    # 3 near-dups 1 regardless of whether the files land in one or two
    # micro-batches (1 < 3, so the within-batch rule agrees with the
    # vs-index rule)
    assert stored == {1, 2, 4}

    # second run with the same checkpoint: offsets committed, no new
    # files -> no further commits
    v = current_version(tdir)
    q2 = incremental_semantic_gate_refresh(spark, src, tdir, ckpt, n_cells=2)
    q2.awaitTermination(120)
    assert current_version(tdir) == v
