"""Manifest-committed parquet table (sources/merge_table): atomic
MERGE commits, snapshot isolation for concurrent readers, optimistic
concurrency, vacuum — the Delta/Iceberg semantics SURVEY §1 maps the
reference's versioned ES bulk upserts (es_eventlog_sync.py:485-547)
and transactional mat-view refreshes to."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from metrics_service_spark.plans.gold import metrics_star
from metrics_service_spark.sources.eventlog import eventlog_view
from metrics_service_spark.sources.merge_table import (
    ConflictError,
    current_version,
    merge_table,
    overwrite_table,
    read_table,
    vacuum,
)
from metrics_service_spark.sources.tables import load_table
from metrics_service_spark.streaming.gold_refresh import incremental_star_refresh


def _state(spark, n, tag):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("part"),
        F.lit(tag).alias("v"),
    )


def _rows(df):
    return sorted((r["k"], r["part"], r["v"]) for r in df.collect())


def test_overwrite_and_read_roundtrip(spark, tmp_path):
    tdir = str(tmp_path / "t")
    v = overwrite_table(_state(spark, 10, "a"), tdir, partition_cols=["part"])
    assert v == 0
    assert _rows(read_table(spark, tdir)) == _rows(_state(spark, 10, "a"))


def test_merge_upserts_and_carries_untouched_files(spark, tmp_path):
    tdir = str(tmp_path / "t")
    overwrite_table(_state(spark, 9, "a"), tdir, partition_cols=["part"])
    # update keys 0,3 (both part=0) + insert key 90 (part=0): only the
    # part=0 files may be rewritten
    updates = _state(spark, 9, "b").filter(F.col("k").isin(0, 3)).unionByName(
        spark.createDataFrame([(90, 0, "b")], "k long, part int, v string")
    )
    merge_table(spark, tdir, updates, key_cols=["k"], partition_cols=["part"])

    got = _rows(read_table(spark, tdir))
    want = sorted(
        [(k, int(k % 3), "b" if k in (0, 3) else "a") for k in range(9)]
        + [(90, 0, "b")]
    )
    assert got == want

    # untouched partitions (part=1,2) carry the SAME file paths across
    # versions — merge cost is proportional to touched partitions
    mdir = os.path.join(tdir, "_manifests")
    with open(os.path.join(mdir, "v0.json")) as fh:
        v0 = {e["path"] for e in json.load(fh)["files"] if e["partition"]["part"] != "0"}
    with open(os.path.join(mdir, "v1.json")) as fh:
        v1 = {e["path"] for e in json.load(fh)["files"] if e["partition"]["part"] != "0"}
    assert v0 == v1 and v0


def test_snapshot_isolation_for_concurrent_readers(spark, tmp_path):
    tdir = str(tmp_path / "t")
    overwrite_table(_state(spark, 6, "a"), tdir, partition_cols=["part"])
    snapshot = read_table(spark, tdir)  # resolved at v0
    merge_table(
        spark,
        tdir,
        _state(spark, 6, "b"),
        key_cols=["k"],
        partition_cols=["part"],
    )
    # the pre-commit reader still sees v0 in full; a fresh resolve sees v1
    assert _rows(snapshot) == _rows(_state(spark, 6, "a"))
    assert _rows(read_table(spark, tdir)) == _rows(_state(spark, 6, "b"))
    assert _rows(read_table(spark, tdir, version=0)) == _rows(_state(spark, 6, "a"))


def test_commit_conflict_raises(spark, tmp_path):
    from metrics_service_spark.sources.merge_table import _commit

    tdir = str(tmp_path / "t")
    overwrite_table(_state(spark, 3, "a"), tdir)
    # two committers computed rewrites against v0 and race on v1:
    # the first wins, the second must see ConflictError (not silently
    # clobber or skip to v2 — its rewrite is based on a stale snapshot)
    assert _commit(tdir, [], 1) == 1
    with pytest.raises(ConflictError):
        _commit(tdir, [], 1)


def test_vacuum_reclaims_only_unreferenced(spark, tmp_path):
    tdir = str(tmp_path / "t")
    overwrite_table(_state(spark, 6, "a"), tdir, partition_cols=["part"])
    merge_table(
        spark,
        tdir,
        _state(spark, 6, "b").filter(F.col("part") == 0),
        key_cols=["k"],
        partition_cols=["part"],
    )
    removed = vacuum(tdir)
    assert removed > 0  # the replaced part=0 files from v0
    # newest snapshot intact after vacuum
    want = sorted(
        (k, int(k % 3), "b" if k % 3 == 0 else "a") for k in range(6)
    )
    assert _rows(read_table(spark, tdir)) == want


def test_gold_refresh_manifest_format_converges(spark, sf_dir, tmp_path):
    ev = eventlog_view(load_table(spark, sf_dir, "events")).cache()
    # the regenerated fixtures span a single month; split by day so
    # the second batch is non-empty and re-touches the month partition
    jan = ev.filter(F.dayofmonth("dateLogged") <= 15)
    rest = ev.filter(F.dayofmonth("dateLogged") > 15)
    silver = str(tmp_path / "silver")
    star = str(tmp_path / "star")
    ckpt = str(tmp_path / "ckpt")

    key = [
        "dataset_id", "user_id", "repository", "award_number",
        "day", "month", "year", "country_code", "metrics_name",
    ]

    def rows(df):
        return sorted(
            tuple(r[c] for c in key + ["metrics_value"]) for r in df.collect()
        )

    jan.write.mode("append").parquet(silver)
    q = incremental_star_refresh(
        spark, silver, star, ckpt, table_format="manifest"
    )
    q.awaitTermination(120)
    assert rows(read_table(spark, star)) == rows(metrics_star(jan))
    v_after_b1 = current_version(star)

    # a reader resolved before batch 2 keeps its snapshot through the
    # concurrent refresh commit
    snapshot = read_table(spark, star)
    rest.write.mode("append").parquet(silver)
    q = incremental_star_refresh(
        spark, silver, star, ckpt, table_format="manifest"
    )
    q.awaitTermination(120)
    assert current_version(star) > v_after_b1
    assert rows(read_table(spark, star)) == rows(metrics_star(ev))
    assert rows(snapshot) == rows(metrics_star(jan))


def test_compact_bin_packs_fragmented_partitions(spark, tmp_path):
    from metrics_service_spark.sources.merge_table import compact_table

    tdir = str(tmp_path / "t")
    overwrite_table(_state(spark, 9, "a"), tdir, partition_cols=["part"])
    # two merges against part=0 accrete two extra file sets there
    for tag in ("b", "c"):
        merge_table(
            spark,
            tdir,
            _state(spark, 9, tag).filter(F.col("part") == 0),
            key_cols=["k"],
            partition_cols=["part"],
        )
    before = _rows(read_table(spark, tdir))

    v = compact_table(spark, tdir, partition_cols=["part"])
    assert v == current_version(tdir)
    entries = json.load(
        open(os.path.join(tdir, "_manifests", f"v{v}.json"))
    )["files"]
    per_part: dict[str, int] = {}
    for e in entries:
        per_part[e["partition"]["part"]] = per_part.get(e["partition"]["part"], 0) + 1
    assert all(n == 1 for n in per_part.values()), per_part
    # data unchanged, older snapshots intact
    assert _rows(read_table(spark, tdir)) == before
    assert _rows(read_table(spark, tdir, version=0)) == _rows(_state(spark, 9, "a"))
    # already compact -> no new version
    assert compact_table(spark, tdir, partition_cols=["part"]) == v


def test_upsert_state_table_skips_unchanged_and_buckets(spark, tmp_path):
    """ST6 end-to-end: hash-diff upsert into the manifest table —
    replays commit nothing, changed families rewrite only their hash
    bucket's files."""
    from metrics_service_spark.streaming.sessions import upsert_state_table

    tdir = str(tmp_path / "state")

    def state(pairs):
        df = spark.createDataFrame(pairs, "user_id long, family array<string>")
        return df.withColumn(
            "bucket", F.pmod(F.xxhash64("user_id"), F.lit(4)).cast("int")
        )

    b1 = state([(1, ["a", "b"]), (2, ["x"]), (3, ["q", "r"])])
    v0 = upsert_state_table(
        spark, tdir, b1, key="user_id", members_col="family",
        partition_cols=["bucket"],
    )
    assert v0 == 0

    # replay: every hash unchanged -> no new version
    assert (
        upsert_state_table(
            spark, tdir, b1, key="user_id", members_col="family",
            partition_cols=["bucket"],
        )
        == v0
    )

    # user 2's family changes -> exactly one new version; the table
    # reflects the change and keeps the untouched families
    b2 = state([(1, ["a", "b"]), (2, ["x", "y"]), (3, ["q", "r"])])
    v1 = upsert_state_table(
        spark, tdir, b2, key="user_id", members_col="family",
        partition_cols=["bucket"],
    )
    assert v1 == v0 + 1
    got = {
        r["user_id"]: sorted(r["family"])
        for r in read_table(spark, tdir).collect()
    }
    assert got == {1: ["a", "b"], 2: ["x", "y"], 3: ["q", "r"]}


def test_upsert_state_table_retries_on_conflict(spark, tmp_path, monkeypatch):
    """A racing writer between snapshot read and commit triggers
    ConflictError; the upsert recomputes against the fresh version and
    lands — the reference's retry_on_conflict at table granularity."""
    from metrics_service_spark.sources import merge_table as mt
    from metrics_service_spark.streaming import sessions as ss

    tdir = str(tmp_path / "state")
    df1 = spark.createDataFrame(
        [(1, ["a"]), (2, ["b"])], "user_id long, family array<string>"
    )
    ss.upsert_state_table(
        spark, tdir, df1, key="user_id", members_col="family"
    )

    real_commit = mt._commit
    raced = {"done": False}

    def racing_commit(table_dir, files, version):
        # a competing writer lands the contested version first, once
        # (carrying the previous version's files, as a no-op merge would)
        if not raced["done"]:
            raced["done"] = True
            real_commit(table_dir, mt._load_manifest(table_dir, version - 1), version)
        return real_commit(table_dir, files, version)

    monkeypatch.setattr(mt, "_commit", racing_commit)
    df2 = spark.createDataFrame(
        [(1, ["a", "z"]), (2, ["b"])], "user_id long, family array<string>"
    )
    v = ss.upsert_state_table(
        spark, tdir, df2, key="user_id", members_col="family"
    )
    assert raced["done"] and v == 2  # v1 went to the racer, retry took v2
    got = {
        r["user_id"]: sorted(r["family"])
        for r in read_table(spark, tdir).collect()
    }
    assert got == {1: ["a", "z"], 2: ["b"]}


def test_merge_schema_evolution(spark, tmp_path):
    """An update batch may add columns (Delta mergeSchema semantics):
    surviving old rows and carried-forward partitions read NULL for
    the new column; old snapshots are untouched."""
    tdir = str(tmp_path / "t")
    overwrite_table(_state(spark, 6, "a"), tdir, partition_cols=["part"])
    evolved = (
        _state(spark, 6, "b")
        .filter(F.col("part") == 0)
        .withColumn("score", F.col("k") * 10)
    )
    merge_table(
        spark, tdir, evolved, key_cols=["k"], partition_cols=["part"]
    )
    got = {
        r["k"]: (r["v"], r["score"])
        for r in read_table(spark, tdir).collect()
    }
    assert got == {
        0: ("b", 0),
        3: ("b", 30),
        1: ("a", None),
        4: ("a", None),
        2: ("a", None),
        5: ("a", None),
    }
    # time travel to the pre-evolution version still has the old schema
    assert "score" not in read_table(spark, tdir, version=0).columns


def test_read_table_partition_pruning(spark, tmp_path):
    """partitions= prunes at the manifest level: the scan plan lists
    only the surviving files — file skipping without touching parquet
    footers of other partitions."""
    tdir = str(tmp_path / "t")
    overwrite_table(_state(spark, 9, "a"), tdir, partition_cols=["part"])
    df = read_table(spark, tdir, partitions={"part": 1})
    assert sorted(r["k"] for r in df.collect()) == [1, 4, 7]
    # the pruned scan's file list excludes the other partitions
    files = df.inputFiles()
    assert files and all("part=1" in f for f in files)
    with pytest.raises(ValueError, match="no files match"):
        read_table(spark, tdir, partitions={"part": 99})
