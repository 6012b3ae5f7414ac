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


def test_merge_global_key_match_rewrites_moved_key(spark, tmp_path):
    """Delta MERGE matches keys globally: when an updated key arrives
    with a NEW partition value, its old row in the old partition is
    rewritten out (key-probe of carried files), not duplicated."""
    tdir = str(tmp_path / "t")
    overwrite_table(_state(spark, 9, "a"), tdir, partition_cols=["part"])
    # key 5 lived in part=2 (5 % 3); it moves to part=0
    moved = spark.createDataFrame([(5, 0, "moved")], "k long, part int, v string")
    merge_table(spark, tdir, moved, key_cols=["k"], partition_cols=["part"])
    got = [(k, p, v) for k, p, v in _rows(read_table(spark, tdir)) if k == 5]
    assert got == [(5, 0, "moved")]


def test_merge_partition_from_key_contract(spark, tmp_path):
    """partition_from_key=True skips the carried-file key probe — the
    caller asserts partition values are a function of the key.  When
    the key stays in its derived partition the merge is exact; the
    probe-skip is the documented trade, not silent."""
    tdir = str(tmp_path / "t")
    overwrite_table(_state(spark, 9, "a"), tdir, partition_cols=["part"])
    upd = _state(spark, 9, "b").filter(F.col("k") == 4)  # part = 4 % 3 = 1
    merge_table(
        spark, tdir, upd, key_cols=["k"], partition_cols=["part"],
        partition_from_key=True,
    )
    got = [(k, p, v) for k, p, v in _rows(read_table(spark, tdir)) if k == 4]
    assert got == [(4, 1, "b")]


def test_merge_expected_base_detects_intervening_commit(spark, tmp_path):
    """expected_base pins the snapshot a read-modify-write was computed
    against: an intervening commit raises ConflictError before any
    rewrite (no silent lost update)."""
    tdir = str(tmp_path / "t")
    overwrite_table(_state(spark, 6, "a"), tdir, partition_cols=["part"])
    observed = current_version(tdir)
    # a racer lands v1
    merge_table(
        spark, tdir, _state(spark, 6, "b").filter(F.col("part") == 0),
        key_cols=["k"], partition_cols=["part"],
    )
    with pytest.raises(ConflictError, match="expected base"):
        merge_table(
            spark, tdir, _state(spark, 6, "c").filter(F.col("part") == 1),
            key_cols=["k"], partition_cols=["part"], expected_base=observed,
        )


def test_vacuum_spares_inflight_stage_until_retention(spark, tmp_path):
    """Files referenced by NO manifest may belong to an in-flight
    merge that has staged data but not committed — vacuum must not
    delete them inside the retention window (the concurrent writer's
    commit would otherwise reference deleted files)."""
    tdir = str(tmp_path / "t")
    overwrite_table(_state(spark, 6, "a"), tdir, partition_cols=["part"])
    merge_table(
        spark, tdir, _state(spark, 6, "b").filter(F.col("part") == 0),
        key_cols=["k"], partition_cols=["part"],
    )
    # simulate an in-flight writer: staged parquet, no manifest yet
    from metrics_service_spark.sources.merge_table import _write_files

    staged = _write_files(
        _state(spark, 3, "inflight"), tdir, ["part"]
    )
    staged_paths = [os.path.join(tdir, e["path"]) for e in staged]

    removed = vacuum(tdir)  # default 1h retention
    assert removed > 0  # superseded v0 part=0 files reclaimed at once
    assert all(os.path.exists(p) for p in staged_paths)  # stage spared

    # past the retention window the aborted stage is reclaimable
    assert vacuum(tdir, retention_seconds=0.0) == len(staged_paths)
    assert not any(os.path.exists(p) for p in staged_paths)


def test_partition_values_hive_escaped_roundtrip(spark, tmp_path):
    """String partition values with chars Spark %XX-escapes in
    directory names (space, '=', '/') still match in merge's
    touched-set and read_table's partitions= filter — manifests store
    the unescaped value."""
    tdir = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "us west", "a"), (2, "a=b", "a"), (3, "x/y", "a")],
        "k long, region string, v string",
    )
    overwrite_table(df, tdir, partition_cols=["region"])
    # update key 1 in the escaped partition: the stale row must be
    # rewritten out, not carried forward as a duplicate
    upd = spark.createDataFrame([(1, "us west", "b")], "k long, region string, v string")
    merge_table(spark, tdir, upd, key_cols=["k"], partition_cols=["region"])
    got = sorted((r["k"], r["region"], r["v"]) for r in read_table(spark, tdir).collect())
    assert got == [(1, "us west", "b"), (2, "a=b", "a"), (3, "x/y", "a")]
    pruned = read_table(spark, tdir, partitions={"region": "us west"})
    assert [(r["k"], r["v"]) for r in pruned.collect()] == [(1, "b")]


def test_null_partition_value_rejected(spark, tmp_path):
    """NULL partition values (__HIVE_DEFAULT_PARTITION__) are not
    representable in the manifest matching contract — fail fast."""
    tdir = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, None, "a")], "k long, region string, v string"
    )
    with pytest.raises(ValueError, match="non-null"):
        overwrite_table(df, tdir, partition_cols=["region"])


def test_two_writer_race_real_conflict_then_linear_history(spark, tmp_path):
    """A true two-writer race: both writers snapshot the SAME base
    version (barrier), merge disjoint key sets, and commit — exactly
    one wins the contested version, the loser sees a real
    ConflictError and retries against the fresh snapshot.  Both
    batches land; version history is linear (v0..v2, no gaps)."""
    import threading

    tdir = str(tmp_path / "t")
    overwrite_table(_state(spark, 6, "base"), tdir, partition_cols=["part"])

    barrier = threading.Barrier(2, timeout=60)
    conflicts: list[str] = []
    errors: list[BaseException] = []

    def writer(tag: str, lo: int):
        batch = spark.createDataFrame(
            [(lo + i, (lo + i) % 3, tag) for i in range(3)],
            "k long, part int, v string",
        )
        first = True
        try:
            for _ in range(5):
                observed = current_version(tdir)
                if first:
                    barrier.wait()
                    first = False
                try:
                    merge_table(
                        spark, tdir, batch, key_cols=["k"],
                        partition_cols=["part"], expected_base=observed,
                    )
                    return
                except ConflictError:
                    conflicts.append(tag)
            raise AssertionError(f"writer {tag} never landed")
        except BaseException as ex:  # surface thread failures to the test
            errors.append(ex)

    t1 = threading.Thread(target=writer, args=("w1", 100))
    t2 = threading.Thread(target=writer, args=("w2", 200))
    t1.start(); t2.start(); t1.join(120); t2.join(120)
    assert not errors, errors
    assert conflicts, "race never produced a real ConflictError"

    assert current_version(tdir) == 2  # linear: v0 + one commit each
    got = _rows(read_table(spark, tdir))
    w1 = [(k, p, v) for k, p, v in got if v == "w1"]
    w2 = [(k, p, v) for k, p, v in got if v == "w2"]
    assert len(w1) == 3 and len(w2) == 3
    base_rows = [(k, p, v) for k, p, v in got if v == "base"]
    assert len(base_rows) == 6


def test_merge_moved_key_numeric_string_partition(spark, tmp_path):
    """The global key probe must survive Hive partition-type
    inference: a string partition value '01' reads back from the path
    as int 1, so any value-based match would miss — the probe matches
    part-file basenames instead.  A key moving out of such a partition
    still gets its stale row rewritten."""
    tdir = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "01", "a"), (2, "01", "a"), (3, "002", "a")],
        "k long, grp string, v string",
    )
    overwrite_table(df, tdir, partition_cols=["grp"])
    # key 3 moves from grp='002' to grp='01'
    upd = spark.createDataFrame(
        [(3, "01", "moved")], "k long, grp string, v string"
    )
    merge_table(spark, tdir, upd, key_cols=["k"], partition_cols=["grp"])
    got = sorted(
        (r["k"], str(r["grp"]), r["v"])
        for r in read_table(spark, tdir).collect()
    )
    # no duplicate row for key 3; grp read back via Hive inference
    # (string '01'/'002' may come back as int — compare the key set)
    ks = [k for k, _, _ in got]
    assert sorted(ks) == [1, 2, 3]
    assert [v for k, _, v in got if k == 3] == ["moved"]


def test_delete_from_table_rewrites_only_touched_files(spark, tmp_path):
    """DELETE by key: rows vanish from the new snapshot; files without
    a matching key carry by reference; old versions still time-travel
    to the pre-delete state until vacuum."""
    from metrics_service_spark.sources.merge_table import delete_from_table

    tdir = str(tmp_path / "t")
    overwrite_table(_state(spark, 9, "a"), tdir, partition_cols=["part"])
    keys = spark.createDataFrame([(0,), (4,)], "k long")  # parts 0 and 1
    v = delete_from_table(spark, tdir, keys, key_cols=["k"])
    assert v == 1
    got = sorted(k for k, _, _ in _rows(read_table(spark, tdir)))
    assert got == [1, 2, 3, 5, 6, 7, 8]
    # untouched partition (part=2) carries the same file paths
    v0 = {e["path"] for e in json.load(open(os.path.join(tdir, "_manifests", "v0.json")))["files"] if e["partition"]["part"] == "2"}
    v1 = {e["path"] for e in json.load(open(os.path.join(tdir, "_manifests", "v1.json")))["files"] if e["partition"]["part"] == "2"}
    assert v0 == v1 and v0
    # time travel still sees the deleted rows; no-match delete is a no-op
    assert len(_rows(read_table(spark, tdir, version=0))) == 9
    assert delete_from_table(
        spark, tdir, spark.createDataFrame([(999,)], "k long"), key_cols=["k"]
    ) == 1


def test_delete_entire_table_contents(spark, tmp_path):
    """Deleting every key leaves a valid committed version whose reads
    fail loudly on the empty manifest (documented read_table contract)
    while older versions stay readable."""
    from metrics_service_spark.sources.merge_table import delete_from_table

    tdir = str(tmp_path / "t")
    overwrite_table(_state(spark, 3, "a"), tdir, partition_cols=["part"])
    all_keys = spark.createDataFrame([(0,), (1,), (2,)], "k long")
    v = delete_from_table(spark, tdir, all_keys, key_cols=["k"])
    assert v == 1
    with pytest.raises(ValueError, match="empty manifest"):
        read_table(spark, tdir)
    assert len(_rows(read_table(spark, tdir, version=0))) == 3


def test_manifest_meta_set_inherit_replace(spark, tmp_path):
    """Commit-scoped table metadata: set by one commit, inherited by
    meta-less commits (ordinary upserts must not drop table
    properties), replaced when passed explicitly, versioned with the
    snapshot."""
    from metrics_service_spark.sources.merge_table import (
        manifest_meta,
        merge_table,
        overwrite_table,
    )

    tdir = str(tmp_path / "meta_t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, p string")
    v0 = overwrite_table(df, tdir, partition_cols=["p"], meta={"gen": "g0"})
    assert manifest_meta(tdir, v0) == {"gen": "g0"}

    up = spark.createDataFrame([(2, "b")], "k long, p string")
    v1 = merge_table(spark, tdir, up, key_cols=["k"], partition_cols=["p"])
    assert manifest_meta(tdir, v1) == {"gen": "g0"}  # inherited
    assert manifest_meta(tdir) == {"gen": "g0"}      # newest by default

    v2 = overwrite_table(df, tdir, partition_cols=["p"], meta={"gen": "g1"})
    assert manifest_meta(tdir, v2) == {"gen": "g1"}
    assert manifest_meta(tdir, v0) == {"gen": "g0"}  # old version keeps its own
