"""Manifest-committed parquet table: transactional MERGE for gold state.

Reference analog: `es_eventlog_sync` upserts session/family state into
an ES index with per-document versioned bulk updates and
`retry_on_conflict` (es_eventlog_sync.py:485-547,640-661); the
Postgres materialized views are refreshed wholesale inside a
transaction (02-metrics-materialized-views.sql).  SURVEY §1 maps both
to a transactional table format (Delta/Iceberg MERGE).  This container
has neither package, so this module implements the same commit
protocol those formats use, from parquet + JSON primitives only:

- Data files are immutable `part-*.parquet`, each pinned to one value
  of the partition columns; the partition values are recorded in the
  manifest (file-skipping metadata, like Delta's add-file stats).
- A table VERSION is a JSON manifest (`_manifests/v{N}.json`) listing
  its data files.  Commits write the next-version manifest with
  O_EXCL create — two concurrent committers race on the version
  number and exactly one wins (optimistic concurrency, the loser
  retries on fresh state).
- Old data files are never mutated or deleted by a commit, so a
  reader that resolved version N keeps a consistent snapshot while
  version N+1 lands (snapshot isolation for concurrent reads);
  `vacuum` reclaims files unreferenced by the newest manifest.
- `merge` is an upsert by key: only data files whose partition value
  appears in the update batch are rewritten (anti-join out the
  updated keys, union the new rows); untouched partitions carry their
  files forward by reference.  Replaying the same batch converges to
  the same state, so foreachBatch retries are safe.

At 100 TB the manifest lists file paths + partition values only
(KBs per thousand files) and the MERGE cost is proportional to the
touched partitions, not the table — the same contract as Delta MERGE
with dynamic file pruning.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_manifests"

# Spark/Hive encode special chars in partition directory names as %XX
# (escapePathName) and NULL as this sentinel.  Manifest entries store
# the UNESCAPED value so `merge`/`read_table(partitions=...)` compare
# against the caller's actual value, not the path encoding.
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
_ESCAPE_RE = re.compile(r"%([0-9A-Fa-f]{2})")


def _unescape_partition_value(raw: str) -> str:
    """Invert Spark's escapePathName: %XX hex escapes -> the char."""
    return _ESCAPE_RE.sub(lambda m: chr(int(m.group(1), 16)), raw)


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _MANIFEST_DIR, f"v{version}.json")


def current_version(table_dir: str) -> int:
    """Newest committed version, or -1 for an empty/new table."""
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return -1
    versions = [
        int(name[1:-5])
        for name in os.listdir(mdir)
        if name.startswith("v") and name.endswith(".json")
    ]
    return max(versions, default=-1)


def _load_manifest(table_dir: str, version: int) -> list[dict]:
    with open(_manifest_path(table_dir, version)) as fh:
        return json.load(fh)["files"]


def _write_files(
    df: DataFrame, table_dir: str, partition_cols: list[str]
) -> list[dict]:
    """Write df as immutable parquet files, one directory per commit,
    and return manifest entries [{path, partition: {col: value}}]."""
    stage = os.path.join(table_dir, f"stage-{uuid.uuid4().hex}")
    if partition_cols:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(stage)
    else:
        df.write.mode("overwrite").parquet(stage)
    entries: list[dict] = []
    for root, _dirs, files in os.walk(stage):
        for name in files:
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(root, name)
            rel = os.path.relpath(path, table_dir)
            part = {}
            for piece in os.path.relpath(root, stage).split(os.sep):
                if "=" in piece:
                    k, v = piece.split("=", 1)
                    if v == _HIVE_NULL:
                        raise ValueError(
                            f"NULL value in partition column {k!r}: manifest "
                            "partition values must be non-null (filter or "
                            "coalesce before writing)"
                        )
                    part[k] = _unescape_partition_value(v)
            entries.append({"path": rel, "partition": part})
    return entries


def _commit(
    table_dir: str,
    files: list[dict],
    version: int,
    meta: dict | None = None,
) -> int:
    """Commit `files` at exactly `version` (the version the committer
    computed its rewrite against, +1).  O_EXCL create makes exactly one
    of two racing committers win; the loser gets ConflictError and must
    recompute against the new current_version and retry.

    `meta` is small commit-scoped table metadata (Delta's
    commitInfo/table-properties analog — e.g. the semantic gate's
    centroid-file pointer).  When None, the PREVIOUS version's meta
    carries forward, so ordinary upserts never drop table properties
    set by an earlier commit; pass a dict (possibly {}) to replace."""
    os.makedirs(os.path.join(table_dir, _MANIFEST_DIR), exist_ok=True)
    if meta is None and version > 0:
        try:
            with open(_manifest_path(table_dir, version - 1)) as fh:
                meta = json.load(fh).get("meta", {})
        except FileNotFoundError:
            meta = {}
    try:
        with open(_manifest_path(table_dir, version), "x") as fh:
            json.dump(
                {"version": version, "files": files, "meta": meta or {}}, fh
            )
        return version
    except FileExistsError:
        # lost the race; surface to the caller, whose rewrite was
        # computed against a stale snapshot
        raise ConflictError(
            f"version {version} already committed under {table_dir}"
        ) from None


def manifest_meta(table_dir: str, version: int | None = None) -> dict:
    """Commit-scoped metadata of `version` (newest by default).
    Versioned like the data: a reader that resolved version N reads
    N's meta and stays consistent while N+1 lands."""
    if version is None:
        version = current_version(table_dir)
    if version < 0:
        return {}
    with open(_manifest_path(table_dir, version)) as fh:
        return json.load(fh).get("meta", {})


class ConflictError(RuntimeError):
    """Optimistic-concurrency conflict: recompute against the new
    current version and retry (the reference's retry_on_conflict)."""


def _read_files(
    spark: SparkSession, table_dir: str, entries: list[dict]
) -> DataFrame:
    """Read manifest entries.  Files from different commits live under
    different stage roots, so partition discovery runs per-stage (each
    stage is internally consistent) and the scans union — a commit's
    worth of files is one scan, so the union width is bounded by the
    number of versions still contributing files, not file count."""
    by_stage: dict[str, list[str]] = {}
    for e in entries:
        stage = e["path"].split(os.sep, 1)[0]
        by_stage.setdefault(stage, []).append(
            os.path.join(table_dir, e["path"])
        )
    parts = [
        spark.read.option(
            "basePath", os.path.join(table_dir, stage)
        ).parquet(*paths)
        for stage, paths in sorted(by_stage.items())
    ]
    out = parts[0]
    for p in parts[1:]:
        # allowMissingColumns: commits may evolve the schema (Delta
        # mergeSchema semantics) — rows from pre-evolution files read
        # NULL for columns they predate
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def read_table(
    spark: SparkSession,
    table_dir: str,
    *,
    version: int | None = None,
    partitions: dict[str, object] | None = None,
) -> DataFrame:
    """Read a snapshot (newest version by default).  The returned
    DataFrame stays valid while later versions commit — files are
    immutable and vacuum only drops unreferenced ones.

    `partitions={"year": 2024, "month": 1}` prunes at the MANIFEST
    level: files whose recorded partition values don't match are never
    even listed to Spark (Delta-style file skipping — the scan plan
    contains only the surviving files, no I/O or footer reads for the
    rest).  Values compare as strings, matching the manifest encoding;
    a list/tuple/set value matches ANY of its members (IN-list
    pruning, e.g. `partitions={"cell": touched_cells}`)."""
    if version is None:
        version = current_version(table_dir)
    if version < 0:
        raise FileNotFoundError(f"no committed version under {table_dir}")
    entries = _load_manifest(table_dir, version)
    if partitions:
        allowed = {
            k: {str(x) for x in (v if isinstance(v, (list, tuple, set)) else [v])}
            for k, v in partitions.items()
        }
        entries = [
            e
            for e in entries
            if all(e["partition"].get(k) in vs for k, vs in allowed.items())
        ]
        if not entries:
            raise ValueError(
                f"no files match partitions {partitions} in v{version} "
                f"under {table_dir}"
            )
    if not entries:
        raise ValueError(f"empty manifest v{version} under {table_dir}")
    return _read_files(spark, table_dir, entries)


def overwrite_table(
    df: DataFrame,
    table_dir: str,
    *,
    partition_cols: list[str] | None = None,
    expected_base: int | None = None,
    meta: dict | None = None,
) -> int:
    """Full-table replace as a single atomic commit.  `expected_base`
    pins the snapshot the replacement was computed from (ConflictError
    before any write if another commit landed); `meta` replaces the
    table metadata for this and subsequent versions (None = carry the
    previous version's forward)."""
    base = current_version(table_dir)
    if expected_base is not None and base != expected_base:
        raise ConflictError(
            f"expected base version {expected_base} but found {base} "
            f"under {table_dir}"
        )
    files = _write_files(df, table_dir, partition_cols or [])
    return _commit(table_dir, files, base + 1, meta=meta)


def merge_table(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    *,
    key_cols: list[str],
    partition_cols: list[str] | None = None,
    partition_from_key: bool = False,
    expected_base: int | None = None,
) -> int:
    """MERGE (upsert): rows matching `key_cols` are replaced by the
    update rows, new keys are inserted.  Keys match GLOBALLY (Delta
    MERGE semantics): if an existing key arrives with a NEW partition
    value, its old row in the old partition is rewritten out, not
    carried forward as a duplicate.  The partitions rewritten are the
    union of (a) partitions present in `updates` and (b) partitions
    currently holding any updated key — (b) is found with a
    column-pruned key-probe of the remaining files (key + partition
    columns only).  Pass `partition_from_key=True` when every
    partition value is a deterministic function of the key (an updated
    key can then only live in its update-batch partition) to skip the
    probe — the common state-table layout.  Idempotent under replay.

    `expected_base` pins the snapshot the caller computed `updates`
    against: if another writer committed in between (current version
    != expected_base), ConflictError is raised BEFORE any rewrite, so
    read-modify-write callers can't silently lose the racer's update."""
    partition_cols = partition_cols or []
    base = current_version(table_dir)
    if expected_base is not None and base != expected_base:
        raise ConflictError(
            f"expected base version {expected_base} but found {base} "
            f"under {table_dir}"
        )
    if base < 0:
        if expected_base is not None:
            # keep the pin through bootstrap: commit at exactly
            # expected_base+1 instead of re-resolving, so a racer that
            # created v0 in between gets ConflictError (O_EXCL), never
            # a silent full replace of its commit
            files = _write_files(updates, table_dir, partition_cols)
            return _commit(table_dir, files, expected_base + 1)
        return overwrite_table(updates, table_dir, partition_cols=partition_cols)

    entries = _load_manifest(table_dir, base)
    if partition_cols:
        touched = {
            tuple(str(r[c]) for c in partition_cols)
            for r in updates.select(*partition_cols).distinct().collect()
        }
        hit = [
            e
            for e in entries
            if tuple(e["partition"].get(c) for c in partition_cols) in touched
        ]
        carried = [e for e in entries if e not in hit]
        if carried and not partition_from_key:
            # global key matching: probe the carried files for updated
            # keys (column-pruned scan: key columns only — the same
            # touched-file scan Delta MERGE runs) and pull exactly the
            # FILES holding one into the rewrite set.  Matching by
            # input_file_name, not partition value, sidesteps Hive
            # partition-type inference (a string partition "01" reads
            # back as int 1 and would never match its manifest string).
            probe = (
                _read_files(spark, table_dir, carried)
                .select(*key_cols, F.input_file_name().alias("__file"))
                .join(
                    F.broadcast(updates.select(*key_cols).distinct()),
                    key_cols,
                    "left_semi",
                )
                .select("__file")
                .distinct()
                .collect()
            )
            # match by part-file BASENAME: Spark part files embed the
            # write-job UUID, so basenames are unique table-wide and
            # immune to the URI/Hive escaping layers a full-path
            # comparison would have to invert
            matched = {os.path.basename(r["__file"]) for r in probe}
            if matched:
                extra_hit = [
                    e
                    for e in carried
                    if os.path.basename(e["path"]) in matched
                ]
                hit += extra_hit
                carried = [e for e in carried if e not in extra_hit]
    else:
        hit, carried = entries, []

    merged = updates
    if hit:
        old = _read_files(spark, table_dir, hit)
        keys = updates.select(*key_cols).distinct()
        kept = old.join(F.broadcast(keys), key_cols, "left_anti")
        # allowMissingColumns = schema evolution (Delta mergeSchema):
        # an update batch may add columns; surviving old rows read NULL
        # for them
        merged = updates.unionByName(kept, allowMissingColumns=True)
    new_files = _write_files(merged, table_dir, partition_cols)
    return _commit(table_dir, carried + new_files, base + 1)


def delete_from_table(
    spark: SparkSession,
    table_dir: str,
    keys: DataFrame,
    *,
    key_cols: list[str],
    expected_base: int | None = None,
) -> int:
    """DELETE by key (the GDPR-expunge primitive, Delta DELETE
    semantics): rewrite exactly the data files holding a matching key
    with those rows anti-joined out; every other file carries into the
    new manifest by reference.  The touched-file set comes from the
    same basename key-probe MERGE uses, so cost tracks the files
    containing deleted keys, not the table.  Old versions still
    contain the rows — run `vacuum` after the retention window to
    physically reclaim them (the same two-step contract as Delta
    DELETE + VACUUM).  Returns the new version (the current one if no
    key matched)."""
    base = current_version(table_dir)
    if expected_base is not None and base != expected_base:
        raise ConflictError(
            f"expected base version {expected_base} but found {base} "
            f"under {table_dir}"
        )
    if base < 0:
        raise FileNotFoundError(f"no committed version under {table_dir}")
    entries = _load_manifest(table_dir, base)
    keyset = keys.select(*key_cols).distinct()
    probe = (
        _read_files(spark, table_dir, entries)
        .select(*key_cols, F.input_file_name().alias("__file"))
        .join(F.broadcast(keyset), key_cols, "left_semi")
        .select("__file")
        .distinct()
        .collect()
    )
    matched = {os.path.basename(r["__file"]) for r in probe}
    if not matched:
        return base
    hit = [e for e in entries if os.path.basename(e["path"]) in matched]
    carried = [e for e in entries if e not in hit]
    kept = _read_files(spark, table_dir, hit).join(
        F.broadcast(keyset), key_cols, "left_anti"
    )
    partition_cols = sorted(hit[0]["partition"]) if hit[0]["partition"] else []
    new_files = (
        _write_files(kept, table_dir, partition_cols)
        if not kept.isEmpty()
        else []
    )
    return _commit(table_dir, carried + new_files, base + 1)


def compact_table(
    spark: SparkSession,
    table_dir: str,
    *,
    partition_cols: list[str] | None = None,
    min_files_per_partition: int = 2,
) -> int:
    """OPTIMIZE: bin-pack partitions fragmented across many small
    files (every MERGE adds a commit's worth of files to the touched
    partitions; a streaming refresh touching the same partition each
    batch accretes one file set per batch — the classic small-file
    problem).  Rewrites each partition held in >= min_files_per_
    partition files into a single coalesced file set and commits; data
    is unchanged, so readers of older versions are unaffected.  Run
    vacuum afterwards to reclaim the replaced files.

    partition_cols defaults to the partition keys recorded in the
    manifest (every commit writes them), so callers — e.g. the CLI —
    need not repeat the table's layout."""
    base = current_version(table_dir)
    if base < 0:
        raise FileNotFoundError(f"no committed version under {table_dir}")
    entries = _load_manifest(table_dir, base)
    if partition_cols is None:
        partition_cols = sorted(entries[0]["partition"]) if entries else []

    by_part: dict[tuple, list[dict]] = {}
    for e in entries:
        key = tuple(e["partition"].get(c) for c in partition_cols)
        by_part.setdefault(key, []).append(e)
    fragmented = [
        e
        for group in by_part.values()
        if len(group) >= min_files_per_partition
        for e in group
    ]
    if not fragmented:
        return base  # nothing to do; current version stands
    carried = [e for e in entries if e not in fragmented]
    packed = _read_files(spark, table_dir, fragmented)
    if partition_cols:
        # one output file per partition value: route all rows of a
        # partition to one task before the partitioned write
        packed = packed.repartition(*[F.col(c) for c in partition_cols])
    else:
        packed = packed.coalesce(1)
    new_files = _write_files(packed, table_dir, partition_cols)
    return _commit(table_dir, carried + new_files, base + 1)


def vacuum(table_dir: str, *, retention_seconds: float = 3600.0) -> int:
    """Delete data files unreferenced by the NEWEST manifest (breaks
    older snapshots, like Delta VACUUM).  Returns files removed.

    Files referenced by SOME older manifest are superseded commits and
    always reclaimable.  Files referenced by NO manifest at all may be
    the staged-but-uncommitted output of an IN-FLIGHT merge — deleting
    them would corrupt that writer's commit — so they are only removed
    once older than `retention_seconds` (Delta's retention-window
    guard; an aborted stage is reclaimed on the next vacuum after the
    window)."""
    version = current_version(table_dir)
    if version < 0:
        return 0
    live = {
        os.path.normpath(os.path.join(table_dir, e["path"]))
        for e in _load_manifest(table_dir, version)
    }
    ever_committed: set[str] = set()
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            for e in _load_manifest(table_dir, int(name[1:-5])):
                ever_committed.add(
                    os.path.normpath(os.path.join(table_dir, e["path"]))
                )
    cutoff = time.time() - retention_seconds
    removed = 0
    for root, _dirs, files in os.walk(table_dir):
        if _MANIFEST_DIR in root:
            continue
        for name in files:
            path = os.path.normpath(os.path.join(root, name))
            if not name.endswith(".parquet") or path in live:
                continue
            if path not in ever_committed and os.path.getmtime(path) > cutoff:
                continue  # possibly an in-flight commit's staged data
            os.remove(path)
            removed += 1
    return removed
