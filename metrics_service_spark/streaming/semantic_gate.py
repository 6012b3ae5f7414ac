"""Streaming semantic admission gate over a persistent embedding index.

Continuously-arriving embedding batches are admitted against the
corpus: a vector is REJECTED when a kept index vector in its cell (or
an earlier vector of the same batch) passes the integer cosine
threshold — the streaming form of
`operators.similarity.semantic_dedup_incremental_int`, evolved the
same way `streaming/paragraph_index.py` extends the batch paragraph
dedup.

State is the transactional manifest table (sources/merge_table)
partitioned by `cell`: admission reads ONLY the batch's touched cells
(IN-list manifest pruning), appends admitted vectors in one atomic
commit pinned by expected_base (racing admitters retry on
ConflictError), and replaying a delivered batch converges — admitted
ids merge onto their own keys, rejected ids stay rejected (a vector
never self-rejects: the index match excludes its own id).

Cell geometry is VERSIONED WITH THE TABLE: each manifest version's
`meta` names the centroid file its rows were assigned under (absent =
the bootstrap file), so a reader of any version pairs a consistent
snapshot with the exact geometry that produced it.  Centroid files
are immutable and created atomically (complete temp file hard-linked
into place — concurrent bootstrappers race on the link and the loser
reads the winner's centroids; a reader can never observe a partial
file).  As the corpus grows past `target_cell_size * n_cells`,
`refresh_centroids` re-clusters with the shared Lloyd loop
(operators/similarity.lloyd_centroids), re-assigns the whole index,
and commits new rows + new centroid pointer as ONE
expected_base-pinned commit — admitters that raced the migration get
ConflictError, re-read the new geometry, re-assign their batch and
retry, so admission stays replay-idempotent across the migration.
"""

from __future__ import annotations

import json
import math
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metrics_service_spark.operators.similarity import (
    SEM_QUANT,
    _argmax_cells,
    _assign_int,
    _check_sem_bounds,
    _md5_seed_centroids,
    check_tau_bounds,
    dot_long,
    lloyd_centroids,
)
from metrics_service_spark.sources.merge_table import (
    ConflictError,
    current_version,
    manifest_meta,
    merge_table,
    overwrite_table,
    read_table,
)

#: Bootstrap-generation centroid file; later generations are
#: uuid-named and pointed at by the manifest meta (versioned with the
#: data, so old-snapshot readers resolve their own geometry).
_BOOT_FILE = "_semantic_centroids_boot.json"
_META_KEY = "centroid_file"


def _write_centroids_atomic(table_dir: str, fname: str, cvecs) -> bool:
    """Create-once atomic write: the FULL content lands in a temp file
    (fsync'd) which is hard-linked into place — link fails if the name
    exists, so exactly one writer wins and no reader can ever see a
    partially written file (the r6-ADVICE bootstrap race).  Returns
    whether this writer won."""
    os.makedirs(table_dir, exist_ok=True)
    path = os.path.join(table_dir, fname)
    tmp = os.path.join(table_dir, f".{fname}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(cvecs, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
        return True
    except FileExistsError:
        return False  # a concurrent writer won; caller reads that file
    finally:
        os.unlink(tmp)


def _centroid_fname(table_dir: str, version: int) -> str:
    return manifest_meta(table_dir, version).get(_META_KEY, _BOOT_FILE)


def _load_centroids(table_dir: str, fname: str) -> list[list[int]]:
    with open(os.path.join(table_dir, fname)) as f:
        return json.load(f)


def _load_or_init_centroids(
    table_dir: str,
    version: int,
    batch: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
) -> tuple[str, list[list[int]]]:
    """Resolve the centroid geometry for `version` (the bootstrap file
    when the table is empty, seeding it from the batch if absent).
    A missing pointed-at file on a COMMITTED table is corruption, not
    a bootstrap — raised, never silently re-seeded."""
    fname = _centroid_fname(table_dir, version) if version >= 0 else _BOOT_FILE
    path = os.path.join(table_dir, fname)
    if not os.path.exists(path):
        if version >= 0:
            # a COMMITTED table always implies its centroid file was
            # written (the boot file included — admission writes it
            # before the first commit): a missing file is corruption.
            # Re-seeding from the CURRENT batch would silently leave
            # every stored row's `cell` inconsistent with the new
            # geometry (wrong pruning and verdicts) — r7 ADVICE.
            raise FileNotFoundError(
                f"centroid file {fname} named by v{version} is missing "
                f"under {table_dir} — committed table, refusing to re-seed"
            )
        cvecs = _md5_seed_centroids(batch, id_col, vec_col, n_cells)
        _write_centroids_atomic(table_dir, fname, cvecs)
    return fname, _load_centroids(table_dir, fname)


def admit_batch(
    spark: SparkSession,
    table_dir: str,
    batch: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    tau_num: int = 3,
    tau_den: int = 10,
    max_retries: int = 3,
    immutable_ids: bool = True,
) -> DataFrame:
    """Admit one embedding batch.  Returns every batch row with
    (cell, kept); kept rows are already committed to the index when
    this returns.  Rejection sources, in order: an index vector in the
    same cell passing the threshold (excluding the row's own id — the
    replay-idempotence rule), or an earlier (smaller-id) surviving
    batch vector (the within-batch SemDeDup drop rule).  Each retry
    re-resolves the snapshot AND its centroid geometry, so admitters
    racing a `refresh_centroids` migration re-assign under the new
    cells and converge.

    CONTRACT (default `immutable_ids=True`): (id, embedding) pairs are
    immutable — re-delivering a batch is fine (replay converges), but
    re-admitting an EXISTING id with a different embedding is not: its
    new cell may differ from the stored one, and the fast merge path
    (partition_from_key) skips the global key probe that would rewrite
    the stale row out of its old partition, leaving a duplicate key.
    If your source can re-emit an id with changed content, pass
    `immutable_ids=False`: the merge then runs the global key-probe
    MERGE (moved keys are rewritten out of their old cell) at the cost
    of a column-pruned scan of the remaining files per commit."""
    if max_retries < 1:
        raise ValueError(f"max_retries must be >= 1, got {max_retries}")
    # CLI-reachable threshold: validate against the int64 envelope
    # BEFORE building any plan (e.g. tau 99/100 silently wraps the
    # den^2*d^2 product at the permitted dim/|q| bounds — r7 ADVICE)
    check_tau_bounds(tau_num, tau_den)
    num2, den2 = tau_num * tau_num, tau_den * tau_den

    def near(d, na2, nb2):
        return (d >= 0) & (F.lit(den2) * d * d >= F.lit(num2) * na2 * nb2)

    last: ConflictError | None = None
    cur_fname: str | None = None
    bat: DataFrame | None = None
    for _ in range(max_retries):
        observed = current_version(table_dir)
        fname, cvecs = _load_or_init_centroids(
            table_dir, observed, batch, id_col, vec_col, n_cells
        )
        if fname != cur_fname:
            # (re-)assign under this geometry; lazy checkpoint — the
            # cells collect below is the materializing action
            bat = _assign_int(batch, id_col, vec_col, cvecs).localCheckpoint(
                eager=False
            )
            cur_fname = fname
        cells = [r["cell"] for r in bat.select("cell").distinct().collect()]
        index = None
        if observed >= 0:
            try:
                index = read_table(
                    spark, table_dir, version=observed, partitions={"cell": cells}
                )
            except ValueError:
                index = None  # nothing stored in the touched cells yet
        if index is not None:
            idx = index.select(
                F.col(id_col).alias("__iid"),
                F.col("qv").alias("__vi"),
                "cell",
                F.col("n2").alias("__ni2"),
            )
            d = dot_long(F.col("__v"), F.col("__vi"))
            hit_index = (
                bat.join(idx, "cell")
                .filter(F.col("__iid") != F.col("__vid"))
                .filter(near(d, F.col("__n2"), F.col("__ni2")))
                .select(F.col("__vid").alias("__rej"))
                .distinct()
            )
        else:
            # empty frame in the BATCH's own id type (a hardcoded long
            # schema made string ids anti-join through an implicit cast)
            hit_index = bat.select(F.col("__vid").alias("__rej")).limit(0)
        vs_index = bat.join(
            hit_index, bat["__vid"] == hit_index["__rej"], "left_anti"
        )
        a = vs_index.select(
            F.col("__vid").alias("__ia"),
            F.col("__v").alias("__va"),
            "cell",
            F.col("__n2").alias("__na2"),
        )
        d2 = dot_long(F.col("__va"), F.col("__v"))
        hit_batch = (
            a.join(vs_index, "cell")
            .filter(F.col("__ia") < F.col("__vid"))
            .filter(near(d2, F.col("__na2"), F.col("__n2")))
            .select(F.col("__vid").alias("__rej"))
            .distinct()
        )
        admitted = (
            vs_index.join(
                hit_batch, vs_index["__vid"] == hit_batch["__rej"], "left_anti"
            )
            .select(
                F.col("__vid").alias(id_col),
                F.col("__v").alias("qv"),
                "cell",
                F.col("__n2").alias("n2"),
            )
            # three consumers (emptiness probe, merge, verdict join)
            # otherwise re-run the whole index-join pipeline each
            .localCheckpoint(eager=False)
        )
        try:
            if admitted.limit(1).count() > 0:
                # immutable_ids -> partition_from_key: a row's cell is
                # a deterministic function of (vector, centroid
                # generation), the only commit that changes the
                # generation rewrites the WHOLE table in the same
                # commit (refresh_centroids), and the immutability
                # contract pins vector per id — so an updated key can
                # only live in its update-batch partition and the
                # global key-probe scan is skipped
                merge_table(
                    spark,
                    table_dir,
                    admitted,
                    key_cols=[id_col],
                    partition_cols=["cell"],
                    partition_from_key=immutable_ids,
                    expected_base=observed,
                )
            adm_ids = admitted.select(
                F.col(id_col).alias("__vid"), F.lit(1).alias("__a")
            )
            return bat.join(adm_ids, "__vid", "left").select(
                F.col("__vid").alias(id_col),
                "cell",
                F.col("__a").isNotNull().alias("kept"),
            )
        except ConflictError as ex:
            last = ex  # racer committed into our cells; re-read and retry
    raise ConflictError(
        f"admission lost {max_retries} commit races under {table_dir}"
    ) from last


def refresh_centroids(
    spark: SparkSession,
    table_dir: str,
    *,
    id_col: str = "vec_id",
    target_cell_size: int = 1000,
    iters: int = 2,
) -> int | None:
    """Re-seed the gate's cell geometry once the indexed corpus has
    outgrown it (the batch side's `target_cell_size` knob, applied to
    the persistent index): when rows > target_cell_size * n_cells,
    re-cluster to ceil(rows / target) cells with the shared Lloyd loop
    (`lloyd_centroids`, SEM_QUANT space — the stored `qv` vectors are
    already quantized), re-assign the WHOLE index, and commit new rows
    + the new centroid-file pointer as ONE expected_base-pinned
    overwrite.  Returns the new version, or None when no refresh was
    needed.  Raises ConflictError if an admitter committed mid-train —
    the next maintenance cycle retries on fresh state.

    Consistency story: centroid files are immutable and uuid-named;
    the manifest meta of each version names the file its rows were
    assigned under, so readers of PRE-migration versions keep both
    their snapshot and its geometry, while post-migration admitters
    resolve the new file via `manifest_meta` and re-assign their
    batches (admit_batch's retry loop)."""
    observed = current_version(table_dir)
    if observed < 0:
        return None
    old = _load_centroids(table_dir, _centroid_fname(table_dir, observed))
    index = read_table(spark, table_dir, version=observed)
    n_rows = index.count()
    if n_rows <= target_cell_size * len(old):
        return None
    new_k = max(len(old) + 1, math.ceil(n_rows / target_cell_size))
    quant = index.select(F.col(id_col).alias("__vid"), F.col("qv").alias("__v"))
    cvecs = lloyd_centroids(quant, new_k, iters)
    _check_sem_bounds(cvecs)
    # carry qv/n2 straight from the stored rows (n2 is invariant under
    # re-assignment; only `cell` changes)
    reassigned = (
        _argmax_cells(
            index.select(
                F.col(id_col).alias("__vid"),
                F.col("qv").alias("__v"),
                F.col("n2"),
            ),
            cvecs,
        )
        .select(
            F.col("__vid").alias(id_col),
            F.col("__v").alias("qv"),
            "cell",
            "n2",
        )
    )
    fname = f"_semantic_centroids_{uuid.uuid4().hex}.json"
    _write_centroids_atomic(table_dir, fname, cvecs)
    try:
        return overwrite_table(
            reassigned,
            table_dir,
            partition_cols=["cell"],
            expected_base=observed,
            meta={_META_KEY: fname, "n_cells": len(cvecs)},
        )
    except ConflictError:
        os.unlink(os.path.join(table_dir, fname))  # orphaned generation
        raise


def incremental_semantic_gate_refresh(
    spark: SparkSession,
    emb_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    tau_num: int = 3,
    tau_den: int = 10,
    target_cell_size: int | None = None,
    available_now: bool = True,
):
    """Stream embedding files -> gated index.  Checkpointed offsets
    give exactly-once folding per file; admit_batch's key-merge +
    self-id exclusion make redelivery of an uncommitted batch
    converge instead of double-inserting.  With `target_cell_size`
    set, each fold also runs the centroid-refresh check, so the cell
    geometry keeps up with corpus growth (a refresh that loses a race
    simply waits for the next batch)."""
    schema = spark.read.parquet(emb_dir).schema
    stream = spark.readStream.schema(schema).parquet(emb_dir)

    def fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        admit_batch(
            spark,
            table_dir,
            batch,
            id_col=id_col,
            vec_col=vec_col,
            n_cells=n_cells,
            tau_num=tau_num,
            tau_den=tau_den,
        )
        if target_cell_size is not None:
            try:
                refresh_centroids(
                    spark,
                    table_dir,
                    id_col=id_col,
                    target_cell_size=target_cell_size,
                )
            except ConflictError:
                pass  # an admitter won the race; retry next fold

    writer = (
        stream.writeStream.foreachBatch(fold)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
