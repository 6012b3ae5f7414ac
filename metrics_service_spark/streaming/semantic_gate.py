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

Cell geometry must be STABLE as the index grows, so centroids are
seeded once from the bootstrap batch (md5 order) and persisted beside
the manifest with the same O_EXCL create-once discipline as commits —
concurrent bootstrappers race to create the file and the loser reads
the winner's centroids.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metrics_service_spark.operators.similarity import (
    SEM_QUANT,
    _assign_int,
    _md5_seed_centroids,
    dot_long,
)
from metrics_service_spark.sources.merge_table import (
    ConflictError,
    current_version,
    merge_table,
    read_table,
)

_CENTROID_FILE = "_semantic_centroids.json"


def _load_or_init_centroids(
    table_dir: str,
    batch: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
) -> list[list[int]]:
    path = os.path.join(table_dir, _CENTROID_FILE)
    if not os.path.exists(path):
        cvecs = _md5_seed_centroids(batch, id_col, vec_col, n_cells)
        os.makedirs(table_dir, exist_ok=True)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                json.dump(cvecs, f)
        except FileExistsError:
            pass  # a concurrent bootstrapper won; use its centroids
    with open(path) as f:
        return json.load(f)


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
) -> DataFrame:
    """Admit one embedding batch.  Returns every batch row with
    (cell, kept); kept rows are already committed to the index when
    this returns.  Rejection sources, in order: an index vector in the
    same cell passing the threshold (excluding the row's own id — the
    replay-idempotence rule), or an earlier (smaller-id) surviving
    batch vector (the within-batch SemDeDup drop rule)."""
    cvecs = _load_or_init_centroids(table_dir, batch, id_col, vec_col, n_cells)
    bat = _assign_int(batch, id_col, vec_col, cvecs).localCheckpoint(eager=True)
    num2, den2 = tau_num * tau_num, tau_den * tau_den

    def near(d, na2, nb2):
        return (d >= 0) & (
            F.lit(den2) * d * d >= F.lit(num2) * na2 * nb2
        )

    last: ConflictError | None = None
    for _ in range(max_retries):
        observed = current_version(table_dir)
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
            hit_index = spark.createDataFrame([], "__rej long")
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
        admitted = vs_index.join(
            hit_batch, vs_index["__vid"] == hit_batch["__rej"], "left_anti"
        ).select(
            F.col("__vid").alias(id_col),
            F.col("__v").alias("qv"),
            "cell",
            F.col("__n2").alias("n2"),
        )
        try:
            if admitted.limit(1).count() > 0:
                merge_table(
                    spark,
                    table_dir,
                    admitted,
                    key_cols=[id_col],
                    partition_cols=["cell"],
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
    raise last


def incremental_semantic_gate_refresh(
    spark: SparkSession,
    emb_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    available_now: bool = True,
):
    """Stream embedding files -> gated index.  Checkpointed offsets
    give exactly-once folding per file; admit_batch's key-merge +
    self-id exclusion make redelivery of an uncommitted batch
    converge instead of double-inserting."""
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
        )

    writer = (
        stream.writeStream.foreachBatch(fold)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
