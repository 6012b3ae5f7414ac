"""Streaming record-linkage admission gate over a persistent block
index — the linkage twin of `streaming/semantic_gate.py`, completing
the batch/streaming symmetry of the linkage family the way
paragraph_index/semantic_gate did for the paragraph and embedding
families.

Continuously-arriving document batches are admitted against the
corpus: a document is REJECTED when a kept index document in its
(block_cols, prefix-block) cell — or an earlier surviving document of
the same batch — is within ``max_dist`` prefix levenshtein (the exact
scoring of `operators.dedup.fuzzy_prefix_admit`, whose batch form is
the oracle-checked `doc_linkage_incremental` entry; the gate's
verdicts are pinned to it by tests/test_linkage_gate.py).

State is the transactional manifest table (sources/merge_table),
partitioned by ``pb`` = a 64-way hash bucket of the block key —
raw block keys are arbitrary text prefixes (spaces, punctuation) and
must not become partition directory names, and the bounded bucket
count keeps the manifest's partition list flat.  Admission reads ONLY
the batch's touched buckets (IN-list manifest pruning — cost scales
with the batch, never the corpus), appends admitted rows in one
atomic commit pinned by ``expected_base`` (racing admitters retry on
ConflictError), and replaying a delivered batch converges: admitted
ids merge onto their own keys, and a previously-admitted document
never self-rejects (the index match excludes its own id; any LATER
admission in its block is by construction farther than ``max_dist``,
so it cannot retroactively reject the replay).

The ``max_cell`` cap applies `fuzzy_prefix_admit`'s deterministic
wholesale-drop rule to INDEX cells (a boilerplate corpus prefix must
not fan a batch row out by its cell population).  Cell populations
only grow, so a cap flip between delivery and replay can only REMOVE
rejection sources — replayed verdicts converge toward admission,
never toward a stranded rejected-but-stored state.

Documents are immutable by contract (same rule as the semantic gate's
``immutable_ids``): a doc_id's text never changes, so its block —
and with it its partition — is a pure function of the key and the
fast ``partition_from_key`` merge path is safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metrics_service_spark.sources.merge_table import (
    ConflictError,
    current_version,
    merge_table,
    read_table,
)

N_BUCKETS = 64


def _blocked(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    prefix_chars: int,
    block_chars: int,
) -> DataFrame:
    from metrics_service_spark.operators.similarity import _spread

    b = _spread(
        df.select(
            *[F.col(c) for c in block_cols],
            F.col(id_col).alias("__id"),
            F.substring(F.col(text_col), 1, prefix_chars).alias("__pfx"),
        )
    ).withColumn("__bk", F.substring(F.col("__pfx"), 1, block_chars))
    return b.withColumn(
        "pb",
        F.pmod(F.xxhash64(*[F.col(c) for c in block_cols], F.col("__bk")),
               F.lit(N_BUCKETS)).cast("int"),
    )


def admit_batch_linkage(
    spark: SparkSession,
    table_dir: str,
    batch: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: list[str] | None = None,
    prefix_chars: int = 80,
    block_chars: int = 4,
    max_dist: int = 48,
    max_cell: int | None = 64,
    max_retries: int = 3,
) -> DataFrame:
    """Admit one document batch.  Returns every batch row with
    (pb, kept); kept rows are already committed to the block index
    when this returns.  Rejection sources, in order: an index document
    in the same block within ``max_dist`` (excluding the row's own id
    — the replay rule; overfull index cells skipped by the
    ``max_cell`` drop rule), then an earlier (smaller-id) surviving
    batch document in the same block (the within-batch drop-larger-id
    rule, matching `fuzzy_prefix_pairs` cluster semantics — including
    its wholesale-drop of overfull BATCH cells, so a boilerplate
    prefix can never make the within-batch arm quadratic)."""
    if max_retries < 1:
        raise ValueError(f"max_retries must be >= 1, got {max_retries}")
    block_cols = list(block_cols or [])
    bat = _blocked(
        batch, id_col, text_col, block_cols, prefix_chars, block_chars
    ).localCheckpoint(eager=False)
    join_keys = block_cols + ["__bk"]

    last: ConflictError | None = None
    for _ in range(max_retries):
        observed = current_version(table_dir)
        buckets = [r["pb"] for r in bat.select("pb").distinct().collect()]
        index = None
        if observed >= 0:
            try:
                index = read_table(
                    spark,
                    table_dir,
                    version=observed,
                    partitions={"pb": buckets},
                )
            except ValueError:
                index = None  # nothing stored in the touched buckets yet
        if index is not None:
            idx = index.select(
                *[F.col(c) for c in block_cols],
                F.col(id_col).alias("__iid"),
                F.col("pfx").alias("__ipfx"),
                F.col("bk").alias("__bk"),
            )
            if max_cell is not None:
                # fuzzy_prefix_admit's deterministic wholesale-drop
                # rule on INDEX cells (populations only grow, so a
                # flip across replays only removes rejection sources)
                cells = idx.groupBy(*join_keys).agg(
                    F.count(F.lit(1)).alias("__n")
                )
                idx = idx.join(
                    F.broadcast(cells.filter(F.col("__n") <= max_cell)),
                    join_keys,
                    "left_semi",
                )
            hit_index = (
                bat.join(idx, join_keys)
                .filter(F.col("__iid") != F.col("__id"))
                .filter(
                    # r17: threshold form — banded early-bailout
                    F.levenshtein(
                        F.col("__pfx"), F.col("__ipfx"), max_dist
                    )
                    >= 0
                )
                .select(F.col("__id").alias("__rej"))
                .distinct()
            )
        else:
            hit_index = bat.select(F.col("__id").alias("__rej")).limit(0)
        vs_index = bat.join(
            hit_index, bat["__id"] == hit_index["__rej"], "left_anti"
        )
        pairable = vs_index
        if max_cell is not None:
            # the SAME wholesale-drop rule on BATCH cells: an overfull
            # batch block (boilerplate prefix) must not quadratically
            # self-join — its docs skip the within-batch check, exactly
            # as fuzzy_prefix_pairs emits no pairs for dropped cells.
            # (The first 50x probe ran WITHOUT this arm's cap and the
            # bootstrap self-join went quadratic under cross-copy block
            # collisions — the guard is load-bearing, not decorative.)
            bcells = vs_index.groupBy(*join_keys).agg(
                F.count(F.lit(1)).alias("__n")
            )
            pairable = vs_index.join(
                F.broadcast(bcells.filter(F.col("__n") <= max_cell)),
                join_keys,
                "left_semi",
            )
        a = pairable.select(
            *[F.col(c) for c in block_cols],
            F.col("__id").alias("__ia"),
            F.col("__pfx").alias("__pa"),
            "__bk",
        )
        hit_batch = (
            a.join(pairable, join_keys)
            .filter(F.col("__ia") < F.col("__id"))
            .filter(
                F.levenshtein(F.col("__pa"), F.col("__pfx"), max_dist)
                >= 0
            )
            .select(F.col("__id").alias("__rej"))
            .distinct()
        )
        admitted = (
            vs_index.join(
                hit_batch, vs_index["__id"] == hit_batch["__rej"], "left_anti"
            )
            .select(
                F.col("__id").alias(id_col),
                *[F.col(c) for c in block_cols],
                F.col("__pfx").alias("pfx"),
                F.col("__bk").alias("bk"),
                "pb",
            )
            .localCheckpoint(eager=False)
        )
        try:
            if admitted.limit(1).count() > 0:
                merge_table(
                    spark,
                    table_dir,
                    admitted,
                    key_cols=[id_col],
                    partition_cols=["pb"],
                    partition_from_key=True,  # text immutable per id
                    expected_base=observed,
                )
            adm = admitted.select(
                F.col(id_col).alias("__id"), F.lit(1).alias("__a")
            )
            return bat.join(adm, "__id", "left").select(
                F.col("__id").alias(id_col),
                "pb",
                F.col("__a").isNotNull().alias("kept"),
            )
        except ConflictError as ex:
            last = ex  # racer committed into our buckets; retry
    raise ConflictError(
        f"linkage admission lost {max_retries} commit races under "
        f"{table_dir}"
    ) from last
