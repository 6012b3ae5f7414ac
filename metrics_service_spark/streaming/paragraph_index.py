"""Persistent corpus paragraph-hash index, maintained incrementally.

The batch operator `operators.dedup.paragraph_dedup_stats` recomputes
corpus-wide paragraph counts from scratch; a continuously-ingested
corpus instead maintains a COUNT INDEX keyed by paragraph hash and
folds each new batch in (the same evolution as
`incremental_near_duplicates_md5` vs the batch MinHash path, and the
reference's incremental portal-hash state, es_eventlog_sync.py:485-547).

State lives in the transactional manifest table (sources/merge_table):
each update is one atomic commit (readers keep their snapshot),
`expected_base` pinning turns racing writers into retried
ConflictErrors, and the hash-bucket partitioning means an update
rewrites only the buckets its batch touches — cost tracks the batch,
not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metrics_service_spark.functions.stable import round_frac

from metrics_service_spark.sources.merge_table import (
    ConflictError,
    current_version,
    merge_table,
    read_table,
)

N_BUCKETS = 16


def batch_paragraph_counts(
    docs: DataFrame, id_col: str, text_col: str, *, chunk_tokens: int = 20
) -> DataFrame:
    """(paragraph_hash, bucket, n) for one document batch — the unit
    the index accumulates.  Same chunking as paragraph_dedup_stats."""
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.greatest(
        F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens)
        ),
    )
    return (
        docs.select(F.explode(chunks).alias("__p"))
        .select(F.md5(F.col("__p")).alias("ph"))
        .groupBy("ph")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bucket", F.pmod(F.xxhash64("ph"), F.lit(N_BUCKETS)).cast("int"))
    )


def update_paragraph_index(
    spark: SparkSession,
    table_dir: str,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 20,
) -> int:
    """Fold a document batch into the persistent index: counts ADD to
    existing hash rows (read-modify-write pinned by expected_base —
    a racing writer's commit raises ConflictError and the add retries
    against the fresh snapshot, never double- or under-counting).
    Only the hash buckets present in the batch are read (manifest
    partition pruning) and rewritten.  Returns the committed version."""
    batch = batch_paragraph_counts(
        docs, id_col, text_col, chunk_tokens=chunk_tokens
    ).localCheckpoint(eager=False)

    last: ConflictError | None = None
    for _ in range(3):
        observed = current_version(table_dir)
        if observed >= 0:
            buckets = [r["bucket"] for r in batch.select("bucket").distinct().collect()]
            prior = None
            try:
                # IN-list manifest pruning: only the touched buckets'
                # files are ever listed to Spark
                prior = read_table(
                    spark, table_dir, partitions={"bucket": buckets}
                )
            except ValueError:
                prior = None  # no files in these buckets yet
            if prior is not None:
                merged = (
                    batch.alias("b")
                    .join(prior.alias("p"), ["ph", "bucket"], "left")
                    .select(
                        "ph",
                        "bucket",
                        (
                            F.col("b.n")
                            + F.coalesce(F.col("p.n"), F.lit(0))
                        ).alias("n"),
                    )
                )
            else:
                merged = batch
        else:
            merged = batch
        try:
            return merge_table(
                spark,
                table_dir,
                merged,
                key_cols=["ph"],
                partition_cols=["bucket"],
                partition_from_key=True,  # bucket = hash(ph)
                # pinned even at bootstrap (-1): a racer creating v0
                # between current_version and this commit must raise,
                # or its overlapping hash rows would be clobbered
                # instead of added to
                expected_base=observed,
            )
        except ConflictError as ex:
            last = ex
    raise last


def duplicate_paragraph_fraction(
    spark: SparkSession,
    table_dir: str,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 20,
) -> DataFrame:
    """Score an INCOMING batch against the index BEFORE folding it in:
    per doc, the fraction of its paragraphs already present in the
    corpus index (the streaming admission filter).  Join is on the
    hash-bucketed index with manifest pruning to the batch's buckets."""
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.greatest(
        F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens)
        ),
    )
    paras = docs.select(
        F.col(id_col).alias("__id"), F.explode(chunks).alias("__p")
    ).select("__id", F.md5(F.col("__p")).alias("ph"))
    try:
        index = read_table(spark, table_dir).select("ph").withColumn(
            "__seen", F.lit(1)
        )
    except FileNotFoundError:
        index = None
    if index is None:
        scored = paras.withColumn("__seen", F.lit(None).cast("int"))
    else:
        scored = paras.join(index, "ph", "left")
    return (
        scored.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_paragraphs"),
            F.sum(F.coalesce(F.col("__seen"), F.lit(0)).cast("long")).alias(
                "n_seen_paragraphs"
            ),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_paragraphs",
            "n_seen_paragraphs",
            round_frac(
                F.col("n_seen_paragraphs"), F.col("n_paragraphs"), 4
            ).alias("seen_fraction"),
        )
    )


def incremental_paragraph_index_refresh(
    spark: SparkSession,
    docs_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 20,
    available_now: bool = True,
):
    """Stream documents -> paragraph index.  A file-source stream over
    the documents directory sees only NEW files (checkpointed offsets
    = exactly-once folding: a replayed batch is redelivered only if
    its offset never committed, the same contract as
    gold_refresh.incremental_star_refresh); each micro-batch folds its
    paragraph counts into the manifest table atomically."""
    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)

    def fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        update_paragraph_index(
            spark,
            table_dir,
            batch,
            id_col=id_col,
            text_col=text_col,
            chunk_tokens=chunk_tokens,
        )

    writer = (
        stream.writeStream.foreachBatch(fold)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
