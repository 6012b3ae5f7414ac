"""Top-fraction selection gates for training-data quality filtering.

The naive exact gate — ``percent_rank()`` over an unpartitioned window —
is a single-task global sort: correct, and the right ORACLE twin, but
wrong at 10^9 documents.  Two scale paths:

``top_fraction``
    EXACT distributed selection for bounded-cardinality scores (the
    quality score is rounded to 4 decimals, so it takes at most ~20k
    distinct values no matter the corpus size).  One map-side-combined
    groupBy builds the value histogram; the cumulative-count window and
    cutoff search then run over the tiny histogram, never the corpus;
    the corpus itself is only ever filtered.  Produces the bit-identical
    result to ``percent_rank() <= frac`` with (score DESC, id ASC)
    ordering — so it shares the exact DuckDB oracle.

``top_fraction_approx``
    For unbounded/continuous scores: ``approxQuantile`` cutoff (one
    distributed GK-sketch pass) + a plain value filter.  Ties at the
    cutoff are all kept, so the kept fraction is approximate two ways
    (sketch error + tie inclusion); no oracle is claimed.

Reference parity: the reference has no quality gate (this is part of
the beyond-reference LLM-pipeline surface); the percentile semantics
mirror the catalog's oracle variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_fraction(
    scored: DataFrame,
    *,
    score_col: str,
    id_col: str,
    frac: float = 0.5,
    materialize: bool = True,
) -> DataFrame:
    """Keep the top ``frac`` of rows by (score DESC, id ASC), exactly
    matching ``percent_rank() OVER (ORDER BY score DESC, id ASC) <=
    frac`` — i.e. keep k = floor((n-1)*frac) + 1 rows — without ever
    globally sorting the corpus.

    Plan shape: histogram groupBy (shuffle of <=|distinct scores| rows),
    a window + top-1 over the tiny histogram, then two corpus filters
    joined against the broadcast 1-row cutoff.  The only per-row window
    runs on the boundary group (rows tied AT the cutoff value) to rank
    ties by id; degenerate corpora where most rows share one score fall
    back to sorting that one group.

    Returns the ``id_col`` column only (matching the window variant).

    With ``materialize`` (default) the (id, score) projection is
    computed ONCE and checkpointed — ~16 bytes/row — instead of
    re-deriving the scores (typically expensive text expressions over
    the full corpus) for the histogram, the above-cutoff filter and
    the boundary group separately.  On a cluster swap localCheckpoint
    for a reliable checkpoint (SCALE.md).
    """
    scored = scored.select(id_col, score_col)
    if materialize:
        scored = scored.localCheckpoint(eager=False)
    sc = F.col(score_col)
    hist = scored.groupBy(score_col).agg(F.count(F.lit(1)).alias("__c"))
    tot = hist.agg(F.sum("__c").alias("__n"))
    wcum = Window.orderBy(sc.desc()).rowsBetween(Window.unboundedPreceding, 0)
    cutoff = (
        hist.withColumn("__cum", F.sum("__c").over(wcum))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "__k",
            (F.floor((F.col("__n") - 1) * F.lit(frac)) + 1).cast("long"),
        )
        .filter(F.col("__cum") >= F.col("__k"))
        .orderBy(sc.desc())
        .limit(1)
        .select(
            sc.alias("__cut"),
            # rows still needed once everything above the cut is kept
            (F.col("__k") - (F.col("__cum") - F.col("__c"))).alias("__m"),
        )
    )
    # NULL-score handling mirrors the percent_rank twin: desc ordering
    # puts NULLs LAST, so when the cutoff lands in the NULL group every
    # non-null score is "above" it (plain sc > NULL would match
    # nothing) and the boundary tie-group is matched null-safely
    above = (
        scored.crossJoin(F.broadcast(cutoff))
        .filter(
            F.when(F.col("__cut").isNull(), sc.isNotNull()).otherwise(
                sc > F.col("__cut")
            )
        )
        .select(id_col)
    )
    wtie = Window.partitionBy(score_col).orderBy(F.col(id_col).asc())
    boundary = (
        scored.join(F.broadcast(cutoff), sc.eqNullSafe(F.col("__cut")))
        .withColumn("__r", F.row_number().over(wtie))
        .filter(F.col("__r") <= F.col("__m"))
        .select(id_col)
    )
    return above.unionByName(boundary)


def group_quantile_disc(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    q: float,
) -> DataFrame:
    """Exact per-group DISCRETE quantile (an actual element, the one at
    1-based rank floor((n-1)*q)+1 in ascending order) — the same
    bounded-cardinality histogram trick as ``top_fraction``: one
    map-side-combined (group, value) count, a cumulative window over
    DISTINCT VALUES per group (bounded), and a min over qualifying
    values.  No per-group sort of raw rows at any scale.

    Returns one row per group: (*group_cols, q_value, n).
    """
    gv = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("__c"))
    wtot = Window.partitionBy(*group_cols)
    # asc_nulls_last matches the SQL-standard ORDER BY (and the DuckDB
    # oracle): NULL values rank after every real value, so the quantile
    # is NULL only when k exceeds the non-null population
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(value_col).asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = gv.withColumn("__n", F.sum("__c").over(wtot)).withColumn(
        "__cum", F.sum("__c").over(wcum)
    )
    k = (F.floor((F.col("__n") - 1) * F.lit(q)) + 1).cast("long")
    # min_by(__cum) picks the FIRST qualifying histogram row in rank
    # order — unlike min(value), it correctly returns NULL when the
    # quantile falls inside the NULL group
    return (
        ranked.filter(F.col("__cum") >= k)
        .groupBy(*group_cols)
        .agg(
            F.min_by(value_col, "__cum").alias("q_value"),
            F.first("__n").alias("n"),
        )
    )


def top_fraction_approx(
    scored: DataFrame,
    *,
    score_col: str,
    id_col: str,
    frac: float = 0.5,
    relative_error: float = 0.01,
) -> DataFrame:
    """Approximate gate for unbounded scores: one Greenwald-Khanna
    sketch pass for the (1-frac) quantile cutoff, then a plain filter.
    Keeps all ties at the cutoff; kept fraction is frac +- (sketch
    error + tie mass).  No oracle — use ``top_fraction`` when the score
    has bounded cardinality and exactness matters."""
    (cut,) = scored.approxQuantile(score_col, [1.0 - frac], relative_error)
    return scored.filter(F.col(score_col) >= F.lit(cut)).select(id_col)


def percentile_buckets(
    scored: DataFrame,
    *,
    score_col: str,
    id_col: str,
    fracs: tuple[float, ...] = (1 / 3, 2 / 3),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    materialize: bool = True,
    max_distinct_scores: int | None = 100_000,
) -> DataFrame:
    """CCNet-style quality bucketing: label every row by which global
    score percentile band it falls in — ``labels[i]`` for rows ranked
    (score DESC, id ASC) within the top ``fracs[i]`` fraction, the
    last label for the rest.  Bit-identical to the window twin

        CASE WHEN row_number() <= floor((n-1)*frac_i)+1 THEN label_i ...

    but with NO global sort: the same bounded-cardinality histogram as
    ``top_fraction`` yields one (cut value, boundary quota) row per
    frac; the corpus is then joined against the broadcast cutoffs, and
    only rows tied AT a cutoff value need a (score-partitioned) tie
    rank.  Returns (id, score, bucket).

    Contract: the cumulative window runs over the score HISTOGRAM on
    ONE task, so it is safe only while the score column has bounded
    cardinality (rounded/quantized scores — the CCNet entry rounds to
    4 dp, <= 10^4 distinct values per unit range).  Feeding raw
    continuous scores would silently build a corpus-sized single-task
    window; ``max_distinct_scores`` (same discipline as the
    ``max_cell``/``max_bucket`` guards) makes that an ERROR instead:
    an inline ``assert_true`` fused into the histogram window fails
    fast at row cap+1 with no extra Spark job.  ``None`` disables.
    """
    if len(labels) != len(fracs) + 1:
        raise ValueError("need exactly one more label than fracs")
    scored = scored.select(id_col, score_col)
    if materialize:
        scored = scored.localCheckpoint(eager=False)
    sc = F.col(score_col)
    hist = scored.groupBy(score_col).agg(F.count(F.lit(1)).alias("__c"))
    tot = hist.agg(F.sum("__c").alias("__n"))
    wcum = Window.orderBy(sc.desc()).rowsBetween(Window.unboundedPreceding, 0)
    cum_col = F.sum("__c").over(wcum)
    if max_distinct_scores is not None:
        # jobless cardinality guard: both window functions share one
        # Window node; the assert trips while the (single) partition
        # streams, before the oversized histogram is fully buffered
        rank = F.row_number().over(Window.orderBy(sc.desc()))
        guard = F.assert_true(
            rank <= F.lit(max_distinct_scores),
            F.lit(
                "percentile_buckets: score cardinality exceeds "
                f"max_distinct_scores={max_distinct_scores}; round or "
                "quantize the score column (the single-task histogram "
                "window is only safe at bounded cardinality)"
            ),
        )
        cum_col = F.when(guard.isNull(), cum_col)
    cum = (
        hist.withColumn("__cum", cum_col)
        .crossJoin(F.broadcast(tot))
        .localCheckpoint(eager=False)  # one tiny frame, len(fracs) consumers
    )
    cuts = None
    for i, frac in enumerate(fracs):
        cut_i = (
            cum.withColumn(
                "__k",
                (F.floor((F.col("__n") - 1) * F.lit(frac)) + 1).cast("long"),
            )
            .filter(F.col("__cum") >= F.col("__k"))
            .orderBy(sc.desc())
            .limit(1)
            .select(
                F.lit(i).alias("__b"),
                sc.alias("__cut"),
                (F.col("__k") - (F.col("__cum") - F.col("__c"))).alias("__m"),
            )
        )
        cuts = cut_i if cuts is None else cuts.unionByName(cut_i)
    above = (
        scored.crossJoin(F.broadcast(cuts))
        .filter(
            F.when(F.col("__cut").isNull(), sc.isNotNull()).otherwise(
                sc > F.col("__cut")
            )
        )
        .select(id_col, "__b")
    )
    # only rows tied AT a cutoff value enter the tie-rank window — the
    # per-score groups are bounded, the corpus is never globally sorted
    wtie = Window.partitionBy(score_col, "__b").orderBy(F.col(id_col).asc())
    boundary = (
        scored.join(F.broadcast(cuts), sc.eqNullSafe(F.col("__cut")))
        .withColumn("__r", F.row_number().over(wtie))
        .filter(F.col("__r") <= F.col("__m"))
        .select(id_col, "__b")
    )
    admitted = (
        above.unionByName(boundary).groupBy(id_col).agg(F.min("__b").alias("__b"))
    )
    label_expr = F.element_at(
        F.array(*[F.lit(x) for x in labels]),
        (F.coalesce(F.col("__b"), F.lit(len(fracs))) + 1).cast("int"),
    )
    return (
        scored.join(admitted, id_col, "left")
        .select(id_col, score_col, label_expr.alias("bucket"))
    )
