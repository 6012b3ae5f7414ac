"""Self-trained bigram language-model scoring — the perplexity signal
that feeds CCNet-style quality bucketing (Wenzek et al. 2020: docs are
binned by LM perplexity; `doc_ccnet_bucket` implements the binning,
this module implements the score that real pipelines bin on).

Two forms:

- `bigram_frequency_class` (exact): per document, the mean FREQUENCY
  CLASS of its bigrams, where a bigram's class is floor(log2(count))+1
  computed EXACTLY as the length of the count's binary representation
  (Spark `length(conv(c,10,2))`, DuckDB `length(bin(c))` — integer
  string ops, never IEEE log).  Rare-bigram documents score low ≈ high
  perplexity.  Bit-identical across engines: counts are exact
  integers, the mean uses the repo's integer-arithmetic stable
  rounding.  This is the oracle-checked twin.
- `bigram_perplexity` (float, production form): true add-nothing
  conditional perplexity exp(-mean ln(c_lr / c_l)) over the same
  self-trained counts.  Self-training means no OOV (every scored
  bigram was counted), so no smoothing term is needed.  ln/exp are
  engine-specific IEEE — rows-only checked, exactness delegated to
  the `_fclass` twin that shares every upstream stage.

Scale shape: ONE corpus-sized bigram explode feeds both the count
aggregation and the probe side (shared via a lazy checkpoint, scanned
once); the train/probe join is key-partitioned on the bigram — the
same co-partitioned shuffle pair Catalyst plans for any
self-aggregation join — and the per-doc rollup is the only other
exchange.  Nothing is collected; the count table is never assumed
broadcastable (at 100 TB it is itself corpus-scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metrics_service_spark.functions.stable import round_frac, sql_round_frac


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, l, r) per bigram occurrence over non-empty lowercased
    whitespace tokens.  NOT checkpointed: the count and probe sides
    each re-derive it (two scans — inside the plan-gate budget),
    because materializing the ~20x-corpus exploded bigram set costs
    far more than a second parquet scan at any scale.  `_spread`
    parallelizes the explode off a one-row-group local source (no-op
    on a well-partitioned real input — the r9 serialization trap,
    re-measured here when the 50x probe pinned this entry to one
    core before the spread)."""
    from metrics_service_spark.operators.similarity import _spread

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != F.lit("")
    )
    pair_arr = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("l"),
            F.element_at(toks, i + F.lit(1)).alias("r"),
        ),
    )
    return (
        _spread(docs.select(F.col(id_col), F.col(text_col)))
        .filter(F.size(toks) >= 2)
        .select(F.col(id_col), F.explode(pair_arr).alias("p"))
        .select(id_col, F.col("p.l").alias("l"), F.col("p.r").alias("r"))
    )


def bigram_frequency_class(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_bigrams, sum_fclass, mean_fclass): exact-integer
    frequency-class scoring.  Documents with fewer than two tokens
    have no bigrams and are excluded (no score is defensible for
    them; the oracle applies the same rule)."""
    grams = _doc_bigrams(docs, id_col, text_col)
    counts = grams.groupBy("l", "r").agg(F.count(F.lit(1)).alias("c"))
    fclass = F.length(F.conv(F.col("c"), 10, 2)).cast("long")
    return (
        grams.join(counts, ["l", "r"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(fclass).alias("sum_fclass"),
        )
        .select(
            id_col,
            "n_bigrams",
            "sum_fclass",
            round_frac(F.col("sum_fclass"), F.col("n_bigrams"), 4).alias(
                "mean_fclass"
            ),
        )
    )


def bigram_perplexity(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_bigrams, ppl): conditional bigram perplexity
    exp(-mean ln(c_lr / c_l)) under the self-trained counts — the
    production CCNet filter signal.  Float form; exactness lives in
    the `bigram_frequency_class` twin."""
    grams = _doc_bigrams(docs, id_col, text_col)
    counts = (
        grams.groupBy("l", "r")
        .agg(F.count(F.lit(1)).alias("c_lr"))
        .localCheckpoint(eager=False)
    )
    # c_l = bigram occurrences with left l = sum_r c_lr: rolled up from
    # the (already vocab-sized) count table, not a third corpus scan
    left_counts = counts.groupBy("l").agg(F.sum("c_lr").alias("c_l"))
    lp = F.log(F.col("c_lr").cast("double") / F.col("c_l").cast("double"))
    return (
        grams.join(counts, ["l", "r"])
        .join(left_counts, ["l"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.exp(-F.avg(lp)).alias("ppl"),
        )
    )


# --- DuckDB mirror of the exact form ---------------------------------------
def sql_bigram_fclass(
    *,
    id_col: str = "doc_id",
    docs_table: str = "documents",
    text_col: str = "text",
) -> str:
    return f"""WITH toked AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '\\s+'),
                     w -> w <> '') AS toks
  FROM {docs_table}
),
grams AS (
  SELECT {id_col}, pr.l AS l, pr.r AS r
  FROM toked, UNNEST(list_transform(generate_series(1, len(toks) - 1),
        i -> struct_pack(l := toks[i], r := toks[i + 1]))) t(pr)
  WHERE len(toks) >= 2
),
counts AS (
  SELECT l, r, CAST(count(*) AS BIGINT) AS c FROM grams GROUP BY 1, 2
),
scored AS (
  SELECT g.{id_col}, CAST(length(bin(c.c)) AS BIGINT) AS fclass
  FROM grams g JOIN counts c USING (l, r)
),
agg AS (
  SELECT {id_col},
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(fclass) AS BIGINT) AS sum_fclass
  FROM scored GROUP BY 1
)
SELECT {id_col}, n_bigrams, sum_fclass,
       {sql_round_frac("sum_fclass", "n_bigrams", 4)} AS mean_fclass
FROM agg"""
