"""Deterministic sampling / splitting for training-data pipelines.

Both operators key on a salted md5 of the id, compared as a lowercase
hex PREFIX STRING: for fixed-length lowercase hex, lexicographic order
equals numeric order ('0'-'9' < 'a'-'f' in ASCII), so a threshold like
`hex2 < 'cc'` keeps exactly 204/256 of the uniform hash space — no
hex->int parsing, which keeps the expression bit-identical in Spark
and any SQL oracle.

Scale: pure per-row codegen expressions plus (for the stratified
variant) one broadcast join against the tiny rates dim — a 100 TB
corpus streams through with zero shuffles.

Reference parity: beyond the reference surface (training-pipeline
operators); determinism mirrors the repo-wide no-RNG policy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: (upper-exclusive 2-hex-char threshold, name) — contiguous ranges of
#: the 256-value space: train [00,cc) = 204/256, val [cc,e6) = 26/256,
#: test [e6,ff] = 26/256.
SPLITS: list[tuple[str, str]] = [("cc", "train"), ("e6", "val"), ("zz", "test")]


def _hex2(id_col: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 2)


def hash_split(
    df: DataFrame, id_col: str, *, salt: str = "split", out_col: str = "split"
) -> DataFrame:
    """Assign each row a deterministic train/val/test split (~80/10/10)
    from the salted hash of its id — stable across runs, machines and
    engines; changing `salt` re-rolls every assignment at once."""
    h = _hex2(F.col(id_col), f"{salt}:")
    expr = F.lit(SPLITS[-1][1])
    for cut, name in reversed(SPLITS[:-1]):
        expr = F.when(h < cut, name).otherwise(expr)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    *,
    salt: str = "samp",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically:
    row kept iff hex2(salted id) < the stratum's threshold.  Rates are
    quantized to 1/256 resolution (the 2-hex-char space) so the
    predicate is an exact string comparison on both engines; the rates
    dim is broadcast.  Strata missing from `rates` use `default_rate`.
    """

    def cut(rate: float) -> str:
        n = max(0, min(256, round(rate * 256)))
        return "zz" if n >= 256 else f"{n:02x}"

    spark = df.sparkSession
    rates_df = spark.createDataFrame(
        [(k, cut(v)) for k, v in sorted(rates.items())],
        f"{stratum_col} string, __cut string",
    )
    h = _hex2(F.col(id_col), f"{salt}:")
    return (
        df.join(F.broadcast(rates_df), stratum_col, "left")
        .withColumn("__cut", F.coalesce(F.col("__cut"), F.lit(cut(default_rate))))
        .filter(h < F.col("__cut"))
        .drop("__cut")
    )


def mixture_rates(
    df: DataFrame,
    stratum_col: str,
    *,
    targets_pm: dict[str, int],
    budget: int,
) -> DataFrame:
    """Per-stratum sampling thresholds to reshape the corpus toward a
    target mixture (the DoReMi/Pile-style domain-reweighting step):
    stratum s should contribute ~ targets_pm[s]/1000 of a `budget`-row
    sample, so its keep-threshold over the 256-value hash space is

        thr_s = min(256, (targets_pm[s] * budget * 256) div (1000 * n_s))

    — all integer arithmetic (div), so Spark and a SQL oracle agree
    bit-for-bit.  thr >= 256 means the stratum is under-represented
    even kept whole (keep all; an upsampling pass is a separate
    concern).  Strata absent from targets_pm are dropped (weight 0).
    Returns (stratum, n_docs, thr)."""
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(k, v) for k, v in targets_pm.items()],
        f"{stratum_col} string, __w int",
    )
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_docs"))
    return counts.join(F.broadcast(tgt), stratum_col).select(
        stratum_col,
        "n_docs",
        F.least(
            F.lit(256),
            F.expr(f"div(__w * {int(budget)}L * 256, 1000 * n_docs)"),
        )
        .cast("int")
        .alias("thr"),
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    *,
    targets_pm: dict[str, int],
    budget: int,
    salt: str = "mix",
) -> DataFrame:
    """Deterministically resample the corpus toward the target mixture:
    row kept iff its salted 2-hex hash is below its stratum's
    `mixture_rates` threshold.  One tiny broadcast join + per-row
    codegen predicate — zero corpus shuffles."""
    rates = mixture_rates(
        df, stratum_col, targets_pm=targets_pm, budget=budget
    )
    h = _hex2(F.col(id_col), f"{salt}:")
    thr_hex = F.lpad(F.lower(F.hex(F.col("thr"))), 2, "0")
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter((F.col("thr") >= 256) | (h < thr_hex))
        .drop("n_docs", "thr")
    )


def per_group_quota(
    df: DataFrame,
    group_col: str,
    id_col: str,
    *,
    quota: int,
) -> DataFrame:
    """Per-group quota capping (the Common-Crawl domain-balancing
    pass): keep at most `quota` rows per group, chosen by the
    deterministic md5(id) draw — no group may dominate the corpus
    regardless of its raw mass.  One cell-keyed shuffle; the per-group
    top-k is WindowGroupLimit-pushed map-side, so a 10^8-row group
    costs its partitions only a streaming top-quota pass.  Output:
    (id, group, rk)."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.select(group_col, id_col)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= quota)
        .select(id_col, group_col, F.col("rk").cast("int").alias("rk"))
    )


def _hex4_int(h: Column) -> Column:
    """First 4 hex chars of an md5 hex digest -> integer in
    [0, 65536): per-char ascii arithmetic (ascii(c)-48, minus 39 more
    for 'a'-'f') — both engines have ascii(), so no base-conversion
    builtin is needed and the oracle replays it character for
    character (`sql_hex4_int`)."""

    def hv(i: int) -> Column:
        c = F.substring(h, i, 1)
        return F.ascii(c) - F.when(c >= "a", F.lit(87)).otherwise(F.lit(48))

    return ((hv(1) * 16 + hv(2)) * 16 + hv(3)) * 16 + hv(4)


def sql_hex4_int(hexpr: str) -> str:
    """DuckDB twin of :func:`_hex4_int` over the hex expression
    `hexpr` (evaluated once per character position)."""
    terms = []
    for i, mult in ((1, 4096), (2, 256), (3, 16), (4, 1)):
        c = f"substr({hexpr}, {i}, 1)"
        terms.append(
            f"(ascii({c}) - CASE WHEN {c} >= 'a' THEN 87 ELSE 48 END)"
            + (f" * {mult}" if mult > 1 else "")
        )
    return "(" + " + ".join(terms) + ")"


def shuffle_shard(
    df: DataFrame,
    id_col: str,
    *,
    n_shards: int = 16,
    salt: str = "shard",
) -> DataFrame:
    """Deterministic global shuffle + shard manifest — the last step
    of every training-data pipeline: shuffle the curated corpus,
    cut it into `n_shards` shards, and fix a reproducible order
    within each.  The salted md5 key IS the shuffle (uniform,
    engine-portable, re-rolled wholesale by changing `salt`):
    shard = hex4(key) % n_shards, pos = row_number within the shard
    ordered by (key, id).

    Scale: assignment is per-row codegen; the one shuffle is the
    per-shard window, whose partition mass is rows/n_shards — the
    caller derives `n_shards` from the corpus row count (parquet
    footer stats) to hold shards at a target size, the same
    geometry-scales-with-data contract as the embedding cell family.
    Output (id, shard, pos)."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy(
        F.col("__key").asc(), F.col(id_col).asc()
    )
    return (
        df.select(
            F.col(id_col),
            h.alias("__key"),
            (_hex4_int(h) % n_shards).cast("int").alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w).cast("int"))
        .select(id_col, "shard", "pos")
    )


def isqrt_long(x: Column) -> Column:
    """Exact floor(sqrt(x)) for BIGINT 0 <= x < 2^52, engine-portable:
    the double sqrt of an exactly-representable x is within one ULP of
    the true root, so floor() lands within +-1 of isqrt(x) and ONE
    additive correction step makes it exact — the same expression (and
    therefore the same result) on Spark and in the DuckDB oracle twin
    (see catalog's temperature-mix entry), with no reliance on either
    engine's libm rounding at perfect-square knife edges."""
    y0 = F.floor(F.sqrt(x.cast("double"))).cast("long")
    return (
        y0
        + F.when((y0 + 1) * (y0 + 1) <= x, F.lit(1)).otherwise(F.lit(0))
        - F.when(y0 * y0 > x, F.lit(1)).otherwise(F.lit(0))
    )


def temperature_source_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    *,
    keep_total: int,
) -> DataFrame:
    """Temperature-flattened source mixing at alpha = 0.5 (the
    Gopher/The-Pile domain-rebalancing pass): per-source keep quotas
    proportional to sqrt(n_s) instead of n_s, so head domains stop
    dominating the training mix while long-tail sources keep presence.
    quota_s = round_half_up(keep_total * isqrt(n_s) / sum isqrt(n_s)),
    rows chosen per source by the deterministic md5(id) draw — every
    step integer arithmetic (exact isqrt + round_frac_bigint), so the
    whole pass is oracle-replayable bit-for-bit.  Simple per-source
    rounding means the realized total is keep_total +- n_sources/2 —
    the right trade at corpus scale, where largest-remainder
    apportionment would cost a global sort for a cosmetic exactness.

    Scale: one map-side-combined count agg (rows ~ n_sources), the
    quota frame broadcast back, and ONE source-keyed window rank over
    the corpus — quotas vary per group, so the rank filter cannot push
    as a WindowGroupLimit constant, but it is still a single streaming
    pass per partition after the one source-keyed shuffle.  Output:
    (id, group, rk) for the kept rows."""
    from metrics_service_spark.functions.stable import round_frac_bigint

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    weights = counts.select(
        group_col, isqrt_long(F.col("__n")).alias("__w")
    )
    total = weights.agg(F.sum("__w").alias("__tw"))
    quotas = weights.crossJoin(F.broadcast(total)).select(
        group_col,
        round_frac_bigint(
            F.col("__w") * F.lit(keep_total), F.col("__tw"), 0
        ).alias("__q"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.select(group_col, id_col)
        .withColumn("rk", F.row_number().over(w))
        .join(F.broadcast(quotas), group_col)
        .filter(F.col("rk") <= F.col("__q"))
        .select(id_col, group_col, F.col("rk").cast("int").alias("rk"))
    )


def _floordiv_long(x: Column, y: Column) -> Column:
    """Exact floor-division of two non-negative BIGINTs below 2^52:
    `(x - pmod(x, y)) / y` — one correctly-rounded (here exact) IEEE
    division, bit-identical to an integer `//` in any SQL oracle."""
    return ((x - F.pmod(x, y)) / y).cast("long")


def epoch_cap_source_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    *,
    budget: int,
    max_epochs: int = 3,
) -> DataFrame:
    """UniMax-style epoch-capped source mixing (Chung et al. 2023, the
    other public mixing recipe next to sqrt-temperature flattening):
    spread a total example ``budget`` as UNIFORMLY as possible across
    sources, except no source may repeat more than ``max_epochs``
    times.  Integer waterfilling in closed form — no driver loop:

    * capacity ``c_s = max_epochs * n_s``; sort sources by
      ``(c_s, source)``.  With inclusive prefix sums ``P_i`` over the
      sorted order, source ``i`` is SATURATED (gets its full capacity)
      iff ``c_i * (m - i + 1) <= budget - P_{i-1}`` — for sorted
      capacities the saturated set is a prefix, so the classic
      sequential waterfill collapses to one window pass.
    * the unsaturated remainder splits the leftover evenly,
      first-``(R mod m')`` sources in sort order taking the odd unit —
      every step plain BIGINT, so the DuckDB oracle replays it
      bit-for-bit.
    * realized per-source draw: ``e = q // n_s`` full epochs for every
      document plus one extra epoch for the first ``q mod n_s``
      documents in the deterministic md5 rank — output one row per
      (document, epoch).

    Scale: one map-side-combined count agg collapses the corpus to
    ``m`` rows; the waterfill windows run over that tiny frame; the
    quota frame broadcasts back; and the corpus pays exactly ONE
    source-keyed shuffle for the rank window before the per-row epoch
    explode.  Invariant (tested): output rows ==
    ``min(budget, max_epochs * corpus_rows)``.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    caps = counts.select(
        group_col, "__n", (F.col("__n") * F.lit(max_epochs)).alias("__c")
    )
    wo = Window.orderBy(F.col("__c").asc(), F.col(group_col).asc())
    pref = caps.select(
        group_col,
        "__n",
        "__c",
        F.row_number().over(wo).alias("__i"),
        F.sum("__c")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("__P"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("__m"),
    )
    # the waterfill frame has TWO consumers (the level aggregate and
    # the quota projection) — one lazy checkpoint keeps the corpus
    # count-scan from running twice (tests/test_plan_quality.py's
    # duplicate-subtree rule)
    sat = pref.withColumn(
        "__sat",
        F.col("__c") * (F.col("__m") - F.col("__i") + 1)
        <= F.lit(budget) - (F.col("__P") - F.col("__c")),
    ).localCheckpoint(eager=False)
    level = sat.agg(
        F.coalesce(
            F.max(F.when(F.col("__sat"), F.col("__i"))), F.lit(0)
        ).alias("__S"),
        F.coalesce(
            F.max(F.when(F.col("__sat"), F.col("__P"))),
            F.lit(0).cast("long"),
        ).alias("__PS"),
    )
    rem = F.lit(budget) - F.col("__PS")
    # greatest(..., 1) keeps the divisor legal when every source is
    # saturated (the branch is then never selected, but ANSI division
    # must not see a zero)
    m_unsat = F.greatest(F.col("__m") - F.col("__S"), F.lit(1)).cast("long")
    quotas = (
        sat.crossJoin(F.broadcast(level))
        .select(
            group_col,
            "__n",
            F.when(F.col("__i") <= F.col("__S"), F.col("__c"))
            .otherwise(
                _floordiv_long(rem, m_unsat)
                + F.when(
                    (F.col("__i") - F.col("__S")) <= F.pmod(rem, m_unsat),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("__q"),
        )
        .select(
            group_col,
            _floordiv_long(F.col("__q"), F.col("__n")).alias("__e"),
            F.pmod(F.col("__q"), F.col("__n")).alias("__r"),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.select(group_col, id_col)
        .withColumn("rk", F.row_number().over(w))
        .join(F.broadcast(quotas), group_col)
        .withColumn(
            "__n_ep",
            (
                F.col("__e")
                + F.when(F.col("rk") <= F.col("__r"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).cast("int"),
        )
        .filter(F.col("__n_ep") > 0)
        .select(
            id_col,
            group_col,
            F.explode(F.sequence(F.lit(1), F.col("__n_ep"))).alias("epoch"),
        )
    )


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    *,
    group_cols: list[str] | None = None,
    k: int = 20,
    salt: str = "ps",
) -> DataFrame:
    """Weighted priority sampling (Duffield, Lund & Thorup 2007): each
    row gets priority q_i = w_i / u_i with u_i uniform, and the sample
    is the top-k by priority — inclusion probability grows with the
    weight while every row keeps a chance, the standard
    quality-weighted corpus subsample (contrast `stratified_sample`'s
    weight-blind rates and `per_group_quota`'s hard caps).

    Determinism contract: u_i is the md5 hex8 of (salt, id) — a
    32-bit uniform both engines replay — and the priority is the
    FLOOR-QUANTIZED integer (w << 32) div u (exact long arithmetic,
    ties to the lower id), so the selected set is bit-identical across
    engines; the quantization only reorders pairs whose true
    priorities differ by < 1, i.e. by less than the scheme's own noise.
    Overflow bound: w * 2^32 must fit a long — weights up to ~2*10^9
    are safe (lengths, token counts, basis-point scores all qualify).

    Scale shape: one pure projection (md5 + integer arithmetic), ONE
    group-keyed exchange, and a WindowGroupLimit-pushed top-k — the
    doc_source_quota class.  k and the group count bound the output,
    never the corpus."""
    group_cols = list(group_cols or [])
    u = (
        _hex4_int(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
        ).cast("long")
        * F.lit(65536)
        + _hex4_int(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
                ),
                5,
                4,
            )
        ).cast("long")
        + F.lit(1)
    )
    w = F.col(weight_col).cast("long")
    scored = df.select(
        *[F.col(c) for c in group_cols],
        F.col(id_col),
        w.alias("weight"),
        ((w * F.lit(4294967296)).cast("long")).alias("__num"),
        u.alias("__u"),
    ).select(
        *group_cols,
        id_col,
        "weight",
        F.expr("__num div __u").alias("priority_q"),
    )
    win = Window.partitionBy(
        *[F.col(c) for c in group_cols] if group_cols else [F.lit(1)]
    ).orderBy(F.col("priority_q").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(
            *group_cols, id_col, "weight", "priority_q",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def sql_priority_sample(
    *,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    table: str = "documents",
    group_cols: list[str] | None = None,
    k: int = 20,
    salt: str = "ps",
) -> str:
    """DuckDB twin of :func:`priority_sample` (same hex8 ascii
    arithmetic, same floor division, same tie rule)."""
    group_cols = list(group_cols or [])
    g = ", ".join(group_cols)
    gsel = f"{g}, " if g else ""
    hexpr = f"md5('{salt}:' || CAST({id_col} AS VARCHAR))"
    u = (
        f"(CAST({sql_hex4_int(hexpr)} AS BIGINT) * 65536 + "
        f"CAST({sql_hex4_int(f'substr({hexpr}, 5, 4)')} AS BIGINT) + 1)"
    )
    part = f"PARTITION BY {g}" if g else ""
    return f"""
WITH p AS (
  SELECT {gsel}{id_col}, CAST({weight_col} AS BIGINT) AS weight,
         (CAST({weight_col} AS BIGINT) * 4294967296) // {u} AS priority_q
  FROM {table}
)
SELECT {gsel}{id_col}, weight, priority_q, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER ({part}
            ORDER BY priority_q DESC, {id_col}) AS rank
  FROM p
) WHERE rank <= {k}
"""
