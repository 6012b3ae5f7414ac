"""Bloom-filter semi-join pruning.

The 100 TB problem this solves: a semi-join of a huge fact table
against a selective dim normally shuffles the ENTIRE fact table on the
join key before any row is eliminated.  Spark's own runtime bloom
filter (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects
exactly this rewrite, but its `bloom_filter_agg` / `might_contain`
expressions are not SQL-registered in 4.1, and the injection only
fires under cost heuristics a test can't pin.  This module builds the
same structure explicitly from DataFrame ops:

1. BUILD — one scan of the (already filtered) dim side folds every key
   into an m-bit Bloom filter: k positions per key by double hashing
   (Kirsch-Mitzenmacher: pos_i = h1 + i*h2 mod m), positions grouped
   into 64-bit words, `bit_or` aggregated.  The shuffle moves at most
   m/64 partial-word rows (map-side combined); the driver collects the
   FIXED-SIZE word array (m_bits/64 longs — like the IVF seed collect,
   bounded by a config constant, never by data volume).
2. PROBE — the word array is inlined into a pure filter expression on
   the fact scan: all k bits set => candidate.  Whole-stage codegen,
   no Python, applied BEFORE the join shuffle, so only candidate fact
   rows reach the exchange.
3. EXACT JOIN — a normal left-semi join over the survivors.  A Bloom
   filter has false positives but NEVER false negatives, so the final
   result is bit-identical to the plain semi-join — the oracle for any
   query through this operator is ordinary SQL.

Sizing: false-positive rate ~= (1 - e^(-k*n/m))^k.  Size m from the
DIM cardinality (`sized_m_bits`, ~10 bits/key), never the fact.  The
default k=3 is deliberately BELOW the FP-optimal k ~= 7 at that load:
the probe's cost is k hash-and-test rounds per FACT row (measured at
30M rows on local[32]: k=5 -> 7.8 s, k=3 -> 3.1 s of pure
whole-stage-codegen CPU), while FP only moves 1.7% -> 0.9% — and
every false positive is removed by the trailing exact join anyway, so
k buys CPU, not correctness.  For dims too large for literal
inlining, raise m and switch the probe to a broadcast join against
the word table — same plan shape.

Reference parity: the reference filters events against known-PID sets
via ES terms lookups (SURVEY.md J3); at warehouse scale that shape is
this prune + semi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Second-hash salt for Kirsch-Mitzenmacher double hashing — any
#: constant works; independence comes from xxhash64's avalanche.
_SALT = 0x9E3779B9

#: Largest filter inlined as a single array<long> literal.  Above this
#: the probe switches to broadcast word-table joins: measured at
#: m=2^21 (sf0.1 lineitem probe) the literal path costs ~3.4 s of
#: analysis/codegen on the 32k-element constant plus ~2x probe
#: execution, while the joined path stays at the m=2^16 wall.
INLINE_LIMIT_BITS = 1 << 19


def _h1(key: Column, m_bits: int) -> Column:
    # reduced mod m up front: ANSI mode (Spark 4 default) rejects the
    # wrap-around of raw h1 + i*h2, and (h1 mod m, h2 mod m) is an
    # equally valid double-hash family with bounded arithmetic
    return F.pmod(F.xxhash64(key), F.lit(m_bits))


def _h2(key: Column, m_bits: int) -> Column:
    # forced into [1, m_bits): an h2 of 0 would collapse all k probe
    # positions onto h1, giving that key single-bit protection and a
    # realized FP rate above the (1-e^{-kn/m})^k sizing formula (the
    # standard Kirsch-Mitzenmacher requirement that h2 be nonzero mod m)
    return F.pmod(F.xxhash64(key, F.lit(_SALT)), F.lit(m_bits - 1)) + 1


def sized_m_bits(
    n_keys: int,
    *,
    bits_per_key: int = 10,
    min_bits: int = 1 << 13,
    max_bits: int = 1 << 23,
) -> int:
    """Filter size for `n_keys` build keys: next power of two >=
    bits_per_key * n_keys, clamped.  bits_per_key=10 at the default
    k=3 holds the FP rate near 2% regardless of dim cardinality — the sizing rule
    SCALE.md's 50x probe proves out (a PINNED m saturates: FP -> 1 and
    the prune passes everything, 6.9x wall growth vs 1.5x sized).
    n_keys is the DIM side count — one cheap aggregate on the already
    filtered dim, or any upper bound (oversizing only costs m/64 plan
    literals).  The clamp floor keeps tiny dims codegen-trivial; the
    ceiling (2^23 bits = 1 MB as a single array<long> Literal — 8x the
    largest analysis-profiled probe) marks where the probe should
    switch to a broadcast word-table join instead (module docstring,
    "dims too large for literal inlining")."""
    m = min_bits
    while m < bits_per_key * n_keys and m < max_bits:
        m <<= 1
    return m


def build_bloom(
    dim: DataFrame, key_col: str, *, m_bits: int = 1 << 16, k: int = 3
) -> list[int]:
    """One dim-side scan -> the filter's m_bits/64 words as a Python
    list (the bounded driver collect: size is the config constant
    m_bits, independent of row count)."""
    spark = dim.sparkSession
    ks = F.broadcast(spark.range(k).select(F.col("id").alias("__i")))
    key = F.col(key_col)
    pos = F.pmod(
        _h1(key, m_bits) + F.col("__i") * _h2(key, m_bits), F.lit(m_bits)
    )
    rows = (
        dim.select(key_col)
        .join(ks)
        .select(
            F.floor(pos / 64).cast("int").alias("__w"),
            (pos % 64).cast("int").alias("__b"),
        )
        .selectExpr("__w", "shiftleft(1L, __b) AS __mask")
        .groupBy("__w")
        .agg(F.bit_or("__mask").alias("__word"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for r in rows:
        out[r["__w"]] = r["__word"]
    return out


def bloom_contains(
    key: Column, words: list[int], *, m_bits: int, k: int = 3
) -> Column:
    """Pure-codegen membership test: true iff all k bits are set.
    `words` is inlined as ONE array<long> literal parsed from a single
    SQL string — NOT F.array(*[F.lit(w) ...]) (whose m/64-child
    CreateArray tree made analysis quadratic-ish in m: 54 s to plan the
    m=2^20 probe) and NOT F.lit(list) either (py4j converts that
    per-element on the DRIVER: measured 5.9 s to construct the m=2^20
    probe vs 20 ms as one parsed string; warm execution is identical).
    The variable-amount bit shifts go through the SQL `shiftleft`,
    which (unlike the Python `F.shiftleft`) accepts a column shift
    amount."""
    arr = F.expr(
        "cast(array(" + ",".join(str(int(w)) for w in words) + ") as array<bigint>)"
    )
    h1, h2 = _h1(key, m_bits), _h2(key, m_bits)
    test = F.lit(True)
    for i in range(k):
        pos = F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits))
        word = F.element_at(arr, F.floor(pos / 64).cast("int") + 1)
        bit = (pos % 64).cast("int")
        mask = F.call_function("shiftleft", F.lit(1).cast("long"), bit)
        test = test & (word.bitwiseAND(mask) != 0)
    return test


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    *,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Semi-join `fact` to `dim` with a Bloom pre-prune on the fact
    side.  Result is EXACTLY the plain left-semi join: the prune only
    admits false positives and the real join removes them.

    Two probe shapes, picked by m (the module docstring's "dims too
    large for literal inlining" seam, now implemented): up to
    `INLINE_LIMIT_BITS` the word array is collected and inlined as one
    literal (pure codegen filter, zero joins); above it the words STAY
    DISTRIBUTED as an m/64-row frame and the probe is k broadcast hash
    joins on the word index — no driver materialization at all, and no
    multi-hundred-KB literal for analysis/codegen to chew (measured at
    m=2^21, sf0.1: literal probe 4.5 s wall vs 1.4 s joined)."""
    if m_bits <= INLINE_LIMIT_BITS:
        words = build_bloom(dim, dim_key, m_bits=m_bits, k=k)
        pruned = fact.filter(
            bloom_contains(F.col(fact_key), words, m_bits=m_bits, k=k)
        )
    else:
        pruned = _bloom_prune_join(fact, dim, fact_key, dim_key, m_bits, k)
    return pruned.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key,
        "left_semi",
    )


def _bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Probe via k broadcast hash joins against the distributed word
    frame (same bit arithmetic as `bloom_contains`).  The word frame is
    one dim-side scan + bit_or agg — identical to `build_bloom` minus
    the collect — lazily checkpointed so the k joins share ONE
    materialization; at most m/64 rows broadcast.  Each join keeps a
    fact row only if its word has the probed bit set, so after k joins
    exactly the all-k-bits-set candidates remain — the same survivor
    set the literal filter admits."""
    spark = dim.sparkSession
    ks = F.broadcast(spark.range(k).select(F.col("id").alias("__i")))
    key = F.col(dim_key)
    pos = F.pmod(
        _h1(key, m_bits) + F.col("__i") * _h2(key, m_bits), F.lit(m_bits)
    )
    words = (
        dim.select(dim_key)
        .join(ks)
        .select(
            F.floor(pos / 64).cast("int").alias("__w"),
            (pos % 64).cast("int").alias("__b"),
        )
        .selectExpr("__w", "shiftleft(1L, __b) AS __mask")
        .groupBy("__w")
        .agg(F.bit_or("__mask").alias("__word"))
        .localCheckpoint(eager=False)
    )
    fkey = F.col(fact_key)
    h1, h2 = _h1(fkey, m_bits), _h2(fkey, m_bits)
    pruned = fact
    for i in range(k):
        p = F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits))
        wi, mi = f"__bw{i}", f"__bm{i}"
        pruned = (
            pruned.withColumn(wi, F.floor(p / 64).cast("int"))
            .withColumn(
                mi,
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
                ),
            )
            .join(
                F.broadcast(
                    words.select(
                        F.col("__w").alias(wi), F.col("__word").alias(f"__wv{i}")
                    )
                ),
                wi,
            )
            .filter(F.col(f"__wv{i}").bitwiseAND(F.col(mi)) != 0)
            .drop(wi, mi, f"__wv{i}")
        )
    return pruned
