"""Count-min sketch over a key stream — the sublinear heavy-hitter
counter (Cormode & Muthukrishnan 2005), built entirely from DataFrame
aggregations so both the sketch and its estimates replay in a SQL
oracle bit-for-bit.

The sketch is a (depth x width) counter grid: each key increments one
bucket per row j, bucket_j(key) = hex4(md5("{salt}{j}:" || key)) mod
width — the same engine-portable md5/ascii hashing every deterministic
operator in this repo uses (operators/sampling.py `_hex4_int`).  A
key's estimate is the MIN of its depth buckets: always >= the true
count (collisions only ever add), with the overshoot bounded by
(stream length / width) per row w.h.p.

Scale: the build is one explode(depth) + one map-side-combined groupBy
that collapses a 100 TB key stream to at most depth*width cells — the
sketch FITS IN A BROADCAST no matter the corpus, which is the whole
point: downstream estimation is a broadcast join, no second corpus
pass.  Beyond-reference surface (training-pipeline corpus statistics);
the HLL/KMV distinct-count twins live in catalog/core.py (A2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metrics_service_spark.operators.sampling import _hex4_int, sql_hex4_int


def _cms_bucket(key: Column, j: int, width: int, salt: str) -> Column:
    h = F.md5(F.concat(F.lit(f"{salt}{j}:"), key.cast("string")))
    return (_hex4_int(h) % F.lit(width)).cast("int")


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Fold a key stream (one occurrence per row) into CMS cells
    (j, bucket, cnt).  Sparse: cells no key hashed into are absent
    (they are exact zeros — `cms_estimate` coalesces them)."""
    if not 0 < width <= 65536:
        raise ValueError("cms width must divide the 16-bit hash space")
    arms = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                _cms_bucket(F.col(key_col), j, width, salt).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(arms).alias("a"))
        .select(F.col("a.j").alias("j"), F.col("a.bucket").alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: re-derive the
    key's depth buckets, broadcast-join the (tiny) sketch, and take the
    per-key MIN.  Adds a ``cms_est`` column; parameters must match the
    build or the estimates are garbage (same salt/width/depth)."""
    arms = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                _cms_bucket(F.col(key_col), j, width, salt).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    probes = keys.select(
        F.col(key_col), F.explode(arms).alias("a")
    ).select(key_col, F.col("a.j").alias("j"), F.col("a.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("cms_est"))
    )


def sql_cms_bucket(key_expr: str, j: int, width: int, salt: str) -> str:
    """DuckDB twin of :func:`_cms_bucket` (same salt framing, same
    hex4/ascii arithmetic, same mod)."""
    h = f"md5('{salt}{j}:' || CAST(({key_expr}) AS VARCHAR))"
    return f"({sql_hex4_int(h)} % {width})"


def sql_cms_arms(key_expr: str, *, width: int, depth: int, salt: str) -> str:
    """A DuckDB ``unnest`` producing this key's (j, bucket) probe rows —
    the literal-unrolled twin of the Spark arms array."""
    structs = ", ".join(
        f"{{'j': {j}, 'bucket': {sql_cms_bucket(key_expr, j, width, salt)}}}"
        for j in range(depth)
    )
    return f"unnest([{structs}])"
