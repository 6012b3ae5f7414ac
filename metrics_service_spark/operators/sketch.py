"""Count-min sketch over a key stream — the sublinear heavy-hitter
counter (Cormode & Muthukrishnan 2005), built entirely from DataFrame
aggregations so both the sketch and its estimates replay in a SQL
oracle bit-for-bit.

The sketch is a (depth x width) counter grid: each key increments one
bucket per row j.  All depth buckets come from ONE md5 digest — row j
reads the digest's j-th 4-hex-char window (32 hex chars = 8
independent 16-bit hashes, so depth <= 8 costs a single md5 per
occurrence; the per-(key, arm) md5 variant measured 29.9x at the 50x
probe, the md5-CPU-wall class, and this windowed form quarters the
digest work).  Same engine-portable md5/ascii hashing as every
deterministic operator here (operators/sampling.py `_hex4_int`).  A
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


def _cms_digest(key: Column, salt: str) -> Column:
    return F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string")))


def _cms_bucket(digest: Column, j: int, width: int) -> Column:
    return (
        _hex4_int(F.substring(digest, 4 * j + 1, 4)) % F.lit(width)
    ).cast("int")


def _check_geometry(width: int, depth: int) -> None:
    """Shared build/estimate-side geometry guard: parameters must match
    across the seam, so BOTH sides reject what either would."""
    if not (0 < width <= 65536 and 65536 % width == 0):
        # the bucket is hash16 % width; a non-divisor width would give
        # modulo-biased buckets (estimates stay valid upper bounds, but
        # the uniformity term in the CMS error bound silently weakens)
        raise ValueError("cms width must divide the 16-bit hash space")
    if not 0 < depth <= 8:
        raise ValueError("cms depth must fit the md5 digest (<= 8 windows)")


def _cms_arms(key: Column, width: int, depth: int, salt: str) -> Column:
    """The (j, bucket) probe array: each arm reads a disjoint 4-hex
    window of one digest.  The digest expression appears depth*4 times
    syntactically but whole-stage codegen's subexpression elimination
    computes it once — measured equal to the 4-separate-md5 form and
    2x FASTER than routing through the `_bind1` interpreted-transform
    idiom (5M rows: inline 3.6 s, _bind1 7.5 s; the HOF's per-row
    interpreted eval costs more than it saves here, unlike the
    per-EXPLODED-row re-evaluation cases _bind1 exists for)."""
    d = _cms_digest(key, salt)
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                _cms_bucket(d, j, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    weight_col: str | None = None,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Fold a key stream into CMS cells (j, bucket, cnt).  Sparse:
    cells no key hashed into are absent (they are exact zeros —
    `cms_estimate` coalesces them).

    Without ``weight_col`` each input row is one occurrence.  With it,
    each row adds ``weight_col`` occurrences of its key — feed
    PRE-AGGREGATED (key, count) rows and the depth-amplified shuffle
    runs over distinct-key mass instead of raw occurrence mass, which
    is identical arithmetic (a bucket's count is the sum over its
    keys' counts) and the form a calibration pipeline wants, since it
    must compute the exact counts anyway.

    Geometry: ``width`` must divide the 16-bit hash space (65536 % width
    == 0, e.g. 512/1024/2048 — a non-divisor like 1000 raises; modulo
    bias would silently weaken the uniformity term in the CMS error
    bound) and ``depth`` <= 8; `cms_estimate` enforces the identical
    rule so a mismatch fails loudly on either side of the seam."""
    _check_geometry(width, depth)
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        df.select(
            w.cast("long").alias("__w"),
            F.explode(_cms_arms(F.col(key_col), width, depth, salt)).alias("a"),
        )
        .select("__w", F.col("a.j").alias("j"), F.col("a.bucket").alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.sum("__w").alias("cnt"))
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
    build or the estimates are garbage (same salt/width/depth, and the
    same geometry rule: width a divisor of 65536, depth <= 8)."""
    _check_geometry(width, depth)
    probes = keys.select(
        F.col(key_col),
        F.explode(_cms_arms(F.col(key_col), width, depth, salt)).alias("a"),
    ).select(key_col, F.col("a.j").alias("j"), F.col("a.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("cms_est"))
    )


def sql_cms_bucket(key_expr: str, j: int, width: int, salt: str) -> str:
    """DuckDB twin of :func:`_cms_bucket` (same one-digest windowing,
    same hex4/ascii arithmetic, same mod)."""
    h = f"substr(md5('{salt}:' || CAST(({key_expr}) AS VARCHAR)), {4 * j + 1}, 4)"
    return f"({sql_hex4_int(h)} % {width})"


def sql_cms_arms(key_expr: str, *, width: int, depth: int, salt: str) -> str:
    """A DuckDB ``unnest`` producing this key's (j, bucket) probe rows —
    the literal-unrolled twin of the Spark arms array."""
    structs = ", ".join(
        f"{{'j': {j}, 'bucket': {sql_cms_bucket(key_expr, j, width, salt)}}}"
        for j in range(depth)
    )
    return f"unnest([{structs}])"
