"""Broadcast range-join enrichment (geo-IP / CIDR analog).

Reference semantics (SURVEY.md F16/F17): logstash enriches each event
with `geoip {source: remoteIP}` and CIDR-list membership tags
(search.conf:287-333).  Spark has no geo-IP builtin; the scalable
pattern is a RANGE JOIN against a broadcast dimension of non-overlapping
[lo, hi] intervals (ip-to-long both sides).

Physical plan: dim is broadcast, so the range predicate runs as a
BroadcastNestedLoopJoin — no shuffle of the fact side.  A full geo-IP
table (~3M ranges, ~100 MB) still broadcasts; if it ever doesn't,
the equi-prefilter below (coarse bucket on the high bits) turns the NLJ
into a broadcast HASH join + residual range check, which is the 100 TB
path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ip_to_long(ip: Column) -> Column:
    """Dotted IPv4 -> int64 (for CIDR/range membership)."""
    parts = F.split(ip, r"\.")
    return (
        parts[0].cast("long") * F.lit(16777216)
        + parts[1].cast("long") * F.lit(65536)
        + parts[2].cast("long") * F.lit(256)
        + parts[3].cast("long")
    )


def range_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    *,
    lo: str = "lo",
    hi: str = "hi",
    how: str = "left",
    bucket_width: int | None = None,
) -> DataFrame:
    """Join facts to the (small, broadcast) ranges dim on
    lo <= value < hi.

    With bucket_width set, both sides are bucketed on
    floor(value / width) first (ranges exploded across the buckets they
    span) so the join is an equi-join on the bucket plus a residual
    range predicate — hash join instead of nested-loop, the shape that
    survives a wide dim at scale.  Requires numeric lo/hi.
    """
    v = F.col(value_col)
    if bucket_width is None:
        cond = (v >= F.col(lo)) & (v < F.col(hi))
        return facts.join(F.broadcast(ranges), cond, how)
    width = int(bucket_width)
    exploded = ranges.withColumn(
        "__rb",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / width).cast("long"),
                F.floor((F.col(hi) - 1) / width).cast("long"),
            )
        ),
    )
    facts_b = facts.withColumn("__fb", F.floor(v / width).cast("long"))
    cond = (
        (F.col("__fb") == F.col("__rb")) & (v >= F.col(lo)) & (v < F.col(hi))
    )
    out = facts_b.join(F.broadcast(exploded), cond, how)
    return out.drop("__fb", "__rb")
