"""Count-min sketch: the one-sided error guarantee (est >= truth for
EVERY key), exactness when nothing collides, and parameter hygiene."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metrics_service_spark.operators.sketch import cms_build, cms_estimate


def _stream(spark, freqs: dict):
    rows = [(k,) for k, n in freqs.items() for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_cms_never_undercounts(spark):
    # 40 keys with skewed frequencies into a deliberately tiny sketch
    # (width 16) so collisions are guaranteed: every estimate must
    # still be >= the true count, and the heaviest key's estimate is
    # at least its own mass
    freqs = {f"k{i}": (40 - i) for i in range(40)}
    df = _stream(spark, freqs)
    sk = cms_build(df, "k", width=16, depth=3)
    keys = spark.createDataFrame([(k,) for k in freqs], "k string")
    est = {
        r.k: r.cms_est
        for r in cms_estimate(sk, keys, "k", width=16, depth=3).collect()
    }
    assert set(est) == set(freqs)
    assert all(est[k] >= n for k, n in freqs.items())


def test_cms_exact_without_collisions(spark):
    # a single distinct key cannot collide with anything: min over its
    # buckets is the exact count, whatever the width
    df = _stream(spark, {"only": 17})
    sk = cms_build(df, "k", width=64, depth=4)
    keys = spark.createDataFrame([("only",), ("absent",)], "k string")
    est = {
        r.k: r.cms_est
        for r in cms_estimate(sk, keys, "k", width=64, depth=4).collect()
    }
    assert est["only"] == 17
    # a key that never appeared estimates 0 unless all its buckets
    # collide with the lone present key — with one occupied cell per
    # row and width 64 the chance every row collides is (1/64)^4, and
    # the md5-derived buckets are fixed, so pin the actual value
    assert est["absent"] in (0, 17)
    assert est["absent"] == 0  # verified stable for these literals


def test_cms_sketch_is_tiny_and_mergeable(spark):
    # cell count bounded by depth*width regardless of stream size, and
    # two half-stream sketches sum cell-wise to the full-stream sketch
    # (the property that makes CMS a streaming/partition-parallel fold)
    freqs = {f"w{i}": 5 for i in range(50)}
    full = _stream(spark, freqs)
    sk_full = cms_build(full, "k", width=32, depth=2)
    assert sk_full.count() <= 64
    h1 = _stream(spark, {k: 2 for k in freqs})
    h2 = _stream(spark, {k: 3 for k in freqs})
    merged = (
        cms_build(h1, "k", width=32, depth=2)
        .unionByName(cms_build(h2, "k", width=32, depth=2))
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, sk_full.collect())
    )
    # weighted build over pre-aggregated (key, count) rows == raw build
    pre = full.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    sk_w = cms_build(pre, "k", weight_col="n", width=32, depth=2)
    assert sorted(map(tuple, sk_w.collect())) == sorted(
        map(tuple, sk_full.collect())
    )


def test_cms_width_validation():
    with pytest.raises(ValueError, match="width"):
        cms_build(None, "k", width=100_000)
