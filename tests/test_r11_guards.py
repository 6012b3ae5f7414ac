"""Round-11 guard contracts: the scrub packed-key id bound (ADVICE
r10) and materialization parity of the dup-span bisect oracles (the
tools/pandas_parity.py finding pinned as a regression test)."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from metrics_service_spark.sources.tables import TABLES
from metrics_service_spark.testing.oracle import _canon_rows


def test_span_scrub_rejects_out_of_range_doc_id(spark):
    """doc_id >= 2^43 would silently wrap the packed keeper key
    doc_id * 2^20 + pos on the Spark side (non-ANSI) while DuckDB's
    BIGINT raises — the guard converts that parity split into an
    error (ADVICE r10)."""
    from metrics_service_spark.operators.dedup import duplicate_span_scrub

    df = spark.createDataFrame(
        [(1 << 43, "a b c d e f g h i")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="doc id outside"):
        duplicate_span_scrub(df, "doc_id", "text").collect()
    neg = spark.createDataFrame(
        [(-1, "a b c d e f g h i")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="doc id outside"):
        duplicate_span_scrub(neg, "doc_id", "text").collect()
    # in-range ids still flow
    ok = spark.createDataFrame(
        [((1 << 43) - 1, "a b c")], "doc_id long, text string"
    )
    assert duplicate_span_scrub(ok, "doc_id", "text").count() == 1


def test_dup_span_bisect_oracles_are_materialization_invariant():
    """The bisect arms exist because DuckDB HUGEINT (sum of integers)
    materializes as float64 under pandas but int under fetchall —
    tools/pandas_parity.py.  Pin that both new oracles canonicalize
    identically under BOTH materializations, so they stay safe under
    any driver comparator."""
    from metrics_service_spark.catalog import all_queries

    cat = all_queries()
    sf_dir = "/root/testdata/sf0.01"
    for name in ("doc_dup_spans_counts", "doc_dup_spans_frac"):
        con = duckdb.connect()
        try:
            for t in TABLES:
                p = os.path.join(sf_dir, f"{t}.parquet")
                if os.path.exists(p):
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                    )
            cur = con.execute(cat[name].oracle)
            cols = [d[0] for d in cur.description]
            exact = cur.fetchall()
            pdf = con.execute(cat[name].oracle).df()
            assert all(str(t) == "int64" for t in pdf.dtypes), (
                name,
                dict(pdf.dtypes.astype(str)),
            )
            via_pandas = [
                tuple(r) for r in pdf.itertuples(index=False, name=None)
            ]
            assert _canon_rows(cols, exact) == _canon_rows(cols, via_pandas)
        finally:
            con.close()


def test_isqrt_long_exact_at_knife_edges(spark):
    """The one-step-corrected isqrt must be exact wherever double sqrt
    can wobble: perfect squares, squares +-1, and large values near
    the 2^52 contract bound — on BOTH engines, against math.isqrt."""
    import math

    import duckdb

    cases = []
    for b in [0, 1, 2, 3, 10, 99, 10**6, 2**26 - 1, 2**26]:
        for sq in (b * b, b * b + 1, max(b * b - 1, 0)):
            cases.append(sq)
    cases += [2**52 - 1, 4503599627370241]  # (2^26)^2 + 1 territory
    cases = sorted(set(cases))

    from metrics_service_spark.operators.sampling import isqrt_long

    df = spark.createDataFrame([(x,) for x in cases], "x long").select(
        "x", isqrt_long(F.col("x")).alias("y")
    )
    got = {r.x: r.y for r in df.collect()}
    con = duckdb.connect()
    for x in cases:
        expect = math.isqrt(x)
        assert got[x] == expect, (x, got[x], expect)
        sql = (
            f"SELECT y0 + (CASE WHEN (y0+1)*(y0+1) <= {x} THEN 1 ELSE 0 END)"
            f" - (CASE WHEN y0*y0 > {x} THEN 1 ELSE 0 END) FROM "
            f"(SELECT CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) AS y0)"
        )
        assert con.execute(sql).fetchone()[0] == expect, x
    con.close()


def test_temperature_mix_flattens_head_domains(spark):
    """Property: with alpha=0.5 quotas, a source 100x another's size
    gets ~10x (sqrt-proportional) the quota, not 100x — and no quota
    exceeds what rounding of the sqrt weights allows."""
    import math

    from metrics_service_spark.operators.sampling import (
        temperature_source_sample,
    )

    rows = [(i, "head") for i in range(400)] + [
        (1000 + i, "tail") for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_source_sample(
        df, "source", "doc_id", keep_total=22
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r.source, 0)
        by[r.source] += 1
    # weights isqrt: head 20, tail 2 -> quotas 20, 2 of 22
    assert by == {"head": 20, "tail": 2}, by
    assert math.isqrt(400) == 20  # the flattening: 100x mass -> 10x quota
