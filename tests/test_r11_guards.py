"""Round-11 guard contracts: the scrub packed-key id bound (ADVICE
r10) and materialization parity of the dup-span bisect oracles (the
tools/pandas_parity.py finding pinned as a regression test)."""

from __future__ import annotations

import os

import duckdb
import pytest

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
