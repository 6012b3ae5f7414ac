"""Every catalog query must emit only SCALAR columns: the driver's
pandas canonicalizer cannot sort/hash list or struct cells (the round-1
user_event_family failure class).  Serialize arrays before returning
(array_join / explode / md5) — keep rich types in operator APIs, not
catalog outputs."""

from __future__ import annotations

from pyspark.sql import types as T

from metrics_service_spark.catalog import all_queries
import pytest

# multi-minute suite: excluded from the fast default run (pytest.ini)
pytestmark = pytest.mark.slow


def test_all_outputs_scalar(spark, sf_dir):
    offenders = []
    for name, spec in all_queries().items():
        df = spec.fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert offenders == []


def test_rows_only_entries_name_an_oracle_checked_twin():
    """Every rows-only catalog entry (no DuckDB oracle — float/hash
    family not SQL-replayable) must cite its exact twin: an
    oracle-checked entry that hard-verifies the same pipeline.  Keeps
    the driver report self-explaining (VERDICT r5 #8)."""
    from metrics_service_spark.catalog import all_queries

    cat = all_queries()
    for name, spec in cat.items():
        if spec.oracle:
            continue
        assert spec.exact_twin, f"{name} is rows-only with no exact_twin"
        twin = cat.get(spec.exact_twin)
        assert twin is not None, f"{name}: twin {spec.exact_twin} not in catalog"
        assert twin.oracle, f"{name}: twin {spec.exact_twin} is not oracle-checked"


def test_derived_cells_mirrors_fixture_count(sf_dir):
    """Footer-derived cell geometry (r9): _derived_cells must equal the
    oracle's scalar-subquery derivation over the same table, and scale
    linearly past the floor."""
    import math

    import duckdb

    from metrics_service_spark.catalog.llm import (
        CELL_FLOOR,
        CELL_TARGET,
        _derived_cells,
        _sql_cells,
    )

    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    sql_n = con.execute(
        "WITH q AS (SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')) SELECT {_sql_cells('q')}"
    ).fetchone()[0]
    con.close()
    expected = max(CELL_FLOOR, math.ceil(n / CELL_TARGET))
    assert _derived_cells(sf_dir) == expected == sql_n
    # geometry scales with the corpus, not pinned at the floor
    assert max(CELL_FLOOR, math.ceil(100 * CELL_TARGET / CELL_TARGET)) == 100
