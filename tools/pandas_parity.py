"""Materialization-parity sweep for the DuckDB oracles (r11 root-cause
tool for the doc_dup_spans three-round driver red).

The repo's local comparator materializes oracle results via
``cursor.fetchall()`` (Python ints — HUGEINT comes back exact).  A
driver that materializes via ``cursor.df()`` (pandas) instead sees
DuckDB's HUGEINT columns converted to **float64** (verified on DuckDB
1.0.0: ``SELECT sum(x)`` -> dtype float64, value ``10.0``), so a bare
``sum(<integer>)`` in a final projection canonicalizes as ``"7.0"``
against Spark's ``"7"`` — hash-red with rows+schema green, reproducing
exactly the doc_dup_spans driver signature while staying invisible to
every fetchall-based local sweep.

This tool needs NO Spark: for every catalog oracle it runs the SQL
once, materializes BOTH ways, canonicalizes with the repo comparator's
own _canon_value, and reports entries whose two canons differ.  Any
entry listed here is red under a pandas-materializing driver no matter
how correct the Spark side is.

Usage: python tools/pandas_parity.py [sf_dir] [--json OUT.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from metrics_service_spark.catalog import all_queries  # noqa: E402
from metrics_service_spark.sources.tables import TABLES  # noqa: E402
from metrics_service_spark.testing.oracle import _canon_rows  # noqa: E402


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        json_out = args[args.index("--json") + 1]
        del args[args.index("--json") : args.index("--json") + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    catalog = all_queries()
    diverged: dict[str, str] = {}
    results: dict[str, str] = {}
    for name, spec in catalog.items():
        if spec.oracle is None:
            results[name] = "no-oracle"
            continue
        con = _connect(sf_dir)
        t0 = time.perf_counter()
        try:
            cur = con.execute(spec.oracle)
            cols = [d[0] for d in cur.description]
            exact = cur.fetchall()
            pdf = con.execute(spec.oracle).df()
            via_pandas = [
                tuple(row) for row in pdf.itertuples(index=False, name=None)
            ]
            ce = _canon_rows(cols, exact)
            cp = _canon_rows(cols, via_pandas)
            if ce != cp:
                first = next(
                    (a, b) for a, b in zip(ce, cp) if a != b
                )
                diverged[name] = f"fetchall={first[0]} pandas={first[1]}"
                results[name] = "DIVERGED"
                print(f"{name}: DIVERGED\n  fetchall: {first[0]}\n  pandas  : {first[1]}")
            else:
                results[name] = "parity"
                print(f"{name}: parity ({len(exact)} rows, {time.perf_counter()-t0:.1f}s)")
        except Exception as e:
            results[name] = f"error: {type(e).__name__}"
            print(f"{name}: ERROR {type(e).__name__}: {e}")
        finally:
            con.close()
    print(f"\n{len(diverged)} diverged / {len(results)} entries")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "diverged": diverged, "results": results},
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {json_out}")
    sys.exit(1 if diverged else 0)


if __name__ == "__main__":
    main()


# Minimal standalone repro of the mechanism (no catalog needed):
#   import duckdb
#   con = duckdb.connect()
#   q = "SELECT sum(x) AS s FROM (SELECT unnest(range(5)) AS x)"
#   con.execute(q).fetchall()   # [(10,)]        -- Python int
#   con.execute(q).df().dtypes  # s    float64   -- HUGEINT -> float64
